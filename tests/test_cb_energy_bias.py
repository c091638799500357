"""EnergyBias swaps on the checkerboard backend (reference src/moves.jl:246-280).

Three gates:
- _softmax_pick samples the masked softmax exactly (distribution + log-prob);
- θ = 0 reduces BITWISE to the uniform in-cell swap (same RNG stream, same
  lane selection, zero MH correction);
- a biased pool (θ ≠ 0) leaves ensemble averages unchanged vs a uniform-swap
  pool at the same state point — the stationary distribution is invariant
  under the proposal change iff the MH asymmetry correction is exact.
"""

import jax
import jax.numpy as jnp
import numpy as np

from particlesmc_tpu.core.energy import initialize_energy
from particlesmc_tpu.core.state import make_system
from particlesmc_tpu.models import tables as T
from particlesmc_tpu.moves import base as MB
from particlesmc_tpu.moves import checkerboard as CB
from particlesmc_tpu.moves.checkerboard import _softmax_pick
import pytest

# statistical/parity long-runners: fast tier skips this module
pytestmark = pytest.mark.slow


def _system(n_side=16, seed=3, temperature=0.7):
    """2D Kob-Andersen-style binary mixture big enough for a CB grid."""
    rng = np.random.default_rng(seed)
    n = n_side * n_side
    d = 2
    density = 1.0
    L = (n / density) ** (1 / d)
    a = L / n_side
    grid = np.stack(
        np.meshgrid(*[np.arange(n_side) * a + a / 2] * d, indexing="ij"), -1
    ).reshape(-1, d)
    pos = grid + rng.uniform(-0.05 * a, 0.05 * a, (n, d))
    sp = (rng.random(n) < 0.3).astype(np.int64) + 1
    table = T.KobAndersen(jnp.float64)
    st = make_system(pos, sp, density, temperature, dtype=jnp.float64)
    return initialize_energy(st, table, check=True), table, n


def test_softmax_pick_distribution_and_logp():
    logits = jnp.asarray([1.0, -0.5, 0.0, 2.0, -1.0, 0.3])[None, :]
    memb = jnp.asarray([True, False, True, True, False, True])[None, :]
    lv = np.where(np.asarray(memb[0]), np.asarray(logits[0]), -np.inf)
    p_true = np.exp(lv - lv.max())
    p_true /= p_true.sum()

    us = np.linspace(0.001, 0.999, 4001)
    counts = np.zeros(6)
    for u in us:
        pick, logp = _softmax_pick(logits, memb, jnp.asarray([u]))
        k = int(np.argmax(np.asarray(pick[0])))
        assert bool(memb[0, k])
        counts[k] += 1
        np.testing.assert_allclose(float(logp[0]), np.log(p_true[k]), rtol=1e-10)
    np.testing.assert_allclose(counts / len(us), p_true, atol=0.002)


def test_theta_zero_is_bitwise_uniform_swap():
    st, table, n = _system()
    spec = CB.make_cb_spec(np.asarray(st.box), table.max_cutoff, n)
    pool_u = (
        MB.displacement(0.08, probability=0.7),
        MB.discrete_swap(0, 1, probability=0.3),
    )
    pool_eb = (
        MB.displacement(0.08, probability=0.7),
        MB.discrete_swap(0, 1, probability=0.3, policy="energy_bias"),
    )
    hs_u = jax.jit(CB.build_hyper_sweep_fn(spec, table, n, pool=pool_u))
    hs_eb = jax.jit(CB.build_hyper_sweep_fn(spec, table, n, pool=pool_eb))
    pu = MB.init_pool_params(pool_u)
    pe = MB.init_pool_params(pool_eb)  # theta1 = theta2 = 0

    cu = CB.init_cb_state(st, spec, seed=5, n_moves=2)
    ce = CB.init_cb_state(st, spec, seed=5, n_moves=2)
    for _ in range(5):
        cu = hs_u(cu, pu)
        ce = hs_eb(ce, pe)
    np.testing.assert_array_equal(
        np.asarray(cu.system.position), np.asarray(ce.system.position)
    )
    np.testing.assert_array_equal(
        np.asarray(cu.system.species), np.asarray(ce.system.species)
    )
    np.testing.assert_array_equal(np.asarray(cu.accepted), np.asarray(ce.accepted))
    assert int(np.sum(np.asarray(cu.accepted)[1])) > 0  # swaps really fired


def test_biased_swaps_preserve_ensemble_averages():
    """Stationary-distribution invariance: disp+EB(θ≠0) and disp+uniform-swap
    pools must agree on mean energy within MC error (a wrong q_rev/q_fwd
    would bias the ensemble)."""
    st, table, n = _system(temperature=0.9)
    spec = CB.make_cb_spec(np.asarray(st.box), table.max_cutoff, n)
    pool_u = (
        MB.displacement(0.09, probability=0.8),
        MB.discrete_swap(0, 1, probability=0.2),
    )
    pool_eb = (
        MB.displacement(0.09, probability=0.8),
        MB.discrete_swap(
            0, 1, probability=0.2, policy="energy_bias", theta1=1.0, theta2=1.0
        ),
    )

    def mean_energy(pool, seed, chains=6, equil=150, meas=250):
        hs = CB.build_hyper_sweep_fn(spec, table, n, pool=pool)
        params = MB.init_pool_params(pool)
        step = jax.jit(jax.vmap(lambda c: hs(c, params)))
        batch = jax.tree.map(lambda x: jnp.broadcast_to(x, (chains,) + x.shape), st)
        keys = jax.random.split(jax.random.PRNGKey(seed), chains)
        cb = jax.vmap(lambda s, k: CB.init_cb_state(s, spec, k, len(pool)))(
            batch, keys
        )
        for _ in range(equil):
            cb = step(cb)
        es = []
        for _ in range(meas):
            cb = step(cb)
            es.append(np.asarray(cb.system.energy))
        acc = np.asarray(cb.accepted, np.float64).sum(0)
        att = np.asarray(cb.attempted, np.float64).sum(0)
        es = np.asarray(es)  # [meas, chains]
        per_chain = es.mean(axis=0) / n
        return per_chain.mean(), per_chain.std(ddof=1) / np.sqrt(len(per_chain)), (
            acc / att
        )

    e_u, se_u, rate_u = mean_energy(pool_u, seed=11)
    e_b, se_b, rate_b = mean_energy(pool_eb, seed=23)
    sig = np.hypot(se_u, se_b)
    assert abs(e_u - e_b) < 4 * max(sig, 1e-4), (e_u, e_b, sig)
    # the bias really changed the proposal distribution — picking high-energy
    # members of both species raises swap acceptance (that is the whole point
    # of EnergyBias; measured ~1.7x at this state point)
    assert rate_b[1] > rate_u[1] + 0.005, (rate_u, rate_b)
