"""Parallel tempering: swap mechanics and the sharded-chains collective path
(SURVEY.md §2.10 — first-class in this build, '(soon)' in the reference)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from particlesmc_tpu.core.energy import initialize_energy
from particlesmc_tpu.core.state import make_system
from particlesmc_tpu.engine.tempering import replica_exchange
from particlesmc_tpu.models import tables as T
from particlesmc_tpu.moves import base as MB
from particlesmc_tpu.moves import kernel as K


def _ladder_batch(m=8, n=32, seed=0):
    rng = np.random.default_rng(seed)
    d = 2
    density = 0.5
    L = (n / density) ** (1 / d)
    per_dim = int(np.ceil(n ** (1 / d)))
    a = L / per_dim
    grid = np.stack(
        np.meshgrid(*[np.arange(per_dim) * a + a / 2] * d, indexing="ij"), -1
    ).reshape(-1, d)[:n]
    table = T.KobAndersen()
    states = []
    for k in range(m):
        pos = grid + rng.uniform(-0.05 * a, 0.05 * a, (n, d))
        sp = rng.integers(1, 3, n)
        st = make_system(pos, sp, density, 1.0, dtype=jnp.float64)
        st = initialize_energy(st, table, check=False)
        states.append(st)
    batch = jax.tree.map(lambda *xs: jnp.stack(xs), *states)
    ladder = jnp.linspace(0.5, 2.0, m)
    batch = batch.replace(temperature=ladder)
    return batch, table


def test_swap_exchanges_configurations_not_temperatures():
    batch, table = _ladder_batch()
    config = K.KernelConfig(pool=(MB.displacement(0.1),), table=table, cell_spec=None)
    keys = jax.random.split(jax.random.PRNGKey(0), 8)
    mc = jax.vmap(lambda s, k: K.init_mc_state(s, config, k))(batch, keys)

    T0 = np.asarray(mc.system.temperature)
    E0 = np.asarray(mc.system.energy)
    P0 = np.asarray(mc.system.position)

    mc2, att, acc = replica_exchange(mc, jax.random.PRNGKey(42), 0)
    T1 = np.asarray(mc2.system.temperature)
    E1 = np.asarray(mc2.system.energy)
    P1 = np.asarray(mc2.system.position)

    # temperatures stay with the slot
    np.testing.assert_array_equal(T0, T1)
    # pairs attempted are the even-left ones
    np.testing.assert_array_equal(np.asarray(att), [True, False] * 4)
    # accepted pairs exchanged configurations; others untouched
    acc = np.asarray(acc)
    for k in range(0, 8, 2):
        if acc[k]:
            assert E1[k] == pytest.approx(E0[k + 1])
            assert E1[k + 1] == pytest.approx(E0[k])
            np.testing.assert_allclose(P1[k], P0[k + 1])
        else:
            assert E1[k] == pytest.approx(E0[k])
    # energy multiset conserved
    np.testing.assert_allclose(np.sort(E0), np.sort(E1))


def test_swap_acceptance_rule():
    """A pair with E_k > E_{k+1} and beta_k > beta_{k+1} has log_alpha > 0 →
    always swaps; the reverse ordering obeys the Metropolis rule."""
    batch, table = _ladder_batch(m=2)
    config = K.KernelConfig(pool=(MB.displacement(0.1),), table=table, cell_spec=None)
    keys = jax.random.split(jax.random.PRNGKey(0), 2)
    mc = jax.vmap(lambda s, k: K.init_mc_state(s, config, k))(batch, keys)
    # force E_0 > E_1 with T_0 < T_1 (beta_0 > beta_1) → log_alpha > 0
    sys2 = mc.system.replace(
        energy=jnp.asarray([10.0, -10.0]), temperature=jnp.asarray([0.5, 2.0])
    )
    mc = mc.replace(system=sys2)
    mc2, att, acc = replica_exchange(mc, jax.random.PRNGKey(1), 0)
    assert bool(acc[0])
    np.testing.assert_allclose(np.asarray(mc2.system.energy), [-10.0, 10.0])


def test_sharded_chains_match_single_device():
    """jit over an 8-device mesh (chains sharded) reproduces the unsharded
    trajectories (SURVEY.md §7 hard part c). Tolerance is one-ULP-tight, not
    bitwise: XLA tiles the dense N-body energy reduction differently per
    device layout, which legitimately reorders floating-point sums."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    batch, table = _ladder_batch(m=8)
    pool = (MB.displacement(0.1),)
    config = K.KernelConfig(pool=pool, table=table, cell_spec=None)
    params = MB.init_pool_params(pool)
    keys = jax.random.split(jax.random.PRNGKey(3), 8)
    mc = jax.vmap(lambda s, k: K.init_mc_state(s, config, k))(batch, keys)
    sweep = K.build_sweep_fn(config, 32)

    def train(mcb, prm, key):
        mcb = jax.vmap(lambda m: sweep(m, prm))(mcb)
        mcb, _, _ = replica_exchange(mcb, key, 0)
        return mcb

    key = jax.random.PRNGKey(9)
    ref = jax.jit(train)(mc, params, key)

    mesh = Mesh(np.asarray(jax.devices()[:8]), ("chains",))
    shard = NamedSharding(mesh, P("chains"))
    mc_sh = jax.device_put(mc, shard)
    out = jax.jit(train)(mc_sh, jax.device_put(params, NamedSharding(mesh, P())), key)

    np.testing.assert_allclose(
        np.asarray(ref.system.position), np.asarray(out.system.position),
        rtol=1e-12, atol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(ref.system.energy), np.asarray(out.system.energy),
        rtol=1e-12,
    )
    # state actually lives on 8 devices
    assert len(out.system.position.sharding.device_set) == 8


# ---------------------------------------------------------------------------
# Physics validation (VERDICT round-1 item 5)
# ---------------------------------------------------------------------------


def _ladder_chains(ladder, n=140, d=2, density=1.1920748468939728, seed=9,
                   model="JBB"):
    from particlesmc_tpu.io.loader import Chains

    table = getattr(T, model)(jnp.float64)
    rng = np.random.default_rng(seed)
    L = (n / density) ** (1 / d)
    per_dim = int(np.ceil(n ** (1 / d)))
    a = L / per_dim
    grid = np.stack(
        np.meshgrid(*[np.arange(per_dim) * a + a / 2] * d, indexing="ij"), -1
    ).reshape(-1, d)[:n]
    states = []
    for temp in ladder:
        pos = grid + rng.uniform(-0.03 * a, 0.03 * a, (n, d))
        if model == "JBB":
            r = rng.random(n)
            sp = np.where(r < 0.4, 1, np.where(r < 0.7, 2, 3))
        else:
            sp = rng.integers(1, 3, n)
        st = make_system(pos, sp, density, float(temp), dtype=jnp.float64)
        states.append(initialize_energy(st, table, check=False))
    batch = jax.tree.map(lambda *xs: jnp.stack(xs), *states)
    return Chains(states=batch, table=table, list_type="dense",
                  n_chains=len(ladder))


@pytest.mark.slow
def test_ladder_marginals_match_single_T_runs(tmp_path):
    """Tempered ladder slot k samples the same <E>(T_k) as an independent
    single-T ensemble — the melting-curve-style physical gate (SURVEY step 9).
    Both arms run the SAME engine config; only ReplicaExchange differs, so a
    detailed-balance error in the swap move shifts the tempered marginals."""
    from particlesmc_tpu.engine.simulation import Simulation
    from particlesmc_tpu.engine.schedule import build_schedule

    # a dilute fluid state point: dense 2D mixtures are glassy at low T, so
    # a lattice-start independent arm cannot equilibrate in test time (the
    # tempered arm can — which is the point of tempering, but it turns the
    # comparison into a burn-in race instead of a stationarity check)
    ladder = [0.9, 1.1, 1.35, 1.6]
    pool = (MB.displacement(0.25),)
    burn, meas, interval = 300, 600, 2

    def run(with_rex, path, seed):
        chains = _ladder_chains(ladder, n=64, density=0.6, model="KobAndersen")
        algos = [
            dict(algorithm="Metropolis", pool=pool, seed=seed),
            dict(algorithm="StoreCallbacks", callbacks=("energy",),
                 scheduler=build_schedule(burn + meas, burn, interval)),
        ]
        if with_rex:
            algos.append(
                dict(algorithm="ReplicaExchange",
                     scheduler=build_schedule(burn + meas, 0, 5))
            )
        sim = Simulation(chains, algos, burn + meas, path=str(path))
        sim.run()
        series = [
            np.loadtxt(path / "chains" / str(k + 1) / "energy.dat")[:, 1]
            for k in range(len(ladder))
        ]
        return np.asarray(series)  # [M, T_samples]

    e_rex = run(True, tmp_path / "rex", seed=3)
    e_ind = run(False, tmp_path / "ind", seed=11)

    # swaps must actually fire for this test to mean anything
    acc = np.loadtxt(tmp_path / "rex" / "tempering_acceptance.dat", ndmin=2)
    assert acc[-1, 1] > 0.05

    for k in range(len(ladder)):
        # trim to a multiple of 6 samples for block means
        m6 = (e_rex.shape[1] // 6) * 6
        a, b = e_rex[k][:m6], e_ind[k][:m6]
        ba = np.mean(a.reshape(6, -1), axis=1)
        bb = np.mean(b.reshape(6, -1), axis=1)
        s = np.sqrt(np.var(ba, ddof=1) / 6 + np.var(bb, ddof=1) / 6)
        assert abs(np.mean(a) - np.mean(b)) < 6 * max(s, 1e-3), (
            k, np.mean(a), np.mean(b), s
        )


@pytest.mark.slow
def test_replica_exchange_over_checkerboard_backend(tmp_path):
    """ReplicaExchange permutes the CBState pytree (planes/slot/shift travel
    with the configuration); the incremental energy of every chain must still
    match a dense recompute after swapped hyper-sweeps."""
    from particlesmc_tpu.core.energy import total_energy_dense
    from particlesmc_tpu.engine.simulation import Simulation
    from particlesmc_tpu.engine.schedule import build_schedule

    ladder = [0.7, 0.9, 1.2, 1.6]
    chains = _ladder_chains(ladder)
    pool = (MB.displacement(0.1),)
    steps = 12
    sim = Simulation(
        chains,
        [
            dict(algorithm="Metropolis", pool=pool, seed=5, parallel_moves=True),
            dict(algorithm="ReplicaExchange",
                 scheduler=build_schedule(steps, 0, 3)),
        ],
        steps,
        path=str(tmp_path),
    )
    sim.run()

    assert (tmp_path / "tempering_acceptance.dat").exists()
    # temperatures stayed with their slots
    np.testing.assert_allclose(
        np.asarray(sim.mc.system.temperature), ladder, rtol=0, atol=0
    )
    for k in range(len(ladder)):
        st = jax.tree.map(lambda x: x[k], sim.mc.system)
        e_ref = float(
            total_energy_dense(st.position, st.species, st.box, chains.table)
        )
        np.testing.assert_allclose(float(st.energy), e_ref, rtol=1e-9, atol=1e-7)
