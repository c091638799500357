"""Force-bias ("smart MC") displacement — correctness of the MH correction.

The smart proposal is asymmetric (drift along the local force); if the
reverse-drift correction in moves/checkerboard._disp_submove_smart were
wrong, the sampled distribution would be biased and the equilibrium mean
energy would drift away from the plain-Gaussian kernel's. The test
equilibrates one system and measures both pools on the checkerboard
backend, requiring agreement within combined statistical error — the same
differential methodology as the reference's list-parity tests
(reference test/runtests.jl:90-91) and tests/test_checkerboard.py.
"""

import jax
import jax.numpy as jnp
import numpy as np

from particlesmc_tpu.core import energy as E
from particlesmc_tpu.core.state import make_system
from particlesmc_tpu.models import tables as T
from particlesmc_tpu.moves import base as MB
from particlesmc_tpu.moves import checkerboard as CB
import pytest

# statistical/parity long-runners: fast tier skips this module
pytestmark = pytest.mark.slow

jax.config.update("jax_enable_x64", True)


def _equilibrated(n=150, d=2, density=0.9, temp=1.0, seed=3):
    table = T.KobAndersen(jnp.float64)
    rng = np.random.default_rng(seed)
    L = (n / density) ** (1 / d)
    per = int(np.ceil(n ** (1 / d)))
    a = L / per
    grid = np.stack(
        np.meshgrid(*[np.arange(per) * a + a / 2] * d, indexing="ij"), -1
    ).reshape(-1, d)[:n]
    pos = grid + rng.uniform(-0.03 * a, 0.03 * a, (n, d))
    species = (rng.random(n) < 0.2).astype(np.int32) + 1
    st = make_system(pos, species, density, temp, dtype=jnp.float64)
    st = E.initialize_energy(st, table)
    spec = CB.make_cb_spec(np.asarray(st.box), table.max_cutoff, n)
    assert spec is not None
    pool0 = (MB.displacement(0.1),)
    hs0 = jax.jit(CB.build_hyper_sweep_fn(spec, table, n, pool=pool0))
    cb = CB.init_cb_state(st, spec, seed=7, n_moves=1)
    p0 = MB.init_pool_params(pool0)
    for _ in range(300):
        cb = hs0(cb, p0)
    return cb.system, spec, table, n


def _measure(st_eq, spec, table, n, pool, seed, meas=400):
    hs = jax.jit(CB.build_hyper_sweep_fn(spec, table, n, pool=pool))
    cb = CB.init_cb_state(st_eq, spec, seed=seed, n_moves=len(pool))
    params = MB.init_pool_params(pool)
    es = []
    for _ in range(meas):
        cb = hs(cb, params)
        es.append(float(cb.system.energy) / n)
    assert not bool(cb.overflow)
    acc = float(np.sum(np.asarray(cb.accepted))) / max(
        1.0, float(np.sum(np.asarray(cb.attempted)))
    )
    return np.asarray(es), acc


def test_smart_matches_gaussian_equilibrium():
    st_eq, spec, table, n = _equilibrated()
    es_g, acc_g = _measure(st_eq, spec, table, n, (MB.displacement(0.1),), 11)
    es_s, acc_s = _measure(
        st_eq, spec, table, n, (MB.displacement_smart(0.1),), 12
    )
    assert 0.01 < acc_g < 0.95
    assert 0.01 < acc_s < 0.95
    # force bias should not hurt acceptance at equal sigma (it aims moves
    # downhill); allow slack for statistics
    assert acc_s > acc_g * 0.8, (acc_s, acc_g)
    b_g = np.mean(np.reshape(es_g, (8, -1)), axis=1)
    b_s = np.mean(np.reshape(es_s, (8, -1)), axis=1)
    s = np.sqrt(np.var(b_g, ddof=1) / 8 + np.var(b_s, ddof=1) / 8)
    assert abs(np.mean(es_g) - np.mean(es_s)) < 4 * max(s, 1e-4), (
        np.mean(es_g), np.mean(es_s), s,
    )


def test_smart_with_trim_matches_untrimmed():
    """Compaction composes with the smart sub-move (force sums are also
    cutoff-truncated, so dropped lanes contribute 0 to drift and ΔE)."""
    st_eq, spec, table, n = _equilibrated()
    pool = (MB.displacement_smart(0.1),)
    params = MB.init_pool_params(pool)
    outs = []
    for tk in (None, 26 * spec.cap // 2):
        hs = jax.jit(
            CB.build_hyper_sweep_fn(spec, table, n, pool=pool, trim_k=tk)
        )
        cb = CB.init_cb_state(st_eq, spec, seed=5, n_moves=1)
        for _ in range(3):
            cb = hs(cb, params)
        outs.append(cb)
    a, b = outs
    assert int(jnp.sum(b.skipped)) == 0
    np.testing.assert_array_equal(np.asarray(a.accepted), np.asarray(b.accepted))
    np.testing.assert_allclose(
        np.asarray(a.system.position), np.asarray(b.system.position), atol=1e-9
    )
    assert int(jnp.sum(a.accepted)) > 0
