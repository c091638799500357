"""Pallas checkerboard-substep kernel parity (moves/cb_pallas.py).

The Pallas path runs the identical algorithm as the XLA displacement branch
(same RNG draws, same pick/proposal/accept formulas), so with matching
precision the two paths must produce the same trajectory except on
measure-zero accept boundaries. Tests run the kernel in interpret mode on
CPU (the compiled path needs a real TPU; the bench exercises that).
"""

import jax
import jax.numpy as jnp
import numpy as np

from particlesmc_tpu.core import energy as E
from particlesmc_tpu.models import tables as T
from particlesmc_tpu.moves import base as MB
from particlesmc_tpu.moves import checkerboard as CB

from .test_checkerboard import _lattice_system
import pytest

# statistical/parity long-runners: fast tier skips this module
pytestmark = pytest.mark.slow


def _setup(n=1300, d=3, density=1.2, temperature=1.0):
    table = T.KobAndersen(jnp.float64)
    st = _lattice_system(n, d, density, temperature=temperature, table=table)
    spec = CB.make_cb_spec(np.asarray(st.box), table.max_cutoff, n)
    assert spec is not None
    return st, table, spec


def test_pallas_substep_matches_xla_path():
    """Same CBState + key through both backends: identical counters and
    float-tolerance-identical trajectories/energies."""
    st, table, spec = _setup()
    n = st.position.shape[0]
    pool = (MB.displacement(0.08),)
    params = MB.init_pool_params(pool, jnp.float64)

    fn_xla = jax.jit(
        CB.build_hyper_sweep_fn(
            spec, table, n, inner=4, sweeps=2, pool=pool, use_pallas=False
        )
    )
    fn_pl = jax.jit(
        CB.build_hyper_sweep_fn(
            spec, table, n, inner=4, sweeps=2, pool=pool,
            use_pallas=True, pallas_interpret=True,
        )
    )
    cb0 = CB.init_cb_state(st, spec, seed=3, n_moves=1)
    a = fn_xla(cb0, params)
    b = fn_pl(cb0, params)

    np.testing.assert_array_equal(np.asarray(a.attempted), np.asarray(b.attempted))
    np.testing.assert_array_equal(np.asarray(a.accepted), np.asarray(b.accepted))
    np.testing.assert_allclose(
        np.asarray(a.system.position), np.asarray(b.system.position),
        rtol=0, atol=1e-9,
    )
    np.testing.assert_allclose(
        float(a.system.energy), float(b.system.energy), rtol=1e-9
    )
    assert int(np.sum(np.asarray(b.accepted))) > 20


def test_pallas_ledger_matches_dense_recompute():
    """Incrementally booked energy through the Pallas path equals a fresh
    dense recomputation (the reference's own bookkeeping gate,
    test/runtests.jl:90-91)."""
    st, table, spec = _setup()
    n = st.position.shape[0]
    pool = (MB.displacement(0.08),)
    params = MB.init_pool_params(pool, jnp.float64)
    fn = jax.jit(
        CB.build_hyper_sweep_fn(
            spec, table, n, inner=4, sweeps=1, pool=pool,
            use_pallas=True, pallas_interpret=True,
        )
    )
    cb = CB.init_cb_state(st, spec, seed=11, n_moves=1)
    for _ in range(2):
        cb = fn(cb, params)
    assert not bool(cb.overflow)
    e_ref = float(
        E.total_energy_dense(
            cb.system.position, cb.system.species, cb.system.box, table
        )
    )
    np.testing.assert_allclose(float(cb.system.energy), e_ref, rtol=1e-9, atol=1e-7)
