"""Per-substep candidate compaction (trim) — exactness vs the untrimmed
kernel, overflow-as-identity semantics, and auto sizing.

Dropped lanes are beyond the pair cutoff of every mover position in the
active cell, so trimmed and untrimmed kernels see identical ΔE up to
floating-point summation order: in f64 the trajectories coincide to ~1e-12
and every accept decision matches over short runs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from particlesmc_tpu.core.energy import initialize_energy, total_energy_dense
from particlesmc_tpu.core.state import make_system
from particlesmc_tpu.models import tables as T
from particlesmc_tpu.moves import base as MB
from particlesmc_tpu.moves import checkerboard as CB

# statistical/parity long-runners: fast tier skips this module
pytestmark = pytest.mark.slow

jax.config.update("jax_enable_x64", True)


def _liquid(n=1500, d=3, density=1.2, temperature=1.0, seed=0):
    rng = np.random.default_rng(seed)
    L = (n / density) ** (1 / d)
    per = int(np.ceil(n ** (1 / d)))
    a = L / per
    grid = np.stack(
        np.meshgrid(*[np.arange(per) * a + a / 2] * d, indexing="ij"), -1
    ).reshape(-1, d)[:n]
    pos = grid + rng.uniform(-0.05 * a, 0.05 * a, (n, d))
    species = (rng.random(n) < 0.2).astype(np.int32) + 1
    table = T.KobAndersen(jnp.float64)
    st = make_system(pos, species, density, temperature, dtype=jnp.float64)
    # the n=1500 lattice spacing (~0.9 sigma) overlaps on purpose: the
    # bookkeeping test then exercises large positive-and-negative deltas.
    # check=False because the initial energy is finite but large.
    st = initialize_energy(st, table, check=False)
    return st, table


def _run(st, table, pool, trim_k, calls=3, inner=4, seed=7, cap=None):
    n = st.position.shape[0]
    spec = CB.make_cb_spec(np.asarray(st.box), table.max_cutoff, n, cap=cap)
    assert spec is not None
    hs = jax.jit(
        CB.build_hyper_sweep_fn(
            spec, table, n, inner=inner, pool=pool, trim_k=trim_k
        )
    )
    mc = CB.init_cb_state(st, spec, seed, n_moves=len(pool))
    params = MB.init_pool_params(pool, jnp.float64)
    for _ in range(calls):
        mc = hs(mc, params)
    return mc, spec


@pytest.mark.parametrize(
    "pool",
    [
        (MB.displacement(0.06),),
        (MB.displacement(0.06, probability=0.8),
         MB.discrete_swap(1, 2, probability=0.2)),
    ],
    ids=["disp", "disp+swap"],
)
def test_trim_matches_untrimmed(pool):
    st, table = _liquid()
    mc0, spec = _run(st, table, pool, trim_k=None)
    # compaction capacity below the full 26*cap but above any real count
    trim_k = min(26 * spec.cap - 1, 26 * spec.cap // 2)
    mc1, _ = _run(st, table, pool, trim_k=trim_k)
    assert int(jnp.sum(mc1.skipped)) == 0
    np.testing.assert_array_equal(
        np.asarray(mc0.attempted), np.asarray(mc1.attempted)
    )
    np.testing.assert_array_equal(
        np.asarray(mc0.accepted), np.asarray(mc1.accepted)
    )
    np.testing.assert_allclose(
        np.asarray(mc1.system.position),
        np.asarray(mc0.system.position),
        atol=1e-9,
    )
    np.testing.assert_array_equal(
        np.asarray(mc0.system.species), np.asarray(mc1.system.species)
    )
    assert int(jnp.sum(mc1.accepted)) > 0  # runs actually moved


def test_trim_energy_bookkeeping():
    st, table = _liquid()
    pool = (MB.displacement(0.1),)
    mc, spec = _run(st, table, pool, trim_k=26 * spec_cap_half(st, table))
    booked = float(mc.system.energy)
    recomputed = float(
        total_energy_dense(
            mc.system.position, mc.system.species, mc.system.box, table
        )
    )
    np.testing.assert_allclose(booked, recomputed, rtol=1e-9, atol=1e-7)


def spec_cap_half(st, table):
    n = st.position.shape[0]
    spec = CB.make_cb_spec(np.asarray(st.box), table.max_cutoff, n)
    return spec.cap // 2


def test_trim_overflow_substep_is_identity():
    st, table = _liquid()
    pool = (MB.displacement(0.06),)
    mc, _ = _run(st, table, pool, trim_k=2, calls=2)  # always overflows
    assert int(jnp.sum(mc.skipped)) > 0
    assert int(jnp.sum(mc.accepted)) == 0
    assert int(jnp.sum(mc.attempted)) == 0
    np.testing.assert_allclose(
        np.asarray(mc.system.position), np.asarray(st.position), atol=0
    )


def test_auto_trim_k_sizing():
    st, table = _liquid(n=10_000)
    n = 10_000
    spec = CB.make_cb_spec(np.asarray(st.box), table.max_cutoff, n, cap=32)
    k = CB.auto_trim_k(spec, np.asarray(st.box), table.max_cutoff, n)
    assert k is not None
    assert k % 128 == 0
    assert k < 26 * spec.cap
    # mean in-range count at this state point is ~370; 7 sigma under 512
    assert k == 512
    # tight caps where compaction cannot beat 26*cap lanes return None
    st2, _ = _liquid(n=1500)
    spec2 = CB.make_cb_spec(np.asarray(st2.box), table.max_cutoff, 1500, cap=16)
    assert CB.auto_trim_k(spec2, np.asarray(st2.box), table.max_cutoff, 1500) is None
