"""MC kernel invariants (build step 3 gates, SURVEY.md §7):
- incremental energy bookkeeping == recomputed total energy
- dense (EmptyList-oracle) vs cell-list paths produce identical trajectories
  with identical keys — the reference's own core test design (test/runtests.jl:90-91)
- species populations conserved under swap moves.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from particlesmc_tpu.core import neighbours as NB
from particlesmc_tpu.core.energy import initialize_energy, total_energy_dense
from particlesmc_tpu.core.state import make_system
from particlesmc_tpu.models import tables as T
from particlesmc_tpu.moves import base as MB
from particlesmc_tpu.moves import kernel as K


def _small_system(n=64, d=2, density=0.6, T_=1.5, model="BHHP", seed=0, dtype=jnp.float64):
    """Lattice + jitter start (overlap-free, O(N) energies) — mirrors how the
    reference workflows build initial states (examples/ortho-terphenyl stage 1)."""
    rng = np.random.default_rng(seed)
    L = (n / density) ** (1 / d)
    per_dim = int(np.ceil(n ** (1 / d)))
    a = L / per_dim
    grid = np.stack(
        np.meshgrid(*[np.arange(per_dim) * a + a / 2] * d, indexing="ij"), -1
    ).reshape(-1, d)[:n]
    pos = grid + rng.uniform(-0.05 * a, 0.05 * a, (n, d))
    nsp = 2 if model in ("BHHP", "KobAndersen") else 3
    sp = rng.integers(0, nsp, n)
    table = T.MODEL_REGISTRY[model](dtype)
    st = make_system(pos, sp + 1, density, T_, dtype=dtype)
    st = initialize_energy(st, table, check=False)
    return st, table


def _run(st, table, pool, n_sweeps, seed=3, cell_spec=None, mol=None):
    config = K.KernelConfig(
        pool=pool,
        table=table,
        cell_spec=cell_spec,
        mol_start=mol[0] if mol else None,
        mol_len=mol[1] if mol else None,
    )
    mc = K.init_mc_state(st, config, seed)
    run = K.build_run_fn(config, st.n_particles)
    params = MB.init_pool_params(pool, st.position.dtype)
    return run(mc, params, n_sweeps)


def test_incremental_energy_displacement():
    st, table = _small_system()
    pool = (MB.displacement(0.12),)
    mc = _run(st, table, pool, 5)
    recomputed = total_energy_dense(
        mc.system.position, mc.system.species, mc.system.box, table
    )
    assert float(mc.system.energy) == pytest.approx(float(recomputed), abs=1e-9)
    att = int(mc.attempted.sum())
    acc = int(mc.accepted.sum())
    assert att == 5 * st.n_particles
    assert 0 < acc < att  # non-trivial acceptance


def test_incremental_energy_with_swaps():
    st, table = _small_system(model="KobAndersen", density=0.4)
    pool = (
        MB.displacement(0.1, probability=0.5),
        MB.discrete_swap(0, 1, probability=0.5),
    )
    mc = _run(st, table, pool, 5)
    recomputed = total_energy_dense(
        mc.system.position, mc.system.species, mc.system.box, table
    )
    assert float(mc.system.energy) == pytest.approx(float(recomputed), abs=1e-9)
    # species populations conserved (swap preserves counts)
    sp0 = np.bincount(np.asarray(st.species), minlength=2)
    sp1 = np.bincount(np.asarray(mc.system.species), minlength=2)
    np.testing.assert_array_equal(sp0, sp1)
    assert int(mc.attempted[1]) > 0


def test_dense_vs_cell_trajectory_parity():
    """Identical seeds → identical trajectories across neighbour
    implementations (reference test/runtests.jl:90-91,129)."""
    st, table = _small_system(n=216, d=3, density=0.5, T_=2.0, model="KobAndersen", seed=4)
    pool = (
        MB.displacement(0.1, probability=0.5),
        MB.discrete_swap(0, 1, probability=0.5),
    )
    spec = NB.make_spec(np.asarray(st.box), table.max_cutoff, 216)
    assert spec is not None

    mc_dense = _run(st, table, pool, 3, seed=11, cell_spec=None)
    mc_cell = _run(st, table, pool, 3, seed=11, cell_spec=spec)

    np.testing.assert_allclose(
        np.asarray(mc_dense.system.position),
        np.asarray(mc_cell.system.position),
        atol=1e-9,
    )
    np.testing.assert_array_equal(
        np.asarray(mc_dense.system.species), np.asarray(mc_cell.system.species)
    )
    assert float(mc_dense.system.energy) == pytest.approx(
        float(mc_cell.system.energy), abs=1e-9
    )
    np.testing.assert_array_equal(
        np.asarray(mc_dense.accepted), np.asarray(mc_cell.accepted)
    )
    assert not bool(mc_cell.cell.overflow)


def test_vmapped_chains():
    """Batched chains evolve independently and identically to solo runs."""
    st, table = _small_system(n=32)
    pool = (MB.displacement(0.1),)
    config = K.KernelConfig(pool=pool, table=table, cell_spec=None)
    params = MB.init_pool_params(pool)

    batch = jax.tree.map(lambda x: jnp.stack([x, x]), st)
    keys = jnp.stack([jax.random.PRNGKey(1), jax.random.PRNGKey(2)])
    mc = jax.vmap(lambda s, k: K.init_mc_state(s, config, k))(batch, keys)
    sweep = K.build_sweep_fn(config, 32)
    run = jax.jit(jax.vmap(lambda m: sweep(m, params)))
    out = run(mc)

    solo = K.init_mc_state(st, config, jax.random.PRNGKey(1))
    solo_out = K.build_sweep_fn(config, 32)(solo, params)
    np.testing.assert_allclose(
        np.asarray(out.system.position[0]), np.asarray(solo_out.system.position), atol=0
    )
    # different keys → different trajectories
    assert not np.allclose(
        np.asarray(out.system.position[0]), np.asarray(out.system.position[1])
    )
