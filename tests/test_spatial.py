"""Spatial domain decomposition (parallel/spatial.py): the grid-sharded
hyper-sweep with ppermute halo exchange must reproduce the single-device
checkerboard kernel EXACTLY — it consumes the same bulk RNG stream with the
same per-active-cell layout, so any halo/image/parity error shows up as a
trajectory divergence, not a statistical one (SURVEY §2.10/§5.7)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from particlesmc_tpu.core import energy as E
from particlesmc_tpu.core.state import make_system
from particlesmc_tpu.models import tables as T
from particlesmc_tpu.moves import checkerboard as CB
from particlesmc_tpu.parallel import spatial as SP


def _wide_system(table, ncx=16, ncy=4, seed=0):
    """2D system whose box fits an (ncx, ncy) grid at the cutoff — wide in x
    so the grid shards over 8 devices with even slabs."""
    rng = np.random.default_rng(seed)
    rcut = table.max_cutoff
    box = np.array([ncx * rcut * 1.01, ncy * rcut * 1.01])
    density = 0.6
    n = int(density * box[0] * box[1])
    # jittered rectangular lattice: overlap-free start keeps |E| = O(N), so
    # exact-parity energy comparisons aren't swamped by reduction-order noise
    aspect = box[0] / box[1]
    ny = max(1, int(np.sqrt(n / aspect)))
    nx = int(np.ceil(n / ny))
    xs, ys = np.meshgrid(
        (np.arange(nx) + 0.5) * box[0] / nx,
        (np.arange(ny) + 0.5) * box[1] / ny,
        indexing="ij",
    )
    pos = np.stack([xs.reshape(-1), ys.reshape(-1)], -1)[:n]
    pos += rng.uniform(-0.05, 0.05, pos.shape)
    species = (rng.random(n) < 0.3).astype(np.int64) + 1
    st = make_system(pos, species, density, 1.0, box=box, dtype=jnp.float64)
    return E.initialize_energy(st, table, check=True)


@pytest.mark.parametrize("n_devices", [2, 8])
@pytest.mark.slow
def test_spatial_matches_unsharded_exactly(n_devices):
    devices = jax.devices()
    if len(devices) < n_devices:
        pytest.skip("needs virtual device mesh")
    table = T.KobAndersen(jnp.float64)
    st = _wide_system(table)
    n = st.n_particles
    spec = CB.make_cb_spec(np.asarray(st.box), table.max_cutoff, n)
    assert spec is not None and spec.ncells[0] == 16
    assert SP.spatial_slab_width(spec, n_devices) is not None

    mesh = Mesh(np.array(devices[:n_devices]), ("space",))
    sigma = 0.1

    cb0 = CB.init_cb_state(st, spec, seed=4)
    sweep_ref = jax.jit(CB.build_hyper_sweep_fn(spec, table, n, inner=3))
    sweep_sp = jax.jit(
        SP.build_spatial_hyper_sweep_fn(
            spec, table, n, mesh, axis="space", inner=3
        )
    )

    a, b = cb0, cb0
    for _ in range(3):
        a = sweep_ref(a, sigma)
        b = sweep_sp(b, sigma)

    assert not bool(b.overflow)
    np.testing.assert_allclose(
        np.asarray(b.system.position), np.asarray(a.system.position),
        atol=1e-12,
    )
    np.testing.assert_allclose(
        float(b.system.energy), float(a.system.energy), rtol=1e-12
    )
    # same attempt accounting (occupied-cell attempts, reference convention)
    assert int(np.sum(np.asarray(b.attempted))) == int(
        np.sum(np.asarray(a.attempted))
    )
    assert int(np.sum(np.asarray(b.accepted))) == int(
        np.sum(np.asarray(a.accepted))
    )
    assert int(np.sum(np.asarray(b.accepted))) > 50  # moves actually landed

    # and the sharded incremental energy is still exact vs the dense oracle
    e_ref = float(
        E.total_energy_dense(
            b.system.position, b.system.species, b.system.box, table
        )
    )
    np.testing.assert_allclose(float(b.system.energy), e_ref, atol=1e-7)


def test_slab_width_validation():
    spec = CB.CBSpec(ncells=(16, 4), cap=8)
    assert SP.spatial_slab_width(spec, 8) == 2
    assert SP.spatial_slab_width(spec, 4) == 4
    assert SP.spatial_slab_width(spec, 3) is None  # not divisible
    spec2 = CB.CBSpec(ncells=(12, 4), cap=8)
    assert SP.spatial_slab_width(spec2, 2) == 6
    assert SP.spatial_slab_width(spec2, 4) is None  # odd slabs


@pytest.mark.slow
def test_spatial_pool_disp_swap_matches_unsharded_exactly():
    """Pool mode (disp + DiscreteSwap): the sharded kernel consumes the same
    RNG layout as the unsharded pool kernel, so trajectories, species
    assignments, and per-move counters must agree exactly."""
    from particlesmc_tpu.moves import base as MB

    devices = jax.devices()
    if len(devices) < 4:
        pytest.skip("needs virtual device mesh")
    table = T.KobAndersen(jnp.float64)
    st = _wide_system(table, seed=3)
    # hot enough that 1<->2 KA swaps actually get accepted
    st = st.replace(temperature=jnp.asarray(5.0, jnp.float64))
    n = st.n_particles
    spec = CB.make_cb_spec(np.asarray(st.box), table.max_cutoff, n)
    mesh = Mesh(np.array(devices[:4]), ("space",))

    pool = (MB.displacement(0.1, probability=0.8), MB.discrete_swap(0, 1, 0.2))
    params = MB.init_pool_params(pool)
    cb0 = CB.init_cb_state(st, spec, seed=11, n_moves=2)
    sweep_ref = jax.jit(
        CB.build_hyper_sweep_fn(spec, table, n, inner=4, pool=pool)
    )
    sweep_sp = jax.jit(
        SP.build_spatial_hyper_sweep_fn(
            spec, table, n, mesh, axis="space", inner=4, pool=pool
        )
    )
    a, b = cb0, cb0
    for _ in range(3):
        a = sweep_ref(a, params)
        b = sweep_sp(b, params)

    assert not bool(b.overflow)
    np.testing.assert_array_equal(np.asarray(a.attempted), np.asarray(b.attempted))
    np.testing.assert_array_equal(np.asarray(a.accepted), np.asarray(b.accepted))
    np.testing.assert_array_equal(
        np.asarray(a.system.species), np.asarray(b.system.species)
    )
    np.testing.assert_allclose(
        np.asarray(b.system.position), np.asarray(a.system.position), atol=1e-12
    )
    np.testing.assert_allclose(
        float(b.system.energy), float(a.system.energy), rtol=1e-12
    )
    # both moves actually fired and some swaps were accepted
    assert int(np.asarray(a.accepted)[0]) > 0
    assert int(np.asarray(a.accepted)[1]) > 0
