"""Structural-observable tests, including the g(r) correctness gate:
checkerboard and sequential kernels must produce the same pair structure."""

import jax
import jax.numpy as jnp
import numpy as np

from particlesmc_tpu.analysis import (
    mean_squared_displacement,
    radial_distribution,
    self_intermediate_scattering,
    unwrap_trajectory,
)
from particlesmc_tpu.core import energy as E
from particlesmc_tpu.core.state import make_system
from particlesmc_tpu.models import tables as T
from particlesmc_tpu.moves import base as MB
from particlesmc_tpu.moves import checkerboard as CB
from particlesmc_tpu.moves import kernel as K
import pytest


@pytest.mark.slow
def test_gr_ideal_gas_is_flat():
    rng = np.random.default_rng(0)
    box = np.array([12.0, 12.0, 12.0])
    pos = rng.uniform(0, 12.0, (4000, 3))
    r, g = radial_distribution(pos, box, nbins=30, rmax=5.0)
    assert abs(np.mean(g[5:]) - 1.0) < 0.05  # flat at 1 beyond tiny r


def test_gr_species_resolved_lattice():
    # simple cubic lattice: delta peaks at the lattice spacing
    a = 1.0
    g1 = np.stack(np.meshgrid(*[np.arange(4) * a] * 3, indexing="ij"), -1).reshape(-1, 3)
    box = np.array([4.0, 4.0, 4.0])
    r, g = radial_distribution(g1, box, nbins=40, rmax=1.9)
    first_peak = np.flatnonzero(g > 5.0)[0]
    assert abs(r[first_peak] - a) < 0.06
    assert np.all(g[r < 0.9] == 0.0)  # no pairs below the lattice spacing


def test_fskt_and_msd_static_frames():
    pos = np.tile(np.random.default_rng(1).uniform(0, 10, (50, 3)), (5, 1, 1))
    F = self_intermediate_scattering(pos, np.full(3, 10.0), k_mod=7.4)
    np.testing.assert_allclose(F, 1.0, atol=1e-12)  # nothing moved
    np.testing.assert_allclose(mean_squared_displacement(pos), 0.0, atol=1e-15)


def test_msd_unwraps_folded_boundary_crossings():
    """A diffusing walker that crosses the periodic boundary: MSD on the
    FOLDED trajectory must match the ground-truth unwrapped one when `box`
    is passed (frame-to-frame min-image unwrapping) — and be wrong without
    it (the silent-degradation regression pinned here, VERDICT r3)."""
    rng = np.random.default_rng(7)
    box = np.full(3, 5.0)
    steps = rng.normal(0.0, 0.4, (200, 20, 3))  # well under box/2 per frame
    truth = np.concatenate(
        [np.zeros((1, 20, 3)), np.cumsum(steps, axis=0)]
    ) + rng.uniform(0, 5.0, (1, 20, 3))
    folded = truth - box * np.floor(truth / box)
    assert np.any(np.abs(truth - folded) > 1.0)  # boundary WAS crossed

    msd_truth = mean_squared_displacement(truth)
    np.testing.assert_allclose(
        mean_squared_displacement(folded, box=box), msd_truth, rtol=1e-12
    )
    # unwrapped displacements match truth exactly (offset by a constant image)
    unwrapped = unwrap_trajectory(folded, box)
    np.testing.assert_allclose(unwrapped - unwrapped[0], truth - truth[0], atol=1e-9)
    # without the box, folded MSD is badly wrong once the walkers spread
    assert abs(mean_squared_displacement(folded)[-1] - msd_truth[-1]) > 0.5 * msd_truth[-1]


@pytest.mark.slow
def test_gr_parity_checkerboard_vs_sequential():
    """BASELINE correctness gate: pair-correlation distributions agree within
    MC error between the two sampling kernels."""
    table = T.JBB(jnp.float64)
    n, d, density, temp, sigma = 140, 2, 1.1920748468939728, 0.8, 0.12
    rng = np.random.default_rng(3)
    L = (n / density) ** (1 / d)
    per = int(np.ceil(n ** (1 / d)))
    a = L / per
    grid = np.stack(
        np.meshgrid(*[np.arange(per) * a + a / 2] * d, indexing="ij"), -1
    ).reshape(-1, d)[:n]
    pos = grid + rng.uniform(-0.03 * a, 0.03 * a, (n, d))
    species = (rng.random(n) < 0.2).astype(np.int64) + 1
    st = E.initialize_energy(
        make_system(pos, species, density, temp, dtype=jnp.float64), table
    )

    # equilibrate sequentially, then fork
    pool = (MB.displacement(sigma),)
    config = K.KernelConfig(pool=pool, table=table, cell_spec=None)
    params = MB.init_pool_params(pool)
    mc = K.init_mc_state(st, config, 13)
    sweep = jax.jit(K.build_sweep_fn(config, n))
    for _ in range(400):
        mc = sweep(mc, params)
    st_eq = mc.system

    box = np.asarray(st_eq.box)
    frames_seq, frames_cb = [], []
    for _ in range(150):
        mc = sweep(mc, params)
        frames_seq.append(np.asarray(mc.system.position))

    spec = CB.make_cb_spec(box, table.max_cutoff, n)
    cb = CB.init_cb_state(st_eq, spec, seed=11)
    hsweep = jax.jit(CB.build_hyper_sweep_fn(spec, table, n))
    for _ in range(150):
        cb = hsweep(cb, sigma)
        frames_cb.append(np.asarray(cb.system.position))

    r, g_seq = radial_distribution(np.stack(frames_seq), box, nbins=40, rmax=3.0)
    _, g_cb = radial_distribution(np.stack(frames_cb), box, nbins=40, rmax=3.0)
    # compare where g is meaningfully non-zero; generous MC-error band
    mask = (g_seq > 0.2) | (g_cb > 0.2)
    assert np.max(np.abs(g_seq[mask] - g_cb[mask])) < 0.35
    np.testing.assert_allclose(g_seq[mask], g_cb[mask], atol=0.25, rtol=0.2)
