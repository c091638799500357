"""Pallas ΔE kernel parity (interpreter mode on CPU; same code lowers via
Mosaic on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from particlesmc_tpu.core import energy as E
from particlesmc_tpu.core.geometry import min_image
from particlesmc_tpu.core.state import make_system
from particlesmc_tpu.models import tables as T
from particlesmc_tpu.models.potentials import pair_potential
from particlesmc_tpu.models.tables import gather_pair
from particlesmc_tpu.moves import checkerboard as CB
from particlesmc_tpu.moves import pallas_kernels as PK


def test_delta_e_planes_matches_reference_math():
    """Kernel vs straight-jnp evaluation on random candidate planes."""
    rng = np.random.default_rng(0)
    table = T.KobAndersen(jnp.float64)
    A, K, d, S = 16, 96, 3, table.n_species
    L = 9.0
    box = jnp.full((d,), L, jnp.float64)

    nb_pos = rng.uniform(0, L, (A, K, d))
    nb_sp = rng.integers(0, S, (A, K)).astype(np.float64)
    mask = (rng.random((A, K)) < 0.8).astype(np.float64)
    x_old = rng.uniform(0, L, (A, d))
    x_new = x_old + rng.normal(0, 0.1, (A, d))
    s_a = rng.integers(0, S, (A,))

    planes = jnp.moveaxis(
        jnp.concatenate([nb_pos, nb_sp[..., None]], axis=-1), -1, 0
    )
    act = jnp.concatenate(
        [jnp.asarray(x_old), jnp.asarray(x_new),
         jnp.asarray(s_a, jnp.float64)[:, None], jnp.zeros((A, 7 - 2 * d))],
        axis=1,
    )
    de_kernel = np.asarray(
        PK.delta_e_planes(
            planes, act, jnp.asarray(mask), PK.pack_table(table, jnp.float64),
            box[None, :], S, interpret=True,
        )
    )[:, 0]

    # straight-jnp reference
    p = gather_pair(table, jnp.asarray(s_a)[:, None], jnp.asarray(nb_sp, jnp.int32))
    r2o = jnp.sum(min_image(jnp.asarray(nb_pos) - jnp.asarray(x_old)[:, None, :], box) ** 2, -1)
    r2n = jnp.sum(min_image(jnp.asarray(nb_pos) - jnp.asarray(x_new)[:, None, :], box) ** 2, -1)
    du = (pair_potential(r2n, p) - pair_potential(r2o, p)) * mask
    de_ref = np.asarray(jnp.sum(du, axis=-1))

    np.testing.assert_allclose(de_kernel, de_ref, rtol=1e-10, atol=1e-10)


def test_hyper_sweep_pallas_oracle_energy():
    """End-to-end wiring: the pallas-ΔE hyper-sweep books energy that matches
    a fresh dense recomputation (the incremental-oracle gate)."""
    table = T.KobAndersen(jnp.float64)
    n, d, density = 1300, 3, 1.2
    rng = np.random.default_rng(1)
    L = (n / density) ** (1 / d)
    per = int(np.ceil(n ** (1 / d)))
    a = L / per
    grid = np.stack(
        np.meshgrid(*[np.arange(per) * a + a / 2] * d, indexing="ij"), -1
    ).reshape(-1, d)[:n]
    pos = grid + rng.uniform(-0.03 * a, 0.03 * a, (n, d))
    species = (rng.random(n) < 0.2).astype(np.int64) + 1
    st = E.initialize_energy(
        make_system(pos, species, density, 1.0, dtype=jnp.float64), table
    )
    spec = CB.make_cb_spec(np.asarray(st.box), table.max_cutoff, n)
    cb = CB.init_cb_state(st, spec, seed=7)
    sweep = jax.jit(CB.build_hyper_sweep_fn(spec, table, n, use_pallas=True))
    for _ in range(2):
        cb = sweep(cb, 0.08)
    assert int(np.sum(np.asarray(cb.accepted))) > 30
    e_ref = float(
        E.total_energy_dense(cb.system.position, cb.system.species, cb.system.box, table)
    )
    np.testing.assert_allclose(float(cb.system.energy), e_ref, rtol=1e-9, atol=1e-7)
