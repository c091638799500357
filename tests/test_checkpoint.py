"""Exact-resume checkpointing (positions + RNG keys + θ + counters) — the
capability SURVEY.md §5.4 flags as missing in the reference."""

import numpy as np

import jax
import jax.numpy as jnp

from particlesmc_tpu.core.energy import initialize_energy
from particlesmc_tpu.core.state import make_system
from particlesmc_tpu.io.checkpoint import load_checkpoint, save_checkpoint
from particlesmc_tpu.models import tables as T
from particlesmc_tpu.moves import base as MB
from particlesmc_tpu.moves import kernel as K


def _batch(m=2, n=32, seed=0):
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
    sts = []
    for _ in range(m):
        pos = grid + rng.uniform(-0.05 * a, 0.05 * a, (n, d))
        sp = rng.integers(1, 3, n)
        st = make_system(pos, sp, density, 1.2, dtype=jnp.float64)
        sts.append(initialize_energy(st, table, check=False))
    return jax.tree.map(lambda *xs: jnp.stack(xs), *sts), table


def test_checkpoint_exact_resume(tmp_path):
    batch, table = _batch()
    pool = (MB.displacement(0.1),)
    config = K.KernelConfig(pool=pool, table=table, cell_spec=None)
    params = MB.init_pool_params(pool)
    keys = jax.random.split(jax.random.PRNGKey(7), 2)
    mc0 = jax.vmap(lambda s, k: K.init_mc_state(s, config, k))(batch, keys)

    sweep = K.build_sweep_fn(config, 32)
    step = jax.jit(jax.vmap(lambda m: sweep(m, params)))

    # straight-through: 4 sweeps
    mc = mc0
    for _ in range(4):
        mc = step(mc)
    ref_pos = np.asarray(mc.system.position)

    # interrupted: 2 sweeps → checkpoint → load → 2 sweeps
    mc = mc0
    for _ in range(2):
        mc = step(mc)
    ckpt = tmp_path / "state.npz"
    save_checkpoint(str(ckpt), mc, params, step=2, extra={"note": "test"})

    mc2, params2, t = load_checkpoint(str(ckpt), config)
    assert t == 2
    for _ in range(2):
        mc2 = step(mc2)

    np.testing.assert_array_equal(ref_pos, np.asarray(mc2.system.position))
    np.testing.assert_array_equal(
        np.asarray(mc.attempted), np.asarray(load_checkpoint(str(ckpt), config)[0].attempted)
    )


def test_checkpoint_checkerboard_exact_resume(tmp_path):
    """Exact resume for the checkerboard backend: same color stream + key
    state -> bitwise-identical trajectories after reload."""
    from particlesmc_tpu.io.checkpoint import load_checkpoint_checkerboard
    from particlesmc_tpu.moves import checkerboard as CB

    # bigger box so a checkerboard grid exists (>= 4 cells/dim at cutoff)
    batch, table = _batch(m=2, n=140)
    spec = CB.make_cb_spec(
        np.asarray(batch.box[0]), table.max_cutoff, batch.position.shape[1]
    )
    assert spec is not None
    keys = jax.random.split(jax.random.PRNGKey(3), 2)
    cb0 = jax.vmap(lambda s, k: CB.init_cb_state(s, spec, k))(batch, keys)
    hs = CB.build_hyper_sweep_fn(spec, table, batch.position.shape[1])
    step = jax.jit(jax.vmap(lambda m, ck: hs(m, 0.1, ck), in_axes=(0, None)))
    cks = [jax.random.PRNGKey(100 + i) for i in range(4)]

    cb = cb0
    for i in range(4):
        cb = step(cb, cks[i])
    ref_pos = np.asarray(cb.system.position)

    cb = cb0
    for i in range(2):
        cb = step(cb, cks[i])
    params = ({"sigma": jnp.asarray(0.1)},)
    ckpt = tmp_path / "cb.npz"
    save_checkpoint(str(ckpt), cb, params, step=2)
    cb2, params2, t = load_checkpoint_checkerboard(str(ckpt), spec)
    assert t == 2 and float(params2[0]["sigma"]) == 0.1
    for i in range(2, 4):
        cb2 = step(cb2, cks[i])
    np.testing.assert_array_equal(ref_pos, np.asarray(cb2.system.position))


def test_checkpoint_roundtrips_params(tmp_path):
    batch, table = _batch()
    pool = (MB.displacement(0.1), MB.discrete_swap(0, 1, 0.3, policy="energy_bias", theta1=0.2))
    config = K.KernelConfig(pool=pool, table=table, cell_spec=None)
    params = MB.init_pool_params(pool)
    keys = jax.random.split(jax.random.PRNGKey(1), 2)
    mc = jax.vmap(lambda s, k: K.init_mc_state(s, config, k))(batch, keys)
    p = tmp_path / "c.npz"
    save_checkpoint(str(p), mc, params, step=0)
    _, params2, _ = load_checkpoint(str(p), config)
    assert float(params2[1]["theta1"]) == 0.2
    assert set(params2[0].keys()) == {"sigma"}
