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
