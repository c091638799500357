"""Shared model-building code for the two-process distributed smoke test.

Kept import-light and deterministic: BOTH the worker processes and the
single-process reference in tests/test_multiprocess.py call these, so any
drift between them is a real parity failure, not a setup difference.
"""

import numpy as np


def build_batch(chains: int):
    """A batch of `chains` identical-recipe (different-key) KA-LJ systems
    on the sequential kernel, small enough to compile fast on CPU."""
    import jax
    import jax.numpy as jnp

    from particlesmc_tpu.core.energy import initialize_energy
    from particlesmc_tpu.core.state import make_system
    from particlesmc_tpu.models import tables as T
    from particlesmc_tpu.moves import base as MB, kernel as K

    n, dim, rho, temp = 64, 3, 0.8, 1.5
    rng = np.random.default_rng(11)
    L = (n / rho) ** (1 / dim)
    per = int(np.ceil(n ** (1 / dim)))
    a = L / per
    grid = np.stack(
        np.meshgrid(*[np.arange(per) * a + a / 2] * dim, indexing="ij"), -1
    ).reshape(-1, dim)[:n]
    pos = grid + rng.uniform(-0.05 * a, 0.05 * a, (n, dim))
    species = (rng.random(n) < 0.2).astype(np.int32) + 1

    dtype = jnp.float64
    table = T.KobAndersen(dtype)
    st = initialize_energy(
        make_system(pos, species, rho, temp, dtype=dtype), table
    )
    pool = (MB.displacement(0.1),)
    params = MB.init_pool_params(pool, dtype)
    config = K.KernelConfig(pool=pool, table=table, cell_spec=None)
    keys = jax.random.split(jax.random.PRNGKey(5), chains)
    batch = jax.tree.map(lambda x: jnp.broadcast_to(x, (chains,) + x.shape), st)
    mc = jax.vmap(lambda s, k: K.init_mc_state(s, config, k))(batch, keys)
    sweep = K.build_sweep_fn(config, n)
    return mc, params, sweep


def run_sweeps(mc, params, sweep, shard=None, n_sweeps: int = 2):
    """Jitted n_sweeps of the vmapped kernel; `shard` pins in/out shardings
    when running over a multi-process mesh."""
    import jax

    def body(mcb):
        for _ in range(n_sweeps):
            mcb = jax.vmap(lambda m: sweep(m, params))(mcb)
        return mcb

    if shard is not None:
        fn = jax.jit(body, out_shardings=jax.tree.map(lambda _: shard, mc))
    else:
        fn = jax.jit(body)
    out = fn(mc)
    jax.block_until_ready(out.system.energy)
    return out
