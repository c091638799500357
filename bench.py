"""Headline benchmark: aggregate MC sweeps/s at N=10k LJ (BASELINE.json metric).

Runs the fused vmapped Metropolis sweep kernel (cell-list candidates) on a
binary Kob-Andersen LJ mixture, N=10,000, 3D, with many independent chains
batched per chip — the TPU-native inversion of the reference's 1 chain/core
Julia loop (SURVEY.md §7).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
`vs_baseline` is measured sweeps/s divided by the estimated single-core Julia
reference at N=10k with its LinkedList path (~200 sweeps/s — extrapolated from
the published 5.1 us/step at N=216, benchmark/particles_benchmarks.jl:28,
assuming ~1 us/step with O(1) neighbour iteration at N=10k → 10 ms/sweep).
"""

import json
import os
import sys
import time

N = int(os.environ.get("BENCH_N", 10_000))
CHAINS = int(os.environ.get("BENCH_CHAINS", 512))
SWEEPS_TIMED = int(os.environ.get("BENCH_SWEEPS", 4))
JULIA_BASELINE_SWEEPS_PER_S = 200.0


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from particlesmc_tpu.core import neighbours as NB
    from particlesmc_tpu.core.state import make_system
    from particlesmc_tpu.models import tables as T
    from particlesmc_tpu.moves import base as MB
    from particlesmc_tpu.moves import kernel as K

    dtype = jnp.float32
    d = 3
    density = 1.2
    temperature = 1.0

    # Lattice + jitter start (overlap-free)
    rng = np.random.default_rng(0)
    L = (N / density) ** (1 / d)
    per_dim = int(np.ceil(N ** (1 / d)))
    a = L / per_dim
    grid = np.stack(
        np.meshgrid(*[np.arange(per_dim) * a + a / 2] * d, indexing="ij"), -1
    ).reshape(-1, d)[:N]
    pos = grid + rng.uniform(-0.05 * a, 0.05 * a, (N, d))
    species = (rng.random(N) < 0.2).astype(np.int64)  # 80:20 KA composition

    table = T.KobAndersen(dtype)
    st = make_system(pos, species + 1, density, temperature, dtype=dtype)

    spec = NB.make_spec(np.asarray(st.box), table.max_cutoff, N, density)
    pool = (MB.displacement(0.12),)
    config = K.KernelConfig(pool=pool, table=table, cell_spec=spec)
    params = MB.init_pool_params(pool, dtype)

    keys = jax.random.split(jax.random.PRNGKey(0), CHAINS)
    batch = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (CHAINS,) + x.shape), st
    )
    mc = jax.vmap(lambda s, k: K.init_mc_state(s, config, k))(batch, keys)

    sweep = K.build_sweep_fn(config, N)
    step_chunk = jax.jit(jax.vmap(lambda m: sweep(m, params)))

    # warmup / compile
    t0 = time.perf_counter()
    mc = step_chunk(mc)
    jax.block_until_ready(mc.system.position)
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _ in range(SWEEPS_TIMED):
        mc = step_chunk(mc)
    jax.block_until_ready(mc.system.position)
    elapsed = time.perf_counter() - t0

    sweeps_per_s = CHAINS * SWEEPS_TIMED / elapsed
    print(
        json.dumps(
            {
                "metric": f"MC sweeps/s/chip, N={N} LJ (KobAndersen), {CHAINS} chains",
                "value": round(sweeps_per_s, 2),
                "unit": "sweeps/s",
                "vs_baseline": round(sweeps_per_s / JULIA_BASELINE_SWEEPS_PER_S, 3),
            }
        )
    )
    print(
        f"# device={jax.devices()[0].platform} compile={compile_s:.1f}s "
        f"timed={elapsed:.2f}s accept_rate="
        f"{float(jnp.sum(mc.accepted)) / max(1.0, float(jnp.sum(mc.attempted))):.3f}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
