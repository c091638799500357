"""Headline benchmark: aggregate MC sweeps/s at N=10k LJ (BASELINE.json metric).

Default mode runs the checkerboard hyper-sweep kernel (moves/checkerboard.py)
— the massively-parallel TPU Metropolis backend — on a binary Kob-Andersen LJ
mixture, N=10,000, 3D, with many independent chains batched per chip.
BENCH_MODE=seq measures the sequential per-move kernel instead (the
reference-semantics path).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
`vs_baseline` is measured aggregate sweeps/s divided by the estimated
single-core Julia reference at N=10k with its LinkedList path (~200 sweeps/s
— extrapolated from the published 5.1 us/step at N=216,
benchmark/particles_benchmarks.jl:28, assuming ~1 us/step with O(1)
neighbour iteration at N=10k → 10 ms/sweep, 1 chain/core).

Env knobs: BENCH_N, BENCH_CHAINS, BENCH_SWEEPS, BENCH_MODE (cb|seq),
BENCH_SIGMA.
"""

import json
import os
import sys
import time

N = int(os.environ.get("BENCH_N", 10_000))
CHAINS = int(os.environ.get("BENCH_CHAINS", 256))
SWEEPS_TIMED = int(os.environ.get("BENCH_SWEEPS", 8))
MODE = os.environ.get("BENCH_MODE", "cb")
SIGMA = float(os.environ.get("BENCH_SIGMA", 0.10))
REBIN = int(os.environ.get("BENCH_REBIN", 16))  # sweeps per rebin block (cb mode)
JULIA_BASELINE_SWEEPS_PER_S = 200.0


def _config(dtype):
    import numpy as np

    d, density, temperature = 3, 1.2, 1.0
    rng = np.random.default_rng(0)
    L = (N / density) ** (1 / d)
    per_dim = int(np.ceil(N ** (1 / d)))
    a = L / per_dim
    grid = np.stack(
        np.meshgrid(*[np.arange(per_dim) * a + a / 2] * d, indexing="ij"), -1
    ).reshape(-1, d)[:N]
    pos = np.asarray(grid + rng.uniform(-0.05 * a, 0.05 * a, (N, d)), np.float32)
    species = (rng.random(N) < 0.2).astype(np.int32) + 1
    return pos, species, density, temperature


def main():
    import jax
    import jax.numpy as jnp

    plat = os.environ.get("JAX_PLATFORMS")
    if plat:  # sitecustomize-registered plugins may override the env var
        jax.config.update("jax_platforms", plat)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from particlesmc_tpu.core.state import make_system
    from particlesmc_tpu.models import tables as T

    dtype = jnp.float32
    pos, species, density, temperature = _config(dtype)
    table = T.KobAndersen(dtype)
    st = make_system(pos, species, density, temperature, dtype=dtype)

    if MODE == "cb":
        from particlesmc_tpu.moves import checkerboard as CB

        # cap=32 ≈ 1.64x the mean occupancy at the N=10k/rho=1.2 default —
        # validated overflow-free over 768 sweeps from the lattice start (the
        # sticky overflow flag below guards the result regardless); the
        # library default (2.5x) is kept conservative for arbitrary systems.
        cap_env = os.environ.get("BENCH_CAP", "32" if N == 10_000 else "")
        spec = CB.make_cb_spec(
            __import__("numpy").asarray(st.box),
            table.max_cutoff,
            N,
            cap=int(cap_env) if cap_env else None,
        )
        hs = CB.build_hyper_sweep_fn(
            spec,
            table,
            N,
            use_pallas=bool(int(os.environ.get("BENCH_PALLAS", "0"))),
            inner=int(os.environ.get("BENCH_INNER", "8")),
            sweeps=REBIN,
        )

        @jax.jit
        def init_all(st):
            keys = jax.random.split(jax.random.PRNGKey(0), CHAINS)
            batch = jax.tree.map(lambda x: jnp.broadcast_to(x, (CHAINS,) + x.shape), st)
            return jax.vmap(lambda s, k: CB.init_cb_state(s, spec, k))(batch, keys)

        state = init_all(st)
        step = jax.jit(jax.vmap(lambda m: hs(m, SIGMA)))

        def advance(s, i):
            return step(s)

        label = f"checkerboard MC sweeps/s/chip, N={N} LJ, {CHAINS} chains"
    else:
        from particlesmc_tpu.moves import base as MB
        from particlesmc_tpu.moves import kernel as K

        pool = (MB.displacement(SIGMA),)
        config = K.KernelConfig(pool=pool, table=table, cell_spec=None)
        params = MB.init_pool_params(pool, dtype)

        @jax.jit
        def init_all(st):
            keys = jax.random.split(jax.random.PRNGKey(0), CHAINS)
            batch = jax.tree.map(lambda x: jnp.broadcast_to(x, (CHAINS,) + x.shape), st)
            return jax.vmap(lambda s, k: K.init_mc_state(s, config, k))(batch, keys)

        state = init_all(st)
        sweep = K.build_sweep_fn(config, N)
        step = jax.jit(jax.vmap(lambda m: sweep(m, params)))

        def advance(s, i):
            return step(s)

        label = f"sequential MC sweeps/s/chip, N={N} LJ, {CHAINS} chains"

    jax.block_until_ready(state.system.position)

    t0 = time.perf_counter()
    state = advance(state, 0)
    jax.block_until_ready(state.system.position)
    compile_s = time.perf_counter() - t0

    import numpy as np

    def _sum64(x):  # i32 counters overflow a device-side sum at 256 chains
        return float(np.sum(np.asarray(x, np.int64)))

    att0 = _sum64(state.attempted)
    t0 = time.perf_counter()
    for i in range(SWEEPS_TIMED):
        state = advance(state, i + 1)
    jax.block_until_ready(state.system.position)
    elapsed = time.perf_counter() - t0

    # one sweep = N attempted moves (the reference convention, sweepstep=N,
    # src/ParticlesMC.jl:246) — counted from the kernel's attempt counter so
    # rounding of rounds*colors*inner*cells up to >= N is not under-reported
    attempted = _sum64(state.attempted) - att0
    sweeps_per_s = attempted / N / elapsed
    if MODE == "cb" and bool(jnp.any(state.overflow)):
        print("# WARNING: cell-bucket overflow — result invalid", file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": label,
                "value": round(sweeps_per_s, 2),
                "unit": "sweeps/s",
                "vs_baseline": round(sweeps_per_s / JULIA_BASELINE_SWEEPS_PER_S, 3),
            }
        )
    )
    acc = _sum64(state.accepted) / max(1.0, _sum64(state.attempted))
    print(
        f"# device={jax.devices()[0].platform} compile={compile_s:.1f}s "
        f"timed={elapsed:.2f}s accept_rate={acc:.3f}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
