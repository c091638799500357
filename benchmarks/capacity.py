"""Per-chip N-capacity curve for the checkerboard backend (SURVEY §2.10/§5.7).

Measures aggregate sweeps/s and per-chain device memory at N = 1e4 … 1e6
(Kob-Andersen LJ, 3D, rho = 1.2), choosing the chain batch to fill a fixed
memory budget. This is the measured scaling story for the particle-count
axis: within one chip the checkerboard kernel covers N up to the HBM limit,
and the chains axis (not spatial decomposition) is the cross-chip scaling
dimension — see docs/man/performance.md "Scaling out" for the rationale and
parallel/spatial.py for the shard_map halo-exchange path beyond it.

Usage: python benchmarks/capacity.py [--ns 10000 100000 1000000]
       [--budget-gb 4] [--sweeps 4]
Prints one JSON line per N.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import os
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    # per-platform cache: CPU AOT entries poison the TPU dir (and are
    # host-machine-feature specific -> SIGILL across hosts)
    "/tmp/jax_cache_cpu"
    if os.environ.get("JAX_PLATFORMS") == "cpu"
    else "/tmp/jax_cache",
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

sys.path.insert(0, ".")

from particlesmc_tpu.core.state import make_system
from particlesmc_tpu.models import tables as T
from particlesmc_tpu.moves import base as MB
from particlesmc_tpu.moves import checkerboard as CB

DIM, DENSITY, TEMPERATURE = 3, 1.2, 1.0


def lattice(n, seed=0):
    rng = np.random.default_rng(seed)
    L = (n / DENSITY) ** (1 / DIM)
    per = int(np.ceil(n ** (1 / DIM)))
    a = L / per
    grid = np.stack(
        np.meshgrid(*[np.arange(per) * a + a / 2] * DIM, indexing="ij"), -1
    ).reshape(-1, DIM)[:n]
    pos = np.asarray(grid + rng.uniform(-0.05 * a, 0.05 * a, (n, DIM)), np.float32)
    species = (rng.random(n) < 0.2).astype(np.int32) + 1
    return pos, species


def bytes_per_chain(n, spec, inner, rebin):
    # state: positions + species + planes + idx + slot (f32/i32 = 4 B)
    state = 4 * (
        n * DIM + n + spec.total * spec.cap * (DIM + 1) + spec.total * spec.cap + n
    )
    # dominant HLO temps (measured from the N=1e5 OOM report): the kernel
    # draws the whole rebin block's Gaussian proposals up front —
    # rebin x inner x (d+1) x ncells floats — plus ~6 s32[n] sort copies
    # for the carried rebin
    proposals = 4 * rebin * inner * (DIM + 1) * spec.total
    sort = 6 * 4 * n
    return state + proposals + sort


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ns", type=int, nargs="+",
                    default=[10_000, 30_000, 100_000, 300_000, 1_000_000])
    ap.add_argument("--budget-gb", type=float, default=4.0)
    ap.add_argument("--sweeps", type=int, default=4,
                    help="timed hyper-sweep calls (each = rebin sweeps)")
    ap.add_argument("--inner", type=int, default=48)
    ap.add_argument("--rebin", type=int, default=16)
    ap.add_argument("--max-chains", type=int, default=256)
    ap.add_argument("--cap", type=int, default=0,
                    help="bucket capacity override (0 = auto, rounded up "
                    "to x32; overflow shows up as skip_frac)")
    args = ap.parse_args()

    dtype = jnp.float32
    table = T.KobAndersen(dtype)

    for n in args.ns:
        pos, species = lattice(n)
        st = make_system(pos, species, DENSITY, TEMPERATURE, dtype=dtype)
        spec = CB.make_cb_spec(np.asarray(st.box), table.max_cutoff, n)
        # production settings (bench.py / mixing matrix): inner=48, rebin=16,
        # and a 32-aligned bucket cap — the auto cap can land on values like
        # 49 whose candidate-lane axis breaks XLA's 128-lane tiling (measured
        # 21% slower at cap=28 vs 32; worse at 49): round UP to x32, which
        # only adds masked lanes and cannot overflow earlier.
        cap32 = -(-spec.cap // 32) * 32
        if args.cap:
            cap32 = int(args.cap)
        elif (n, DENSITY, TEMPERATURE) == (10_000, 1.2, 1.0):
            # overflow-validated at EXACTLY the bench state point (bench.py);
            # other densities/temperatures keep the conservative auto cap
            cap32 = 32
        spec = CB.CBSpec(ncells=spec.ncells, cap=cap32)
        per_chain = bytes_per_chain(n, spec, args.inner, args.rebin)
        chains = max(1, min(args.max_chains, int(args.budget_gb * 1e9 / per_chain)))
        hs = CB.build_hyper_sweep_fn(
            spec, table, n, inner=args.inner, sweeps=args.rebin
        )

        @jax.jit
        def init_all(st):
            keys = jax.random.split(jax.random.PRNGKey(0), chains)
            batch = jax.tree.map(lambda x: jnp.broadcast_to(x, (chains,) + x.shape), st)
            return jax.vmap(lambda s, k: CB.init_cb_state(s, spec, k))(batch, keys)

        state = init_all(st)
        step = jax.jit(jax.vmap(lambda m: hs(m, 0.06), in_axes=(0,)))
        t0 = time.perf_counter()
        state = step(state)
        jax.block_until_ready(state.system.position)
        compile_s = time.perf_counter() - t0

        att0 = float(np.sum(np.asarray(state.attempted, np.int64)))
        t0 = time.perf_counter()
        for _ in range(args.sweeps):
            state = step(state)
        jax.block_until_ready(state.system.position)
        dt_s = time.perf_counter() - t0
        att = float(np.sum(np.asarray(state.attempted, np.int64))) - att0
        print(json.dumps({
            "N": n,
            "chains": chains,
            "ncells": spec.ncells,
            "cap": spec.cap,
            "mb_per_chain": round(per_chain / 1e6, 1),
            "sweeps_per_s": round(att / n / dt_s, 2),
            "moves_per_s": round(att / dt_s, 0),
            "compile_s": round(compile_s, 1),
            "overflow": bool(np.any(np.asarray(state.overflow))),
        }), flush=True)


if __name__ == "__main__":
    main()
