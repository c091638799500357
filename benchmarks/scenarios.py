"""Benchmark scenario suite — mirrors the reference's benchmark matrix
(reference: benchmark/particles_benchmarks.jl, 7 scenarios over
mc_step!/mc_sweep!) re-expressed for the batched TPU kernel.

Each scenario reports per-sweep wall time for a batch of chains and the
derived aggregate sweeps/s — the TPU-meaningful analogue of the reference's
single-chain @btime numbers (its headline: 5.114 us/step, 1.737 ms/sweep at
N=216 dense, benchmark/particles_benchmarks.jl:28-29).

Usage:  python benchmarks/scenarios.py [--chains 64] [--sweeps 4] [--only NAME]
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

sys.path.insert(0, ".")

from particlesmc_tpu.core import neighbours as NB
from particlesmc_tpu.core.state import make_system
from particlesmc_tpu.models import tables as T
from particlesmc_tpu.moves import base as MB
from particlesmc_tpu.moves import kernel as K

# (name, N, d, density, temperature, model factory, species fractions, cell?)
SCENARIOS = [
    ("medium-ss-3d-dense", 216, 3, 0.5342, 0.2, T.BHHP, (0.5, 0.5), False),
    ("medium-ss-3d-cell", 216, 3, 0.5342, 0.2, T.BHHP, (0.5, 0.5), True),
    ("small-2d-dense", 50, 2, 1.1920748468939728, 0.8, T.JBB, (0.46, 0.26, 0.28), False),
    ("large-2d-dense", 1000, 2, 1.1920748468939728, 0.8, T.JBB, (0.46, 0.26, 0.28), False),
    ("large-2d-cell", 1000, 2, 1.1920748468939728, 0.8, T.JBB, (0.46, 0.26, 0.28), True),
    ("larger-2d-cell", 3000, 2, 1.1920748468939728, 0.8, T.JBB, (0.46, 0.26, 0.28), True),
    ("larger-ss-3d-cell", 3000, 3, 0.5, 1.0, T.BHHP, (0.5, 0.5), True),
]


def lattice_config(n, d, density, fractions, rng):
    L = (n / density) ** (1 / d)
    per_dim = int(np.ceil(n ** (1 / d)))
    a = L / per_dim
    grid = np.stack(
        np.meshgrid(*[np.arange(per_dim) * a + a / 2] * d, indexing="ij"), -1
    ).reshape(-1, d)[:n]
    pos = grid + rng.uniform(-0.05 * a, 0.05 * a, (n, d))
    counts = [round(n * f) for f in fractions]
    counts[-1] = n - sum(counts[:-1])
    species = np.concatenate([np.full(c, s + 1) for s, c in enumerate(counts)])
    rng.shuffle(species)
    return pos, species


def run_scenario(name, n, d, density, temperature, model, fractions, cell, chains, sweeps, dtype):
    rng = np.random.default_rng(42)
    pos, species = lattice_config(n, d, density, fractions, rng)
    table = model(dtype)
    st = make_system(pos, species, density, temperature, dtype=dtype)
    spec = NB.make_spec(np.asarray(st.box), table.max_cutoff, n) if cell else None
    pool = (MB.displacement(0.1),)
    config = K.KernelConfig(pool=pool, table=table, cell_spec=spec)
    params = MB.init_pool_params(pool, dtype)

    keys = jax.random.split(jax.random.PRNGKey(42), chains)
    batch = jax.tree.map(lambda x: jnp.broadcast_to(x, (chains,) + x.shape), st)
    mc = jax.vmap(lambda s, k: K.init_mc_state(s, config, k))(batch, keys)

    sweep = K.build_sweep_fn(config, n)
    f = jax.jit(jax.vmap(lambda m: sweep(m, params)))

    t0 = time.perf_counter()
    mc = f(mc)
    jax.block_until_ready(mc.system.position)
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _ in range(sweeps):
        mc = f(mc)
    jax.block_until_ready(mc.system.position)
    el = (time.perf_counter() - t0) / sweeps

    return {
        "scenario": name,
        "N": n,
        "chains": chains,
        "ms_per_sweep_batch": round(el * 1e3, 3),
        "us_per_step_chain": round(el / n / chains * 1e6, 4),
        "aggregate_sweeps_per_s": round(chains / el, 2),
        "compile_s": round(compile_s, 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chains", type=int, default=64)
    ap.add_argument("--sweeps", type=int, default=4)
    ap.add_argument("--only", type=str, default=None)
    ap.add_argument("--f64", action="store_true")
    args = ap.parse_args()
    if args.f64:
        jax.config.update("jax_enable_x64", True)
    dtype = jnp.float64 if args.f64 else jnp.float32

    for sc in SCENARIOS:
        if args.only and args.only not in sc[0]:
            continue
        res = run_scenario(*sc, chains=args.chains, sweeps=args.sweeps, dtype=dtype)
        print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
