"""Mixing-rate sweep: sigma x rebin cadence at the headline bench point.

The chip sits at its sweeps/s roofline, so mixing per wall-second is decided
by PROPOSAL QUALITY: per sweep, a chain gains ~acc(sigma) * E|delta|^2 of
configuration-space motion, and the checkerboard adds two sigma-sensitive
losses (cell-exit auto-rejects, rebin/shift cadence). This harness measures
msd_per_s (the honest mixing metric of bench.py) over a sigma x rebin_every
grid at the N=10k LJ bench point and prints one JSON line per cell; the
matrix goes into docs/man/performance.md and picks bench.py's default sigma.

sigma is a TRACED pool parameter — the whole sigma axis reuses one compiled
kernel per rebin value.

Usage: python benchmarks/mixing_sweep.py [--sigmas 0.06,0.12,...]
       [--rebins 4,8,16] [--chains 256] [--n 10000] [--sweep-calls 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

DIM, DENSITY, TEMPERATURE = 3, 1.2, 1.0
JULIA_NODE_SWEEPS_PER_S = 200.0 * 64
JULIA_MSD_PER_SWEEP = 0.55 * 3 * 0.05**2  # see bench.py docstring


def lattice_config(n):
    rng = np.random.default_rng(0)
    L = (n / DENSITY) ** (1 / DIM)
    per = int(np.ceil(n ** (1 / DIM)))
    a = L / per
    grid = np.stack(
        np.meshgrid(*[np.arange(per) * a + a / 2] * DIM, indexing="ij"), -1
    ).reshape(-1, DIM)[:n]
    pos = np.asarray(grid + rng.uniform(-0.05 * a, 0.05 * a, (n, DIM)), np.float32)
    species = (rng.random(n) < 0.2).astype(np.int32) + 1
    return pos, species


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sigmas", default="0.06,0.09,0.12,0.15,0.20,0.25,0.30")
    ap.add_argument("--rebins", default="4,8,16")
    ap.add_argument("--chains", type=int, default=256)
    ap.add_argument("--n", type=int, default=10_000)
    ap.add_argument("--inner", type=int, default=48)
    ap.add_argument("--cap", type=int, default=0,
                    help="bucket capacity; 0 = library auto (use 32 at the "
                    "validated N=10k bench point, see bench.py)")
    ap.add_argument("--equil-sweeps", type=int, default=192)
    ap.add_argument("--meas-sweeps", type=int, default=128,
                    help="hyper-sweeps per measurement (equal across cells)")
    ap.add_argument("--temperature", type=float, default=TEMPERATURE,
                    help="state-point temperature (default 1.0 = the bench "
                    "point; 0.45 = the classic Kob-Andersen supercooled "
                    "point)")
    ap.add_argument("--smart", action="store_true",
                    help="use the force-bias (SmartGaussian) displacement "
                    "policy instead of SimpleGaussian")
    ap.add_argument("--cell-factor", type=float, default=1.0,
                    help="inflate the grid's rcut by this factor: bigger "
                    "cells cut the cell-exit auto-reject fraction at large "
                    "sigma at the price of more candidate lanes per move "
                    "(cap grows ~factor^d). 1.0 = the production grid.")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        jax.config.update("jax_platforms", plat)
    jax.config.update(
        "jax_compilation_cache_dir",
        # per-platform cache: CPU AOT entries poison the TPU dir (and are
        # host-machine-feature specific -> SIGILL across hosts)
        "/tmp/jax_cache_cpu"
        if os.environ.get("JAX_PLATFORMS") == "cpu"
        else "/tmp/jax_cache",
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from particlesmc_tpu.core.state import make_system
    from particlesmc_tpu.models import tables as T
    from particlesmc_tpu.moves import base as MB
    from particlesmc_tpu.moves import checkerboard as CB

    n, chains = args.n, args.chains
    pos, species = lattice_config(n)
    table = T.KobAndersen(jnp.float32)
    st = make_system(pos, species, DENSITY, args.temperature, dtype=jnp.float32)
    box = np.asarray(st.box)
    # --cap is honored at any --cell-factor (a fat-cell grid with a user cap
    # is a legitimate sweep point; the earlier silent cap=auto override when
    # cell_factor != 1 produced a different cap than requested)
    spec = CB.make_cb_spec(
        box, table.max_cutoff * args.cell_factor, n, cap=(args.cap or None)
    )
    if spec is None:
        raise SystemExit("box too small for a checkerboard grid at this N")
    print(f"# grid {spec.ncells} cap={spec.cap}", file=sys.stderr)
    pool = (
        (MB.displacement_smart(0.06),) if args.smart else (MB.displacement(0.06),)
    )

    def build(rebin):
        hs = CB.build_hyper_sweep_fn(
            spec, table, n, inner=args.inner, sweeps=rebin, pool=pool
        )
        return jax.jit(
            jax.vmap(lambda m, s: hs(m, ({"sigma": s},)), in_axes=(0, None))
        )

    @jax.jit
    def init_all(st):
        keys = jax.random.split(jax.random.PRNGKey(0), chains)
        batch = jax.tree.map(lambda x: jnp.broadcast_to(x, (chains,) + x.shape), st)
        return jax.vmap(lambda s, k: CB.init_cb_state(s, spec, k, 1))(batch, keys)

    # shared equilibration at a mid-grid sigma (structure is sigma-independent
    # at equilibrium; each cell re-burns shortly at its own sigma)
    state0 = init_all(st)
    step16 = build(16)
    sig_eq = jnp.asarray(0.10, jnp.float32)
    for _ in range(max(1, args.equil_sweeps // 16)):
        state0 = step16(state0, sig_eq)
    jax.block_until_ready(state0.system.position)
    print(f"# equilibrated {args.equil_sweeps} sweeps at sigma=0.10", file=sys.stderr)

    sigmas = [float(s) for s in args.sigmas.split(",")]
    rebins = [int(r) for r in args.rebins.split(",")]
    results = []
    for rebin in rebins:
        step = build(rebin)
        calls_meas = max(1, args.meas_sweeps // rebin)
        calls_burn = max(1, 32 // rebin)
        # warm the compile outside the timed window
        _ = jax.block_until_ready(
            step(state0, jnp.asarray(sigmas[0], jnp.float32)).system.position
        )
        for sig in sigmas:
            s_ = jnp.asarray(sig, jnp.float32)
            stt = state0
            for _ in range(calls_burn):
                stt = step(stt, s_)
            jax.block_until_ready(stt.system.position)
            att0 = float(np.sum(np.asarray(stt.attempted, np.int64)))
            acc0 = float(np.sum(np.asarray(stt.accepted, np.int64)))
            skip0 = float(np.sum(np.asarray(stt.skipped, np.int64)))
            p0 = np.asarray(stt.system.position)
            t0 = time.perf_counter()
            for _ in range(calls_meas):
                stt = step(stt, s_)
            jax.block_until_ready(stt.system.position)
            el = time.perf_counter() - t0
            att = float(np.sum(np.asarray(stt.attempted, np.int64))) - att0
            acc = float(np.sum(np.asarray(stt.accepted, np.int64))) - acc0
            skip = float(np.sum(np.asarray(stt.skipped, np.int64))) - skip0
            dx = np.asarray(stt.system.position) - p0
            dx -= box * np.round(dx / box)
            msd = float(np.mean(np.sum(dx * dx, -1)))
            row = {
                "sigma": sig,
                "rebin": rebin,
                "temperature": args.temperature,
                "smart": bool(args.smart),
                "inner": args.inner,
                "cell_factor": args.cell_factor,
                "cap": spec.cap,
                "sweeps_per_s": round(att / n / el, 1),
                "acceptance": round(acc / max(att, 1.0), 4),
                "msd_per_s": round(msd / el, 6),
                "vs_baseline_msd": round(
                    chains * (msd / el)
                    / (JULIA_NODE_SWEEPS_PER_S * JULIA_MSD_PER_SWEEP),
                    4,
                ),
                "skip_frac": round(skip / max(1.0, calls_meas * chains), 4),
            }
            results.append(row)
            print(json.dumps(row))
    best = max(results, key=lambda r: r["msd_per_s"])
    print("# best:", json.dumps(best), file=sys.stderr)


if __name__ == "__main__":
    main()
