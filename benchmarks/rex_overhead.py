"""Replica-exchange overhead at the bench point (VERDICT r3 weak #7).

The engine's ReplicaExchange.step() is a host-side event between jitted
chunks (engine/tempering.py): one jitted permutation pass plus a host pull
of the two counter scalars. This measures what that costs at aggressive
swap cadences — checkerboard kernel, N=10k LJ, 256-chain temperature ladder
— by timing the same number of sweeps with swap-every-{inf, 20, 5, 1}
hyper-sweep calls. Prints one JSON line per cadence; the table goes into
docs/man/performance.md.

Usage: python benchmarks/rex_overhead.py [--chains 256] [--n 10000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

DIM, DENSITY = 3, 1.2


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=10_000)
    ap.add_argument("--chains", type=int, default=256)
    ap.add_argument("--inner", type=int, default=48)
    ap.add_argument("--cap", type=int, default=32)
    ap.add_argument("--rebin", type=int, default=16)
    ap.add_argument("--calls", type=int, default=8)
    ap.add_argument("--cadences", default="0,20,5,1",
                    help="REX events every k hyper-sweep calls; 0 = never")
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
    from particlesmc_tpu.engine.tempering import replica_exchange
    from particlesmc_tpu.models import tables as T
    from particlesmc_tpu.moves import base as MB
    from particlesmc_tpu.moves import checkerboard as CB

    n, chains = args.n, args.chains
    rng = np.random.default_rng(0)
    L = (n / DENSITY) ** (1 / DIM)
    per = int(np.ceil(n ** (1 / DIM)))
    a = L / per
    grid = np.stack(
        np.meshgrid(*[np.arange(per) * a + a / 2] * DIM, indexing="ij"), -1
    ).reshape(-1, DIM)[:n]
    pos = np.asarray(grid + rng.uniform(-0.05 * a, 0.05 * a, (n, DIM)), np.float32)
    species = (rng.random(n) < 0.2).astype(np.int32) + 1
    table = T.KobAndersen(jnp.float32)
    st = make_system(pos, species, DENSITY, 1.0, dtype=jnp.float32)
    spec = CB.make_cb_spec(np.asarray(st.box), table.max_cutoff, n, cap=args.cap)
    pool = (MB.displacement(0.1),)
    params = MB.init_pool_params(pool, jnp.float32)
    hs = CB.build_hyper_sweep_fn(
        spec, table, n, inner=args.inner, sweeps=args.rebin, pool=pool
    )
    step = jax.jit(jax.vmap(lambda m: hs(m, params), in_axes=(0,)))

    # temperature ladder on the chains axis
    ladder = jnp.linspace(1.0, 2.0, chains, dtype=jnp.float32)

    @jax.jit
    def init_all(st):
        keys = jax.random.split(jax.random.PRNGKey(0), chains)
        batch = jax.tree.map(lambda x: jnp.broadcast_to(x, (chains,) + x.shape), st)
        batch = batch.replace(temperature=ladder)
        return jax.vmap(lambda s, k: CB.init_cb_state(s, spec, k, 1))(batch, keys)

    state0 = init_all(st)
    # warm both compiles + equilibrate a little
    state0 = step(state0)
    state0, _, _ = replica_exchange(state0, jax.random.PRNGKey(1), 0)
    state0, _, _ = replica_exchange(state0, jax.random.PRNGKey(1), 1)
    for _ in range(8):
        state0 = step(state0)
    jax.block_until_ready(state0.system.position)

    for cad in [int(c) for c in args.cadences.split(",")]:
        stt = state0
        key = jax.random.PRNGKey(7)
        att0 = float(np.sum(np.asarray(stt.attempted, np.int64)))
        rex_att = rex_acc = 0
        parity = 0
        t0 = time.perf_counter()
        for i in range(args.calls):
            stt = step(stt)
            if cad and (i + 1) % cad == 0:
                key, sub = jax.random.split(key)
                stt, at, ac = replica_exchange(stt, sub, parity)
                parity ^= 1
                # host pull per event — exactly what the engine does
                rex_att += int(np.asarray(at).sum())
                rex_acc += int(np.asarray(ac).sum())
        jax.block_until_ready(stt.system.position)
        el = time.perf_counter() - t0
        att = float(np.sum(np.asarray(stt.attempted, np.int64))) - att0
        print(json.dumps({
            "swap_every_calls": cad,
            "rebin": args.rebin,
            "sweeps_per_s": round(att / n / el, 1),
            "rex_events": (args.calls // cad) if cad else 0,
            "rex_rate": round(rex_acc / rex_att, 4) if rex_att else None,
        }), flush=True)


if __name__ == "__main__":
    main()
