"""Measure the PGMC overhead envelope on the checkerboard backend.

Times the same KA-LJ study (N configurable, vmapped chain batch, learnable
displacement sigma) with and without the PolicyGradientEstimator +
PolicyGradientUpdate pair, at a given estimation cadence, and prints one
JSON line with both rates. This quantifies what "PGMC is usable at scale"
costs (reference flagship scenario test/pgmc_ka2d.jl runs EnergyBias at toy
N on the sequential path there; here sigma-learning rides the parallel
kernel — engine/simulation.py wires the estimator to the dense ΔE path on
mc.system, engine/pgmc.py).

Usage: python tools/pgmc_envelope.py [--n 4096] [--chains 64] [--steps 200]
       [--q-every 10] [--q-batch 10]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def build_chains(n: int, m: int):
    import jax
    import jax.numpy as jnp

    from particlesmc_tpu.core.energy import initialize_energy
    from particlesmc_tpu.core.state import make_system
    from particlesmc_tpu.io.loader import Chains
    from particlesmc_tpu.models import tables as T

    d, density, temperature = 3, 1.2, 1.0
    rng = np.random.default_rng(0)
    L = (n / density) ** (1 / d)
    per = int(np.ceil(n ** (1 / d)))
    a = L / per
    grid = np.stack(
        np.meshgrid(*[np.arange(per) * a + a / 2] * d, indexing="ij"), -1
    ).reshape(-1, d)[:n]
    table = T.KobAndersen(jnp.float32)
    states = []
    for _ in range(m):
        pos = grid + rng.uniform(-0.05 * a, 0.05 * a, (n, d))
        sp = (rng.random(n) < 0.2).astype(np.int32) + 1
        st = make_system(pos, sp, density, temperature, dtype=jnp.float32)
        states.append(initialize_energy(st, table, check=True))
    import jax

    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *states)
    return Chains(states=stacked, table=table, list_type="cell", n_chains=m)


def run_once(n, m, steps, pgmc, q_every, q_batch, workdir):
    from particlesmc_tpu.engine import Simulation, build_schedule
    from particlesmc_tpu.engine.pgmc import VPG
    from particlesmc_tpu.moves import base as MB

    chains = build_chains(n, m)
    pool = (MB.displacement(0.06),)
    algorithms = [
        dict(algorithm="Metropolis", pool=pool, seed=7, sweepstep=n,
             parallel_moves=True),
    ]
    if pgmc:
        algorithms += [
            dict(
                algorithm="PolicyGradientEstimator",
                dependencies=("Metropolis",),
                optimisers=(VPG(1e-4),),
                q_batch_size=q_batch,
                q_every=q_every,
            ),
            dict(
                algorithm="PolicyGradientUpdate",
                dependencies=("PolicyGradientEstimator",),
                scheduler=build_schedule(steps, 0, q_every),
            ),
        ]
    # first instance warms the persistent compile cache; a fresh instance
    # with identical shapes then times the steady-state rate (its compiles
    # are cache hits, so the wall clock is dominated by device work)
    Simulation(chains, algorithms, steps, path=workdir + "-warm").run()
    sim = Simulation(chains, algorithms, steps, path=workdir)
    t0 = time.perf_counter()
    sim.run()
    warm = time.perf_counter() - t0
    att = int(np.sum(np.asarray(sim.mc.attempted, np.int64)))
    return warm, att / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--chains", type=int, default=64)
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--q-every", type=int, default=10)
    ap.add_argument("--q-batch", type=int, default=10)
    ap.add_argument("--workdir", default="/tmp/pgmc-envelope")
    args = ap.parse_args()

    import jax

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

    t_plain, sweeps = run_once(
        args.n, args.chains, args.steps, False, 0, 0,
        os.path.join(args.workdir, "plain"),
    )
    t_pgmc, sweeps_p = run_once(
        args.n, args.chains, args.steps, True, args.q_every, args.q_batch,
        os.path.join(args.workdir, "pgmc"),
    )
    print(json.dumps({
        "n": args.n, "chains": args.chains, "steps": args.steps,
        "q_every": args.q_every, "q_batch": args.q_batch,
        "plain_s": round(t_plain, 2),
        "pgmc_s": round(t_pgmc, 2),
        "overhead_x": round(t_pgmc / t_plain, 3),
        # `sweeps` is already the CHAIN-AGGREGATE sweep count (sim.mc.attempted
        # has a leading [chains] axis and run_once sums it) — no x chains here
        "plain_sweeps_per_s": round(sweeps / t_plain, 1),
        "pgmc_sweeps_per_s": round(sweeps_p / t_pgmc, 1),
    }))


if __name__ == "__main__":
    main()
