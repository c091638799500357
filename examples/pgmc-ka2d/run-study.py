"""PGMC flagship study: EnergyBias-guided swaps on 2D JBB at N >= 1290.

Scales the reference's pgmc_ka2d scenario (test/pgmc_ka2d.jl: 43 particles,
M=10 chains, Displacement/SimpleGaussian + two DiscreteSwap/EnergyBias moves
with VPG + BLANPG optimisers) to the reference's production system size
(N = 1290, the CLI test system test/config_0.xyz) — and runs it on the
PARALLEL checkerboard backend, where EnergyBias swaps execute as in-cell
masked-softmax picks (moves/checkerboard.py) and the PGMC estimator learns
theta through the engine's dense-path objective (engine/pgmc.py).

Artifacts (written to --out):
  theta_trajectory.csv   per-update learnable parameters (sigma, theta x4)
  acceptance_gain.json   swap acceptance at theta=0 vs learned theta,
                         measured head-to-head from the same equilibrated
                         state with the ACTUAL kernel
  theta.png              trajectory plot (if matplotlib is available)

Usage (committed artifact: the defaults, ~10 min on CPU, faster on TPU):
    python examples/pgmc-ka2d/run-study.py
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(HERE, "..", ".."))

COMPOSITION = (20, 11, 12)  # NA : NB : NC of the reference scenario
DENSITY = 1.1920748468939728
TEMPERATURE = 0.5


def build_chains(n, m, seed, dtype):
    import jax
    import jax.numpy as jnp

    from particlesmc_tpu.core.energy import initialize_energy
    from particlesmc_tpu.core.state import make_system
    from particlesmc_tpu.io.loader import Chains
    from particlesmc_tpu.models import tables as T

    d = 2
    rng = np.random.default_rng(seed)
    L = (n / DENSITY) ** (1 / d)
    per = int(np.ceil(n ** (1 / d)))
    a = L / per
    grid = np.stack(
        np.meshgrid(*[np.arange(per) * a + a / 2] * d, indexing="ij"), -1
    ).reshape(-1, d)[:n]
    tot = sum(COMPOSITION)
    na, nb = round(n * COMPOSITION[0] / tot), round(n * COMPOSITION[1] / tot)
    base_sp = np.concatenate(
        [np.full(na, 1), np.full(nb, 2), np.full(n - na - nb, 3)]
    )
    table = T.JBB(dtype)
    states = []
    for _ in range(m):
        pos = grid + rng.uniform(-0.05 * a, 0.05 * a, (n, d))
        sp = base_sp.copy()
        rng.shuffle(sp)
        st = make_system(pos, sp, DENSITY, TEMPERATURE, dtype=dtype)
        states.append(initialize_energy(st, table, check=True))
    import jax

    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *states)
    return Chains(states=stacked, table=table, list_type="cell", n_chains=m)


def measure_swap_acceptance(sim, pool_params, sweeps=100):
    """Windowed swap acceptance of the ACTUAL kernel at given parameters."""
    mc = sim.mc
    att0 = np.asarray(mc.attempted, np.int64).sum(0)
    acc0 = np.asarray(mc.accepted, np.int64).sum(0)
    mc = sim._run_chunk(mc, pool_params, sweeps)
    att = np.asarray(mc.attempted, np.int64).sum(0) - att0
    acc = np.asarray(mc.accepted, np.int64).sum(0) - acc0
    with np.errstate(invalid="ignore"):
        return (acc / np.maximum(att, 1)).tolist()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1290)
    ap.add_argument("--chains", type=int, default=10)
    ap.add_argument("--equil", type=int, default=300)
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--q-every", type=int, default=10)
    ap.add_argument("--q-batch", type=int, default=10)
    ap.add_argument("--update-every", type=int, default=10)
    ap.add_argument("--lr-sigma", type=float, default=1e-3)
    ap.add_argument("--lr-theta", type=float, default=3e-2,
                    help="VPG rate for theta (the reference's BLANPG(1e-6) "
                    "pace needs its 20k updates; this demo makes the same "
                    "ascent visible in ~200)")
    ap.add_argument("--blanpg", action="store_true",
                    help="use BLANPG(lr, 1e-6) for theta instead of VPG")
    ap.add_argument("--measure-sweeps", type=int, default=150)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--out", default=HERE)
    ap.add_argument("--workdir", default=os.path.join(HERE, "tmp"))
    args = ap.parse_args()

    import jax

    # honour JAX_PLATFORMS even where sitecustomize registers a PJRT plugin
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
    import jax.numpy as jnp

    from particlesmc_tpu.engine import Simulation, build_schedule
    from particlesmc_tpu.engine.pgmc import BLANPG, VPG
    from particlesmc_tpu.moves import base as MB

    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    chains = build_chains(args.n, args.chains, args.seed, dtype)

    # reference pool: disp 0.8, EB swaps (1,3) and (2,3) at 0.1 each
    pool = (
        MB.displacement(0.05, probability=0.8),
        MB.discrete_swap(0, 2, probability=0.1, policy="energy_bias"),
        MB.discrete_swap(1, 2, probability=0.1, policy="energy_bias"),
    )
    opt_th = (
        BLANPG(args.lr_theta, 1e-6) if args.blanpg else VPG(args.lr_theta)
    )
    optimisers = (VPG(args.lr_sigma), opt_th, opt_th)

    steps = args.steps
    algorithms = [
        dict(algorithm="Metropolis", pool=pool, seed=args.seed,
             sweepstep=args.n, parallel_moves=True),
        dict(algorithm="PolicyGradientEstimator", dependencies=("Metropolis",),
             optimisers=optimisers, q_batch_size=args.q_batch,
             q_every=args.q_every),
        dict(algorithm="PolicyGradientUpdate",
             dependencies=("PolicyGradientEstimator",),
             scheduler=build_schedule(steps, 0, args.update_every)),
        dict(algorithm="StoreParameters", dependencies=("Metropolis",),
             scheduler=build_schedule(steps, 0, args.update_every)),
        dict(algorithm="StoreAcceptance", dependencies=("Metropolis",),
             scheduler=build_schedule(steps, 0, max(1, steps // 20))),
    ]
    sim = Simulation(chains, algorithms, steps, path=args.workdir, verbose=True)
    assert sim.parallel_moves, "checkerboard backend required for this study"

    # equilibrate at theta = 0 BEFORE learning, then snapshot the state for
    # the head-to-head acceptance measurement
    print(f"equilibrating {args.equil} sweeps ...", flush=True)
    sim.mc = sim._run_chunk(sim.mc, sim.pool_params, args.equil)
    eq_mc = sim.mc
    params0 = sim.pool_params

    print(f"learning: {steps} sweeps, update every {args.update_every} ...",
          flush=True)
    sim.run()
    params_star = sim.pool_params
    th = [
        (float(np.asarray(p.get("theta1", 0.0))),
         float(np.asarray(p.get("theta2", 0.0))))
        for p in params_star
    ]
    print("learned:", th, flush=True)

    # head-to-head: same equilibrated start, actual kernel, theta=0 vs theta*
    sim.mc = eq_mc
    acc0 = measure_swap_acceptance(sim, params0, args.measure_sweeps)
    sim.mc = eq_mc
    accs = measure_swap_acceptance(sim, params_star, args.measure_sweeps)
    gain = {
        "n": args.n, "chains": args.chains, "steps": steps,
        "theta_learned": {
            "swap_1_3": th[1], "swap_2_3": th[2],
            "sigma": float(np.asarray(params_star[0]["sigma"])),
        },
        "acceptance_theta0": {"disp": acc0[0], "swap_1_3": acc0[1],
                              "swap_2_3": acc0[2]},
        "acceptance_learned": {"disp": accs[0], "swap_1_3": accs[1],
                               "swap_2_3": accs[2]},
        "swap_acceptance_gain": {
            "swap_1_3": round(accs[1] / max(acc0[1], 1e-12), 3),
            "swap_2_3": round(accs[2] / max(acc0[2], 1e-12), 3),
        },
    }
    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "acceptance_gain.json"), "w") as f:
        json.dump(gain, f, indent=1)
    print(json.dumps(gain, indent=1))

    # theta trajectory: collate the engine's parameters.dat files
    rows = []
    for m in (2, 3):
        p = np.loadtxt(os.path.join(args.workdir, "moves", str(m), "parameters.dat"))
        rows.append(p)
    sg = np.loadtxt(os.path.join(args.workdir, "moves", "1", "parameters.dat"))
    with open(os.path.join(args.out, "theta_trajectory.csv"), "w") as f:
        f.write("step,sigma,theta1_13,theta2_13,theta1_23,theta2_23\n")
        for k in range(rows[0].shape[0]):
            f.write(
                f"{int(rows[0][k,0])},{sg[k,1]:.6g},"
                f"{rows[0][k,1]:.6g},{rows[0][k,2]:.6g},"
                f"{rows[1][k,1]:.6g},{rows[1][k,2]:.6g}\n"
            )
    print(f"wrote {args.out}/theta_trajectory.csv")

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(1, 2, figsize=(9, 3.5))
        t = rows[0][:, 0]
        axes[0].plot(t, rows[0][:, 1], label=r"$\theta_1$ (A-C)")
        axes[0].plot(t, rows[0][:, 2], label=r"$\theta_2$ (A-C)")
        axes[0].plot(t, rows[1][:, 1], "--", label=r"$\theta_1$ (B-C)")
        axes[0].plot(t, rows[1][:, 2], "--", label=r"$\theta_2$ (B-C)")
        axes[0].set_xlabel("sweep")
        axes[0].set_ylabel(r"$\theta$")
        axes[0].legend(fontsize=7)
        labels = ["A-C", "B-C"]
        x = np.arange(2)
        axes[1].bar(x - 0.17, [acc0[1], acc0[2]], 0.34, label=r"$\theta = 0$")
        axes[1].bar(x + 0.17, [accs[1], accs[2]], 0.34, label=r"learned $\theta$")
        axes[1].set_xticks(x, labels)
        axes[1].set_ylabel("swap acceptance")
        axes[1].legend(fontsize=8)
        fig.tight_layout()
        out_png = os.path.join(args.out, "theta.png")
        fig.savefig(out_png, dpi=150)
        print(f"wrote {out_png}")
    except Exception as exc:
        print(f"(no plot: {exc})")


if __name__ == "__main__":
    main()
