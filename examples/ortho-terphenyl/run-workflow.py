"""Ortho-terphenyl (3-site Kremer-Grest trimer) molecular workflow.

Mirrors the reference's 4-stage study (examples/ortho-terphenyl there;
publication doi:10.1103/4twk-33j7 — molecular motion at the experimental
glass transition): lattice build → staged densification (0.2 → 1.2 by
lastframe-restart runs) → per-temperature equilibration → production with
MoleculeFlip swaps → self-intermediate scattering function F_s(k, t).

All stages drive the real CLI; F_s(k,t) is computed in-repo (numpy) from the
EXYZ trajectory, so there is no external analysis dependency.

Usage (full study is long; the defaults are a scaled-down smoke version):
    python examples/ortho-terphenyl/run-workflow.py \
        --molecules 64 --dens-steps 40 --equil-steps 200 --prod-steps 400 \
        --temperatures 2.0 1.4
"""

from __future__ import annotations

import argparse
import math
import os
import shutil
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(HERE, "..", ".."))

SIGMAS = [0.9, 1.0, 1.1]
DENSITIES = [0.2, 0.24, 0.30, 0.36, 0.44, 0.53, 0.64, 0.77, 0.93, 1.12, 1.2]

MODEL_BLOCKS = """
[model."1-1"]
name = "GeneralKG"
epsilon = 1.0
sigma = 0.9
k = 37.03703703703703
r0 = 1.35

[model."1-2"]
name = "GeneralKG"
epsilon = 1.0
sigma = 0.95
k = 33.24099722991689
r0 = 1.425

[model."1-3"]
name = "GeneralKG"
epsilon = 1.0
sigma = 1.0
k = 30.0
r0 = 1.5

[model."2-2"]
name = "GeneralKG"
epsilon = 1.0
sigma = 1.0
k = 30.0
r0 = 1.5

[model."2-3"]
name = "GeneralKG"
epsilon = 1.0
sigma = 1.05
k = 27.2108843537415
r0 = 1.575

[model."3-3"]
name = "GeneralKG"
epsilon = 1.0
sigma = 1.1
k = 24.79338842975207
r0 = 1.65
"""


def stage1_lattice(m: int, density: float, path: str) -> None:
    """Planar trimers on a cubic molecular lattice, with the bond table."""
    n = 3 * m
    per = round(m ** (1 / 3))
    if per**3 != m:
        raise SystemExit(f"molecules={m} must be a cube")
    L = (n / density) ** (1 / 3)
    a = L / per
    r_ab = (SIGMAS[0] + SIGMAS[1]) / 2
    r_ac = (SIGMAS[0] + SIGMAS[2]) / 2
    ca, sa = math.cos(60 / 180), math.sin(60 / 180)
    with open(path, "w") as f:
        f.write(f"{n}\n")
        f.write(f"columns:molecule,species,position cell:{L},{L},{L}\n")
        mol = 1
        for i in range(per):
            for j in range(per):
                for k in range(per):
                    x, y, z = i * a, j * a, k * a
                    f.write(f"{mol} 1 {x} {y} {z}\n")
                    f.write(f"{mol} 2 {x} {y + r_ab} {z}\n")
                    f.write(f"{mol} 3 {x + r_ac * ca} {y + r_ac * sa} {z}\n")
                    mol += 1
        f.write(f"{3 * m}\n")
        f.write("columns:bond\n")
        for i in range(m):
            A = 1 + 3 * i
            f.write(f"{A} {A + 1}\n{A + 1} {A + 2}\n{A} {A + 2}\n")


def rex_ladder(temperatures, rungs=32):
    """Temperature ladder for replica-exchange equilibration: geometric in
    beta between the warmest and coldest requested T (uniform swap
    acceptance when the energy fluctuation scale ~ T), with every requested
    temperature snapped onto its nearest rung so production can restart
    from an exact-T slot. Returns the DESCENDING-T ladder."""
    t_hi, t_lo = max(temperatures), min(temperatures)
    if t_hi == t_lo:
        return [float(t_hi)]
    b = np.geomspace(1.0 / t_hi, 1.0 / t_lo, rungs)
    ladder = 1.0 / b  # descending T
    for T in temperatures:
        ladder[int(np.argmin(np.abs(ladder - T)))] = T
    return [float(t) for t in ladder]


def params_toml(cfg, T, density, steps, out, traj_interval=None, flip=True,
                nsim=1, traj_log=False, sigma=0.06, parallel=True,
                rex_interval=None):
    moves = """
[[simulation.move]]
action = "Displacement"
probability = 0.9
policy = "SimpleGaussian"
parameters = {sigma = %SIGMA%}

[[simulation.move]]
action = "MoleculeFlip"
probability = 0.1
policy = "DoubleUniform"
parameters = {}
""" if flip else """
[[simulation.move]]
action = "Displacement"
probability = 1.0
policy = "SimpleGaussian"
parameters = {sigma = %SIGMA%}
"""
    moves = moves.replace("%SIGMA%", str(sigma))
    if traj_interval and traj_log:
        # one log-base-2 block spanning the whole run: frames at
        # 0, 1, 2, 4, ... — the reference production template
        # (3-run-production/params-template.toml scheduler_params)
        traj_sched = (
            f"scheduler_params = {{linear_interval = {steps}, log_base = 2.0}}"
        )
    else:
        traj_sched = f"scheduler_params = {{linear_interval = {traj_interval}}}"
    traj = (
        f"""
[[simulation.output]]
algorithm = "StoreTrajectories"
{traj_sched}
fmt = "EXYZ"
"""
        if traj_interval
        else ""
    )
    if isinstance(T, (list, tuple)):
        # one chain slot per entry (a REX ladder, or one frame per T in the
        # pooled production — io/loader.py temperature-vector semantics)
        t_str = "[" + ", ".join(str(float(t)) for t in T) + "]"
    else:
        t_str = str(T)
    rex = (
        f"""
[[simulation.output]]
algorithm = "ReplicaExchange"
scheduler_params = {{linear_interval = {rex_interval}}}
"""
        if rex_interval
        else ""
    )
    return f"""
[system]
config = "{cfg}"
temperature = {t_str}
density = {density}
list_type = "LinkedList"
# 32-aligned bucket cap: the auto molecular cap (occ_factor 4 -> 24 at the
# production 8^3 grid) breaks XLA's 128-lane tiling; x32 caps only add
# masked lanes (see docs/man/performance.md, cap=28 measurement).
# inner=16 / rebin_every=16: the measured msd_per_s optimum of the round-4
# mixing matrix (per-sweep mixing is rebin-insensitive; inner 16-48 are
# msd-equivalent with 16 mixing hardest per sweep).
list_parameters = {{cap = 32, inner = 16, rebin_every = 16}}

[model]
{MODEL_BLOCKS}

[simulation]
type = "Metropolis"
nsim = {nsim}
steps = {steps}
seed = 11
precision = "mixed"
parallel_moves = {str(bool(parallel)).lower()}
output_path = "{out}"
{moves}
[[simulation.output]]
algorithm = "StoreCallbacks"
callbacks = ["energy"]
scheduler_params = {{linear_interval = {max(1, steps // 20) // 16 * 16 or max(1, steps // 20)}}}
{rex}{traj}
[[simulation.output]]
algorithm = "StoreLastFrames"
scheduler_params = {{linear_interval = {steps}}}
fmt = "XYZ"
"""


def run_cli(params_text: str, workdir: str) -> None:
    from particlesmc_tpu.cli import main as cli_main

    os.makedirs(workdir, exist_ok=True)
    p = os.path.join(workdir, "params.toml")
    with open(p, "w") as f:
        f.write(params_text)
    assert cli_main([p]) == 0


def fskt(traj_path: str, k_mod: float, box: np.ndarray):
    """F_s(k, t) from an EXYZ trajectory via the library analysis module."""
    from particlesmc_tpu.analysis import self_intermediate_scattering
    from particlesmc_tpu.io.formats import read_trajectory

    frames = read_trajectory(traj_path)
    pos = np.stack([fr["position"] for fr in frames])  # [T, N, 3]
    steps = np.array([fr["step"] for fr in frames])
    return steps, self_intermediate_scattering(pos, box, k_mod)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--molecules", type=int, default=64)
    ap.add_argument("--dens-steps", type=int, default=40)
    ap.add_argument("--equil-steps", type=int, default=200)
    ap.add_argument("--prod-steps", type=int, default=400)
    ap.add_argument("--nsim", type=int, default=1,
                    help="chains per stage (F_s averages over them)")
    ap.add_argument("--temperatures", type=float, nargs="+", default=[2.0, 1.4])
    ap.add_argument("--workdir", default=os.path.join(HERE, "tmp"))
    ap.add_argument(
        "--densities",
        default=None,
        help="comma list overriding the stage-1 ladder; with an existing "
        "1-densify/inputframe.xyz this RESUMES the ladder from that frame "
        "(e.g. after moving a partially-densified study between hosts)",
    )
    ap.add_argument(
        "--stages",
        default="1234",
        help="which stages to run (e.g. '1' to densify only, '234' to "
        "resume from an existing stage-1 workdir — lets the cheap "
        "densification run on CPU while the TPU is busy). 'R' runs the "
        "replica-exchange equilibration ladder instead of (or after) the "
        "independent per-T stage 2 — e.g. '1R34'. 'P' replaces the per-T "
        "stage 3 with ONE pooled production run over all temperatures "
        "(full chip utilization) — e.g. '1RP4'.",
    )
    ap.add_argument("--rex-rungs", type=int, default=32,
                    help="ladder size for stage R (rex_ladder)")
    ap.add_argument(
        "--out",
        default=None,
        help="directory for fskt.csv + fskt.png (default: workdir; pass the "
        "example dir itself to refresh the committed artifact)",
    )
    args = ap.parse_args()
    out_dir = args.out or args.workdir
    wd = args.workdir

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        # per-platform cache: CPU AOT entries poison the TPU dir (and are
        # host-machine-feature specific -> SIGILL across hosts)
        "/tmp/jax_cache_cpu"
        if os.environ.get("JAX_PLATFORMS") == "cpu"
        else "/tmp/jax_cache",
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    # checkerboard backend needs >= 4 cells of the bond reach (1.65 here)
    # per dimension at the DENSEST stage; below that the engine would refuse
    # parallel_moves, so small smoke runs fall back to the sequential kernel
    L_dense = (3 * args.molecules / 1.2) ** (1 / 3)
    use_parallel = L_dense / 1.65 >= 4.0
    print(f"backend: {'checkerboard' if use_parallel else 'sequential'} "
          f"(L={L_dense:.2f} at rho=1.2)", flush=True)

    # ---- stage 1: lattice + staged densification --------------------------
    s1 = os.path.join(wd, "1-densify")
    os.makedirs(s1, exist_ok=True)
    cfg = os.path.join(s1, "inputframe.xyz")
    if "1" in args.stages:
        ladder = (
            [float(x) for x in args.densities.split(",")]
            if args.densities else DENSITIES
        )
        if not (args.densities and os.path.exists(cfg)):
            # a fresh lattice starts at the FIRST rung of whichever ladder
            # runs (a custom --densities ladder may start above 0.2)
            stage1_lattice(args.molecules, ladder[0], cfg)
        for rho in ladder:
            out = os.path.join(s1, f"rho-{rho}")
            run_cli(params_toml(cfg, 2.0, rho, args.dens_steps, out, parallel=use_parallel), out)
            shutil.copy(os.path.join(out, "chains", "1", "lastframe.xyz"), cfg)
            print(f"[stage 1] density {rho} done", flush=True)

    # ---- stage 2: equilibrate per temperature -----------------------------
    lastframes = {
        T: os.path.join(wd, "2-equilibrate", str(T), "chains", "1", "lastframe.xyz")
        for T in args.temperatures
    }
    if "2" in args.stages:
        for T in args.temperatures:
            out = os.path.join(wd, "2-equilibrate", str(T))
            run_cli(params_toml(cfg, T, 1.2, args.equil_steps, out, parallel=use_parallel), out)
            print(f"[stage 2] T={T} equilibrated", flush=True)

    # ---- stage R: replica-exchange equilibration across a ladder ----------
    # Alternative to stage 2 for deep supercooling: one run holds a
    # beta-geometric temperature ladder (rex_ladder) with the requested
    # temperatures snapped onto rungs; engine/tempering.py swaps
    # configurations between neighbouring rungs so cold replicas keep
    # escaping via hot ones. Production then restarts from each requested
    # rung's lastframe with PLAIN dynamics (F_s under swap events would mix
    # teleports into the correlation functions).
    rex_out = os.path.join(wd, "2-rex-equilibrate")
    if "R" in args.stages:
        ladder = rex_ladder(args.temperatures, rungs=args.rex_rungs)
        print(f"[stage R] {len(ladder)} rungs: {ladder[0]:.3g} .. "
              f"{ladder[-1]:.3g}", flush=True)
        run_cli(
            params_toml(cfg, ladder, 1.2, args.equil_steps, rex_out,
                        parallel=use_parallel, rex_interval=16),
            rex_out,
        )
        acc_path = os.path.join(rex_out, "tempering_acceptance.dat")
        if os.path.exists(acc_path):
            rows = np.loadtxt(acc_path, ndmin=2)
            print(f"[stage R] ladder swap acceptance (final): "
                  f"{rows[-1, -1]:.3f}", flush=True)
    if "R" in args.stages or (
        os.path.isdir(rex_out) and "2" not in args.stages
    ):
        ladder = rex_ladder(args.temperatures, rungs=args.rex_rungs)
        for T in args.temperatures:
            slot = ladder.index(float(T)) + 1
            lastframes[T] = os.path.join(
                rex_out, "chains", str(slot), "lastframe.xyz"
            )

    # ---- stage P: POOLED production (one run, all temperatures) -----------
    # Per-T production runs of nsim chains leave most of the chip idle; one
    # pooled run holds nsim replicas of EVERY temperature's start frame
    # (directory ingest + temperature vector + nsim cloning, io/loader.py)
    # so the chain batch is 5x larger at identical physics. Chain slots are
    # grouped [T0 x nsim, T1 x nsim, ...] (files sort by index prefix; nsim
    # clones consecutively).
    pooled_run = os.path.join(wd, "3-production-pooled", "run")
    if "P" in args.stages:
        cfgdir = os.path.join(wd, "3-production-pooled", "start-frames")
        os.makedirs(cfgdir, exist_ok=True)
        for i, T in enumerate(args.temperatures):
            shutil.copy(lastframes[T], os.path.join(cfgdir, f"{i:03d}.xyz"))
        run_cli(
            params_toml(
                cfgdir, list(args.temperatures), 1.2, args.prod_steps,
                pooled_run, traj_interval=max(1, args.prod_steps // 50),
                nsim=args.nsim, traj_log=True, parallel=use_parallel,
            ),
            pooled_run,
        )
        print(f"[stage P] pooled production done "
              f"({len(args.temperatures)} x {args.nsim} chains)", flush=True)

    # ---- stage 3: production with log-spaced trajectories -----------------
    if "P" in args.stages or os.path.isdir(pooled_run):
        trajs = {
            T: [
                os.path.join(pooled_run, "chains",
                             str(i * args.nsim + k + 1), "trajectory.exyz")
                for k in range(args.nsim)
            ]
            for i, T in enumerate(args.temperatures)
        }
    else:
        trajs = {
            T: [
                os.path.join(wd, "3-production", str(T), "chains", str(k + 1),
                             "trajectory.exyz")
                for k in range(args.nsim)
            ]
            for T in args.temperatures
        }
    if "3" in args.stages:
        for T in args.temperatures:
            out = os.path.join(wd, "3-production", str(T))
            run_cli(
                params_toml(
                    lastframes[T], T, 1.2, args.prod_steps, out,
                    traj_interval=max(1, args.prod_steps // 50),
                    nsim=args.nsim, traj_log=True, parallel=use_parallel,
                ),
                out,
            )
            print(f"[stage 3] T={T} production done", flush=True)
    if "4" not in args.stages:
        return

    # ---- stage 4: F_s(k, t) at k = 7.4 ------------------------------------
    n = 3 * args.molecules
    L = (n / 1.2) ** (1 / 3)
    box = np.full(3, L)
    import csv

    out_csv = os.path.join(out_dir, "fskt.csv")
    curves = {}
    with open(out_csv, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["T", "step", "fskt"])
        for T, paths in trajs.items():
            Fs = []
            for traj in paths:
                steps, F = fskt(traj, 7.4, box)
                Fs.append(F)
            F = np.mean(Fs, axis=0)  # average over independent chains
            curves[T] = (steps, F)
            for s, v in zip(steps, F):
                w.writerow([T, s, v])
            print(f"[stage 4] T={T}: F_s(k,t) from {F[0]:.3f} to {F[-1]:.3f}", flush=True)
    print(f"wrote {out_csv}")

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        plt.figure(figsize=(6, 4))
        for T in sorted(curves, reverse=True):
            steps, F = curves[T]
            m = steps > 0
            plt.semilogx(steps[m], F[m], "o-", ms=3, label=f"T={T}")
        plt.xlabel("t (MC sweeps)")
        plt.ylabel(r"$F_s(k{=}7.4,\,t)$")
        plt.ylim(-0.05, 1.02)
        plt.legend(fontsize=8)
        plt.tight_layout()
        out_png = os.path.join(out_dir, "fskt.png")
        plt.savefig(out_png, dpi=150)
        print(f"wrote {out_png}")
    except Exception as exc:  # matplotlib genuinely optional
        print(f"(no plot: {exc})")


if __name__ == "__main__":
    main()
