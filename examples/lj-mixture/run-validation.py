"""Binary LJ mixture validation against published Monte Carlo energies.

Physics validation gate (mirrors the reference workflow,
examples/lj-mixture/run-validation.py there): run the full CLI stack over the
published state points of Rowley & co. (doi:10.1023/A:1022614200488 — binary
Lennard-Jones mixtures), with displacement + swap moves, add the standard
long-range cutoff correction, and compare mean energies per particle.

Usage:
    python examples/lj-mixture/run-validation.py [--points 5] [--steps 1000]
        [--n 4096] [--workdir ./tmp-ljmix]

Runs on the checkerboard (parallel_moves) backend with a vmapped chain batch
per state point; N defaults to 4096 because the published rcut = 4 sigma
needs a >= 16 sigma box before a 4-cell checkerboard grid exists. State runs in
f32 (full TPU speed) with the incremental energy booked in an f64 ledger
(precision = "mixed"): an f32 accumulator at |E| ~ 3e4 rounds each booked
delta at ~2e-3 and random-walks the long-run mean.

Writes calculated-energies.csv next to this script and prints a summary
table. A correlation plot is saved when matplotlib is importable.
"""

from __future__ import annotations

import argparse
import csv
import math
import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(HERE, "..", ".."))

# Lorentz-Berthelot-fitted pair parameters from the publication
EPS = {(1, 1): 1.0, (1, 2): 1.1523, (2, 2): 1.3702}
SIG = {(1, 1): 1.0, (1, 2): 1.0339, (2, 2): 1.0640}


def write_config(n1: int, n2: int, L: float, path: str, rng) -> None:
    """Cubic-lattice EXYZ start, species shuffled over sites."""
    n = n1 + n2
    per = round(n ** (1 / 3))
    if per**3 != n:
        raise SystemExit(f"N={n} must be a cube")
    a = L / per
    species = np.array([1] * n1 + [2] * n2)
    rng.shuffle(species)
    with open(path, "w") as f:
        f.write(f"{n}\n")
        f.write(
            f'Lattice="{L:.6f} 0.0 0.0 0.0 {L:.6f} 0.0 0.0 0.0 {L:.6f}" '
            "Properties=species:I:1:pos:R:3\n"
        )
        k = 0
        for i in range(per):
            for j in range(per):
                for l in range(per):
                    x = (i + 0.5) * a
                    y = (j + 0.5) * a
                    z = (l + 0.5) * a
                    f.write(f"{species[k]} {x:.8f} {y:.8f} {z:.8f}\n")
                    k += 1


def sigma_for(rho: float) -> float:
    """Per-state-point displacement width targeting ~0.4-0.6 acceptance.

    The round-1 validation used sigma=0.05 everywhere: fine at rho >= 0.6
    (acceptance 0.52-0.64, matching the reference baseline) but hopeless at
    low density, where acceptance hit 0.95 and the walk needed ~1000+ sweeps
    to cross one interparticle spacing — exactly the under-converged points.
    Scale sigma with the interparticle spacing below rho = 0.6."""
    table = [(0.6, 0.05), (0.5, 0.12), (0.4, 0.20), (0.3, 0.30), (0.2, 0.42)]
    for lo, s in table:
        if rho >= lo:
            return s
    return 0.60


def steps_for(rho: float, steps: int) -> int:
    """Dilute points get 2x sweeps: with sigma scaled to the interparticle
    spacing (sigma_for) they mix fast, but the lattice start is farther from
    the dilute fluid's typical set."""
    return steps * 2 if rho < 0.5 else steps


def cap_for(rho: float, rcut: float, n: int) -> int:
    """Checkerboard bucket capacity from the TRUE cell geometry: the grid
    rounds the cell count down to an even number, so cells can be much
    bigger than rcut (at N=4096, rho=0.4 the side is 5.4 vs rcut 4 — mean
    occupancy 64, not rho*rcut^3=26). An LJ gas near T_c also clusters
    hard, so dilute points get ~8x the mean occupancy, dense ones 3x."""
    L = (n / rho) ** (1 / 3)
    nc = int(L / rcut)
    nc -= nc % 2
    side = L / max(nc, 2)
    occ = rho * side**3
    factor = 8.0 if rho < 0.35 else 3.0
    return max(16, int(math.ceil(occ * factor)))


def write_params(workdir: str, cfg: str, T: float, rho: float, rcut: float,
                 steps: int, sigma: float, nsim: int, n: int) -> str:
    blocks = []
    for (s1, s2), eps in EPS.items():
        blocks.append(
            f"""[model."{s1}-{s2}"]
name = "LennardJones"
epsilon = {eps}
sigma = {SIG[(s1, s2)]}
rcut = {rcut}
shift_potential = false
"""
        )
    toml = f"""
[system]
config = "{cfg}"
temperature = {T}
density = {rho}
list_type = "LinkedList"
list_parameters = {{cap = {cap_for(rho, rcut, n)}}}

[model]
{os.linesep.join(blocks)}

[simulation]
type = "Metropolis"
nsim = {nsim}
steps = {steps}
seed = 42
precision = "mixed"
parallel_moves = true
output_path = "{workdir}"

[[simulation.move]]
action = "Displacement"
probability = 0.9
policy = "SimpleGaussian"
parameters = {{sigma = {sigma}}}

[[simulation.move]]
action = "DiscreteSwap"
probability = 0.1
policy = "DoubleUniform"
parameters = {{species = [1, 2]}}

[[simulation.output]]
algorithm = "StoreCallbacks"
callbacks = ["energy"]
scheduler_params = {{linear_interval = 10}}

[[simulation.output]]
algorithm = "StoreAcceptance"
dependencies = ["Metropolis"]
scheduler_params = {{linear_interval = {steps}}}
"""
    path = os.path.join(workdir, "params.toml")
    with open(path, "w") as f:
        f.write(toml)
    return path


def lr_correction(n1: int, n2: int, L: float, rc: float) -> float:
    """Standard homogeneous-fluid LJ tail correction (Gromacs convention)."""
    V = L**3
    out = 0.0
    for (na, nb), key in (((n1, n1), (1, 1)), ((n2, n2), (2, 2))):
        c6 = 4 * EPS[key] * SIG[key] ** 6
        out += -2 / 3 * math.pi * na * (nb / V) * c6 / rc**3
    c6 = 4 * EPS[(1, 2)] * SIG[(1, 2)] ** 6
    out += -2 / 3 * math.pi * 2 * n1 * (n2 / V) * c6 / rc**3
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=None, help="limit state points")
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--nsim", type=int, default=8, help="chains per state point")
    ap.add_argument("--workdir", default=os.path.join(HERE, "tmp"))
    ap.add_argument(
        "--rcut",
        type=float,
        default=4.0,
        help="pair cutoff in sigma_1 (the reference's script uses 4.0). "
        "Non-default values are a PROTOCOL PROBE — the homogeneous tail "
        "correction assumes g(r)=1 beyond rcut, which fails near the "
        "critical point (T=1.51, rho~0.3), so u depends on rcut there even "
        "after correction; results then go to the workdir, never the "
        "committed CSV",
    )
    ap.add_argument(
        "--only",
        action="append",
        default=None,
        metavar="T,X,RHO",
        help="re-run only these state points (repeatable), ignoring the "
        "cache for them — used to re-run near-critical gas points at a "
        "system size matched to the reference's N=1000 (finite-size "
        "effects at rho <= 0.3 are resolvable at our error bars)",
    )
    args = ap.parse_args()
    only = None
    if args.only:
        only = {tuple(float(v) for v in s.split(",")) for s in args.only}

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

    from particlesmc_tpu.cli import main as cli_main

    with open(os.path.join(HERE, "reference-data.csv")) as f:
        rows = list(csv.DictReader(f))
    if args.points:
        rows = rows[: args.points]

    rng = np.random.default_rng(7)
    cache_path = os.path.join(args.workdir, "results.jsonl")
    cache = {}
    if os.path.exists(cache_path):
        import json as _json

        with open(cache_path) as f:
            for line in f:
                r = _json.loads(line)
                cache[(r["t"], r["x"], r["density"])] = r
    results = []
    for i, row in enumerate(rows):
        T, x, rho, u_ref = (float(row[k]) for k in ("t", "x", "density", "u"))
        selected = only is None or (T, x, rho) in only
        if (T, x, rho) in cache and not (selected and only is not None):
            results.append(cache[(T, x, rho)])
            print(f"T={T} x={x} rho={rho}: cached", flush=True)
            continue
        if not selected:
            print(f"T={T} x={x} rho={rho}: skipped (--only)", flush=True)
            continue
        wd = os.path.join(args.workdir, str(i))
        os.makedirs(wd, exist_ok=True)
        L = (args.n / rho) ** (1 / 3)
        n2 = round(args.n * x)
        n1 = args.n - n2
        cfg = os.path.join(wd, "config.exyz")
        write_config(n1, n2, L, cfg, rng)
        rc = args.rcut
        sigma = sigma_for(rho)
        steps = steps_for(rho, args.steps)
        params = write_params(wd, cfg, T, rho, rc, steps, sigma, args.nsim, args.n)
        assert cli_main([params]) == 0

        # average the equilibrated tail over the whole vmapped chain batch;
        # error bar from the per-chain means (independent chains)
        chain_means = []
        tails = []
        for k in range(1, args.nsim + 1):
            e = np.loadtxt(os.path.join(wd, "chains", str(k), "energy.dat"))
            tail = e[len(e) // 2 :, 1]
            tails.append(tail)
            chain_means.append(float(np.mean(tail)))
        corr = lr_correction(n1, n2, L, rc) / args.n
        u = float(np.mean(chain_means)) + corr
        if args.nsim > 1:
            err = float(
                np.std(chain_means, ddof=1) / math.sqrt(len(chain_means))
            )
        else:
            err = float(np.std(tails[0]) / max(1, math.sqrt(len(tails[0]))))
        acc = np.loadtxt(os.path.join(wd, "moves", "1", "acceptance.dat"), ndmin=2)
        acc_sw = np.loadtxt(os.path.join(wd, "moves", "2", "acceptance.dat"), ndmin=2)
        results.append(
            dict(t=T, x=x, density=rho, u_ref=u_ref, u=u, u_err=err,
                 sigma=sigma, steps=steps, n=args.n, nsim=args.nsim,
                 acc_disp=float(acc[-1, 1]), acc_swap=float(acc_sw[-1, 1]))
        )
        import json as _json

        with open(cache_path, "a") as f:
            f.write(_json.dumps(results[-1]) + "\n")
        print(
            f"T={T:<7} x={x:<5} rho={rho:<5} u_ref={u_ref:9.4f} "
            f"u={u:9.4f} ± {err:.4f}  sigma={sigma:.2f} "
            f"acc(disp)={results[-1]['acc_disp']:.2f} "
            f"acc(swap)={results[-1]['acc_swap']:.2f} "
            f"dev={abs(u - u_ref) / max(err, 1e-9):.1f}σ",
            flush=True,
        )

    out = (
        os.path.join(HERE, "calculated-energies.csv")
        if args.rcut == 4.0
        else os.path.join(args.workdir, "calculated-energies.csv")
    )
    if only is not None and os.path.exists(out):
        # --only re-runs MERGE into the committed artifact: keep every other
        # state point's row, replace just the re-run ones (round 2 lost the
        # full 23-point CSV to an overwrite from a smoke run — never again)
        with open(out) as f:
            existing = {
                (r["t"], r["x"], r["density"]): r for r in csv.DictReader(f)
            }
        for r in results:
            existing[(str(r["t"]), str(r["x"]), str(r["density"]))] = {
                k: str(v) for k, v in r.items()
            }
        results = [
            existing[(row["t"], row["x"], row["density"])]
            for row in rows
            if (row["t"], row["x"], row["density"]) in existing
        ]
        for r in results:  # numeric fields back for the summary/plot below
            for k in ("t", "x", "density", "u", "u_ref", "u_err"):
                r[k] = float(r[k])
    fields = list(dict.fromkeys(k for r in results for k in r))
    with open(out, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=fields, restval="")
        w.writeheader()
        w.writerows(results)
    print(f"wrote {out}")

    du = np.array([r["u"] - r["u_ref"] for r in results])
    ndev = np.array(
        [abs(r["u"] - r["u_ref"]) / max(r["u_err"], 1e-9) for r in results]
    )
    n_pass = int(np.sum(ndev < 3))
    print(f"mean |u - u_ref| = {np.mean(np.abs(du)):.4f} over {len(results)} points")
    print(f"{n_pass}/{len(results)} state points within 3 sigma")

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        ur = [r["u_ref"] for r in results]
        uc = [r["u"] for r in results]
        lim = [min(ur + uc) - 0.3, max(ur + uc) + 0.3]
        plt.figure(figsize=(5, 5))
        plt.plot(lim, lim, "k--", lw=1)
        plt.scatter(ur, uc, c=[r["t"] for r in results], cmap="viridis")
        plt.colorbar(label="T")
        plt.xlabel("published u/N")
        plt.ylabel("particlesmc-tpu u/N")
        plt.tight_layout()
        plt.savefig(os.path.join(os.path.dirname(out), "correlation-plot.png"), dpi=150)
        print("wrote correlation-plot.png")
    except Exception as exc:  # matplotlib genuinely optional
        print(f"(no plot: {exc})")


if __name__ == "__main__":
    main()
