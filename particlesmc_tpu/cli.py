"""TOML-driven command-line front-end.

`particlesmc-tpu params.toml` (or `python -m particlesmc_tpu params.toml`)
mirrors the reference CLI schema exactly (reference src/ParticlesMC.jl:137-299;
docs/src/man/simulations.md:21-68):

[system]    config / temperature / density / model (or [model."i-j"] blocks) /
            list_type / list_parameters
[simulation] steps / burn / seed / parallel / output_path
[[simulation.move]]   action / policy / probability / parameters
[[simulation.output]] algorithm / scheduler_params {linear_interval, log_base} /
                      callbacks / dependencies / fmt

All names resolve through explicit registries (no eval — SURVEY.md §5.6).
Extra (TPU-native) keys: [simulation] nsim (replicas per input file),
mesh_axis sharding is configured programmatically via parallel/.
"""

from __future__ import annotations

import sys
import tomllib
from typing import Any, Dict

from .engine.schedule import build_schedule
from .moves import base as MB


def _build_pool(move_cfgs, chains):
    pool = []
    for mv in move_cfgs:
        action = mv["action"]
        policy = mv.get("policy")
        prob = float(mv["probability"])
        params = mv.get("parameters", {})
        if action == "Displacement":
            if "sigma" not in params:
                raise ValueError("Missing parameter 'sigma' for action: Displacement")
            if policy == "SimpleGaussian":
                pool.append(MB.displacement(params["sigma"], prob))
            elif policy == "SmartGaussian":
                # force-bias displacement (TPU extension, moves/base.py)
                pool.append(MB.displacement_smart(params["sigma"], prob))
            else:
                raise ValueError(f"Unsupported policy: {policy} for action: {action}")
        elif action == "DiscreteSwap":
            sp = params.get("species")
            if not sp or len(sp) != 2:
                raise ValueError("'species' for action DiscreteSwap must be two ints")
            s1, s2 = int(sp[0]) - 1, int(sp[1]) - 1  # file species are 1-based
            if policy == "DoubleUniform":
                pool.append(MB.discrete_swap(s1, s2, prob))
            elif policy == "EnergyBias":
                pool.append(
                    MB.discrete_swap(
                        s1,
                        s2,
                        prob,
                        policy="energy_bias",
                        theta1=params.get("theta1", 0.0),
                        theta2=params.get("theta2", 0.0),
                    )
                )
            else:
                raise ValueError(f"Unsupported policy: {policy} for action: {action}")
        elif action == "MoleculeFlip":
            if policy != "DoubleUniform":
                raise ValueError(f"Unsupported policy: {policy} for action: {action}")
            pool.append(MB.molecule_flip(prob))
        else:
            raise ValueError(f"Unsupported action: {action}")
    return tuple(pool)


def _build_outputs(output_cfgs, steps, burn):
    algos = []
    for out in output_cfgs:
        alg = out["algorithm"]
        sp = out.get("scheduler_params", {})
        interval = sp.get("linear_interval", steps)
        if "log_base" in sp:
            block = build_schedule(interval, 0, float(sp["log_base"]))
            sched = build_schedule(steps, burn, list(block))
        else:
            sched = build_schedule(steps, burn, int(interval))
        entry: Dict[str, Any] = {"algorithm": alg, "scheduler": sched}
        if alg == "StoreCallbacks":
            entry["callbacks"] = tuple(out.get("callbacks", []))
        elif alg == "StoreAcceptance":
            entry["dependencies"] = tuple(out.get("dependencies", ["Metropolis"]))
        elif alg in ("StoreTrajectories", "StoreLastFrames"):
            entry["fmt"] = out.get("fmt", "XYZ")
        elif alg == "StoreCheckpoints":
            entry["history"] = bool(out.get("history", False))
        elif alg in ("PrintTimeSteps", "StoreParameters"):
            pass
        elif alg == "ReplicaExchange":
            pass
        elif alg == "AdaptiveSigma":
            # acceptance-targeting sigma controller (engine/adaptive.py);
            # schedule it over the burn-in window — it freezes after its
            # last event
            if "move" in out:
                entry["move"] = int(out["move"]) - 1  # TOML move ids are 1-based
            for k in ("target", "kappa", "sigma_max"):
                if k in out:
                    entry[k] = float(out[k])
        else:
            raise ValueError(f"Unsupported output algorithm: {alg}")
        algos.append(entry)
    return algos


def run_params(params: Dict[str, Any], resume: str | None = None):
    """Assemble and run a Simulation from a parsed TOML dict. `resume`
    points at a checkpoint.npz written by StoreCheckpoints: the run
    continues mid-schedule with exact state (RNG, counters, θ)."""
    import os

    import jax

    # Honour JAX_PLATFORMS even on hosts whose sitecustomize registers an
    # experimental PJRT plugin and overwrites the platform list at import.
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        jax.config.update("jax_platforms", plat)

    system = params["system"]
    sim_cfg = params["simulation"]

    precision = str(sim_cfg.get("precision", system.get("precision", "f64")))
    energy_precision = None
    if precision in ("f64", "float64", "double"):
        jax.config.update("jax_enable_x64", True)
        dtype = "float64"
    elif precision in ("mixed", "f32x64"):
        # f32 state (full TPU speed) + f64 incremental-energy ledger: long
        # runs book millions of O(1) deltas into an O(1e4) accumulator, and
        # an f32 ledger random-walks by ~1e-3/particle over thousands of
        # sweeps (core.energy.initialize_energy docstring)
        jax.config.update("jax_enable_x64", True)
        dtype = "float32"
        energy_precision = "float64"
    else:
        dtype = "float32"
    import jax.numpy as jnp

    from .engine.simulation import Simulation
    from .io.loader import load_chains

    model = system.get("model", params.get("model"))
    if model is None:
        raise ValueError("model must be given in [system] or as [model.\"i-j\"] blocks")

    args = {
        "temperature": system.get("temperature"),
        "density": system.get("density"),
        "model": model,
        "list_type": system.get("list_type", "LinkedList"),
        "list_parameters": system.get("list_parameters"),
        "nsim": sim_cfg.get("nsim"),
    }
    chains = load_chains(
        system["config"], args=args, verbose=bool(sim_cfg.get("verbose", False)),
        dtype=jnp.float64 if dtype == "float64" else jnp.float32,
        energy_dtype=jnp.float64 if energy_precision else None,
    )

    steps = int(sim_cfg["steps"])
    burn = int(sim_cfg.get("burn", 0))
    pool = _build_pool(sim_cfg.get("move", []), chains)
    algorithms = [
        {
            "algorithm": "Metropolis",
            "pool": pool,
            "seed": int(sim_cfg.get("seed", 0)),
            "parallel": bool(sim_cfg.get("parallel", False)),
            "sweepstep": int(sim_cfg.get("sweepstep", chains.n_particles)),
            # TPU-native extension: checkerboard hyper-sweep backend
            # (~n_active simultaneous moves per substep; displacement-only)
            "parallel_moves": bool(sim_cfg.get("parallel_moves", False)),
            # TPU-native extension: shard ONE system's cell grid over this
            # many devices with ppermute halo exchange (parallel/spatial.py);
            # requires parallel_moves = true and nsim = 1
            "spatial_devices": int(sim_cfg.get("spatial_devices", 0)),
        }
    ] + _build_outputs(sim_cfg.get("output", []), steps, burn)

    sim = Simulation(
        chains,
        algorithms,
        steps,
        path=sim_cfg.get("output_path", "./"),
        verbose=bool(sim_cfg.get("verbose", True)),
        resume=resume,
        profile_dir=sim_cfg.get("profile_dir"),
    )
    sim.run()
    return sim


def main(argv=None) -> int:
    argv = list(argv if argv is not None else sys.argv[1:])
    resume = None
    if "--resume" in argv:
        i = argv.index("--resume")
        try:
            resume = argv[i + 1]
        except IndexError:
            print("--resume requires a checkpoint path")
            return 2
        del argv[i : i + 2]
    if len(argv) != 1 or argv[0] in ("-h", "--help"):
        print("usage: particlesmc-tpu <params.toml> [--resume checkpoint.npz]")
        return 0 if argv and argv[0] in ("-h", "--help") else 2
    import os

    if not os.path.isfile(argv[0]):
        print(f"Parameter file '{argv[0]}' does not exist in the current path.")
        return 1
    if resume is not None and not os.path.isfile(resume):
        print(f"Checkpoint file '{resume}' does not exist in the current path.")
        return 1
    with open(argv[0], "rb") as f:
        params = tomllib.load(f)
    # a relative [system] config resolves against the params file's own
    # directory when it does not exist under the CWD — so
    # `particlesmc-tpu examples/movie/params.toml` works from anywhere
    # (the reference's examples cd into each directory instead)
    cfg = params.get("system", {}).get("config")
    if cfg and not os.path.isabs(cfg) and not os.path.exists(cfg):
        beside = os.path.join(os.path.dirname(os.path.abspath(argv[0])), cfg)
        if os.path.exists(beside):
            params["system"]["config"] = beside
    run_params(params, resume=resume)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
