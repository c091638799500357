"""End-to-end engine tests: Simulation + output directory contract + CLI
(build step 4 gate — SURVEY.md §7: one model end-to-end)."""

import os

import numpy as np
import pytest

from particlesmc_tpu.core.energy import initialize_energy, total_energy_dense
from particlesmc_tpu.core.state import make_system
from particlesmc_tpu.engine.schedule import build_schedule
from particlesmc_tpu.engine.simulation import Simulation
from particlesmc_tpu.io import formats
from particlesmc_tpu.io.loader import Chains, load_chains
from particlesmc_tpu.models import tables as T
from particlesmc_tpu.moves import base as MB

import jax
import jax.numpy as jnp


def _write_small_config(path, n=48, d=2, density=0.5, T_=1.5, seed=0):
    rng = np.random.default_rng(seed)
    L = (n / density) ** (1 / d)
    per_dim = int(np.ceil(n ** (1 / d)))
    a = L / per_dim
    grid = np.stack(
        np.meshgrid(*[np.arange(per_dim) * a + a / 2] * d, indexing="ij"), -1
    ).reshape(-1, d)[:n]
    pos = grid + rng.uniform(-0.05 * a, 0.05 * a, (n, d))
    sp = rng.integers(1, 3, n)  # species 1..2
    text = formats.write_xyz_frame(sp, pos, np.full(d, L), 0, density, T_)
    with open(path, "w") as f:
        f.write(text)
    return pos, sp


def _chains_from_file(path, nsim=1):
    return load_chains(
        path,
        args={
            "temperature": 1.5,
            "model": "KobAndersen",
            "list_type": "EmptyList",
            "nsim": nsim,
        },
    )


def test_simulation_outputs(tmp_path):
    cfg = tmp_path / "config.xyz"
    _write_small_config(str(cfg))
    chains = _chains_from_file(str(cfg), nsim=2)
    steps = 20
    sched = build_schedule(steps, 0, [0, 1, 2, 4, 8])
    pool = (
        MB.displacement(0.1, probability=0.6),
        MB.discrete_swap(0, 1, probability=0.4),
    )
    out = tmp_path / "out"
    algorithms = [
        dict(algorithm="Metropolis", pool=pool, seed=7, sweepstep=chains.n_particles),
        dict(algorithm="StoreCallbacks", callbacks=("energy",), scheduler=sched),
        dict(algorithm="StoreAcceptance", dependencies=("Metropolis",), scheduler=sched),
        dict(algorithm="StoreTrajectories", scheduler=sched, fmt="EXYZ"),
        dict(algorithm="StoreLastFrames", scheduler=[steps], fmt="XYZ"),
    ]
    sim = Simulation(chains, algorithms, steps, path=str(out))
    sim.run()

    # directory contract (SURVEY.md §5.5)
    for k in (1, 2):
        e = np.loadtxt(out / "chains" / str(k) / "energy.dat")
        assert e.shape[1] == 2
        expect_times = sched[sched <= steps]
        np.testing.assert_array_equal(e[:, 0], expect_times)
        traj = (out / "chains" / str(k) / "trajectory.exyz").read_text()
        assert traj.count("Lattice=") == len(expect_times)
        lf = (out / "chains" / str(k) / "lastframe.xyz").read_text()
        parsed = formats.read_xyz(lf)
        assert parsed["N"] == chains.n_particles
    acc = np.loadtxt(out / "moves" / "1" / "acceptance.dat")
    assert ((acc[:, 1] >= 0) & (acc[:, 1] <= 1)).all()
    assert (out / "moves" / "2" / "acceptance.dat").exists()

    # chains with different seeds diverge
    e1 = np.loadtxt(out / "chains" / "1" / "energy.dat")[:, 1]
    e2 = np.loadtxt(out / "chains" / "2" / "energy.dat")[:, 1]
    assert not np.allclose(e1[1:], e2[1:])

    # incremental energies consistent with recompute at the end
    st = jax.tree.map(lambda x: x[0], sim.mc.system)
    recomputed = total_energy_dense(st.position, st.species, st.box, chains.table)
    assert float(st.energy) == pytest.approx(float(recomputed), abs=1e-8)

    # final energies per chain match the last stored callback row
    assert e1[-1] == pytest.approx(float(st.energy) / chains.n_particles, abs=1e-9)


def test_lastframe_restart_roundtrip(tmp_path):
    """lastframe is a valid restart input (the reference's workflow chaining,
    examples/ortho-terphenyl stage 1)."""
    cfg = tmp_path / "config.xyz"
    _write_small_config(str(cfg))
    chains = _chains_from_file(str(cfg))
    steps = 5
    pool = (MB.displacement(0.1),)
    algorithms = [
        dict(algorithm="Metropolis", pool=pool, seed=1),
        dict(algorithm="StoreLastFrames", scheduler=[steps], fmt="XYZ"),
    ]
    out = tmp_path / "run1"
    sim = Simulation(chains, algorithms, steps, path=str(out))
    sim.run()
    e_final = float(np.asarray(sim.mc.system.energy[0]))

    lf = out / "chains" / "1" / "lastframe.xyz"
    chains2 = _chains_from_file(str(lf))
    e_stored = float(np.asarray(chains2.states.energy[0]))
    # restart energy == final run energy up to writer precision (6 decimals)
    assert e_stored == pytest.approx(e_final, abs=1e-2)


def test_cli_end_to_end(tmp_path):
    cfg = tmp_path / "config.xyz"
    _write_small_config(str(cfg))
    params = f"""
[system]
config = "{cfg}"
temperature = 1.5
density = 0.5
model = "KobAndersen"
list_type = "EmptyList"

[simulation]
type = "Metropolis"
steps = 10
seed = 10
parallel = false
verbose = false
output_path = "{tmp_path}/data"

[[simulation.move]]
action = "Displacement"
probability = 0.7
policy = "SimpleGaussian"
parameters = {{sigma = 0.05}}

[[simulation.move]]
action = "DiscreteSwap"
probability = 0.3
policy = "DoubleUniform"
parameters = {{species = [1, 2]}}

[[simulation.output]]
algorithm = "StoreCallbacks"
callbacks = ["energy"]
scheduler_params = {{linear_interval = 5}}

[[simulation.output]]
algorithm = "StoreAcceptance"
dependencies = ["Metropolis"]
scheduler_params = {{linear_interval = 5}}

[[simulation.output]]
algorithm = "StoreTrajectories"
scheduler_params = {{linear_interval = 5}}
fmt = "XYZ"

[[simulation.output]]
algorithm = "StoreLastFrames"
scheduler_params = {{linear_interval = 10}}
fmt = "XYZ"
"""
    ptoml = tmp_path / "params.toml"
    ptoml.write_text(params)

    from particlesmc_tpu.cli import main

    assert main([str(ptoml)]) == 0
    e = np.loadtxt(tmp_path / "data" / "chains" / "1" / "energy.dat")
    np.testing.assert_array_equal(e[:, 0], [0, 5, 10])
    assert (tmp_path / "data" / "chains" / "1" / "trajectory.xyz").exists()
    assert (tmp_path / "data" / "moves" / "2" / "acceptance.dat").exists()


def test_cli_missing_file():
    from particlesmc_tpu.cli import main

    assert main(["/nonexistent/params.toml"]) == 1
    assert main(["--help"]) == 0


def test_uneven_chains_warns_not_silent(tmp_path):
    """n_chains not divisible by the visible devices must WARN (the batch
    stays on one device — a v5e-8 user must not silently run on 1/8 of the
    host, VERDICT r3). Divisible counts shard without warning."""
    cfg = tmp_path / "config.xyz"
    _write_small_config(str(cfg))
    algorithms = [
        dict(algorithm="Metropolis", pool=(MB.displacement(0.1),), seed=1),
    ]
    ndev = len(jax.devices())
    assert ndev == 8  # conftest pins 8 virtual CPU devices
    with pytest.warns(RuntimeWarning, match="not divisible"):
        sim = Simulation(_chains_from_file(str(cfg), nsim=3), algorithms, 1,
                         path=str(tmp_path / "o1"))
    assert sim.mesh is None

    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("error")  # divisible case: no warning at all
        sim = Simulation(_chains_from_file(str(cfg), nsim=8), algorithms, 1,
                         path=str(tmp_path / "o2"))
    assert sim.mesh is not None


def test_adaptive_sigma_targets_acceptance(tmp_path):
    """AdaptiveSigma drives the displacement width toward the target
    acceptance from a hopeless start (sigma = 1.0 at a dense state point),
    then freezes after its last scheduled event (engine/adaptive.py)."""
    cfg = tmp_path / "config.xyz"
    _write_small_config(str(cfg), n=48, density=0.9, T_=1.0)
    chains = _chains_from_file(str(cfg), nsim=8)
    steps = 120
    algorithms = [
        dict(algorithm="Metropolis", pool=(MB.displacement(1.0),), seed=3,
             sweepstep=chains.n_particles),
        dict(algorithm="AdaptiveSigma", scheduler=build_schedule(steps, 0, 5),
             target=0.4, kappa=1.5),
    ]
    sim = Simulation(chains, algorithms, steps, path=str(tmp_path / "out"))
    sim.run()
    log = np.loadtxt(tmp_path / "out" / "moves" / "1" / "sigma.dat")
    assert log.shape[0] > 10
    final_sigma, final_rate = log[-1, 1], log[-1, 2]
    assert final_sigma < 0.5  # shrank from 1.0
    assert abs(final_rate - 0.4) < 0.15  # windowed acceptance near target
    # the controller wrote the tuned sigma back into the live pool params
    assert float(np.asarray(sim.pool_params[0]["sigma"])) == pytest.approx(
        final_sigma, rel=1e-10
    )


def test_temperature_ladder_from_one_config(tmp_path):
    """A vector temperature with a single configuration replicates the frame
    across the ladder (parallel-tempering entry; reference accepts a
    temperature vector, src/IO/IO.jl:263-271), composing with nsim."""
    cfg = tmp_path / "config.xyz"
    _write_small_config(str(cfg))
    ladder = [2.0, 1.5, 1.0, 0.8]
    chains = load_chains(
        str(cfg),
        args={"temperature": ladder, "model": "KobAndersen",
              "list_type": "EmptyList"},
    )
    assert chains.n_chains == 4
    np.testing.assert_allclose(np.asarray(chains.states.temperature), ladder)
    # all rungs start from the same frame
    p = np.asarray(chains.states.position)
    np.testing.assert_array_equal(p[0], p[3])

    chains2 = load_chains(
        str(cfg),
        args={"temperature": ladder, "model": "KobAndersen",
              "list_type": "EmptyList", "nsim": 2},
    )
    assert chains2.n_chains == 8
    np.testing.assert_allclose(
        np.asarray(chains2.states.temperature),
        [t for t in ladder for _ in range(2)],
    )

    # vector length must match when there is more than one configuration
    multi = tmp_path / "multi"
    multi.mkdir()
    _write_small_config(str(multi / "a.xyz"))
    _write_small_config(str(multi / "b.xyz"), seed=1)
    with pytest.raises(ValueError, match="temperature vector length"):
        load_chains(
            str(multi),
            args={"temperature": [1.0, 2.0, 3.0], "model": "KobAndersen",
                  "list_type": "EmptyList"},
        )
