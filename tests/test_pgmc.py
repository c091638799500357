"""Policy-guided MC: gradient estimation + optimiser updates
(reference scenario test/pgmc_ka2d.jl at miniature scale)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from particlesmc_tpu.core.energy import initialize_energy
from particlesmc_tpu.core.state import make_system
from particlesmc_tpu.engine.pgmc import BLANPG, VPG
from particlesmc_tpu.engine.simulation import Simulation
from particlesmc_tpu.engine.schedule import build_schedule
from particlesmc_tpu.io.loader import Chains
from particlesmc_tpu.models import tables as T
from particlesmc_tpu.moves import base as MB


def _ka2d_chains(m=3, seed=42):
    """Miniature of the reference PGMC scenario (test/pgmc_ka2d.jl:11-23):
    43 particles, 3 species, 2D JBB."""
    rng = np.random.default_rng(seed)
    NA, NB, NC = 20, 11, 12
    n = NA + NB + NC
    d = 2
    density = 1.1920748468939728
    temperature = 0.5
    L = (n / density) ** (1 / d)
    per_dim = int(np.ceil(n ** (1 / d)))
    a = L / per_dim
    grid = np.stack(
        np.meshgrid(*[np.arange(per_dim) * a + a / 2] * d, indexing="ij"), -1
    ).reshape(-1, d)[:n]
    table = T.JBB()
    states = []
    for _ in range(m):
        pos = grid + rng.uniform(-0.05 * a, 0.05 * a, (n, d))
        sp = np.concatenate([np.full(NA, 1), np.full(NB, 2), np.full(NC, 3)])
        rng.shuffle(sp)
        st = make_system(pos, sp, density, temperature, dtype=jnp.float64)
        st = initialize_energy(st, table, check=True)
        states.append(st)
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *states)
    return Chains(states=stacked, table=table, list_type="dense", n_chains=m)


def test_pgmc_learns_parameters(tmp_path):
    chains = _ka2d_chains()
    pswap = 0.2
    pool = (
        MB.displacement(0.05, probability=1 - pswap),
        MB.discrete_swap(0, 2, pswap / 2, policy="energy_bias"),
        MB.discrete_swap(1, 2, pswap / 2, policy="energy_bias"),
    )
    steps = 6
    sched = build_schedule(steps, 0, 2)
    algorithms = [
        dict(algorithm="Metropolis", pool=pool, seed=42, sweepstep=chains.n_particles),
        dict(
            algorithm="PolicyGradientEstimator",
            dependencies=("Metropolis",),
            optimisers=(VPG(1e-3), BLANPG(1e-4, 1e-6), BLANPG(1e-4, 1e-6)),
            q_batch_size=4,
        ),
        dict(
            algorithm="PolicyGradientUpdate",
            dependencies=("PolicyGradientEstimator",),
            scheduler=build_schedule(steps, 0, 2),
        ),
        dict(algorithm="StoreParameters", dependencies=("Metropolis",), scheduler=sched),
        dict(algorithm="StoreCallbacks", callbacks=("energy",), scheduler=sched),
    ]
    sim = Simulation(chains, algorithms, steps, path=str(tmp_path))
    sim.run()

    sigma = float(sim.pool_params[0]["sigma"])
    th1 = float(sim.pool_params[1]["theta1"])
    th2 = float(sim.pool_params[1]["theta2"])
    assert np.isfinite([sigma, th1, th2]).all()
    assert sigma != pytest.approx(0.05)  # VPG moved the displacement width
    assert (th1, th2) != (0.0, 0.0)  # natural PG moved the bias parameters
    assert sigma > 0

    # StoreParameters dumped θ trajectories
    p1 = np.loadtxt(tmp_path / "moves" / "1" / "parameters.dat")
    assert p1.shape[0] == len(sched)
    p2 = np.loadtxt(tmp_path / "moves" / "2" / "parameters.dat")
    assert p2.shape[1] == 3  # step, theta1, theta2


def test_reward_definitions():
    from particlesmc_tpu.moves.kernel import move_reward, Proposal

    mv = MB.displacement(0.1)
    r = move_reward(mv)

    class St:
        position = jnp.zeros((4, 2))

    prop = Proposal(
        i=jnp.asarray(0),
        j=jnp.asarray(0),
        pos_i=jnp.zeros(2),
        sp_i=jnp.asarray(0),
        sp_j=jnp.asarray(0),
        delta=jnp.asarray([0.3, 0.4]),
        log_q_fwd=jnp.asarray(0.0),
        log_q_rev=jnp.asarray(0.0),
    )
    assert float(r(prop, St())) == pytest.approx(0.25)  # |δ|²
    mv2 = MB.discrete_swap(0, 1, 0.5)
    assert float(move_reward(mv2)(prop, St())) == 1.0
