"""Engine integration of the checkerboard (parallel_moves) backend."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from particlesmc_tpu.core import energy as E
from particlesmc_tpu.core.state import make_system
from particlesmc_tpu.engine import Simulation, build_schedule
from particlesmc_tpu.io.loader import Chains
from particlesmc_tpu.models import tables as T
from particlesmc_tpu.moves import base as MB


def _chains(n=140, m=3, d=2, density=1.1920748468939728, temp=0.8, seed=4,
            three_species=False):
    table = T.JBB(jnp.float64)
    rng = np.random.default_rng(seed)
    L = (n / density) ** (1 / d)
    per_dim = int(np.ceil(n ** (1 / d)))
    a = L / per_dim
    grid = np.stack(
        np.meshgrid(*[np.arange(per_dim) * a + a / 2] * d, indexing="ij"), -1
    ).reshape(-1, d)[:n]

    sts = []
    for k in range(m):
        pos = grid + rng.uniform(-0.03 * a, 0.03 * a, (n, d))
        if three_species:
            r = rng.random(n)
            species = np.where(r < 0.4, 1, np.where(r < 0.7, 2, 3))
        else:
            species = (rng.random(n) < 0.3).astype(np.int64) + 1
        st = make_system(pos, species, density, temp, dtype=jnp.float64)
        sts.append(E.initialize_energy(st, table))
    batched = jax.tree.map(lambda *xs: jnp.stack(xs), *sts)
    return Chains(states=batched, table=table, list_type="dense", n_chains=m)


@pytest.mark.slow
def test_parallel_moves_simulation(tmp_path):
    chains = _chains()
    pool = (MB.displacement(0.1),)
    steps = 6
    sim = Simulation(
        chains,
        [
            {"algorithm": "Metropolis", "pool": pool, "seed": 5,
             "parallel_moves": True},
            {"algorithm": "StoreCallbacks", "callbacks": ("energy",),
             "scheduler": build_schedule(steps, 0, 2)},
            {"algorithm": "StoreAcceptance", "dependencies": ("Metropolis",),
             "scheduler": build_schedule(steps, 0, 2)},
        ],
        steps,
        path=str(tmp_path),
        verbose=False,
    )
    sim.run()

    e = np.loadtxt(tmp_path / "chains" / "1" / "energy.dat")
    assert e.shape == (4, 2)
    assert np.all(np.isfinite(e[:, 1]))
    acc = np.loadtxt(tmp_path / "moves" / "1" / "acceptance.dat")
    assert 0.0 < acc[-1, 1] < 1.0

    # incremental energy booked by the hyper-sweeps matches a dense recompute
    for k in range(chains.n_chains):
        st = jax.tree.map(lambda x: x[k], sim.mc.system)
        e_ref = float(
            E.total_energy_dense(st.position, st.species, st.box, chains.table)
        )
        np.testing.assert_allclose(float(st.energy), e_ref, rtol=1e-9, atol=1e-7)


@pytest.mark.slow
def test_parallel_moves_mixed_pool_simulation(tmp_path):
    """disp+swap pool on the checkerboard backend end-to-end: per-move
    acceptance files, conserved composition, exact energy bookkeeping
    (VERDICT round-1 item 1)."""
    chains = _chains(three_species=True)
    n0 = np.asarray(jnp.sum(chains.states.species == 0, axis=1))
    pool = (
        MB.displacement(0.1, probability=0.6),
        MB.discrete_swap(0, 2, probability=0.2),
        MB.discrete_swap(1, 2, probability=0.2),
    )
    steps = 6
    sim = Simulation(
        chains,
        [
            {"algorithm": "Metropolis", "pool": pool, "seed": 5,
             "parallel_moves": True},
            {"algorithm": "StoreAcceptance", "dependencies": ("Metropolis",),
             "scheduler": build_schedule(steps, 0, 3)},
        ],
        steps,
        path=str(tmp_path),
        verbose=False,
    )
    sim.run()

    for m in range(3):
        acc = np.loadtxt(tmp_path / "moves" / str(m + 1) / "acceptance.dat")
        assert 0.0 <= acc[-1, 1] < 1.0
    # displacement must actually move
    acc0 = np.loadtxt(tmp_path / "moves" / "1" / "acceptance.dat")
    assert acc0[-1, 1] > 0.0
    # at least one swap pair accepts (close-size JBB pairs)
    att = np.asarray(sim.mc.attempted).sum(axis=0)
    acc_cnt = np.asarray(sim.mc.accepted).sum(axis=0)
    assert att.shape == (3,) and (att > 0).all()
    assert acc_cnt[1] + acc_cnt[2] > 0
    # species composition conserved per chain
    n0_after = np.asarray(jnp.sum(sim.mc.system.species == 0, axis=1))
    np.testing.assert_array_equal(n0_after, n0)
    # incremental energy matches a dense recompute (swaps booked exactly)
    for k in range(chains.n_chains):
        st = jax.tree.map(lambda x: x[k], sim.mc.system)
        e_ref = float(
            E.total_energy_dense(st.position, st.species, st.box, chains.table)
        )
        np.testing.assert_allclose(float(st.energy), e_ref, rtol=1e-9, atol=1e-7)


def test_parallel_moves_rejects_unsupported():
    # EnergyBias swaps are checkerboard-supported since round 4 (in-cell
    # masked-softmax pick); a flip move on an ATOMIC system is not.
    chains = _chains(m=1)
    pool = (MB.displacement(0.1), MB.molecule_flip(probability=0.5))
    with pytest.raises(ValueError, match="sequential"):
        Simulation(
            chains,
            [{"algorithm": "Metropolis", "pool": pool, "parallel_moves": True}],
            5,
        )


@pytest.mark.slow
def test_spatial_devices_engine_matches_unsharded(tmp_path):
    """TOML-level feature `[simulation] spatial_devices = P`: the engine run
    with the grid sharded over 4 devices reproduces the unsharded engine run
    exactly (same seed, same RNG layout — parallel/spatial.py)."""
    if len(jax.devices()) < 4:
        pytest.skip("needs virtual device mesh")
    table = T.KobAndersen(jnp.float64)
    rng = np.random.default_rng(7)
    d = 2
    rcut = table.max_cutoff
    box = np.array([8 * rcut * 1.01, 4 * rcut * 1.01])
    density = 0.6
    n = int(density * box[0] * box[1])
    nx = int(np.ceil(np.sqrt(n * box[0] / box[1])))
    ny = int(np.ceil(n / nx))
    xs, ys = np.meshgrid(
        (np.arange(nx) + 0.5) * box[0] / nx,
        (np.arange(ny) + 0.5) * box[1] / ny,
        indexing="ij",
    )
    pos = np.stack([xs.reshape(-1), ys.reshape(-1)], -1)[:n]
    pos += rng.uniform(-0.05, 0.05, pos.shape)
    species = (rng.random(n) < 0.3).astype(np.int64) + 1
    st = make_system(pos, species, density, 1.0, box=box, dtype=jnp.float64)
    st = E.initialize_energy(st, table, check=True)
    batched = jax.tree.map(lambda x: x[None], st)
    chains = Chains(states=batched, table=table, list_type="dense", n_chains=1)

    pool = (MB.displacement(0.1, probability=0.8), MB.discrete_swap(0, 1, 0.2))
    steps = 6

    def run(path, spatial):
        sim = Simulation(
            chains,
            [
                {"algorithm": "Metropolis", "pool": pool, "seed": 5,
                 "parallel_moves": True, "spatial_devices": spatial},
                {"algorithm": "StoreCallbacks", "callbacks": ("energy",),
                 "scheduler": build_schedule(steps, 0, 1)},
            ],
            steps,
            path=str(path),
            verbose=False,
        )
        sim.run()
        return np.loadtxt(path / "chains" / "1" / "energy.dat")

    e_ref = run(tmp_path / "ref", 0)
    e_sp = run(tmp_path / "sp", 4)
    np.testing.assert_allclose(e_sp, e_ref, rtol=1e-12)
