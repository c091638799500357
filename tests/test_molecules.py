"""Molecular systems: bonded energy, MoleculeFlip move, chain correlation
(reference src/molecules.jl, src/moves.jl:291-352)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from particlesmc_tpu.core.energy import initialize_energy, total_energy_dense
from particlesmc_tpu.core.state import bonds_from_pairs, make_system, mol_table
from particlesmc_tpu.models import tables as T
from particlesmc_tpu.moves import base as MB
from particlesmc_tpu.moves import kernel as K


def _trimer_system(n_mol=8, dtype=jnp.float64, seed=0):
    """Small trimer melt: equilateral triangles on a molecular lattice."""
    rng = np.random.default_rng(seed)
    n = 3 * n_mol
    density = 0.4
    d = 3
    L = (n / density) ** (1 / d)
    per_dim = int(np.ceil(n_mol ** (1 / d)))
    a = L / per_dim
    centers = np.stack(
        np.meshgrid(*[np.arange(per_dim) * a + a / 2] * d, indexing="ij"), -1
    ).reshape(-1, d)[:n_mol]
    tri = np.array([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.5, 0.866, 0.0]])
    pos = (centers[:, None, :] + tri[None]).reshape(n, d)
    pos += rng.uniform(-0.02, 0.02, pos.shape)
    species = np.tile([1, 2, 3], n_mol)
    molecule = np.repeat(np.arange(1, n_mol + 1), 3)
    pairs = []
    for m in range(n_mol):
        b = 3 * m
        pairs += [(b, b + 1), (b, b + 2), (b + 1, b + 2)]
    bonds = bonds_from_pairs(pairs, n)
    table = T.Trimer(dtype)
    st = make_system(
        pos, species, density, 2.0, molecule=molecule, bonds=bonds, dtype=dtype
    )
    st = initialize_energy(st, table, check=True)
    ms, ml = mol_table(np.asarray(st.molecule))
    return st, table, ms, ml


def test_trimer_energy_finite_and_bonded():
    st, table, *_ = _trimer_system()
    e = float(st.energy)
    assert np.isfinite(e)
    # removing bonds changes the energy (bonded path active)
    e_nobond = float(
        total_energy_dense(st.position, st.species, st.box, table, bonds=None)
    )
    assert e != pytest.approx(e_nobond)


def test_flip_move_invariants():
    st, table, ms, ml = _trimer_system()
    pool = (
        MB.displacement(0.05, probability=0.5),
        MB.molecule_flip(probability=0.5),
    )
    config = K.KernelConfig(
        pool=pool, table=table, cell_spec=None, mol_start=tuple(ms), mol_len=tuple(ml)
    )
    mc = K.init_mc_state(st, config, 5)
    run = K.build_run_fn(config, st.n_particles)
    params = MB.init_pool_params(pool)
    out = run(mc, params, 4)

    # incremental energy bookkeeping holds through flips
    recomputed = total_energy_dense(
        out.system.position, out.system.species, out.system.box, table, out.system.bonds
    )
    assert float(out.system.energy) == pytest.approx(float(recomputed), abs=1e-9)

    # species multiset within each molecule preserved (flip permutes in place)
    sp = np.asarray(out.system.species).reshape(-1, 3)
    for row in sp:
        assert sorted(row.tolist()) == [0, 1, 2]
    assert int(out.attempted[1]) > 0
    assert int(out.accepted[1]) > 0  # flips do get accepted in a loose melt


def test_chain_correlation_callback():
    st, table, ms, ml = _trimer_system()

    class FakeSim:
        pass

    sim = FakeSim()
    sim.mol_len = ml
    sim.mol_start = ms

    class MC:
        pass

    sim.mc = MC()
    sim.mc.system = jax.tree.map(lambda x: x[None], st)  # batch of 1

    from particlesmc_tpu.engine.callbacks import chain_correlation

    val = chain_correlation(sim)
    # ordered 1,2,3 chains: correlations are (1*-1), (1*3), (-1*3) per chain
    # → cross values -1, 3, -3 → sum of squares = 1 + 9 + 9 = 19
    assert val[0] == pytest.approx(19.0)


def test_molecular_golden_subset_consistency():
    """Dense molecular energy equals bonded + nonbonded split computed
    manually on one particle."""
    from particlesmc_tpu.core import energy as E

    st, table, *_ = _trimer_system()
    k = jnp.asarray(4, jnp.int32)
    full = E.particle_energy_dense(
        k, st.position, st.species, st.box, table, bonds=st.bonds
    )
    nonbond_only = E.particle_energy_dense(
        k, st.position, st.species, st.box, table, bonds=None
    )
    assert float(full) != pytest.approx(float(nonbond_only))
