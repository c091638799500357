"""Shared fixture loading for the test suite."""

import os

import numpy as np

import jax.numpy as jnp

from particlesmc_tpu.core.state import bonds_from_pairs, make_system, mol_table
from particlesmc_tpu.core.energy import initialize_energy
from particlesmc_tpu.models.tables import resolve_model

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


def load_fixture(name):
    return dict(np.load(os.path.join(FIXTURES, name), allow_pickle=False))


def atomic_system(dtype=jnp.float64, with_energy=True):
    fx = load_fixture("config_0.npz")
    st = make_system(
        fx["position"],
        fx["species"],
        float(fx["density"]),
        float(fx["temperature"]),
        box=fx["box"],
        dtype=dtype,
    )
    table = resolve_model(str(fx["model"]), len(np.unique(fx["species"])), dtype)
    if with_energy:
        st = initialize_energy(st, table)
    return st, table, fx


def molecular_system(dtype=jnp.float64, with_energy=True):
    fx = load_fixture("molecule.npz")
    n = len(fx["species"])
    bonds = bonds_from_pairs(fx["bond_pairs"] - 1, n)
    st = make_system(
        fx["position"],
        fx["species"],
        float(fx["density"]),
        float(fx["temperature"]),
        molecule=fx["molecule"],
        bonds=bonds,
        box=fx["box"],
        dtype=dtype,
    )
    table = resolve_model(str(fx["model"]), len(np.unique(fx["species"])), dtype)
    if with_energy:
        st = initialize_energy(st, table)
    mol_start, mol_len = mol_table(np.asarray(st.molecule))
    return st, table, fx, mol_start, mol_len
