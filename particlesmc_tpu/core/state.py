"""System state pytrees.

The reference's `Atoms`/`Molecules` structs (reference: src/atoms.jl:18-30,
src/molecules.jl:24-41) hold mutable Julia vectors. The TPU-native state is a
frozen pytree of fixed-shape arrays: functional updates, `vmap`-able over a
chains axis, shardable with `jax.sharding`. Molecular systems are the same
pytree with the optional `molecule` / `bonds` fields populated (bond lists are
padded to a static max degree with -1).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..models.tables import PairTable
from . import geometry


@struct.dataclass
class SystemState:
    """One Markov chain's particle system (add a leading axis for batches).

    Fields mirror the reference structs:
    - position [N, d], species [N] (int32, 0-based internally)
    - box [d], temperature/density/energy scalars (arrays so that parallel
      tempering can vary temperature per chain under vmap)
    - molecule [N] (0-based molecule id) and bonds [N, B] (-1 padded) for
      molecular systems (reference src/molecules.jl:24-41); None for atoms.
    """

    position: jax.Array
    species: jax.Array
    box: jax.Array
    temperature: jax.Array
    density: jax.Array
    energy: jax.Array
    molecule: Optional[jax.Array] = None
    bonds: Optional[jax.Array] = None

    @property
    def n_particles(self) -> int:
        return self.position.shape[-2]

    @property
    def dim(self) -> int:
        return self.position.shape[-1]

    @property
    def is_molecular(self) -> bool:
        return self.bonds is not None


def make_system(
    position,
    species,
    density: float,
    temperature: float,
    *,
    molecule=None,
    bonds=None,
    box=None,
    dtype=jnp.float64,
) -> SystemState:
    """Construct a SystemState; box defaults to the cubic (N/rho)^(1/d) box
    (reference: src/atoms.jl:45, src/molecules.jl:83). `species` may be 1-based
    (as in config files) — it is normalised to 0-based int32 internally when
    its minimum is 1. Energy is left at 0; call energy.initialize_energy.
    """
    position = jnp.asarray(position, dtype)
    n, d = position.shape
    species = np.asarray(species)
    if species.min() >= 1:
        species = species - 1
    species = jnp.asarray(species, jnp.int32)
    if box is None:
        L = float((n / density) ** (1.0 / d))
        box = jnp.full((d,), L, dtype)
    else:
        box = jnp.asarray(box, dtype)

    mol = None
    bnd = None
    if molecule is not None:
        mol = np.asarray(molecule)
        if mol.min() >= 1:
            mol = mol - 1
        mol = jnp.asarray(mol, jnp.int32)
    if bonds is not None:
        bnd = pad_bonds(bonds, n)

    return SystemState(
        position=position,
        species=species,
        box=box,
        temperature=jnp.asarray(temperature, dtype),
        density=jnp.asarray(density, dtype),
        energy=jnp.asarray(0.0, dtype),
        molecule=mol,
        bonds=bnd,
    )


def pad_bonds(bonds, n: int) -> jax.Array:
    """Convert per-particle bond lists (0-based partner ids) to a padded
    [N, B] int32 array with -1 fill. Accepts a list of lists or an ndarray."""
    if isinstance(bonds, (jnp.ndarray, np.ndarray)) and getattr(bonds, "ndim", 0) == 2:
        return jnp.asarray(bonds, jnp.int32)
    maxb = max((len(b) for b in bonds), default=0)
    maxb = max(maxb, 1)
    out = np.full((n, maxb), -1, np.int32)
    for i, bl in enumerate(bonds):
        out[i, : len(bl)] = sorted(bl)
    return jnp.asarray(out)


def bonds_from_pairs(pairs, n: int):
    """Build per-particle bond lists from (i, j) pairs (0-based).

    Mirrors the reference's adjacency construction (src/IO/IO.jl:108-125)."""
    adj = [[] for _ in range(n)]
    for i, j in pairs:
        adj[int(i)].append(int(j))
        adj[int(j)].append(int(i))
    return adj


def mol_table(molecule: np.ndarray):
    """(start, length) per molecule for consecutive-run molecule ids
    (reference src/molecules.jl:112-139). Returns numpy int arrays."""
    molecule = np.asarray(molecule)
    change = np.flatnonzero(np.diff(molecule)) + 1
    starts = np.concatenate([[0], change])
    lengths = np.diff(np.concatenate([starts, [len(molecule)]]))
    return starts.astype(np.int32), lengths.astype(np.int32)


def fold_positions(state: SystemState) -> SystemState:
    """Fold all positions into the primary box (reference src/IO/IO.jl:284)."""
    return state.replace(position=geometry.fold_back(state.position, state.box))
