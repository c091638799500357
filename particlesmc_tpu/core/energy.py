"""Per-particle and total energy kernels.

The reference's hot path is `compute_energy_particle` — a serial loop over
neighbour-list entries (reference: src/atoms.jl:66-88, src/molecules.jl:206-215).
Here it is one vectorised masked gather-reduce over a fixed-size candidate set:
the candidates are either `arange(N)` (the EmptyList O(N) oracle,
reference src/neighbours.jl:17-44) or a cell-list gather (core/neighbours.py).
One code path serves atomic and molecular systems (bond exclusion + explicit
bonded sum), and a functional `Override` stands in for the reference's
mutate-then-recompute: proposal energies are evaluated *as if* particle i had
moved / species had swapped, without touching state.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..models.potentials import bond_potential, bond_virial, pair_potential, pair_virial
from ..models.tables import PairTable, gather_pair
from .geometry import dist2


class Override(NamedTuple):
    """Virtual single-move edit applied during energy evaluation.

    i: particle whose position is replaced by pos_i and species by sp_i
    j: particle whose species is replaced by sp_j (j == i for displacement)
    Set i = j = -1 for no override (candidate padding uses -1 too, but padded
    lanes are masked out before the override can matter — see below).
    """

    i: jax.Array
    j: jax.Array
    pos_i: jax.Array
    sp_i: jax.Array
    sp_j: jax.Array


def no_override(d: int, dtype) -> Override:
    i = jnp.asarray(-1, jnp.int32)
    return Override(i, i, jnp.zeros((d,), dtype), jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32))


def _effective(idx, position, species, ov: Override):
    """Position/species of particles `idx` with the override applied."""
    x = position[idx]
    s = species[idx]
    hit_i = idx == ov.i
    x = jnp.where(hit_i[..., None], ov.pos_i, x)
    s = jnp.where(hit_i, ov.sp_i, s)
    s = jnp.where(idx == ov.j, ov.sp_j, s)
    return x, s


def particle_energy(
    k,
    cands,
    position,
    species,
    box,
    table: PairTable,
    bonds: Optional[jax.Array] = None,
    ov: Optional[Override] = None,
):
    """Energy of particle k against candidate indices `cands` ([M], -1 padded).

    Matches reference semantics: non-bonded pair potential with cutoff over
    candidates excluding self and bonded partners (src/atoms.jl:66-88,
    src/molecules.jl:206-215), plus the explicit bonded sum over bonds[k]
    (src/molecules.jl:173-179). Inf propagates (overlap / overstretched FENE)
    so the Metropolis step can reject, mirroring src/moves.jl:13-15.
    """
    if ov is None:
        ov = no_override(position.shape[-1], position.dtype)

    xk, sk = _effective(k, position, species, ov)

    # Padded lanes (cands == -1) would spuriously match ov.i == -1 when no
    # override is active; they are masked by `valid` below, and when an
    # override IS active ov.i >= 0 so no collision occurs.
    xc, sc = _effective(cands, position, species, ov)
    valid = (cands >= 0) & (cands != k)

    if bonds is not None:
        bonds_k = bonds[k]  # [B], -1 padded
        is_bonded = jnp.any(cands[:, None] == bonds_k[None, :], axis=-1)
        valid = valid & ~is_bonded

    r2 = dist2(xc, xk, box)
    p = gather_pair(table, sk, sc)
    u = pair_potential(r2, p)
    e = jnp.sum(jnp.where(valid, u, jnp.zeros_like(u)))

    if bonds is not None:
        bk = bonds[k]
        bvalid = bk >= 0
        xb, sb = _effective(jnp.where(bvalid, bk, 0), position, species, ov)
        r2b = dist2(xb, xk, box)
        pb = gather_pair(table, sk, sb)
        ub = bond_potential(r2b, pb)
        e = e + jnp.sum(jnp.where(bvalid, ub, jnp.zeros_like(ub)))

    return e


def particle_energy_dense(k, position, species, box, table, bonds=None, ov=None):
    """O(N) all-pairs particle energy — the EmptyList differential oracle."""
    n = position.shape[-2]
    cands = jnp.arange(n, dtype=jnp.int32)
    return particle_energy(k, cands, position, species, box, table, bonds, ov)


# ---------------------------------------------------------------------------
# Gather-free dense path (the TPU fast path)
# ---------------------------------------------------------------------------
#
# XLA-TPU lowers a vector-index gather (position[cands] with ~10^3 random
# indices) to a serial per-index loop — measured ~3 ms per ΔE at N=512.
# Contiguous vector math over ALL N particles costs ~30N VPU lanes (~1 us at
# N=10k), so up to very large N the TPU-native move kernel is *dense*: no
# candidate indices, no gathers — `where`-masked arithmetic against the full
# position/species arrays. The candidate/cell machinery remains for the
# huge-N regime and as the reference-semantics parity path.


class PairParams(NamedTuple):
    """The pair_potential parameter fields, broadcast to candidate shape."""

    kind: jax.Array
    eps4: jax.Array
    sigma2: jax.Array
    ipl_n: jax.Array
    rcut2: jax.Array
    shift: jax.Array
    c0: jax.Array
    c2s2: jax.Array
    c4s4: jax.Array


def select_pair_params(table: PairTable, sk, species) -> PairParams:
    """Per-pair parameters for (sk, species[j]) without index gathers.

    sk is a traced scalar; `species` any-shaped int array. Each [S, S] table
    field is row-sliced at sk, then the column is chosen by a one-hot
    `where`-chain over the (small, static) species count — pure vector
    selects, never a gather.
    """
    s_count = table.n_species

    def sel(a):
        row = jax.lax.dynamic_index_in_dim(a, sk, axis=0, keepdims=False)
        acc = jnp.full(species.shape, row[0], a.dtype)
        for s in range(1, s_count):
            acc = jnp.where(species == s, row[s], acc)
        return acc

    return PairParams(*(sel(getattr(table, f)) for f in PairParams._fields))


def particle_energy_nogather(
    k,
    position,
    species,
    box,
    table: PairTable,
    bonds: Optional[jax.Array] = None,
    ov: Optional[Override] = None,
):
    """Energy of particle k against all N particles — zero index gathers.

    Semantics identical to particle_energy(k, arange(N), ...) (reference
    src/atoms.jl:81-88): non-bonded sum excluding self and bonded partners,
    plus the explicit bonded sum (src/molecules.jl:206-215). The override is
    applied with iota-compare `where`s on the full arrays.
    """
    n = position.shape[-2]
    iota = jnp.arange(n, dtype=jnp.int32)

    if ov is None:
        pos_eff, sp_eff = position, species
    else:
        hit_i = iota == ov.i
        pos_eff = jnp.where(hit_i[:, None], ov.pos_i[None, :], position)
        sp_eff = jnp.where(hit_i, ov.sp_i, jnp.where(iota == ov.j, ov.sp_j, species))

    xk = jax.lax.dynamic_index_in_dim(pos_eff, k, axis=0, keepdims=False)
    sk = jax.lax.dynamic_index_in_dim(sp_eff, k, axis=0, keepdims=False)

    valid = iota != k
    if bonds is not None:
        bonds_k = jax.lax.dynamic_index_in_dim(bonds, k, axis=0, keepdims=False)
        valid = valid & ~jnp.any(iota[:, None] == bonds_k[None, :], axis=-1)

    r2 = dist2(pos_eff, xk, box)
    p = select_pair_params(table, sk, sp_eff)
    u = pair_potential(r2, p)
    e = jnp.sum(jnp.where(valid, u, jnp.zeros_like(u)))

    if bonds is not None:
        # Bonded partners: B is tiny, so the [B]-index gather is cheap.
        bvalid = bonds_k >= 0
        bk = jnp.where(bvalid, bonds_k, 0)
        xb, sb = _effective(bk, position, species, ov if ov is not None else no_override(position.shape[-1], position.dtype))
        r2b = dist2(xb, xk, box)
        pb = gather_pair(table, sk, sb)
        ub = bond_potential(r2b, pb)
        e = e + jnp.sum(jnp.where(bvalid, ub, jnp.zeros_like(ub)))

    return e


def total_energy_dense(position, species, box, table, bonds=None, batch_size: int = 256):
    """Total energy = sum_i E_i / 2 (reference src/atoms.jl:51-52).

    Chunked over particles to bound the [chunk, N] pair buffers.
    """
    n = position.shape[-2]

    def one(k):
        return particle_energy_nogather(k, position, species, box, table, bonds)

    e = jax.lax.map(one, jnp.arange(n, dtype=jnp.int32), batch_size=min(batch_size, n))
    return jnp.sum(e) / 2


def per_particle_energies(position, species, box, table, bonds=None, cand_fn=None):
    """Vector of all per-particle energies (used by the EnergyBias policy,
    reference src/moves.jl:254-280). `cand_fn(k) -> cands` defaults to the
    gather-free dense path."""
    n = position.shape[-2]
    if cand_fn is None:
        def one(k):
            return particle_energy_nogather(k, position, species, box, table, bonds)
    else:
        def one(k):
            return particle_energy(k, cand_fn(k), position, species, box, table, bonds)

    return jax.vmap(one)(jnp.arange(n, dtype=jnp.int32))


def particle_virial_nogather(k, position, species, box, table: PairTable, bonds=None):
    """Virial contribution of particle k: sum_j w(r_kj) (gather-free dense)."""
    n = position.shape[-2]
    iota = jnp.arange(n, dtype=jnp.int32)
    xk = jax.lax.dynamic_index_in_dim(position, k, axis=0, keepdims=False)
    sk = jax.lax.dynamic_index_in_dim(species, k, axis=0, keepdims=False)
    valid = iota != k
    if bonds is not None:
        bonds_k = jax.lax.dynamic_index_in_dim(bonds, k, axis=0, keepdims=False)
        valid = valid & ~jnp.any(iota[:, None] == bonds_k[None, :], axis=-1)
    r2 = dist2(position, xk, box)
    p = select_pair_params(table, sk, species)
    w = pair_virial(r2, p)
    out = jnp.sum(jnp.where(valid, w, jnp.zeros_like(w)))
    if bonds is not None:
        bvalid = bonds_k >= 0
        bk = jnp.where(bvalid, bonds_k, 0)
        r2b = dist2(position[bk], xk, box)
        pb = gather_pair(table, sk, species[bk])
        wb = bond_virial(r2b, pb)
        out = out + jnp.sum(jnp.where(bvalid, wb, jnp.zeros_like(wb)))
    return out


def total_virial_dense(position, species, box, table, bonds=None, batch_size: int = 256):
    """W = sum_{i<j} w_ij computed as sum_k W_k / 2 (dense, chunked)."""
    n = position.shape[-2]

    def one(k):
        return particle_virial_nogather(k, position, species, box, table, bonds)

    w = jax.lax.map(one, jnp.arange(n, dtype=jnp.int32), batch_size=min(batch_size, n))
    return jnp.sum(w) / 2


def pressure(position, species, box, table, density, temperature, bonds=None):
    """Virial pressure P = rho T + W / (d V)."""
    d = position.shape[-1]
    vol = jnp.prod(box)
    w = total_virial_dense(position, species, box, table, bonds)
    return density * temperature + w / (d * vol)


def initialize_energy(state, table: PairTable, check: bool = True, energy_dtype=None):
    """Compute and store the initial total energy; reject Inf/NaN initial
    configurations like the reference constructor (src/atoms.jl:51-56).

    `energy_dtype` upcasts the stored accumulator (mixed precision: f32
    positions with an f64 incremental-energy ledger — at |E| ~ 3e4 an f32
    accumulator rounds each booked ΔE at ~2e-3, a random-walk drift that
    corrupts long energy averages; the kernels preserve the accumulator
    dtype through JAX type promotion)."""
    e = total_energy_dense(state.position, state.species, state.box, table, state.bonds)
    if energy_dtype is not None:
        e = e.astype(energy_dtype)
    if check:
        ev = float(e)
        if not (ev == ev) or ev in (float("inf"), float("-inf")):
            raise ValueError("Initial configuration has infinite or NaN energy.")
    return state.replace(energy=e)
