"""Fixed-shape bucketed cell list — the TPU neighbour structure.

The reference offers EmptyList / CellList / LinkedList / VerletList behind one
protocol (reference: src/neighbours.jl). Linked lists and per-particle Verlet
vectors are scatter-hostile on TPU; the rebuild keeps two modes:

- dense: candidates = arange(N) (the EmptyList O(N) oracle, src/neighbours.jl:17-44)
- cell:  a bucketed grid `bucket[ncells, cap]` (-1 padded) + `count[ncells]`
  + `cell_of[N]`, built by sort-and-scatter and maintained *incrementally* by
  O(cap) bucket-row surgery on accepted moves — the functional analogue of the
  reference LinkedList's O(1) head/list splice (src/neighbours.jl:297-312).
  Incremental updates are pure gather/scatter on fixed shapes, so they vmap
  over chains with zero divergence (no data-dependent rebuilds inside jit).

Queries gather the 3^d neighbouring cell buckets around the *query position*
(buckets always exact: every particle is binned by its current folded
position), giving a fixed-size [3^d * cap] candidate vector for the masked
energy reduction in core/energy.py.
"""

from __future__ import annotations

import itertools
import math
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from .geometry import fold_back


class CellSpec(NamedTuple):
    """Static grid geometry (baked into the jitted kernels)."""

    ncells: Tuple[int, ...]  # cells per dimension, each >= 3
    cap: int  # bucket capacity

    @property
    def total(self) -> int:
        return int(np.prod(self.ncells))

    @property
    def n_neighbour_cells(self) -> int:
        return 3 ** len(self.ncells)


@struct.dataclass
class CellList:
    bucket: jax.Array  # [ncells_total, cap] int32, -1 padded
    count: jax.Array  # [ncells_total] int32
    cell_of: jax.Array  # [N] int32
    overflow: jax.Array  # bool scalar — sticky capacity-exceeded flag


def make_spec(box, rcut: float, n: int, cap: Optional[int] = None) -> Optional[CellSpec]:
    """Choose the grid for a host-side box. Returns None when a cell grid
    cannot beat O(N) (fewer than 3 cells in some dimension — mirrors the
    auto-list heuristic fallback, reference src/IO/IO.jl:308-310)."""
    box = np.asarray(box, np.float64)
    ncells = tuple(int(x) for x in np.floor(box / rcut))
    if min(ncells) < 3:
        return None
    if cap is None:
        mean_occ = n / float(np.prod(ncells))
        cap = max(8, int(math.ceil(mean_occ * 3.0)))
    return CellSpec(ncells=ncells, cap=int(cap))


def _cell_vec(x, box, spec: CellSpec):
    """Per-dimension cell coordinates of position(s) x (folded into the box)."""
    nc = jnp.asarray(spec.ncells, jnp.int32)
    xf = fold_back(x, box)
    c = jnp.floor(xf / box * nc.astype(x.dtype)).astype(jnp.int32)
    return jnp.clip(c, 0, nc - 1)


def _ravel(cvec, spec: CellSpec):
    nc = spec.ncells
    c = cvec[..., 0]
    for k in range(1, len(nc)):
        c = c * nc[k] + cvec[..., k]
    return c


def cell_index(x, box, spec: CellSpec):
    """Scalar cell id(s) for position(s) x (reference src/neighbours.jl:79-88)."""
    return _ravel(_cell_vec(x, box, spec), spec)


def build_cell_list(position, box, spec: CellSpec) -> CellList:
    """Full rebuild by stable sort + scatter (reference build loop
    src/neighbours.jl:138-163, re-expressed as fixed-shape array ops)."""
    n = position.shape[0]
    cell = cell_index(position, box, spec)
    order = jnp.argsort(cell, stable=True).astype(jnp.int32)
    sorted_cell = cell[order]
    first = jnp.searchsorted(sorted_cell, sorted_cell, side="left")
    rank = jnp.arange(n, dtype=jnp.int32) - first.astype(jnp.int32)

    bucket = jnp.full((spec.total, spec.cap), -1, jnp.int32)
    bucket = bucket.at[sorted_cell, rank].set(order, mode="drop")
    count = jnp.zeros((spec.total,), jnp.int32).at[cell].add(1)
    overflow = jnp.any(count > spec.cap)
    count = jnp.minimum(count, spec.cap)
    return CellList(bucket=bucket, count=count, cell_of=cell, overflow=overflow)


_OFFSETS_CACHE = {}


def _offsets(d: int):
    # Cache as numpy (never jnp): a jnp constant materialised during a jit
    # trace is a tracer, and caching it across traces leaks it.
    if d not in _OFFSETS_CACHE:
        _OFFSETS_CACHE[d] = np.asarray(
            list(itertools.product((-1, 0, 1), repeat=d)), np.int32
        )
    return jnp.asarray(_OFFSETS_CACHE[d])


def neighbour_cells_of(x, box, spec: CellSpec):
    """Ravelled ids of the 3^d cells around position x (the precomputed
    neighbour-cell table of reference src/neighbours.jl:94-111, computed on
    the fly — cheaper than a [ncells, 3^d] gather table on TPU)."""
    d = x.shape[-1]
    c = _cell_vec(x, box, spec)  # [d]
    nc = jnp.asarray(spec.ncells, jnp.int32)
    neigh = (c[None, :] + _offsets(d)) % nc[None, :]  # [3^d, d]
    return _ravel(neigh, spec)


def candidates_around(x, box, clist: CellList, spec: CellSpec):
    """Fixed-size candidate ids ([3^d * cap], -1 padded) near position x."""
    cells = neighbour_cells_of(x, box, spec)
    return clist.bucket[cells].reshape(-1)


def move_particle(clist: CellList, i, new_cell) -> CellList:
    """O(cap) incremental bucket surgery after particle i moved cells.

    Remove i from its old bucket (swap-with-last), append to the new bucket.
    A no-op (returns identical arrays) when the cell didn't change. Fully
    vectorised and branch-free — safe under vmap. Capacity overflow sets the
    sticky `overflow` flag and drops the insert (detected host-side).
    """
    old_cell = clist.cell_of[i]
    changed = old_cell != new_cell

    # Remove from old row: overwrite i's slot with the last occupant.
    row_o = clist.bucket[old_cell]
    cnt_o = clist.count[old_cell]
    pos = jnp.argmax(row_o == i).astype(jnp.int32)
    last = cnt_o - 1
    row_o_new = row_o.at[pos].set(row_o[last]).at[last].set(-1)

    # Insert into new row at count (rows are disjoint when changed=True).
    row_n = clist.bucket[new_cell]
    cnt_n = clist.count[new_cell]
    would_overflow = cnt_n >= clist.bucket.shape[1]
    row_n_new = row_n.at[cnt_n].set(i, mode="drop")

    bucket = clist.bucket.at[old_cell].set(jnp.where(changed, row_o_new, row_o))
    bucket = bucket.at[new_cell].set(
        jnp.where(changed, jnp.where(would_overflow, row_n, row_n_new), bucket[new_cell])
    )
    delta = jnp.where(changed, 1, 0).astype(jnp.int32)
    count = clist.count.at[old_cell].add(-delta)
    count = count.at[new_cell].add(jnp.where(would_overflow, 0, delta))
    cell_of = clist.cell_of.at[i].set(new_cell)
    overflow = clist.overflow | (changed & would_overflow)
    return CellList(bucket=bucket, count=count, cell_of=cell_of, overflow=overflow)
