"""Checkerboard hyper-sweep — the massively-parallel TPU Metropolis kernel.

The sequential sweep kernel (moves/kernel.py) is bound by per-scan-iteration
dispatch cost (~100 us/step on TPU), so at N=10k a sweep of N serial steps
cannot beat the reference no matter how cheap each ΔE is. This kernel is the
TPU-native inversion: **domain-decomposition Monte Carlo** (the scheme used
by GPU hard-particle MC codes), proposing ~A independent moves per substep.

Scheme (valid MCMC for the Boltzmann target):

- Bin particles into a grid of cells of side >= rcut (even count per dim),
  with a random origin shift redrawn at the start of every rebin block.
- A substep activates one of 2^d checkerboard colors; the active cells of a
  color form a stride-2 sublattice, so any two active cells are separated by
  at least one cell (>= rcut): moves of one particle per active cell are
  exactly independent — each sees the true pre-substep configuration.
- One particle is picked uniformly per occupied active cell; a Gaussian
  displacement is proposed; proposals that would LEAVE the particle's cell
  are rejected outright. In-cell truncation keeps the proposal symmetric and
  the binning static for the whole block (selection probabilities are
  therefore symmetric and detailed balance holds per substep). Ergodicity
  across cell boundaries is restored by the per-block random grid shift —
  the standard resolution in checkerboard MC.
- Colors cycle in a FIXED order (itertools.product over parity bits). A
  fixed scan order drops detailed balance for the composed sweep but keeps
  π-invariance (each color substep is a valid Metropolis kernel), exactly
  like sequential-scan Gibbs; it buys fully static slicing — no traced
  indices anywhere, which is what TPUs need (a traced color turns the
  neighbour-block extraction into a batched gather, measured 400x slower).

TPU-native layout (this is where the speed comes from):

- Struct-of-planes payload `[d+1, ncells..., cap]` (x, y, z, species) —
  never an `[..., d+2]` trailing axis, which Mosaic/XLA would tile to
  (sublane=8, lane=128) and inflate ~25x in HBM traffic.
- The scan carries a wrap-PADDED plane grid; each color substep updates the
  active sublattice in place with static strided slices and refreshes one
  halo face per dimension (sequential face copies propagate corners).
- Global positions are NOT touched inside the scan: the payload is the
  canonical state, and positions are reconstructed once per call with a
  single scatter through `idx` (particles cannot change cells between
  rebins, so `idx` is constant for the whole block).
- A call runs `sweeps` hyper-sweeps per rebin: the O(N log N) argsort
  binning (the single most expensive op at N=10k) is amortised over
  `sweeps * N` attempted moves.

One "sweep" is accounted as ~N attempted moves, matching the reference
convention (sweepstep = N, reference src/ParticlesMC.jl:246), i.e.
rounds of 2^d color substeps with A*inner proposals each.

Reference parity note: this kernel has no counterpart in the reference (its
only parallelism is threads over chains, src/ParticlesMC.jl:246); it samples
the same NVT ensemble through a different — massively parallel — proposal
distribution, and is validated against the dense oracle (exact incremental
energy bookkeeping) and statistically against the sequential kernel
(tests/test_checkerboard.py).
"""

from __future__ import annotations

import dataclasses
import itertools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..core.geometry import fold_back
from ..core.state import SystemState
from ..models.potentials import (
    bond_potential,
    pair_fields_needed,
    pair_potential,
    pair_virial,
)
from ..models.tables import PairTable, kinds_present


@dataclasses.dataclass(frozen=True)
class CBSpec:
    """Static checkerboard grid geometry."""

    ncells: Tuple[int, ...]  # per dim, even, >= 4
    cap: int  # bucket capacity

    @property
    def d(self) -> int:
        return len(self.ncells)

    @property
    def total(self) -> int:
        return int(np.prod(self.ncells))

    @property
    def active_dims(self) -> Tuple[int, ...]:
        return tuple(n // 2 for n in self.ncells)

    @property
    def n_active(self) -> int:
        return int(np.prod(self.active_dims))


def auto_trim_k(
    spec: CBSpec, box, rcut: float, n: int, nsigma: float = 7.0,
) -> Optional[int]:
    """Lane capacity for the per-substep candidate compaction (`trim_k`).

    A lane of the 26 static neighbour blocks can interact with a mover —
    which stays inside the active cell for the whole substep — only if its
    distance to the active cell's CUBE is <= rcut, i.e. it lies in the
    cell cube dilated by rcut. The mean count in that region is
    density * (V_dilated - V_cell); `nsigma` Poisson standard deviations of
    headroom are added (a liquid's density fluctuations are sub-Poissonian,
    so this is conservative) and the result is rounded up to the TPU's
    128-lane tile. Returns None when compaction cannot beat the uncompacted
    26*cap lane count (small grids)."""
    box = np.asarray(box, np.float64)
    side = box / np.asarray(spec.ncells, np.float64)
    v_cell = float(np.prod(side))
    d = spec.d
    if d == 2:
        s1, s2 = side
        v_dil = s1 * s2 + 2.0 * rcut * (s1 + s2) + math.pi * rcut**2
    elif d == 3:
        s1, s2, s3 = side
        v_dil = (
            s1 * s2 * s3
            + 2.0 * rcut * (s1 * s2 + s1 * s3 + s2 * s3)
            + math.pi * rcut**2 * (s1 + s2 + s3)
            + 4.0 / 3.0 * math.pi * rcut**3
        )
    else:
        return None
    density = n / float(np.prod(box))
    mean = density * (v_dil - v_cell)
    k = int(mean + nsigma * math.sqrt(max(mean, 1.0)) + 0.5)
    k = max(128, -(-k // 128) * 128)
    if k >= (3**d - 1) * spec.cap:
        return None
    return k


def make_cb_spec(
    box, rcut: float, n: int, cap: Optional[int] = None,
    occ_factor: float = 2.5,
) -> Optional[CBSpec]:
    """Even-count grid with cell side >= rcut; None if the box is too small
    (fewer than 4 cells in some dimension — use the sequential kernel).
    `occ_factor` scales the default bucket capacity over the mean occupancy;
    molecular systems should use ~4 (bonded clusters pack whole molecules
    into single cells, so local occupancy fluctuates harder than an atomic
    liquid's). For molecular systems pass rcut = tables.interaction_range."""
    box = np.asarray(box, np.float64)
    nc = np.floor(box / rcut).astype(int)
    nc = nc - (nc % 2)  # even per dim
    if nc.min() < 4:
        return None
    if cap is None:
        mean_occ = n / float(np.prod(nc))
        cap = max(4, int(math.ceil(mean_occ * occ_factor)))
    return CBSpec(ncells=tuple(int(x) for x in nc), cap=int(cap))


@struct.dataclass
class CBState:
    """Sampler state for one chain under the checkerboard kernel."""

    system: SystemState
    key: jax.Array
    shift: jax.Array  # [d] grid origin offset
    planes: jax.Array  # [NP, nc_total, cap]: x..z planes (SHIFTED frame) +
    # species (+ id / bond-partner / molecule-layout planes when molecular)
    idx: jax.Array  # [nc_total, cap] i32 particle ids, -1 padded
    slot: jax.Array  # [n] i32 flat payload slot of each particle
    attempted: jax.Array  # [n_moves] per-move attempt counters
    accepted: jax.Array  # [n_moves]
    overflow: jax.Array  # sticky bool: some block was SKIPPED (see `skipped`)
    skipped: jax.Array  # count of skipped rebin blocks (overflowing shifts)


# ---------------------------------------------------------------------------
# Binning
#
# Payload positions are stored in the SHIFTED frame x' = fold(x - shift):
# cell c then spans the contiguous interval [c*L/nc, (c+1)*L/nc) per dim,
# no cell ever straddles the box boundary, and — together with the
# image-corrected halos (pad faces carry x' -/+ L) — every in-substep
# distance is a PLAIN coordinate difference: no minimum-image round/divide
# in the hot loop at all (|dx| <= 2 cells <= box/2 guarantees exactness).
# ---------------------------------------------------------------------------


def _cell_vec(x, shift, box, spec: CBSpec):
    nc = jnp.asarray(spec.ncells, jnp.int32)
    xf = fold_back(x - shift, box)
    c = jnp.floor(xf / box * nc.astype(x.dtype)).astype(jnp.int32)
    return jnp.clip(c, 0, nc - 1)


def _mol_columns(system: SystemState):
    """Per-particle molecular payload columns (as floats, -1 padded):
    particle id, B bond-partner ids, molecule start id, molecule length.

    These ride along in the plane payload so that the hyper-sweep can do all
    bond bookkeeping by ID-MATCHING inside the already-extracted 3^d
    neighbour blocks — a bonded partner is always within one interaction
    range (<= cell side, tables.interaction_range) of its mate, hence inside
    the block; no global index gathers (which serialise on TPU) are needed.
    Molecule ids are consecutive runs (reference src/molecules.jl:112-139),
    so start/length per particle come from run-boundary cummax/cummin.
    Ids are exact in f32 up to 2^24 particles."""
    if system.bonds is None:
        return []
    n = system.position.shape[0]
    dt = system.position.dtype
    iota = jnp.arange(n, dtype=jnp.int32)
    cols = [iota.astype(dt)]
    for b in range(system.bonds.shape[1]):
        cols.append(system.bonds[:, b].astype(dt))
    mol = system.molecule
    diff = mol[1:] != mol[:-1]
    one = jnp.ones((1,), bool)
    start_pp = jax.lax.cummax(
        jnp.where(jnp.concatenate([one, diff]), iota, 0)
    )
    end_pp = jax.lax.cummin(
        jnp.where(jnp.concatenate([diff, one]), iota, n - 1), reverse=True
    )
    cols.append(start_pp.astype(dt))
    cols.append((end_pp - start_pp + 1).astype(dt))
    return cols


def rebin(system: SystemState, spec: CBSpec, shift):
    """Sort-carried binning: [NP, total, cap] planes — d shifted position
    planes + species (+ id, B bond-partner ids, mol start, mol length for
    molecular systems, see _mol_columns).

    One stable multi-operand `lax.sort` carries every payload column with
    the cell key, so the padded planes are then built by a MONOTONE-index
    gather from the sorted arrays. The previous form gathered the unsorted
    columns through the argsort permutation (random indices) — measured
    ~600x slower on TPU v5e (random-index gathers serialise; monotone ones
    and 1-D scatters do not)."""
    n, d = system.position.shape
    dt = system.position.dtype
    box = system.box
    xs = fold_back(system.position - shift, box)  # shifted frame
    nc = jnp.asarray(spec.ncells, jnp.int32)
    cvec = jnp.clip(
        jnp.floor(xs / box * nc.astype(dt)).astype(jnp.int32), 0, nc - 1
    )
    cell = cvec[..., 0]
    for k in range(1, spec.d):
        cell = cell * spec.ncells[k] + cvec[..., k]
    iota_n = jnp.arange(n, dtype=jnp.int32)
    mol_cols = _mol_columns(system)
    comps = [xs[:, j] for j in range(d)] + [system.species.astype(dt)] + mol_cols
    sorted_ops = jax.lax.sort(
        tuple([cell] + comps + [iota_n]), dimension=-1, num_keys=1, is_stable=True
    )
    sorted_cell = sorted_ops[0]
    sorted_comps = sorted_ops[1:-1]
    sorted_ids = sorted_ops[-1]
    cells_iota = jnp.arange(spec.total, dtype=jnp.int32)
    first = jnp.searchsorted(sorted_cell, cells_iota, side="left").astype(jnp.int32)
    nxt = jnp.searchsorted(sorted_cell, cells_iota, side="right").astype(jnp.int32)

    p = first[:, None] + jnp.arange(spec.cap, dtype=jnp.int32)[None, :]
    valid = p < nxt[:, None]
    pc = jnp.minimum(p, n - 1).reshape(-1)
    fills = [jnp.asarray(0.0, dt)] * d + [jnp.asarray(-1.0, dt)] * (
        1 + len(mol_cols)
    )
    planes = jnp.stack(
        [
            jnp.where(valid, jnp.take(sj, pc).reshape(spec.total, spec.cap), f)
            for sj, f in zip(sorted_comps, fills)
        ]
    )
    idx = jnp.where(
        valid, jnp.take(sorted_ids, pc).reshape(spec.total, spec.cap), -1
    )
    # particle -> flat payload slot: rank within the cell from run starts
    # (cummax over boundaries — no random-index gather), then one 1-D
    # scatter back to particle order
    one = jnp.ones((1,), bool)
    boundary = jnp.concatenate([one, sorted_cell[1:] != sorted_cell[:-1]])
    start_pos = jax.lax.cummax(jnp.where(boundary, iota_n, 0))
    rank_sorted = iota_n - start_pos
    slot_sorted = sorted_cell * spec.cap + jnp.minimum(rank_sorted, spec.cap - 1)
    slot = jnp.zeros((n,), jnp.int32).at[sorted_ids].set(slot_sorted)
    overflow = jnp.any(nxt - first > spec.cap)
    return planes, idx, slot, overflow


def unbin_positions(planes, idx, n: int, shift, box):
    """Scatter payload positions back into a global [N, d] array (the
    gather-by-slot form serialises on TPU; a 1-D scatter through `idx` does
    not). The first d planes are positions regardless of any trailing
    molecular planes."""
    d = box.shape[-1]
    flat_idx = idx.reshape(-1)
    tgt = jnp.where(flat_idx >= 0, flat_idx, n)  # padding rows dropped
    cols = [
        jnp.zeros((n,), planes.dtype)
        .at[tgt]
        .set(planes[j].reshape(-1), mode="drop")
        + shift[j]
        for j in range(d)
    ]
    x = jnp.stack(cols, axis=-1)
    return fold_back(x, box)


def init_cb_state(system: SystemState, spec: CBSpec, seed, n_moves: int = 1) -> CBState:
    key = jax.random.PRNGKey(seed) if jnp.ndim(seed) == 0 else seed
    d = system.position.shape[-1]
    shift = jnp.zeros((d,), system.position.dtype)
    planes, idx, slot, overflow = rebin(system, spec, shift)
    cdt = jnp.int64 if jax.config.jax_enable_x64 else jnp.int32
    return CBState(
        system=system,
        key=key,
        shift=shift,
        planes=planes,
        idx=idx,
        slot=slot,
        attempted=jnp.zeros((n_moves,), cdt),
        accepted=jnp.zeros((n_moves,), cdt),
        overflow=overflow,
        skipped=jnp.zeros((), cdt),
    )


# ---------------------------------------------------------------------------
# Pair-parameter selection without gathers (small static species count)
# ---------------------------------------------------------------------------

_PAIR_FIELDS = ("kind", "eps4", "sigma2", "ipl_n", "rcut2", "shift", "c0", "c2s2", "c4s4")


class _P:
    """Attribute bundle matching pair_potential's / bond_potential's
    parameter protocol."""

    __slots__ = _PAIR_FIELDS + (
        "has_bond", "kr02", "r02", "eps4b", "sigma2b", "shiftb", "rcut2b"
    )

    def __init__(self, **kw):
        for k, v in kw.items():
            setattr(self, k, v)


def _pair_params(table: PairTable, sa, sb, fields=_PAIR_FIELDS):
    """table[sa, sb] per field via a static S x S where-chain (no gathers).
    `sa`/`sb` may be int or float species arrays (float compares exactly for
    small ids). `fields` prunes the chains to what the potential evaluation
    will touch (potentials.pair_fields_needed)."""
    s_count = table.n_species
    shape = jnp.broadcast_shapes(jnp.shape(sa), jnp.shape(sb))

    def sel(a):
        acc = jnp.full(shape, a[0, 0], a.dtype)
        for s1 in range(s_count):
            for s2 in range(s_count):
                if s1 == 0 and s2 == 0:
                    continue
                acc = jnp.where((sa == s1) & (sb == s2), a[s1, s2], acc)
        return acc

    return _P(**{f: sel(getattr(table, f)) for f in fields})


def _pair_params_rows(table: PairTable, sp_nb, fields):
    """Per-mover-species parameter bundles against a STATIC neighbour-species
    plane: rows[s].field == table.field[s, sp_nb]. The neighbour species of a
    checkerboard substep never change between inner sub-moves (displacement
    moves don't touch species), so hoisting this out of the inner loop removes
    the full S x S where-chain from the hot path; only the (S-1)-deep select
    on the mover's species (_select_row) remains per sub-move."""
    s_count = table.n_species
    rows = []
    for s1 in range(s_count):

        def sel(a, s1=s1):
            acc = jnp.full(jnp.shape(sp_nb), a[s1, 0], a.dtype)
            for s2 in range(1, s_count):
                acc = jnp.where(sp_nb == s2, a[s1, s2], acc)
            return acc

        rows.append(_P(**{f: sel(getattr(table, f)) for f in fields}))
    return rows


def _select_row(rows, sa, fields):
    """rows[sa] per field via an (S-1)-deep where chain on the mover species
    (`sa` may be float; small ids compare exactly)."""
    if len(rows) == 1:
        return rows[0]

    def sel(f):
        acc = getattr(rows[0], f)
        for s in range(1, len(rows)):
            acc = jnp.where(sa == s, getattr(rows[s], f), acc)
        return acc

    return _P(**{f: sel(f) for f in fields})


def _pair_params_static_row(table: PairTable, s_static: int, sp_nb, fields):
    """table.field[s_static, sp_nb] for a STATIC mover species against a
    (possibly live) neighbour-species plane — one (S-1)-where chain per field.
    Used by swap sub-moves, whose two mover species are compile-time ints."""
    s_count = table.n_species

    def sel(a):
        acc = jnp.full(jnp.shape(sp_nb), a[s_static, 0], a.dtype)
        for s2 in range(1, s_count):
            acc = jnp.where(sp_nb == s2, a[s_static, s2], acc)
        return acc

    return _P(**{f: sel(getattr(table, f)) for f in fields})


# ---------------------------------------------------------------------------
# Shared atomic sub-move bodies — used by this kernel AND parallel/spatial.py
# (one copy of the physics; the two kernels differ only in grid geometry and
# halo orchestration)
# ---------------------------------------------------------------------------


def _disp_submove_atomic(
    kp, pf, rows_c, rows_o, center_pos, center_sp, pos_o, valid_o,
    pick, delta, bounds_fn, occupied, log_ua, temperature,
):
    """One atomic displacement sub-move against extracted blocks.

    `pick` [A, cap] one-hot selects the mover per active cell; `delta` is the
    sigma-scaled Gaussian step (d x [A]); `bounds_fn(x_new) -> [A] bool`
    implements the in-cell auto-reject for the caller's geometry (local grid
    in the checkerboard kernel, global-x cell columns in parallel/spatial.py).
    Returns (center_pos', booked_energy_sum, accept [A])."""
    d = len(center_pos)
    dt = center_pos[0].dtype
    x_a = [
        jnp.sum(jnp.where(pick, center_pos[j], 0.0), axis=-1) for j in range(d)
    ]
    s_a = jnp.sum(jnp.where(pick, center_sp, 0.0), axis=-1)
    # positions are already in the shifted frame; NO clip — a clip would
    # silently extend edge cells past the box
    x_new = [x_a[j] + delta[j] for j in range(d)]
    in_cell = occupied & bounds_fn(x_new)
    de = jnp.zeros(x_a[0].shape, dt)
    for pos_nb, rows_nb, valid in (
        (center_pos, rows_c, (center_sp >= 0) & ~pick),
        (pos_o, rows_o, valid_o),
    ):
        p = _select_row(rows_nb, s_a[:, None], pf)
        r2o = jnp.zeros(valid.shape, dt)
        r2n = jnp.zeros(valid.shape, dt)
        for j in range(d):
            # plain differences: halos image-corrected
            dxo = pos_nb[j] - x_a[j][:, None]
            dxn = pos_nb[j] - x_new[j][:, None]
            r2o = r2o + dxo * dxo
            r2n = r2n + dxn * dxn
        du = pair_potential(r2n, p, kp) - pair_potential(r2o, p, kp)
        de = de + jnp.sum(jnp.where(valid, du, jnp.zeros_like(du)), axis=-1)
    accept = (log_ua < -de / temperature) & in_cell
    booked = jnp.where(accept & jnp.isfinite(de), de, jnp.zeros_like(de))
    moved = pick & accept[:, None]
    center_pos = [
        jnp.where(moved, x_new[j][:, None], center_pos[j]) for j in range(d)
    ]
    return center_pos, jnp.sum(booked), accept


def _disp_submove_smart(
    kp, pf, rows_c, rows_o, center_pos, center_sp, pos_o, valid_o,
    pick, xi, sigma, bounds_fn, occupied, log_ua, temperature,
    drift_clip_sigmas: float = 2.0,
):
    """One force-bias ("smart MC") displacement sub-move.

    Proposal: delta = D(x_old) + sigma * xi with drift
    D(x) = clamp(sigma^2 / (2 T) * F(x), +-drift_clip_sigmas * sigma) per
    component, F the force on the mover from every candidate lane
    (Rossky-Doll-Friedman 1978; the clamp bounds the drift at overlapping
    starts and is part of the proposal definition, so MH stays exact).
    Acceptance: log a = -dE/T + [|delta - D(x_old)|^2 - |delta + D(x_new)|^2]
    / (2 sigma^2) — the exact asymmetry correction with the reverse drift
    evaluated at the proposed position. The force costs one pair_virial per
    lane on passes the ΔE already makes, reusing the dx registers.

    In-cell truncation composes exactly as for the symmetric proposal: a
    proposed exit is a rejection; both q factors are the unconstrained
    Gaussians, so pi(x) q(x->y) a(x->y) stays symmetric on in-cell pairs.

    Returns (center_pos', booked_energy_sum, accept [A])."""
    d = len(center_pos)
    dt = center_pos[0].dtype
    tiny = jnp.asarray(1e-12, dt)
    x_a = [
        jnp.sum(jnp.where(pick, center_pos[j], 0.0), axis=-1) for j in range(d)
    ]
    s_a = jnp.sum(jnp.where(pick, center_sp, 0.0), axis=-1)
    groups = (
        (center_pos, rows_c, (center_sp >= 0) & ~pick),
        (pos_o, rows_o, valid_o),
    )

    def energy_and_force(x):
        e = jnp.zeros(x[0].shape, dt)
        f = [jnp.zeros(x[0].shape, dt) for _ in range(d)]
        for pos_nb, rows_nb, valid in groups:
            p = _select_row(rows_nb, s_a[:, None], pf)
            dx = []
            r2 = jnp.zeros(valid.shape, dt)
            for j in range(d):
                dj = pos_nb[j] - x[j][:, None]
                dx.append(dj)
                r2 = r2 + dj * dj
            u = pair_potential(r2, p, kp)
            w = pair_virial(r2, p, kp)
            g = -w / jnp.maximum(r2, tiny)  # F_j = g * dx_j
            e = e + jnp.sum(jnp.where(valid, u, jnp.zeros_like(u)), axis=-1)
            for j in range(d):
                f[j] = f[j] + jnp.sum(
                    jnp.where(valid, g * dx[j], jnp.zeros_like(r2)), axis=-1
                )
        return e, f

    sig2_2t = sigma * sigma / (2.0 * temperature)
    clip = drift_clip_sigmas * sigma

    def drift(f):
        return [jnp.clip(sig2_2t * f[j], -clip, clip) for j in range(d)]

    e_old, f_old = energy_and_force(x_a)
    d_old = drift(f_old)
    delta = [d_old[j] + sigma * xi[j] for j in range(d)]
    x_new = [x_a[j] + delta[j] for j in range(d)]
    in_cell = occupied & bounds_fn(x_new)
    e_new, f_new = energy_and_force(x_new)
    d_new = drift(f_new)
    de = e_new - e_old
    lq = jnp.zeros_like(de)
    for j in range(d):
        fwd = delta[j] - d_old[j]  # = sigma * xi_j
        rev = delta[j] + d_new[j]
        lq = lq + (fwd * fwd - rev * rev)
    log_alpha = -de / temperature + lq / (2.0 * sigma * sigma)
    log_alpha = jnp.where(
        jnp.isnan(log_alpha), jnp.asarray(-jnp.inf, dt), log_alpha
    )
    accept = (log_ua < log_alpha) & in_cell
    booked = jnp.where(accept & jnp.isfinite(de), de, jnp.zeros_like(de))
    moved = pick & accept[:, None]
    center_pos = [
        jnp.where(moved, x_new[j][:, None], center_pos[j]) for j in range(d)
    ]
    return center_pos, jnp.sum(booked), accept


def _swap_pair_de(
    table, kp, pf, s1, s2, center_pos, center_sp, pos_o, valid_o,
    p_o_1, p_o_2, pick_i, pick_j,
):
    """ΔE of swapping the species of the one-hot-picked pair (i: s1→s2 at
    x_i, j: s2→s1 at x_j). Both sums exclude i and j — the mutual pair term
    cancels exactly by table symmetry. Shared by the uniform and the
    energy-biased swap sub-moves. Returns (de [A], x_i, x_j)."""
    d = len(center_pos)
    dt = center_pos[0].dtype
    x_i = [
        jnp.sum(jnp.where(pick_i, center_pos[j], 0.0), axis=-1) for j in range(d)
    ]
    x_j = [
        jnp.sum(jnp.where(pick_j, center_pos[j], 0.0), axis=-1) for j in range(d)
    ]
    # params for the two STATIC mover species vs each neighbour plane; the
    # center plane is live under swaps
    center_sp_safe = jnp.maximum(center_sp, 0.0)
    p_c_1 = _pair_params_static_row(table, s1, center_sp_safe, pf)
    p_c_2 = _pair_params_static_row(table, s2, center_sp_safe, pf)

    de = jnp.zeros(x_i[0].shape, dt)
    for pos_nb, pA, pB, valid in (
        (center_pos, p_c_1, p_c_2, (center_sp >= 0) & ~pick_i & ~pick_j),
        (pos_o, p_o_1, p_o_2, valid_o),
    ):
        r2i = jnp.zeros(valid.shape, dt)
        r2j = jnp.zeros(valid.shape, dt)
        for j in range(d):
            dxi = pos_nb[j] - x_i[j][:, None]
            dxj = pos_nb[j] - x_j[j][:, None]
            r2i = r2i + dxi * dxi
            r2j = r2j + dxj * dxj
        du = (
            pair_potential(r2i, pB, kp)
            - pair_potential(r2i, pA, kp)
            + pair_potential(r2j, pA, kp)
            - pair_potential(r2j, pB, kp)
        )
        de = de + jnp.sum(jnp.where(valid, du, jnp.zeros_like(du)), axis=-1)
    return de, x_i, x_j


def _swap_submove_atomic(
    table, kp, pf, s1, s2, center_pos, center_sp, pos_o, valid_o,
    p_o_1, p_o_2, up, up2, log_ua, temperature,
):
    """One atomic in-cell DiscreteSwap sub-move (see build_hyper_sweep_fn
    docstring for the proposal-symmetry argument). Returns
    (center_sp', booked_energy_sum, accept [A])."""
    dt = center_pos[0].dtype
    s1f = jnp.asarray(float(s1), dt)
    s2f = jnp.asarray(float(s2), dt)
    memb1 = center_sp == s1f  # [A, cap]
    memb2 = center_sp == s2f
    n1 = jnp.sum(memb1.astype(jnp.int32), axis=-1)  # [A]
    n2 = jnp.sum(memb2.astype(jnp.int32), axis=-1)
    r1 = jnp.floor(up * n1.astype(dt)).astype(jnp.int32)
    r2s = jnp.floor(up2 * n2.astype(dt)).astype(jnp.int32)
    rank1 = jnp.cumsum(memb1.astype(jnp.int32), axis=-1) - 1
    rank2 = jnp.cumsum(memb2.astype(jnp.int32), axis=-1) - 1
    pick_i = memb1 & (rank1 == r1[:, None])  # one-hot [A, cap]
    pick_j = memb2 & (rank2 == r2s[:, None])
    valid_sw = (n1 > 0) & (n2 > 0)  # else auto-reject

    de, _, _ = _swap_pair_de(
        table, kp, pf, s1, s2, center_pos, center_sp, pos_o, valid_o,
        p_o_1, p_o_2, pick_i, pick_j,
    )
    accept = valid_sw & (log_ua < -de / temperature)
    booked = jnp.where(accept & jnp.isfinite(de), de, jnp.zeros_like(de))
    center_sp = jnp.where(
        pick_i & accept[:, None],
        s2f,
        jnp.where(pick_j & accept[:, None], s1f, center_sp),
    )
    return center_sp, jnp.sum(booked), accept


def _cell_member_energies(
    table, kp, pf, center_pos, center_sp, pos_o, sp_o_safe, valid_o,
):
    """Per-member local energies E [A, cap]: every center-block particle's
    pair-energy sum against the whole 3^d neighbourhood (own cell + 26
    static blocks), self excluded. This is compute_energy_particle
    (reference src/atoms.jl:81-88) evaluated for ALL members of every active
    cell at once — the input the EnergyBias softmax needs, with no gathers
    (everything is already extracted)."""
    d = len(center_pos)
    dt = center_pos[0].dtype
    cap = center_sp.shape[-1]
    valid_c = center_sp >= 0  # [A, cap]
    sa = jnp.maximum(center_sp, 0.0)

    # center ↔ center (exclude the self lane)
    r2cc = jnp.zeros(center_sp.shape + (cap,), dt)  # [A, cap, cap]
    for j in range(d):
        dx = center_pos[j][:, :, None] - center_pos[j][:, None, :]
        r2cc = r2cc + dx * dx
    pcc = _pair_params(table, sa[:, :, None], sa[:, None, :], pf)
    ucc = pair_potential(r2cc, pcc, kp)
    not_self = ~jnp.eye(cap, dtype=bool)[None]
    mcc = valid_c[:, :, None] & valid_c[:, None, :] & not_self
    e = jnp.sum(jnp.where(mcc, ucc, jnp.zeros_like(ucc)), axis=-1)

    # center ↔ others (halos image-corrected: plain differences)
    r2co = jnp.zeros(center_sp.shape + (pos_o[0].shape[-1],), dt)  # [A,cap,26cap]
    for j in range(d):
        dx = pos_o[j][:, None, :] - center_pos[j][:, :, None]
        r2co = r2co + dx * dx
    pco = _pair_params(table, sa[:, :, None], sp_o_safe[:, None, :], pf)
    uco = pair_potential(r2co, pco, kp)
    mco = valid_c[:, :, None] & valid_o[:, None, :]
    e = e + jnp.sum(jnp.where(mco, uco, jnp.zeros_like(uco)), axis=-1)
    return e


def _softmax_pick(logits, memb, u):
    """Inverse-CDF categorical over the masked softmax of `logits` [A, cap]
    restricted to `memb`, driven by ONE uniform u [A] per cell. Returns
    (one-hot pick [A, cap], log-prob of the picked lane [A]). Cells with no
    members return an all-false pick (callers must auto-reject them)."""
    dt = logits.dtype
    neg = jnp.asarray(-jnp.inf, dt)
    lv = jnp.where(memb, logits, neg)
    m = jnp.max(lv, axis=-1, keepdims=True)
    m = jnp.where(jnp.isfinite(m), m, jnp.zeros_like(m))
    w = jnp.where(memb, jnp.exp(lv - m), jnp.zeros_like(logits))
    tot = jnp.sum(w, axis=-1, keepdims=True)  # [A, 1]
    cum = jnp.cumsum(w, axis=-1)
    thr = u[:, None] * tot  # u in [0, 1): thr < tot, so exactly one lane hits
    pick = memb & (cum > thr) & ((cum - w) <= thr)
    # ties on equal cumsum plateaus (w == 0 runs) resolve to the first lane
    first = jnp.cumsum(pick.astype(jnp.int32), axis=-1) == 1
    pick = pick & first
    logp = jnp.sum(jnp.where(pick, lv, jnp.zeros_like(lv)), axis=-1) - (
        m[:, 0] + jnp.log(jnp.maximum(tot[:, 0], jnp.finfo(dt).tiny))
    )
    return pick, logp


def _swap_submove_energy_bias(
    table, kp, pf, s1, s2, center_pos, center_sp, pos_o, sp_o_safe, valid_o,
    p_o_1, p_o_2, th1, th2, up, up2, log_ua, temperature,
):
    """One in-cell ENERGY-BIASED DiscreteSwap sub-move (reference EnergyBias,
    src/moves.jl:246-280, rebuilt for the checkerboard geometry).

    Within each active cell, i is drawn from the s1 members with probability
    ∝ exp(θ1·E_i) and j from the s2 members ∝ exp(θ2·E_j), where E are the
    members' true local energies from the extracted blocks
    (_cell_member_energies) — a masked softmax, no new gathers. The proposal
    is ASYMMETRIC, so Metropolis-Hastings applies the exact correction: the
    reverse density is evaluated in the post-swap configuration (species of
    i, j exchanged — the reference computes log_proposal_density of the
    inverted action after perform_action!, SURVEY.md §3.2). Swapping i and j
    preserves the cell's composition, so the reverse pick is over the same
    populations and cross-cell independence holds exactly as for the uniform
    in-cell swap. Cells missing either species auto-reject.

    This differs from the reference's GLOBAL softmax over all N particles as
    a proposal distribution but targets the same ensemble (the analogue of
    the in-cell uniform swap vs the reference's global uniform pair);
    parity is established statistically (tests/test_cb_energy_bias.py).

    Returns (center_sp', booked_energy_sum, accept [A])."""
    dt = center_pos[0].dtype
    s1f = jnp.asarray(float(s1), dt)
    s2f = jnp.asarray(float(s2), dt)
    memb1 = center_sp == s1f
    memb2 = center_sp == s2f
    valid_sw = jnp.any(memb1, axis=-1) & jnp.any(memb2, axis=-1)

    e_pre = _cell_member_energies(
        table, kp, pf, center_pos, center_sp, pos_o, sp_o_safe, valid_o
    )
    pick_i, lp_i = _softmax_pick(th1 * e_pre, memb1, up)
    pick_j, lp_j = _softmax_pick(th2 * e_pre, memb2, up2)
    log_q_fwd = lp_i + lp_j

    de, _, _ = _swap_pair_de(
        table, kp, pf, s1, s2, center_pos, center_sp, pos_o, valid_o,
        p_o_1, p_o_2, pick_i, pick_j,
    )

    # reverse density in the post-swap configuration: i is s2, j is s1
    center_sp2 = jnp.where(pick_i, s2f, jnp.where(pick_j, s1f, center_sp))
    e_post = _cell_member_energies(
        table, kp, pf, center_pos, center_sp2, pos_o, sp_o_safe, valid_o
    )
    memb1b = center_sp2 == s1f
    memb2b = center_sp2 == s2f
    l1 = jnp.where(memb1b, th1 * e_post, jnp.asarray(-jnp.inf, dt))
    l2 = jnp.where(memb2b, th2 * e_post, jnp.asarray(-jnp.inf, dt))

    def _lse(lv):
        m = jnp.max(lv, axis=-1, keepdims=True)
        m = jnp.where(jnp.isfinite(m), m, jnp.zeros_like(m))
        return m[:, 0] + jnp.log(
            jnp.maximum(jnp.sum(jnp.exp(lv - m), axis=-1), jnp.finfo(dt).tiny)
        )

    # reverse picks j (now s1) and i (now s2)
    lp_rev_j = jnp.sum(jnp.where(pick_j, th1 * e_post, 0.0), axis=-1) - _lse(l1)
    lp_rev_i = jnp.sum(jnp.where(pick_i, th2 * e_post, 0.0), axis=-1) - _lse(l2)
    log_q_rev = lp_rev_j + lp_rev_i

    log_alpha = -de / temperature + log_q_rev - log_q_fwd
    log_alpha = jnp.where(jnp.isnan(log_alpha), jnp.asarray(-jnp.inf, dt), log_alpha)
    accept = valid_sw & (log_ua < log_alpha)
    booked = jnp.where(accept & jnp.isfinite(de), de, jnp.zeros_like(de))
    center_sp = jnp.where(
        pick_i & accept[:, None],
        s2f,
        jnp.where(pick_j & accept[:, None], s1f, center_sp),
    )
    return center_sp, jnp.sum(booked), accept


# ---------------------------------------------------------------------------
# Static move schedule
# ---------------------------------------------------------------------------


def _slot_schedule(pool, C: int, inner: int):
    """Assign each of the C*inner sub-move slots of a round a pool index.

    The reference draws the move type per step from the pool probabilities
    (src/ParticlesMC.jl:246 via StatsBase.sample); a traced draw would force
    both ΔE paths through a select on TPU, so the mixture is realised as a
    STATIC schedule instead: largest-remainder allocation of the C*inner
    slots to the moves (every move with p > 0 gets >= 1 slot), smoothly
    interleaved. A fixed composition of π-invariant kernels is itself
    π-invariant, so this preserves correctness while matching the requested
    mixture to 1/(C*inner) resolution per round (exactly, over a round)."""
    import numpy as _np

    slots = C * inner
    n_moves = len(pool)
    if n_moves > slots:
        raise ValueError(
            f"move pool has {n_moves} moves but a round only has {slots} "
            f"sub-move slots; raise `inner`"
        )
    p = _np.asarray([m.probability for m in pool], _np.float64)
    p = p / p.sum()
    counts = _np.floor(p * slots).astype(int)
    rem = slots - int(counts.sum())
    order = _np.argsort(-(p * slots - counts))
    for k in range(rem):
        counts[order[k % n_moves]] += 1
    while (counts == 0).any():  # every move must fire at least once per round
        counts[int(_np.argmin(counts))] += 1
        counts[int(_np.argmax(counts))] -= 1
    sched, used = [], _np.zeros(n_moves)
    for t in range(slots):
        m = int(_np.argmax(counts * (t + 1) / slots - used))
        sched.append(m)
        used[m] += 1
    return _np.asarray(sched, int).reshape(C, inner)


# ---------------------------------------------------------------------------
# The hyper-sweep
# ---------------------------------------------------------------------------


_BOND_FIELDS = ("has_bond", "kr02", "r02", "eps4b", "sigma2b", "shiftb", "rcut2b")


def build_hyper_sweep_fn(
    spec: CBSpec,
    table: PairTable,
    n: int,
    sweepstep: Optional[int] = None,
    inner: int = 4,
    sweeps: int = 1,
    pool=None,
    max_bonds: int = 0,
    use_pallas: Optional[bool] = None,
    pallas_interpret: bool = False,
    trim_k: Optional[int] = None,
    trim_rcut: Optional[float] = None,
):
    """Returns the hyper-sweep kernel: one rebin followed by `sweeps`
    hyper-sweeps of ~sweepstep attempted moves each (default n), then one
    global position/species sync.

    Call signature: with `pool=None` (legacy, single Displacement move) the
    returned fn is `hyper_sweep(cb_state, sigma)`. With a `pool` of Move
    specs it is `hyper_sweep(cb_state, pool_params)` where pool_params is
    the tuple-of-dicts from moves.base.init_pool_params; counters in CBState
    must then be [len(pool)] (init_cb_state(..., n_moves=len(pool))).

    Supported pool moves: Displacement/SimpleGaussian and
    DiscreteSwap/DoubleUniform (mixed freely, reference mixture semantics
    src/ParticlesMC.jl:246). The move mixture is realised as a STATIC
    per-slot schedule over the C*inner sub-move slots of a round
    (_slot_schedule) — zero branch overhead since both loops are statically
    unrolled. A swap slot picks one particle of each species uniformly
    WITHIN each active cell and swaps their labels: selection probabilities
    are symmetric (the cell's composition is preserved), both movers sit in
    the same active cell so cross-cell independence holds, and the mutual
    (i, j) pair term cancels exactly (the table is symmetric), so
    ΔE = Δ_i + Δ_j with each sum excluding the partner. Cells missing either
    species auto-reject. This differs from the reference's GLOBAL uniform
    pair selection (src/moves.jl:226-241) as a proposal distribution but
    targets the same ensemble; parity is established statistically
    (tests/test_checkerboard.py). MoleculeFlip runs here too on molecular
    systems (cell-local partner pick, see below). EnergyBias swaps (the PGMC
    flagship policy, reference src/moves.jl:246-280) run as an in-cell
    masked-softmax pick over the members' true local energies with the exact
    MH asymmetry correction (_swap_submove_energy_bias) — atomic pools only.

    `inner` runs that many SEQUENTIAL Metropolis sub-moves per active cell
    per substep against the once-extracted neighbour blocks (the active
    cell's own block is updated in-register between sub-moves; no other
    active cell ever appears in those blocks, so cross-cell independence is
    preserved). This amortises the block extraction and scan-step dispatch
    over `inner` attempted moves.

    `sweeps` amortises the rebin (argsort) over that many sweeps per call —
    particles stay confined to their cells for the whole block; the shift
    redraw at the next call restores cross-cell diffusion.

    MOLECULAR systems (`max_bonds` = bonds.shape[1] > 0): the payload carries
    id / bond-partner-id / molecule-start / molecule-length planes
    (_mol_columns), and `spec` MUST be sized on tables.interaction_range
    (bond reach can exceed the pair cutoff). Displacement ΔE then excludes
    bonded partners from the non-bonded sum and adds the FENE+LJ bond delta
    (reference src/molecules.jl:206-215) with partners located by ID-MATCH
    inside the extracted blocks (a partner is always within one cell side of
    its mate; an unfound partner auto-rejects as a safety net — symmetric,
    since positions of non-movers are static within a substep). MoleculeFlip
    is proposed CELL-LOCALLY: one particle i uniform in the active cell, a
    partner site j uniform among the other members of i's molecule,
    auto-rejecting unless j lies in the SAME active cell (required for
    cross-cell independence: both species edits stay inside the active cell)
    and species differ. Selection probabilities are symmetric — the flip
    moves nothing, so occupancy, molecule length, and the found/not-found
    status are identical forward and reverse. Flips of sites that never
    co-occupy a cell are reached by composing cell-local flips (and the
    per-block grid shifts re-draw the partition), mirroring how in-cell
    displacement truncation restores ergodicity. Parity with the reference's
    global uniform molecule+site proposal (src/moves.jl:344-352) is
    established statistically (tests/test_cb_molecular.py). DiscreteSwap on
    molecular systems stays sequential-kernel-only (species swaps would need
    the same bond machinery; the reference's molecular workloads use flips).

    (A hand-written pallas ΔE kernel was benchmarked against this XLA path
    on a TPU v5e in round 2 and lost 6x — 516 vs 3008 sweeps/s at N=10k —
    so the XLA-fused evaluation is the only implementation.)

    `trim_k` enables PER-SUBSTEP CANDIDATE COMPACTION: the 26 static
    neighbour blocks hold (3^d - 1) * cap lanes per active cell (864 at the
    N=10k bench point) of which only ~45% can possibly interact with the
    mover — a lane matters only if its distance to the active cell's CUBE
    is <= rcut (the mover never leaves the cube within a substep, and the
    pair potential is exactly 0 beyond rcut). Once per color substep those
    lanes are compacted to a 128-aligned buffer of `trim_k` lanes (stable
    sort of the in-range key + monotone take_along_axis — measured ~26 us,
    amortised over the `inner` sub-moves that then each touch trim_k + cap
    instead of 27*cap lanes). EXACTNESS: dropped lanes contribute 0 to
    every ΔE, every member energy (EnergyBias), and every bond term (for
    molecular pools size trim_rcut = tables.interaction_range, which bounds
    the FENE bond reach, so a bonded partner is never dropped); only
    floating-point summation order changes. VALIDITY of the overflow path:
    if more than trim_k lanes are in range for some active cell, that
    SUBSTEP alone becomes the identity kernel (proposals auto-reject,
    attempts not booked, `skipped` incremented). The in-range count for a
    color's active cells depends only on particles OUTSIDE those cells
    (another active cell is >= one full cell side > rcut away from the
    cube), so the condition is invariant under the substep's own moves —
    the same apply-if-valid-else-identity argument as skip-on-overflow.
    `trim_rcut` defaults to tables.interaction_range(table) (== max_cutoff
    for bond-free tables). Size trim_k with auto_trim_k. Incompatible with
    use_pallas (the pallas substep packs the untrimmed lane layout).

    trim is OFF by default: MEASURED NET LOSS on TPU v5e at the N=10k bench
    point despite cutting lanes 864 -> 544. Every mechanism for the
    per-substep data movement loses to the ~6 ms/substep of arithmetic it
    saves (256 chains): a vmapped flat scatter and a vmapped
    take_along_axis both SERIALIZE over the chain batch (~1 ms/chain/
    substep); the value-carrying lax.sort used here is the best of the
    three but still costs ~45 ms/substep at [chains*A, 832] (sorting is
    O(L log^2 L) per lane) and inflates XLA compile 3-4x (204 s vs 67 s).
    A one-hot-matmul compaction would need a [A, L, K] operand that
    materializes at chain-batch scale (tens of GB). The kept implementation
    documents the experiment and remains available (and correct) for
    future hardware/compilers where batched permutation is cheap; see
    docs/man/performance.md for the full cost accounting."""
    d = spec.d
    A_dims = spec.active_dims
    A = spec.n_active
    cap = spec.cap
    inner = max(1, int(inner))
    sweeps = max(1, int(sweeps))
    C = 2**d
    colors = list(itertools.product((0, 1), repeat=d))
    rounds = max(1, -(-int(sweepstep or n) // (A * inner * C)))
    kp = kinds_present(table)  # static: prunes dead potential branches
    pf = pair_fields_needed(kp)
    offsets = [t for t in itertools.product((-1, 0, 1), repeat=d) if any(t)]
    # static grid coordinates of the active cells per color: 2a + c
    grids = np.meshgrid(*[2 * np.arange(ak) for ak in A_dims], indexing="ij")
    base_coords = np.stack([g.reshape(-1) for g in grids], axis=-1)  # [A, d]

    legacy = pool is None
    if legacy:
        from .base import displacement as _mk_disp

        pool = (_mk_disp(1.0),)
    pool = tuple(pool)
    n_moves = len(pool)
    molecular = max_bonds > 0
    for mv in pool:
        ok = (
            mv.action == "displacement"
            and (mv.policy != "smart" or not molecular)
        ) or (
            mv.action == "swap"
            and mv.policy in ("double_uniform", "energy_bias")
            and not molecular
        ) or (mv.action == "flip" and molecular)
        if not ok:
            raise ValueError(
                f"checkerboard backend does not support {mv.action}/{mv.policy}"
                + (" on molecular systems" if molecular else "")
                + " — use the sequential kernel (parallel_moves=false)"
            )
    has_swap = any(mv.action == "swap" for mv in pool)
    has_flip = any(mv.action == "flip" for mv in pool)
    species_live = has_swap or has_flip  # species planes mutate in-substep
    schedule = _slot_schedule(pool, C, inner)

    if trim_k is not None:
        from ..models.tables import interaction_range as _irange

        trim_k = int(trim_k)
        if trim_rcut is None:
            trim_rcut = _irange(table)
        trim_r2 = float(trim_rcut) ** 2
        if trim_k >= ((3**d) - 1) * cap:
            trim_k = None  # cannot beat the uncompacted lane count

    # Pallas substep (moves/cb_pallas.py): the whole inner loop of a
    # displacement substep in one VMEM-resident kernel. Built to remove the
    # HBM re-reads of the static neighbour planes (xprof: the XLA path's ΔE
    # fusions sit at HBM peak), but MEASURED SLOWER on TPU v5e (1.9k vs 3.8k
    # sweeps/s at the N=10k bench point): Mosaic's codegen for this pattern
    # trails XLA's fusions, and pallas forces materialisation of the packed
    # operands that XLA otherwise fuses away — the XLA path overlaps its HBM
    # streaming with ~75% VPU occupancy, so the reuse win cannot pay. Kept
    # OFF by default as the documented outcome of that experiment (exact
    # algorithm parity is pinned by tests/test_cb_pallas.py);
    # PMC_CB_PALLAS=1 or use_pallas=True opts in.
    all_disp = all(
        mv.action == "displacement" and mv.policy == "gaussian" for mv in pool
    )
    if use_pallas is None:
        import os as _os

        use_pallas = _os.environ.get("PMC_CB_PALLAS") == "1"
    pallas_on = bool(use_pallas) and all_disp and not molecular and trim_k is None
    pallas_substep = None
    if pallas_on:
        from .cb_pallas import build_disp_substep

        pallas_substep = build_disp_substep(
            table, kp, pf, d=d, A=A, cap=cap, inner=inner,
            interpret=pallas_interpret,
        )
    # plane layout: [0:d] positions, [d] species, then (molecular only)
    # [d+1] particle id, [d+2 : d+2+B] bond partner ids, [-2] molecule start,
    # [-1] molecule length (_mol_columns)
    NP = d + 1 + (3 + max_bonds if molecular else 0)
    P_ID, P_B0 = d + 1, d + 2
    P_MS, P_ML = d + 2 + max_bonds, d + 3 + max_bonds

    def hyper_sweep_pool(cb: CBState, pool_params) -> CBState:
        dt = cb.system.position.dtype
        sigmas = [
            jnp.asarray(pool_params[m]["sigma"], dt)
            if pool[m].action == "displacement"
            else None
            for m in range(n_moves)
        ]
        thetas = [
            (
                jnp.asarray(pool_params[m]["theta1"], dt),
                jnp.asarray(pool_params[m]["theta2"], dt),
            )
            if pool[m].action == "swap" and pool[m].policy == "energy_bias"
            else None
            for m in range(n_moves)
        ]
        box = cb.system.box
        key, k_shift, k_rand = jax.random.split(cb.key, 3)
        shift = jax.random.uniform(k_shift, (d,), dt) * box
        planes0, idx, slot, ovf = rebin(cb.system, spec, shift)
        grid0 = planes0.reshape((NP,) + spec.ncells + (cap,))
        padded0 = jnp.pad(
            grid0, [(0, 0)] + [(1, 1)] * d + [(0, 0)], mode="wrap"
        )
        # image-correct the halos: plane j's wrap faces along dim j read
        # x' -/+ L so that all in-substep distances are plain differences
        for j in range(d):
            lo = (j,) + (slice(None),) * j + (0,)
            hi = (j,) + (slice(None),) * j + (spec.ncells[j] + 1,)
            padded0 = padded0.at[lo].add(-box[j])
            padded0 = padded0.at[hi].add(box[j])

        # all randomness pregenerated in bulk draws, outside the scan body
        R = sweeps * rounds
        k_pick, k_pick2, k_delta, k_acc = jax.random.split(k_rand, 4)
        rnd = dict(
            up=jax.random.uniform(k_pick, (R, C, inner, A), dt, maxval=1.0 - 1e-7),
            dl=jax.random.normal(k_delta, (R, C, inner, d, A), dt),
            ua=jax.random.uniform(
                k_acc, (R, C, inner, A), dt, minval=jnp.finfo(dt).tiny
            ),
        )
        if has_swap or has_flip:  # second per-cell pick (swap/flip partner)
            rnd["up2"] = jax.random.uniform(
                k_pick2, (R, C, inner, A), dt, maxval=1.0 - 1e-7
            )

        temperature = cb.system.temperature
        if pallas_substep is not None:
            # fold the per-slot sigma and the accept threshold into the bulk
            # draws so the kernel needs no scalars (same RNG stream as the
            # XLA path: identical draws, transformed)
            sig_slot = jnp.stack(
                [
                    jnp.stack([sigmas[int(schedule[c_, i_])] for i_ in range(inner)])
                    for c_ in range(C)
                ]
            )  # [C, inner]
            rnd["dl"] = rnd["dl"] * sig_slot[None, :, :, None, None]
            rnd["thr"] = -jnp.asarray(temperature, dt) * jnp.log(rnd.pop("ua"))
        slot_iota = jnp.arange(cap, dtype=jnp.int32)

        def color_substep(padded, energy, att, acc, ci, rnd_c):
            c = colors[ci]
            col_sched = schedule[ci]  # static [inner] pool indices

            # static slice of dim k at cell offset `off` relative to actives
            def sl(k, off):
                return slice(c[k] + off + 1, c[k] + off + 2 * A_dims[k], 2)

            csl = tuple(sl(k, 0) for k in range(d))

            def _write_back(padded, center_pos, center_sp, energy, att, acc):
                """Write the live center back; refresh one halo face per dim
                (molecular id/bond/layout planes are static — never written)."""
                if species_live:
                    new_block = jnp.stack(center_pos + [center_sp]).reshape(
                        (d + 1,) + tuple(A_dims) + (cap,)
                    )
                    padded = padded.at[(slice(0, d + 1),) + csl].set(new_block)
                else:
                    new_center = jnp.stack(center_pos).reshape(
                        (d,) + tuple(A_dims) + (cap,)
                    )
                    padded = padded.at[(slice(0, d),) + csl].set(new_center)
                # only the LIVE planes need their halo faces refreshed —
                # positions (and species under swap/flip pools); molecular
                # id/bond/layout planes never change, so their faces stay
                # valid from the per-call initialisation
                np_upd = d + 1 if species_live else d
                for k in range(d):
                    nc_k = spec.ncells[k]
                    if c[k] == 0:
                        # actives include grid coord 0 -> refresh right halo,
                        # image-corrected (+L on plane k)
                        src_i, dst_i = 1, nc_k + 1
                        corr = box[k]
                    else:
                        # actives include grid coord nc-1 -> refresh left halo
                        src_i, dst_i = nc_k, 0
                        corr = -box[k]
                    pre = (slice(0, np_upd),) + (slice(None),) * k
                    src = padded[pre + (src_i,)]
                    src = src.at[k].add(corr)
                    padded = padded.at[pre + (dst_i,)].set(src)
                return padded, energy, att, acc

            center = padded[(slice(None),) + csl].reshape(NP, A, cap)
            center_sp = center[d]  # -1.0 == empty; LIVE if pool swaps/flips
            center_pos = [center[j] for j in range(d)]
            # the 26 surrounding blocks never contain another ACTIVE cell, so
            # they are static across the inner sub-moves
            others = jnp.concatenate(
                [
                    padded[(slice(None),) + tuple(sl(k, t[k]) for k in range(d))]
                    .reshape(NP, A, cap)
                    for t in offsets
                ],
                axis=-1,
            )  # [NP, A, 26*cap]
            pos_o = others[:d]
            sp_o = others[d]
            valid_o = sp_o >= 0
            oth_id = others[P_ID] if molecular else None
            coords = jnp.asarray(base_coords + np.asarray(c), jnp.int32)  # [A, d]
            ok_sub = None
            if trim_k is not None:
                # --- per-substep candidate compaction (see build docstring):
                # keep only lanes within trim_rcut of the active cell's cube
                # (shifted frame; halos image-corrected, so plain coords)
                side_v = box / jnp.asarray(spec.ncells, dt)
                lo_c = coords.astype(dt) * side_v[None, :]  # [A, d]
                d2c = jnp.zeros(sp_o.shape, dt)
                for j in range(d):
                    lo_j = lo_c[:, j][:, None]
                    over = jnp.maximum(
                        jnp.maximum(lo_j - pos_o[j], pos_o[j] - (lo_j + side_v[j])),
                        jnp.zeros_like(pos_o[j]),
                    )
                    d2c = d2c + over * over
                inr = valid_o & (d2c <= jnp.asarray(trim_r2, dt))
                count = jnp.sum(inr.astype(jnp.int32), axis=-1)
                ok_sub = ~jnp.any(count > trim_k)
                # Compaction by VALUE-CARRYING stable sort: in-range lanes
                # (key 0) move to the front in original order with their
                # payload riding as sort operands, then a static slice keeps
                # the first trim_k lanes. This is the one formulation that
                # stays fast under vmap on TPU — both a batched scatter and
                # a batched take_along_axis were measured to SERIALIZE over
                # the chain batch (~1 ms/chain/substep), while multi-operand
                # lax.sort lowers as a genuinely batched op (the same reason
                # rebin sorts instead of gathering).
                key_out = jnp.where(inr, 0, 1).astype(jnp.int32)
                ops = [pos_o[j] for j in range(d)] + [
                    jnp.where(inr, sp_o, jnp.asarray(-1.0, dt))
                ]
                if molecular:
                    ops.append(jnp.where(inr, oth_id, jnp.asarray(-1.0, dt)))
                sorted_ops = jax.lax.sort(
                    tuple([key_out] + ops),
                    dimension=-1, num_keys=1, is_stable=True,
                )
                sl_k = (Ellipsis, slice(0, trim_k))
                pos_o = jnp.stack([sorted_ops[1 + j][sl_k] for j in range(d)])
                sp_o = sorted_ops[1 + d][sl_k]
                valid_o = sp_o >= 0
                if molecular:
                    oth_id = sorted_ops[2 + d][sl_k]
            sp_o_safe = jnp.maximum(sp_o, 0.0)
            if molecular:
                # static molecular planes (ids/bonds/molecule layout never
                # change; flips only edit species)
                center_id = center[P_ID]
                center_bnd = [center[P_B0 + b] for b in range(max_bonds)]
                center_ms, center_ml = center[P_MS], center[P_ML]

                def bond_excl(ids_nb, partners):
                    """Mask of lanes that are bonded partners of the mover
                    (excluded from the non-bonded sum, reference
                    src/molecules.jl:206-215)."""
                    m = jnp.zeros(ids_nb.shape, bool)
                    for pb in partners:
                        m = m | ((ids_nb == pb[:, None]) & (pb[:, None] >= 0))
                    return m

                def find_by_id(pid, live_center_pos, live_center_sp):
                    """Locate particle `pid` [A] in the 3^d blocks by id
                    match; returns (pos list d x [A], species [A], found [A]).
                    Halos are image-corrected, so the position is directly
                    usable in plain-difference distances."""
                    mc_ = (center_id == pid[:, None]) & (pid[:, None] >= 0)
                    mo_ = (oth_id == pid[:, None]) & (pid[:, None] >= 0)
                    xp = [
                        jnp.sum(jnp.where(mc_, live_center_pos[j], 0.0), -1)
                        + jnp.sum(jnp.where(mo_, pos_o[j], 0.0), -1)
                        for j in range(d)
                    ]
                    sp_p = jnp.sum(
                        jnp.where(mc_, live_center_sp, 0.0), -1
                    ) + jnp.sum(jnp.where(mo_, sp_o, 0.0), -1)
                    found = jnp.any(mc_, -1) | jnp.any(mo_, -1)
                    return xp, sp_p, found

                def bond_delta(x_old, x_new, s_old, s_new, partners, skip_id,
                               live_center_pos, live_center_sp):
                    """Σ_b [u_bond(new) − u_bond(old)] over the mover's bond
                    partners; +inf (→ reject) if a live partner is not found
                    in the blocks. `skip_id` masks the mutual bond of a flip
                    pair (cancels exactly by table symmetry). Position AND
                    species may both change (displacement: x; flip: s)."""
                    de_b = jnp.zeros((A,), dt)
                    inf = jnp.asarray(jnp.inf, dt)
                    for pb in partners:
                        act = pb >= 0
                        if skip_id is not None:
                            act = act & (pb != skip_id)
                        xp, sp_p, found = find_by_id(
                            pb, live_center_pos, live_center_sp
                        )
                        r2o = jnp.zeros((A,), dt)
                        r2n = jnp.zeros((A,), dt)
                        for j in range(d):
                            dxo = xp[j] - x_old[j]
                            dxn = xp[j] - x_new[j]
                            r2o = r2o + dxo * dxo
                            r2n = r2n + dxn * dxn
                        po = _pair_params(table, s_old, sp_p, _BOND_FIELDS)
                        pn = _pair_params(table, s_new, sp_p, _BOND_FIELDS)
                        du = bond_potential(r2n, pn) - bond_potential(r2o, po)
                        du = jnp.where(found, du, inf)
                        de_b = de_b + jnp.where(act, du, jnp.zeros_like(du))
                    return de_b

            # occupancy is static across inner: swaps preserve composition,
            # displacements are confined to their cell
            occ = jnp.sum((center_sp >= 0).astype(jnp.int32), axis=-1)  # [A]
            occupied = occ > 0
            if ok_sub is not None:
                # trim overflow -> this substep is the identity kernel:
                # every acceptance uniform becomes +inf (log +inf is never
                # below any log-alpha) and attempts are not booked
                occupied = occupied & ok_sub
                rnd_c = dict(
                    rnd_c,
                    ua=jnp.where(ok_sub, rnd_c["ua"], jnp.asarray(jnp.inf, dt)),
                )

            if pallas_substep is not None:
                # ---- VMEM-resident inner loop (moves/cb_pallas.py) ----------
                side = box / jnp.asarray(spec.ncells, dt)
                lo = coords.astype(dt).T * side[:, None]  # [d, A]
                hi = lo + side[:, None]
                packed_pos = jnp.concatenate(
                    [jnp.stack(center_pos), pos_o], axis=-1
                )  # [d, A, cap + 26*cap]
                packed_sp = jnp.concatenate([center_sp, sp_o], axis=-1)
                new_center, booked_sum, acc_k = pallas_substep(
                    packed_pos, packed_sp,
                    rnd_c["up"], rnd_c["dl"], rnd_c["thr"], lo, hi,
                )
                center_pos = [new_center[j] for j in range(d)]
                energy = energy + booked_sum.astype(energy.dtype)
                occ_cnt = jnp.sum(occupied.astype(att.dtype))
                for m in range(n_moves):
                    slots_m = [i for i in range(inner) if int(col_sched[i]) == m]
                    if not slots_m:
                        continue
                    att = att.at[m].add(occ_cnt * len(slots_m))
                    acc_m = acc_k[slots_m[0]]
                    for i in slots_m[1:]:
                        acc_m = acc_m + acc_k[i]
                    acc = acc.at[m].add(acc_m.astype(acc.dtype))
                return _write_back(
                    padded, center_pos, center_sp, energy, att, acc
                ) + (jnp.zeros((), cb.skipped.dtype),)

            slots_here = set(int(m) for m in col_sched)
            any_disp = any(pool[m].action == "displacement" for m in slots_here)
            any_flip = any(pool[m].action == "flip" for m in slots_here)

            # neighbour-side parameter selection hoisted out of the hot loop
            # (the `others` species plane is static for the whole substep)
            rows_o = rows_c_static = None
            if any_disp or any_flip:
                rows_o = _pair_params_rows(table, sp_o_safe, pf)
                if not species_live:  # center species static too
                    rows_c_static = _pair_params_rows(
                        table, jnp.maximum(center_sp, 0.0), pf
                    )
            swap_o_rows = {
                m: (
                    _pair_params_static_row(table, pool[m].species[0], sp_o_safe, pf),
                    _pair_params_static_row(table, pool[m].species[1], sp_o_safe, pf),
                )
                for m in slots_here
                if pool[m].action == "swap"
            }

            def grid_bounds(x_new):
                """In-cell auto-reject for the local grid geometry."""
                ok = jnp.ones(x_new[0].shape, bool)
                for j in range(d):
                    cj = jnp.floor(x_new[j] / box[j] * spec.ncells[j]).astype(
                        jnp.int32
                    )
                    ok = ok & (cj == coords[:, j])
                return ok

            for kin in range(inner):
                m = int(col_sched[kin])
                mv = pool[m]
                if mv.action == "displacement" and not molecular:
                    rows_c = (
                        _pair_params_rows(table, jnp.maximum(center_sp, 0.0), pf)
                        if species_live  # center species are live
                        else rows_c_static
                    )
                    # floor(u * occ) is uniform over [0, occ) for u ~ U[0, 1)
                    r = jnp.floor(rnd_c["up"][kin] * occ.astype(dt)).astype(
                        jnp.int32
                    )
                    pick = slot_iota[None, :] == r[:, None]  # [A, cap]
                    if mv.policy == "smart":
                        xi = [rnd_c["dl"][kin, j] for j in range(d)]
                        center_pos, booked_sum, accept = _disp_submove_smart(
                            kp, pf, rows_c, rows_o, center_pos, center_sp,
                            pos_o, valid_o, pick, xi, sigmas[m], grid_bounds,
                            occupied, jnp.log(rnd_c["ua"][kin]), temperature,
                        )
                    else:
                        delta = [
                            sigmas[m] * rnd_c["dl"][kin, j] for j in range(d)
                        ]
                        center_pos, booked_sum, accept = _disp_submove_atomic(
                            kp, pf, rows_c, rows_o, center_pos, center_sp,
                            pos_o, valid_o, pick, delta, grid_bounds, occupied,
                            jnp.log(rnd_c["ua"][kin]), temperature,
                        )
                    energy = energy + booked_sum
                    att = att.at[m].add(jnp.sum(occupied.astype(att.dtype)))
                    acc = acc.at[m].add(jnp.sum(accept.astype(acc.dtype)))
                elif mv.action == "displacement":
                    # --- molecular displacement: bond exclusions + FENE ΔE ---
                    # floor(u * occ) is uniform over [0, occ) for u ~ U[0, 1)
                    r = jnp.floor(rnd_c["up"][kin] * occ.astype(dt)).astype(
                        jnp.int32
                    )
                    pick = slot_iota[None, :] == r[:, None]  # [A, cap]
                    x_a = [
                        jnp.sum(jnp.where(pick, center_pos[j], 0.0), axis=-1)
                        for j in range(d)
                    ]  # d x [A]
                    s_a = jnp.sum(jnp.where(pick, center_sp, 0.0), axis=-1)

                    # --- proposal: Gaussian, auto-reject on cell exit --------
                    # (positions are already in the shifted frame; NO clip — a
                    # clip would silently extend edge cells past the box)
                    x_new = [
                        x_a[j] + sigmas[m] * rnd_c["dl"][kin, j] for j in range(d)
                    ]
                    in_cell = occupied & grid_bounds(x_new)

                    # --- ΔE: own (live) block + static neighbour blocks ------
                    rows_c = (
                        _pair_params_rows(
                            table, jnp.maximum(center_sp, 0.0), pf
                        )
                        if species_live  # center species are live
                        else rows_c_static
                    )
                    if molecular:
                        # mover's bond partner ids (for exclusion + bond ΔE)
                        pbs = [
                            jnp.sum(jnp.where(pick, center_bnd[b], 0.0), -1)
                            for b in range(max_bonds)
                        ]
                    de = jnp.zeros((A,), dt)
                    for pos_nb, ids_nb, rows_nb, valid in (
                        (
                            center_pos,
                            center_id if molecular else None,
                            rows_c,
                            (center_sp >= 0) & ~pick,
                        ),
                        (pos_o, oth_id if molecular else None, rows_o, valid_o),
                    ):
                        if molecular:  # bond exclusion in the non-bonded sum
                            valid = valid & ~bond_excl(ids_nb, pbs)
                        p = _select_row(rows_nb, s_a[:, None], pf)
                        r2o = jnp.zeros(valid.shape, dt)
                        r2n = jnp.zeros(valid.shape, dt)
                        for j in range(d):
                            # plain differences: halos image-corrected
                            dxo = pos_nb[j] - x_a[j][:, None]
                            dxn = pos_nb[j] - x_new[j][:, None]
                            r2o = r2o + dxo * dxo
                            r2n = r2n + dxn * dxn
                        du = pair_potential(r2n, p, kp) - pair_potential(
                            r2o, p, kp
                        )
                        de = de + jnp.sum(
                            jnp.where(valid, du, jnp.zeros_like(du)), axis=-1
                        )
                    if molecular:  # FENE+LJ bond delta of the moved particle
                        de = de + bond_delta(
                            x_a, x_new, s_a, s_a, pbs, None,
                            center_pos, center_sp,
                        )

                    # --- Metropolis accept (overlap → de huge → reject) ------
                    accept = (
                        jnp.log(rnd_c["ua"][kin]) < -de / temperature
                    ) & in_cell
                    booked = jnp.where(
                        accept & jnp.isfinite(de), de, jnp.zeros_like(de)
                    )

                    # --- apply: in-register center update --------------------
                    moved = pick & accept[:, None]  # [A, cap]
                    center_pos = [
                        jnp.where(moved, x_new[j][:, None], center_pos[j])
                        for j in range(d)
                    ]
                    energy = energy + jnp.sum(booked)
                    att = att.at[m].add(jnp.sum(occupied.astype(att.dtype)))
                    acc = acc.at[m].add(jnp.sum(accept.astype(acc.dtype)))
                elif mv.action == "swap":
                    # --- in-cell species swap (see build docstring) ----------
                    p_o_1, p_o_2 = swap_o_rows[m]
                    if mv.policy == "energy_bias":
                        center_sp, booked_sum, accept = _swap_submove_energy_bias(
                            table, kp, pf, mv.species[0], mv.species[1],
                            center_pos, center_sp, pos_o, sp_o_safe, valid_o,
                            p_o_1, p_o_2, thetas[m][0], thetas[m][1],
                            rnd_c["up"][kin], rnd_c["up2"][kin],
                            jnp.log(rnd_c["ua"][kin]), temperature,
                        )
                    else:
                        center_sp, booked_sum, accept = _swap_submove_atomic(
                            table, kp, pf, mv.species[0], mv.species[1],
                            center_pos, center_sp, pos_o, valid_o, p_o_1, p_o_2,
                            rnd_c["up"][kin], rnd_c["up2"][kin],
                            jnp.log(rnd_c["ua"][kin]), temperature,
                        )
                    energy = energy + booked_sum
                    att = att.at[m].add(jnp.sum(occupied.astype(att.dtype)))
                    acc = acc.at[m].add(jnp.sum(accept.astype(acc.dtype)))
                else:
                    # --- cell-local MoleculeFlip (see build docstring) --------
                    # pick i uniform in the active cell; partner j uniform
                    # among the other members of i's molecule; auto-reject
                    # unless j sits in the SAME active cell and species differ
                    r = jnp.floor(rnd_c["up"][kin] * occ.astype(dt)).astype(
                        jnp.int32
                    )
                    pick = slot_iota[None, :] == r[:, None]  # [A, cap]

                    def csel(plane, pick=pick):
                        return jnp.sum(jnp.where(pick, plane, 0.0), axis=-1)

                    x_i = [csel(center_pos[j]) for j in range(d)]
                    s_i = csel(center_sp)
                    id_i = csel(center_id)
                    ms, ml = csel(center_ms), csel(center_ml)
                    pbs_i = [csel(center_bnd[b]) for b in range(max_bonds)]

                    # partner site: uniform over the L-1 other members,
                    # skipping i's own rank (symmetric: the flip moves
                    # nothing, so occ/L/ranks are identical in reverse)
                    lm1 = jnp.maximum(ml - 1.0, 1.0)
                    off = jnp.floor(rnd_c["up2"][kin] * lm1)
                    off = off + (off >= (id_i - ms)).astype(dt)
                    pj = ms + off
                    match_j = (center_id == pj[:, None]) & occupied[:, None]
                    found_j = jnp.any(match_j, axis=-1)

                    def jsel(plane, match_j=match_j):
                        return jnp.sum(jnp.where(match_j, plane, 0.0), axis=-1)

                    x_j = [jsel(center_pos[j]) for j in range(d)]
                    s_j = jsel(center_sp)
                    pbs_j = [jsel(center_bnd[b]) for b in range(max_bonds)]
                    valid_fl = (
                        occupied & (ml > 1.5) & found_j & (s_i != s_j)
                    )

                    # --- ΔE: species of i, j exchange; positions fixed.
                    # Mutual (i, j) term — non-bonded or bonded — cancels by
                    # table symmetry, so Δ = Δ_i + Δ_j, each sum excluding
                    # the pair and its own bonded partners.
                    rows_c = _pair_params_rows(
                        table, jnp.maximum(center_sp, 0.0), pf
                    )
                    de = jnp.zeros((A,), dt)
                    for pos_nb, ids_nb, rows_nb, valid in (
                        (
                            center_pos,
                            center_id,
                            rows_c,
                            (center_sp >= 0) & ~pick & ~match_j,
                        ),
                        (pos_o, oth_id, rows_o, valid_o),
                    ):
                        p_i = _select_row(rows_nb, s_i[:, None], pf)
                        p_j = _select_row(rows_nb, s_j[:, None], pf)
                        excl_i = bond_excl(ids_nb, pbs_i)
                        excl_j = bond_excl(ids_nb, pbs_j)
                        r2i = jnp.zeros(valid.shape, dt)
                        r2j = jnp.zeros(valid.shape, dt)
                        for j in range(d):
                            dxi = pos_nb[j] - x_i[j][:, None]
                            dxj = pos_nb[j] - x_j[j][:, None]
                            r2i = r2i + dxi * dxi
                            r2j = r2j + dxj * dxj
                        du_i = pair_potential(r2i, p_j, kp) - pair_potential(
                            r2i, p_i, kp
                        )
                        du_j = pair_potential(r2j, p_i, kp) - pair_potential(
                            r2j, p_j, kp
                        )
                        de = de + jnp.sum(
                            jnp.where(valid & ~excl_i, du_i, jnp.zeros_like(du_i)),
                            axis=-1,
                        )
                        de = de + jnp.sum(
                            jnp.where(valid & ~excl_j, du_j, jnp.zeros_like(du_j)),
                            axis=-1,
                        )
                    # bond terms: i's bonds re-typed s_i→s_j (skip partner j),
                    # j's bonds re-typed s_j→s_i (skip partner i)
                    de = de + bond_delta(
                        x_i, x_i, s_i, s_j, pbs_i, pj, center_pos, center_sp
                    )
                    de = de + bond_delta(
                        x_j, x_j, s_j, s_i, pbs_j, id_i, center_pos, center_sp
                    )

                    accept = valid_fl & (
                        jnp.log(rnd_c["ua"][kin]) < -de / temperature
                    )
                    booked = jnp.where(
                        accept & jnp.isfinite(de), de, jnp.zeros_like(de)
                    )
                    flip_i = pick & accept[:, None]
                    flip_j = match_j & accept[:, None]
                    center_sp = jnp.where(
                        flip_i,
                        s_j[:, None],
                        jnp.where(flip_j, s_i[:, None], center_sp),
                    )
                    energy = energy + jnp.sum(booked)
                    att = att.at[m].add(jnp.sum(occupied.astype(att.dtype)))
                    acc = acc.at[m].add(jnp.sum(accept.astype(acc.dtype)))

            out = _write_back(padded, center_pos, center_sp, energy, att, acc)
            skip_inc = (
                jnp.zeros((), cb.skipped.dtype)
                if ok_sub is None
                else (~ok_sub).astype(cb.skipped.dtype)
            )
            return out + (skip_inc,)

        def round_body(carry, rnd_r):
            padded, energy, att, acc, skp = carry
            for ci in range(C):  # static unroll over 2^d colors
                rnd_c = {k: v[ci] for k, v in rnd_r.items()}
                padded, energy, att, acc, dskp = color_substep(
                    padded, energy, att, acc, ci, rnd_c
                )
                skp = skp + dskp
            return (padded, energy, att, acc, skp), None

        att0 = jnp.zeros((n_moves,), cb.attempted.dtype)
        acc0 = jnp.zeros((n_moves,), cb.accepted.dtype)
        skp0 = jnp.zeros((), cb.skipped.dtype)
        (padded, energy, att, acc, skp), _ = jax.lax.scan(
            round_body,
            (padded0, cb.system.energy, att0, acc0, skp0),
            rnd,
        )

        interior = (slice(None),) + tuple(slice(1, -1) for _ in range(d))
        planes = padded[interior].reshape(NP, spec.total, cap)
        position = unbin_positions(planes, idx, n, shift, box)
        if species_live:
            flat_idx = idx.reshape(-1)
            tgt = jnp.where(flat_idx >= 0, flat_idx, n)
            species = (
                jnp.zeros((n,), dt)
                .at[tgt]
                .set(planes[d].reshape(-1), mode="drop")
                .astype(jnp.int32)
            )
        else:
            species = cb.system.species
        # SKIP-ON-OVERFLOW: if this call's shift overflowed a bucket, the
        # whole block acts as the IDENTITY kernel — no moves are applied and
        # the next call redraws the shift. This is unbiased: in-block moves
        # never change cell occupancy, so a shift's validity is invariant
        # under the block's own moves, making "apply-if-valid else identity"
        # exactly pi-reversible per shift (uniform, state-independent shift
        # mixture). The cost is throughput (counted in `skipped`; attempts
        # are not booked for skipped blocks), never correctness — which lets
        # the bucket capacity be sized for throughput instead of for the
        # worst-case occupancy tail.
        ok = ~ovf
        system = cb.system.replace(
            position=jnp.where(ok, position, cb.system.position),
            species=jnp.where(ok, species, cb.system.species),
            energy=jnp.where(ok, energy, cb.system.energy),
        )
        zero_att = jnp.zeros_like(att)
        return cb.replace(
            system=system,
            key=key,
            shift=jnp.where(ok, shift, cb.shift),
            planes=jnp.where(ok, planes, cb.planes),
            idx=jnp.where(ok, idx, cb.idx),
            slot=jnp.where(ok, slot, cb.slot),
            attempted=cb.attempted + jnp.where(ok, att, zero_att),
            accepted=cb.accepted + jnp.where(ok, acc, zero_att),
            overflow=cb.overflow | ovf,
            # skip events: 1 per rebin-overflow call (whole block identity)
            # + 1 per trim-overflow substep (that substep identity) — the
            # substep skips only count when the call itself applied
            skipped=cb.skipped
            + ovf.astype(cb.skipped.dtype)
            + jnp.where(ok, skp, jnp.zeros_like(skp)),
        )

    if legacy:

        def hyper_sweep(cb: CBState, sigma, color_key=None) -> CBState:
            """Legacy single-Displacement entry: `sigma` is the Gaussian
            width. `color_key` is accepted for backwards compatibility and
            ignored — the color order is a fixed static cycle (see module
            docstring for why that is both valid MCMC and TPU-necessary)."""
            del color_key
            return hyper_sweep_pool(cb, ({"sigma": sigma},))

        return hyper_sweep
    return hyper_sweep_pool
