"""Checkerboard hyper-sweep — the massively-parallel TPU Metropolis kernel.

The sequential sweep kernel (moves/kernel.py) is bound by per-scan-iteration
dispatch cost (~100 us/step on TPU), so at N=10k a sweep of N serial steps
cannot beat the reference no matter how cheap each ΔE is. This kernel is the
TPU-native inversion: **domain-decomposition Monte Carlo** (the scheme used
by GPU hard-particle MC codes), proposing ~A independent moves per substep.

Scheme (valid MCMC for the Boltzmann target):

- Bin particles into a grid of cells of side >= rcut (even count per dim),
  with a random origin shift redrawn at the start of every hyper-sweep.
- A substep draws one of 2^d checkerboard colors; the "active" cells of that
  color form a stride-2 sublattice, so any two active cells are separated by
  at least one cell (>= rcut): moves of one particle per active cell are
  exactly independent — each sees the true pre-substep configuration.
- One particle is picked uniformly per occupied active cell; a Gaussian
  displacement is proposed; proposals that would LEAVE the particle's cell
  are rejected outright. In-cell truncation keeps the proposal symmetric and
  the binning static for the whole hyper-sweep (selection probabilities are
  therefore symmetric and detailed balance holds per substep). Ergodicity
  across cell boundaries is restored by the per-sweep random grid shift —
  the standard resolution in checkerboard MC.
- ΔE uses candidates from the particle's 3^d neighbouring cells, extracted
  as STATIC strided slices of a wrap-padded payload grid — no vector-index
  gathers anywhere (they serialise on TPU); updates are one-hot matmul
  scatters (MXU work).

One "sweep" is accounted as ~N attempted moves, matching the reference
convention (sweepstep = N, reference src/ParticlesMC.jl:246), i.e.
ceil(N / A) substeps of A simultaneous proposals.

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

from ..core.geometry import dist2, fold_back
from ..core.state import SystemState
from ..models.potentials import pair_potential
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


def make_cb_spec(box, rcut: float, n: int, cap: Optional[int] = None) -> Optional[CBSpec]:
    """Even-count grid with cell side >= rcut; None if the box is too small
    (fewer than 4 cells in some dimension — use the sequential kernel)."""
    box = np.asarray(box, np.float64)
    nc = np.floor(box / rcut).astype(int)
    nc = nc - (nc % 2)  # even per dim
    if nc.min() < 4:
        return None
    if cap is None:
        mean_occ = n / float(np.prod(nc))
        cap = max(4, int(math.ceil(mean_occ * 2.5)))
    return CBSpec(ncells=tuple(int(x) for x in nc), cap=int(cap))


@struct.dataclass
class CBState:
    """Sampler state for one chain under the checkerboard kernel."""

    system: SystemState
    key: jax.Array
    shift: jax.Array  # [d] grid origin offset
    payload: jax.Array  # [nc_total, cap, d+2]: position, species, id (as floats)
    idx: jax.Array  # [nc_total, cap] i32 particle ids, -1 padded
    attempted: jax.Array  # displacement-move counters
    accepted: jax.Array
    overflow: jax.Array  # sticky bool


# ---------------------------------------------------------------------------
# Binning
# ---------------------------------------------------------------------------


def _cell_vec(x, shift, box, spec: CBSpec):
    nc = jnp.asarray(spec.ncells, jnp.int32)
    xf = fold_back(x - shift, box)
    c = jnp.floor(xf / box * nc.astype(x.dtype)).astype(jnp.int32)
    return jnp.clip(c, 0, nc - 1)


def rebin(system: SystemState, spec: CBSpec, shift):
    """Sort-and-scatter payload build (positions + species + ids per cell)."""
    n, d = system.position.shape
    cvec = _cell_vec(system.position, shift, system.box, spec)
    cell = cvec[..., 0]
    for k in range(1, spec.d):
        cell = cell * spec.ncells[k] + cvec[..., k]
    order = jnp.argsort(cell, stable=True).astype(jnp.int32)
    sorted_cell = cell[order]
    first = jnp.searchsorted(sorted_cell, sorted_cell, side="left")
    rank = jnp.arange(n, dtype=jnp.int32) - first.astype(jnp.int32)

    dt = system.position.dtype
    idx = jnp.full((spec.total, spec.cap), -1, jnp.int32)
    idx = idx.at[sorted_cell, rank].set(order, mode="drop")
    # payload lanes: position[0:d], species (d), particle id (d+1) — the id
    # rides as an exact small float so ONE pad+slice pipeline serves the
    # whole substep (ids < 2^24 are exact in f32)
    payload = jnp.zeros((spec.total, spec.cap, d + 2), dt)
    payload = payload.at[..., d].set(-1.0)  # species lane -1 == empty slot
    payload = payload.at[..., d + 1].set(-1.0)
    rows = jnp.concatenate(
        [
            system.position[order],
            system.species[order][:, None].astype(dt),
            order[:, None].astype(dt),
        ],
        axis=-1,
    )
    payload = payload.at[sorted_cell, rank].set(rows, mode="drop")
    count = jnp.zeros((spec.total,), jnp.int32).at[cell].add(1)
    overflow = jnp.any(count > spec.cap)
    return payload, idx, overflow


def init_cb_state(system: SystemState, spec: CBSpec, seed) -> CBState:
    key = jax.random.PRNGKey(seed) if jnp.ndim(seed) == 0 else seed
    d = system.position.shape[-1]
    shift = jnp.zeros((d,), system.position.dtype)
    payload, idx, overflow = rebin(system, spec, shift)
    cdt = jnp.int64 if jax.config.jax_enable_x64 else jnp.int32
    return CBState(
        system=system,
        key=key,
        shift=shift,
        payload=payload,
        idx=idx,
        attempted=jnp.zeros((), cdt),
        accepted=jnp.zeros((), cdt),
        overflow=overflow,
    )


# ---------------------------------------------------------------------------
# Pair-parameter selection without gathers (small static species count)
# ---------------------------------------------------------------------------

_PAIR_FIELDS = ("kind", "eps4", "sigma2", "ipl_n", "rcut2", "shift", "c0", "c2s2", "c4s4")


class _P:
    """Attribute bundle matching pair_potential's parameter protocol."""

    __slots__ = _PAIR_FIELDS

    def __init__(self, **kw):
        for k, v in kw.items():
            setattr(self, k, v)


def _pair_params(table: PairTable, sa, sb, fields=_PAIR_FIELDS):
    """table[sa, sb] per field via a static S x S where-chain (no gathers).
    `fields` prunes the chains to what the potential evaluation will touch
    (potentials.pair_fields_needed)."""
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


# ---------------------------------------------------------------------------
# The hyper-sweep
# ---------------------------------------------------------------------------


def build_hyper_sweep_fn(
    spec: CBSpec,
    table: PairTable,
    n: int,
    sweepstep: Optional[int] = None,
    use_pallas: bool = False,
    inner: int = 4,
):
    """Returns hyper_sweep(cb_state, sigma) -> cb_state: ~sweepstep attempted
    moves (default n) as ceil(sweepstep / (n_active*inner)) substeps.

    `inner` runs that many SEQUENTIAL Metropolis sub-moves per active cell
    per substep against the once-extracted neighbour blocks (the active
    cell's own block is updated in-register between sub-moves; no other
    active cell ever appears in those blocks, so cross-cell independence is
    preserved). This amortises the block extraction and scan-step dispatch
    over `inner` attempted moves — the main HBM/overhead lever.

    use_pallas fuses the ΔE evaluation into one VMEM-resident pallas kernel
    (moves/pallas_kernels.py); off-TPU it runs in interpreter mode, so keep
    it False for CPU production runs."""
    d = spec.d
    A_dims = spec.active_dims
    A = spec.n_active
    cap = spec.cap
    inner = max(1, int(inner))
    n_sub = max(1, -(-int(sweepstep or n) // (A * inner)))
    kp = kinds_present(table)  # static: prunes dead potential branches
    from ..models.potentials import pair_fields_needed
    pf = pair_fields_needed(kp)
    offsets = list(itertools.product((-1, 0, 1), repeat=d))
    center_idx = offsets.index((0,) * d)
    grids = np.meshgrid(*[2 * np.arange(ak) for ak in A_dims], indexing="ij")
    base_coords = np.stack([g.reshape(-1) for g in grids], axis=-1)  # [A, d]

    def hyper_sweep(cb: CBState, sigma, color_key=None) -> CBState:
        """One hyper-sweep. `color_key` drives the substep color sequence;
        under vmap it MUST be passed unbatched (in_axes=None) and shared by
        all chains — a per-chain color would turn the neighbour-block
        dynamic_slice into a batched-index gather, which serialises on TPU
        (measured 400x slowdown). Sharing the color sequence across chains
        correlates only WHICH sublattice is active each substep, not the
        per-chain picks/displacements/acceptances; each chain remains a valid
        sampler. When None (single-chain use), it is derived from cb.key.
        """
        dt = cb.system.position.dtype
        sigma = jnp.asarray(sigma, dt)
        key, k_shift, k_scan, k_color_fallback = jax.random.split(cb.key, 4)
        if color_key is None:
            color_key = k_color_fallback
        colors = jax.random.randint(color_key, (n_sub, d), 0, 2, dtype=jnp.int32)
        shift = jax.random.uniform(k_shift, (d,), dt) * cb.system.box
        payload0, idx0, ovf = rebin(cb.system, spec, shift)
        # all per-substep randomness pregenerated in 3 bulk draws — keeps
        # ~6 threefry kernels per substep out of the scan body
        k_pick, k_delta, k_acc = jax.random.split(k_scan, 3)
        u_pick = jax.random.uniform(k_pick, (n_sub, inner, A), dt, maxval=1.0 - 1e-7)
        deltas = jax.random.normal(k_delta, (n_sub, inner, A, d), dt)
        u_acc = jax.random.uniform(
            k_acc, (n_sub, inner, A), dt, minval=jnp.finfo(dt).tiny
        )

        def substep(carry, scan_in):
            cbits, u_pick_s, delta_s, u_acc_s = scan_in
            system, payload, idx = carry
            box = system.box

            # --- neighbour blocks: pad(wrap) + one dynamic slice + static
            # strided slices (no vector-index gathers) ----------------------
            grid = payload.reshape(spec.ncells + (cap, d + 2))
            padded = jnp.pad(grid, [(1, 1)] * d + [(0, 0), (0, 0)], mode="wrap")
            zero = jnp.asarray(0, jnp.int32)
            start = tuple(cbits[k] for k in range(d)) + (zero, zero)
            sizes = tuple(nk + 1 for nk in spec.ncells) + (cap, d + 2)
            block = jax.lax.dynamic_slice(padded, start, sizes)

            def nb_slice(t):
                sl = tuple(
                    slice(1 + t[k], 1 + t[k] + 2 * A_dims[k] - 1, 2) for k in range(d)
                )
                return block[sl].reshape(A, cap, d + 2)

            center = nb_slice((0,) * d)  # [A, cap, d+2], updated per sub-move
            sp_c = center[..., d].astype(jnp.int32)  # -1 == empty (static)
            idx_c = center[..., d + 1].astype(jnp.int32)  # id lane (static)
            # the 26 surrounding blocks never contain another ACTIVE cell, so
            # they are static across the inner sub-moves
            others = jnp.concatenate(
                [nb_slice(t) for i, t in enumerate(offsets) if i != center_idx],
                axis=1,
            )  # [A, 26*cap, d+2]
            pos_o = others[..., :d]
            sp_o = others[..., d].astype(jnp.int32)
            valid_o = sp_o >= 0

            coords = jnp.asarray(base_coords, jnp.int32) + cbits[None, :]  # [A, d]
            flat = coords[:, 0]
            for k in range(1, d):
                flat = flat * spec.ncells[k] + coords[:, k]

            occ = jnp.sum((sp_c >= 0).astype(jnp.int32), axis=-1)  # [A]
            occupied = occ > 0
            slot_iota = jnp.arange(cap, dtype=jnp.int32)
            iota_n = jnp.arange(n, dtype=jnp.int32)

            position = system.position
            energy = system.energy
            att = jnp.zeros((), cb.attempted.dtype)
            acc = jnp.zeros((), cb.accepted.dtype)

            for kin in range(inner):
                # --- pick one particle per occupied active cell -------------
                # floor(u * occ) is uniform over [0, occ) for u ~ U[0, 1)
                r = jnp.floor(u_pick_s[kin] * occ.astype(dt)).astype(jnp.int32)
                pick = slot_iota[None, :] == r[:, None]  # [A, cap]
                pos_c = center[..., :d]
                x_a = jnp.sum(jnp.where(pick[..., None], pos_c, 0.0), axis=1)
                s_a = jnp.sum(jnp.where(pick, sp_c, 0), axis=1)
                id_a = jnp.sum(jnp.where(pick, idx_c, 0), axis=1)

                # --- proposal: Gaussian, auto-reject on cell exit -----------
                delta = sigma * delta_s[kin]
                x_new = x_a + delta
                in_cell = jnp.all(
                    _cell_vec(x_new, shift, box, spec) == coords, axis=-1
                )

                # --- ΔE: own (live) block + static neighbour blocks ---------
                if use_pallas:
                    from . import pallas_kernels as PK

                    nb_flat = jnp.concatenate([center, others], axis=1)
                    planes = jnp.moveaxis(nb_flat[..., : d + 1], -1, 0)
                    sp_pl = planes[d]
                    self_m = jnp.concatenate(
                        [pick, jnp.zeros((A, 26 * cap), bool)], axis=1
                    )
                    valid_m = (sp_pl >= 0) & ~self_m
                    act = jnp.concatenate(
                        [x_a, x_new, s_a.astype(dt)[:, None],
                         jnp.zeros((A, 7 - 2 * d), dt)],
                        axis=1,
                    )
                    de = PK.delta_e_planes(
                        planes,
                        act,
                        valid_m.astype(dt),
                        PK.pack_table(table, dt),
                        box[None, :],
                        table.n_species,
                        kinds_present=kp,
                    )[:, 0]
                else:
                    de = jnp.zeros((A,), dt)
                    for pos_nb, sp_nb, valid in (
                        (pos_c, sp_c, (sp_c >= 0) & ~pick),
                        (pos_o, sp_o, valid_o),
                    ):
                        p = _pair_params(table, s_a[:, None], jnp.maximum(sp_nb, 0), pf)
                        r2_old = dist2(pos_nb, x_a[:, None, :], box)
                        r2_new = dist2(pos_nb, x_new[:, None, :], box)
                        du = pair_potential(r2_new, p, kp) - pair_potential(r2_old, p, kp)
                        de = de + jnp.sum(
                            jnp.where(valid, du, jnp.zeros_like(du)), axis=-1
                        )

                # --- Metropolis accept (overlap → de huge → reject) ---------
                accept = (
                    (jnp.log(u_acc_s[kin]) < -de / system.temperature)
                    & in_cell
                    & occupied
                )
                booked = jnp.where(
                    accept & jnp.isfinite(de), de, jnp.zeros_like(de)
                )

                # --- apply: live center update + one-hot position scatter ----
                upd = accept.astype(dt)
                dxa = (x_new - x_a) * upd[:, None]  # [A, d]
                moved = (pick & accept[:, None])[..., None]  # [A, cap, 1]
                center = center.at[..., :d].set(
                    jnp.where(moved, x_new[:, None, :], pos_c)
                )
                onehot_n = (iota_n[None, :] == id_a[:, None]).astype(dt)  # [A, N]
                position = position + jnp.einsum("an,ad->nd", onehot_n, dxa)
                energy = energy + jnp.sum(booked)
                att = att + jnp.sum(occupied.astype(att.dtype))
                acc = acc + jnp.sum(accept.astype(acc.dtype))

            # --- write the live center rows back into the payload ------------
            iota_c = jnp.arange(spec.total, dtype=jnp.int32)
            onehot_c = (iota_c[None, :] == flat[:, None]).astype(dt)  # [A, total]
            rows = center.reshape(A, cap * (d + 2))
            scattered = jnp.einsum("ac,ax->cx", onehot_c, rows).reshape(
                spec.total, cap, d + 2
            )
            is_active = jnp.sum(onehot_c, axis=0).reshape(spec.total, 1, 1) > 0
            payload = jnp.where(is_active, scattered, payload)

            system = system.replace(position=position, energy=energy)
            return (system, payload, idx), (att, acc)

        (system, payload, idx), (att_s, acc_s) = jax.lax.scan(
            substep, (cb.system, payload0, idx0), (colors, u_pick, deltas, u_acc)
        )
        return cb.replace(
            system=system,
            key=key,
            shift=shift,
            payload=payload,
            idx=idx,
            attempted=cb.attempted + jnp.sum(att_s),
            accepted=cb.accepted + jnp.sum(acc_s),
            overflow=cb.overflow | ovf,
        )

    return hyper_sweep
