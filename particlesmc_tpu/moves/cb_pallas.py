"""Pallas TPU kernel for the checkerboard displacement substep.

Why this exists (measured on TPU v5e, round 3): the XLA color-substep runs
the `inner` sequential sub-moves as `inner` separate fusions, and every one
re-reads the static 26-cell neighbour planes from HBM — an xprof trace shows
the fused ΔE reductions pinned at ~810 GB/s (HBM peak) with arithmetic
intensity 3.5 flops/byte, i.e. the kernel is bandwidth-bound, and a
flops-halving ablation does not change its runtime. XLA cannot hoist the
reuse: sibling fusions do not share operand reads, and a batched formulation
materialises the [inner, A, L] broadcast instead of streaming it.

This kernel runs the WHOLE inner loop of one color substep in a single
Pallas program: the packed (center + 26 neighbour cells) position/species
lanes are loaded into VMEM once and all `inner` Metropolis sub-moves are
applied against them in-register, writing back only the updated center
block. HBM traffic per substep drops from ~inner reads of the neighbour
planes to one.

Semantics are IDENTICAL to the XLA path (moves/checkerboard.py displacement
branch): uniform pick per occupied active cell (floor(u * occ), with
replacement), Gaussian proposal, auto-reject on cell exit (here as a bounds
compare against the cell's [lo, hi) interval — the same region the binning
floor defines), Metropolis accept at temperature T (the threshold
-T*log(u_accept) is precomputed outside), booked energy excludes non-finite
ΔE. The physics (pair_potential, species-pair parameter selection) is the
same library code, traced inside the kernel. Trajectories agree with the
XLA path to float rounding (sum order differs), which flips an accept only
on measure-zero boundaries; statistical gates and the energy-ledger
consistency test pin parity (tests/test_cb_pallas.py).

Scope: displacement-only pools on atomic systems (static species planes).
Swap/flip pools and molecular systems stay on the XLA path.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from ..models.potentials import pair_potential


def build_disp_substep(
    table,
    kp: Tuple[int, ...],
    pf: Tuple[str, ...],
    *,
    d: int,
    A: int,
    cap: int,
    inner: int,
    interpret: bool = False,
):
    """Returns `substep(packed_pos, packed_sp, up, dl, thr, lo, hi)` for ONE
    chain (vmap lifts it to a batch):

      packed_pos [d, A, LP]  center (first `cap` lanes, LIVE) + 26-cell
                             neighbour positions, shifted frame, halos
                             image-corrected (plain differences are exact)
      packed_sp  [A, LP]     species lanes, -1 = empty
      up         [inner, A]  U[0,1) pick draws
      dl         [inner, d, A] sigma-scaled Gaussian steps
      thr        [inner, A]  accept thresholds -T*log(u)
      lo, hi     [d, A]      active-cell bounds per dim (shifted frame)

    -> (center_pos [d, A, cap], booked [1,1] f32-like, acc_k [1, inner] i32)
    """
    from .checkerboard import _pair_params  # shared species-pair selection

    # pallas kernels cannot close over traced values; the model table is
    # static physics, so bake its fields in as numpy constants
    class _StaticTable:
        pass

    tbl = _StaticTable()
    tbl.n_species = table.n_species
    for f in pf:
        setattr(tbl, f, np.asarray(getattr(table, f)))

    def kernel(pos_ref, sp_ref, up_ref, dl_ref, thr_ref, lo_ref, hi_ref,
               out_pos_ref, booked_ref, acc_ref):
        sp = sp_ref[...]  # [A, LP]
        dt = pos_ref.dtype
        lanes = jax.lax.broadcasted_iota(jnp.int32, sp.shape, 1)
        valid_sp = sp >= 0
        sp_safe = jnp.maximum(sp, jnp.zeros_like(sp))
        occ = jnp.sum(
            jnp.where(valid_sp[:, :cap], 1, 0).astype(jnp.int32),
            axis=-1, keepdims=True,
        )  # [A, 1]
        occupied = occ > 0
        pos = [pos_ref[j] for j in range(d)]  # live packed planes [A, LP]
        booked = jnp.zeros((), dt)
        accs = []
        for k in range(inner):
            upk = up_ref[k][:, None]        # [A, 1]
            thrk = thr_ref[k][:, None]
            r = jnp.floor(upk * occ.astype(dt)).astype(jnp.int32)
            pick = lanes == r               # one-hot on center lanes [A, LP]
            x_a = [
                jnp.sum(jnp.where(pick, pos[j], jnp.zeros_like(pos[j])),
                        axis=-1, keepdims=True)
                for j in range(d)
            ]  # d x [A, 1]
            s_a = jnp.sum(
                jnp.where(pick, sp, jnp.zeros_like(sp)), axis=-1, keepdims=True
            )
            x_new = [x_a[j] + dl_ref[k, j][:, None] for j in range(d)]
            in_cell = occupied
            for j in range(d):
                in_cell = in_cell & (x_new[j] >= lo_ref[j][:, None]) & (
                    x_new[j] < hi_ref[j][:, None]
                )

            p = _pair_params(tbl, s_a, sp_safe, pf)
            r2o = jnp.zeros(sp.shape, dt)
            r2n = jnp.zeros(sp.shape, dt)
            for j in range(d):
                dxo = pos[j] - x_a[j]
                dxn = pos[j] - x_new[j]
                r2o = r2o + dxo * dxo
                r2n = r2n + dxn * dxn
            du = pair_potential(r2n, p, kp) - pair_potential(r2o, p, kp)
            masked = valid_sp & ~pick
            de = jnp.sum(
                jnp.where(masked, du, jnp.zeros_like(du)), axis=-1, keepdims=True
            )  # [A, 1]

            accept = (de < thrk) & in_cell
            booked = booked + jnp.sum(
                jnp.where(accept & jnp.isfinite(de), de, jnp.zeros_like(de))
            )
            moved = pick & accept
            pos = [jnp.where(moved, x_new[j], pos[j]) for j in range(d)]
            accs.append(jnp.sum(accept.astype(jnp.int32)))

        for j in range(d):
            out_pos_ref[j] = pos[j][:, :cap]
        booked_ref[...] = jnp.reshape(booked, (1, 1))
        acc_ref[...] = jnp.stack(accs)[None, :]

    def substep(packed_pos, packed_sp, up, dl, thr, lo, hi):
        dt = packed_pos.dtype
        lp = packed_pos.shape[-1]
        out_shape = (
            jax.ShapeDtypeStruct((d, A, cap), dt),
            jax.ShapeDtypeStruct((1, 1), dt),
            jax.ShapeDtypeStruct((1, inner), jnp.int32),
        )
        out_pos, booked, acc_k = pl.pallas_call(
            kernel,
            out_shape=out_shape,
            interpret=interpret,
        )(packed_pos, packed_sp, up, dl, thr, lo, hi)
        return out_pos, booked[0, 0], acc_k[0]

    return substep
