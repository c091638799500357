"""Spatial domain decomposition of the checkerboard grid (SURVEY §2.10/§5.7).

The chains axis is the primary scale-out dimension (embarrassingly parallel);
this module adds the second axis: for single systems too large for one chip's
HBM, the cell grid itself is sharded along its first dimension over a mesh
axis, and each color substep exchanges one halo cell-slab with each grid
neighbour via `jax.lax.ppermute` (nearest-neighbour ICI traffic, bytes =
one cell-column of payload per substep).

Decomposition invariants (why this is exact, not approximate):

- Device p owns a slab of `w = ncells[0] / P` cell-columns starting at the
  EVEN global column p·w, so local checkerboard parity equals global parity
  on every device and all devices step the same color schedule in lockstep.
- A move only reads the 3^d block around its active cell. Actives at local
  column 0 / w-1 read the halo column, which holds the neighbouring device's
  boundary cells from the end of the previous substep — exactly the state an
  unsharded kernel would read, because a substep never writes cells adjacent
  to a same-color active cell in dimension 0 beyond its own column.
- The halo columns carry image-corrected positions (±L on the x plane across
  the periodic seam, devices 0 ↔ P−1), so in-substep distances stay plain
  coordinate differences exactly as in moves/checkerboard.py.

The per-substep move math mirrors the displacement branch of
checkerboard.build_hyper_sweep_fn (atomic Displacement/SimpleGaussian pools —
the hot production move); swap/flip pools stay on the chains-parallel
backend. The same global RNG stream is consumed (bulk draws sharded over the
active-cell axis), so a sharded run reproduces the unsharded kernel's
trajectory exactly (tests/test_spatial.py).
"""

from __future__ import annotations

import itertools
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.potentials import pair_fields_needed, pair_potential
from ..models.tables import PairTable, kinds_present
from ..moves.checkerboard import (
    CBSpec,
    CBState,
    _pair_params_rows,
    _select_row,
    rebin,
    unbin_positions,
)


def spatial_slab_width(spec: CBSpec, n_devices: int) -> Optional[int]:
    """Cell-columns per device, or None if the grid cannot be sharded over
    `n_devices` (needs ncells[0] divisible into even slabs of >= 2)."""
    ncx = spec.ncells[0]
    if ncx % n_devices:
        return None
    w = ncx // n_devices
    if w < 2 or w % 2:
        return None
    return w


def build_spatial_hyper_sweep_fn(
    spec: CBSpec,
    table: PairTable,
    n: int,
    mesh: Mesh,
    axis: str = "space",
    sweepstep: Optional[int] = None,
    inner: int = 4,
    sweeps: int = 1,
):
    """Returns hyper_sweep(cb_state, sigma) with the grid sharded over
    `mesh[axis]`. State in/out is an ordinary (global) CBState; binning and
    position reconstruction stay global, the color-substep scan runs under
    shard_map with ppermute halo exchange."""
    d = spec.d
    P_dev = mesh.shape[axis]
    w = spatial_slab_width(spec, P_dev)
    if w is None:
        raise ValueError(
            f"grid ncells[0]={spec.ncells[0]} cannot shard into even slabs "
            f"over {P_dev} devices"
        )
    cap = spec.cap
    inner = max(1, int(inner))
    sweeps = max(1, int(sweeps))
    C = 2**d
    colors = list(itertools.product((0, 1), repeat=d))
    # local active geometry: slab of w columns → w/2 actives along dim 0
    A_dims_local = (w // 2,) + tuple(nk // 2 for nk in spec.ncells[1:])
    A_local = int(np.prod(A_dims_local))
    A_global = A_local * P_dev
    rounds = max(1, -(-int(sweepstep or n) // (A_global * inner * C)))
    kp = kinds_present(table)
    pf = pair_fields_needed(kp)
    offsets = [t for t in itertools.product((-1, 0, 1), repeat=d) if any(t)]
    grids = np.meshgrid(*[2 * np.arange(ak) for ak in A_dims_local], indexing="ij")
    base_coords_local = np.stack([g.reshape(-1) for g in grids], axis=-1)
    NP = d + 1  # atomic payload only
    fwd = [(i, (i + 1) % P_dev) for i in range(P_dev)]  # send right
    bwd = [(i, (i - 1) % P_dev) for i in range(P_dev)]  # send left

    def sharded_rounds(slab, energy0, rnd, sigma, box, temperature):
        """shard_map body: slab [NP, w, nc1.., cap] (local, no pads) +
        per-device slices of the bulk randoms; returns the updated slab and
        psum'd booked-energy / attempt / accept tallies."""
        pidx = jax.lax.axis_index(axis)
        dt = slab.dtype
        Lx = box[0]

        # pad dims 1..d-1 with local wrap (whole dimensions live on-device,
        # image-corrected exactly like the unsharded kernel) …
        padded = jnp.pad(
            slab,
            [(0, 0), (0, 0)] + [(1, 1)] * (d - 1) + [(0, 0)],
            mode="wrap",
        )
        for j in range(1, d):
            lo = (j,) + (slice(None),) * j + (0,)
            hi = (j,) + (slice(None),) * j + (spec.ncells[j] + 1,)
            padded = padded.at[lo].add(-box[j])
            padded = padded.at[hi].add(box[j])

        # … and dim 0 with neighbour columns over ICI. The column received
        # across the periodic seam carries x ∓ L on plane 0.
        def exchange_halo_x(padded_inner):
            left_col = padded_inner[:, 1]  # my first interior column
            right_col = padded_inner[:, w]  # my last interior column
            # my right halo (w+1) = right neighbour's first column
            recv_right = jax.lax.ppermute(left_col, axis, bwd)
            # my left halo (0) = left neighbour's last column
            recv_left = jax.lax.ppermute(right_col, axis, fwd)
            corr_hi = jnp.where(pidx == P_dev - 1, Lx, jnp.asarray(0.0, dt))
            corr_lo = jnp.where(pidx == 0, -Lx, jnp.asarray(0.0, dt))
            recv_right = recv_right.at[0].add(corr_hi)
            recv_left = recv_left.at[0].add(corr_lo)
            padded_inner = padded_inner.at[:, w + 1].set(recv_right)
            padded_inner = padded_inner.at[:, 0].set(recv_left)
            return padded_inner

        pad0 = jnp.pad(padded, [(0, 0), (1, 1)] + [(0, 0)] * d, mode="wrap")
        pad0 = exchange_halo_x(pad0)

        slot_iota = jnp.arange(cap, dtype=jnp.int32)
        nc_glob_x = spec.ncells[0]
        x_col_offset = pidx.astype(jnp.int32) * w

        def color_substep(padded, energy, att, acc, ci, rnd_c):
            c = colors[ci]

            def sl(k, off, span):
                return slice(c[k] + off + 1, c[k] + off + 2 * span, 2)

            spans = A_dims_local
            csl = tuple(sl(k, 0, spans[k]) for k in range(d))
            center = padded[(slice(None),) + csl].reshape(NP, A_local, cap)
            center_sp = center[d]
            center_pos = [center[j] for j in range(d)]
            others = jnp.concatenate(
                [
                    padded[
                        (slice(None),)
                        + tuple(sl(k, t[k], spans[k]) for k in range(d))
                    ].reshape(NP, A_local, cap)
                    for t in offsets
                ],
                axis=-1,
            )
            pos_o = others[:d]
            sp_o = others[d]
            valid_o = sp_o >= 0
            occ = jnp.sum((center_sp >= 0).astype(jnp.int32), axis=-1)
            occupied = occ > 0
            coords = jnp.asarray(base_coords_local + np.asarray(c), jnp.int32)
            # global x coordinate of each active cell (for in-cell checks)
            gx = coords[:, 0] + x_col_offset

            rows_o = _pair_params_rows(table, jnp.maximum(sp_o, 0.0), pf)
            rows_c = _pair_params_rows(table, jnp.maximum(center_sp, 0.0), pf)

            for kin in range(inner):
                r = jnp.floor(rnd_c["up"][kin] * occ.astype(dt)).astype(jnp.int32)
                pick = slot_iota[None, :] == r[:, None]
                x_a = [
                    jnp.sum(jnp.where(pick, center_pos[j], 0.0), axis=-1)
                    for j in range(d)
                ]
                s_a = jnp.sum(jnp.where(pick, center_sp, 0.0), axis=-1)
                x_new = [
                    x_a[j] + sigma * rnd_c["dl"][kin, j] for j in range(d)
                ]
                in_cell = occupied
                cx = jnp.floor(x_new[0] / box[0] * nc_glob_x).astype(jnp.int32)
                in_cell = in_cell & (cx == gx)
                for j in range(1, d):
                    cj = jnp.floor(x_new[j] / box[j] * spec.ncells[j]).astype(
                        jnp.int32
                    )
                    in_cell = in_cell & (cj == coords[:, j])

                de = jnp.zeros((A_local,), dt)
                for pos_nb, rows_nb, valid in (
                    (center_pos, rows_c, (center_sp >= 0) & ~pick),
                    (pos_o, rows_o, valid_o),
                ):
                    p = _select_row(rows_nb, s_a[:, None], pf)
                    r2o = jnp.zeros(valid.shape, dt)
                    r2n = jnp.zeros(valid.shape, dt)
                    for j in range(d):
                        dxo = pos_nb[j] - x_a[j][:, None]
                        dxn = pos_nb[j] - x_new[j][:, None]
                        r2o = r2o + dxo * dxo
                        r2n = r2n + dxn * dxn
                    du = pair_potential(r2n, p, kp) - pair_potential(r2o, p, kp)
                    de = de + jnp.sum(
                        jnp.where(valid, du, jnp.zeros_like(du)), axis=-1
                    )

                accept = (jnp.log(rnd_c["ua"][kin]) < -de / temperature) & in_cell
                booked = jnp.where(
                    accept & jnp.isfinite(de), de, jnp.zeros_like(de)
                )
                moved = pick & accept[:, None]
                center_pos = [
                    jnp.where(moved, x_new[j][:, None], center_pos[j])
                    for j in range(d)
                ]
                energy = energy + jnp.sum(booked)
                att = att + jnp.sum(occupied.astype(att.dtype))
                acc = acc + jnp.sum(accept.astype(acc.dtype))

            new_center = jnp.stack(center_pos).reshape(
                (d,) + tuple(A_dims_local) + (cap,)
            )
            padded = padded.at[(slice(0, d),) + csl].set(new_center)

            # refresh halos: dims >= 1 locally (one face each, as in the
            # unsharded kernel), dim 0 across devices via ppermute
            for k in range(1, d):
                ax = 1 + k
                nc_k = spec.ncells[k]
                if c[k] == 0:
                    src = jax.lax.index_in_dim(padded, 1, ax, keepdims=False)
                    src = src.at[k].add(box[k])
                    padded = jax.lax.dynamic_update_index_in_dim(
                        padded, src, nc_k + 1, ax
                    )
                else:
                    src = jax.lax.index_in_dim(padded, nc_k, ax, keepdims=False)
                    src = src.at[k].add(-box[k])
                    padded = jax.lax.dynamic_update_index_in_dim(padded, src, 0, ax)
            padded = exchange_halo_x(padded)
            return padded, energy, att, acc

        def round_body(carry, rnd_r):
            padded, energy, att, acc = carry
            for ci in range(C):
                rnd_c = {k: v[ci] for k, v in rnd_r.items()}
                padded, energy, att, acc = color_substep(
                    padded, energy, att, acc, ci, rnd_c
                )
            return (padded, energy, att, acc), None

        cdt = jnp.int64 if jax.config.jax_enable_x64 else jnp.int32
        # tallies become device-varying inside the scan body — mark the
        # initial zeros as varying over the mesh axis so carry types match
        zeros = jax.lax.pcast(
            (jnp.zeros((), energy0.dtype), jnp.zeros((), cdt), jnp.zeros((), cdt)),
            (axis,),
            to="varying",
        )
        (padded, energy, att, acc), _ = jax.lax.scan(
            round_body, (pad0,) + zeros, rnd
        )
        interior = (slice(None), slice(1, w + 1)) + tuple(
            slice(1, -1) for _ in range(d - 1)
        )
        slab_out = padded[interior]
        booked = jax.lax.psum(energy, axis)
        att = jax.lax.psum(att, axis)
        acc = jax.lax.psum(acc, axis)
        return slab_out, booked, att, acc

    in_specs = (
        P(None, axis),  # slab [NP, x-sharded, rest replicated]
        P(),
        {  # bulk randoms: active axis sharded (contiguous device blocks
            # match the x-major global active ordering)
            "up": P(None, None, None, axis),
            "dl": P(None, None, None, None, axis),
            "ua": P(None, None, None, axis),
        },
        P(),
        P(),
        P(),
    )
    sharded = jax.shard_map(
        sharded_rounds,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=(P(None, axis), P(), P(), P()),
    )

    def hyper_sweep(cb: CBState, sigma) -> CBState:
        dt = cb.system.position.dtype
        box = cb.system.box
        key, k_shift, k_rand = jax.random.split(cb.key, 3)
        shift = jax.random.uniform(k_shift, (d,), dt) * box
        planes0, idx, slot, ovf = rebin(cb.system, spec, shift)
        grid0 = planes0.reshape((NP,) + spec.ncells + (cap,))

        # identical bulk-draw layout to the unsharded kernel, so both
        # kernels consume the same randoms per active cell (exact-parity
        # test hook); the active axis is sharded by shard_map
        R = sweeps * rounds
        k_pick, _k_pick2, k_delta, k_acc = jax.random.split(k_rand, 4)
        rnd = dict(
            up=jax.random.uniform(
                k_pick, (R, C, inner, A_global), dt, maxval=1.0 - 1e-7
            ),
            dl=jax.random.normal(k_delta, (R, C, inner, d, A_global), dt),
            ua=jax.random.uniform(
                k_acc, (R, C, inner, A_global), dt, minval=jnp.finfo(dt).tiny
            ),
        )

        grid_out, booked, att, acc = sharded(
            grid0, cb.system.energy, rnd, jnp.asarray(sigma, dt), box,
            cb.system.temperature,
        )
        planes = grid_out.reshape(NP, spec.total, cap)
        position = unbin_positions(planes, slot, shift, box)
        system = cb.system.replace(
            position=position, energy=cb.system.energy + booked
        )
        return cb.replace(
            system=system,
            key=key,
            shift=shift,
            planes=planes,
            idx=idx,
            slot=slot,
            attempted=cb.attempted + att.astype(cb.attempted.dtype),
            accepted=cb.accepted + acc.astype(cb.accepted.dtype),
            overflow=cb.overflow | ovf,
        )

    return hyper_sweep
