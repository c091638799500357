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

The per-sub-move physics is SHARED with the chains-parallel kernel
(checkerboard._disp_submove_atomic / _swap_submove_atomic — one copy, no
fork); this module owns only grid geometry and halo orchestration. Pools of
Displacement and DiscreteSwap/DoubleUniform moves are supported on atomic
systems (the same static slot schedule as the unsharded kernel); molecular
pools stay on the chains-parallel backend. The same global RNG stream is
consumed (bulk draws sharded over the active-cell axis), so a sharded run
reproduces the unsharded kernel's trajectory exactly (tests/test_spatial.py).

Overflowing rebin shifts are handled exactly like the unsharded kernel:
the block becomes the identity kernel and is counted in CBState.skipped
(unbiased — see moves/checkerboard.py skip-on-overflow).

Reference parity note: the reference has no spatial decomposition (or any
multi-device path) at all — its N-scaling story is the O(1)-per-move
neighbour list (reference src/neighbours.jl); this is the TPU-native
equivalent of scaling the particle-count axis past one device's memory.
"""

from __future__ import annotations

import itertools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..models.tables import PairTable, kinds_present
from ..models.potentials import pair_fields_needed
from ..moves.checkerboard import (
    CBSpec,
    CBState,
    _disp_submove_atomic,
    _pair_params_rows,
    _pair_params_static_row,
    _slot_schedule,
    _swap_submove_atomic,
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
    pool=None,
):
    """Returns the sharded hyper-sweep with the grid split over `mesh[axis]`.

    With `pool=None` (legacy) the returned fn is `hyper_sweep(cb, sigma)`
    (single Displacement move). With a `pool` of Move specs it is
    `hyper_sweep(cb, pool_params)` — Displacement and DiscreteSwap/
    DoubleUniform moves on atomic systems, same static slot schedule as
    moves/checkerboard.py; CBState counters must then be [len(pool)].

    State in/out is an ordinary (global) CBState; binning and position
    reconstruction stay global, the color-substep scan runs under shard_map
    with ppermute halo exchange."""
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

    legacy = pool is None
    if legacy:
        from ..moves.base import displacement as _mk_disp

        pool = (_mk_disp(1.0),)
    pool = tuple(pool)
    n_moves = len(pool)
    for mv in pool:
        ok = mv.action == "displacement" or (
            mv.action == "swap" and mv.policy == "double_uniform"
        )
        if not ok:
            raise ValueError(
                f"spatial backend supports Displacement and DiscreteSwap/"
                f"DoubleUniform pools on atomic systems; {mv.action}/"
                f"{mv.policy} needs another backend"
            )
    has_swap = any(mv.action == "swap" for mv in pool)
    species_live = has_swap
    np_upd = d + 1 if species_live else d  # planes written back per substep
    schedule = _slot_schedule(pool, C, inner)

    def sharded_rounds(slab, energy0, rnd, sig_slot, box, temperature):
        """shard_map body: slab [NP, w, nc1.., cap] (local, no pads) +
        per-device slices of the bulk randoms; returns the updated slab and
        psum'd booked-energy / per-move attempt / accept tallies."""
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
            col_sched = schedule[ci]

            def sl(k, off, span):
                return slice(c[k] + off + 1, c[k] + off + 2 * span, 2)

            spans = A_dims_local
            csl = tuple(sl(k, 0, spans[k]) for k in range(d))
            center = padded[(slice(None),) + csl].reshape(NP, A_local, cap)
            center_sp = center[d]  # LIVE if pool swaps
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
            sp_o_safe = jnp.maximum(sp_o, 0.0)
            occ = jnp.sum((center_sp >= 0).astype(jnp.int32), axis=-1)
            occupied = occ > 0
            coords = jnp.asarray(base_coords_local + np.asarray(c), jnp.int32)
            # global x coordinate of each active cell (for in-cell checks)
            gx = coords[:, 0] + x_col_offset

            slots_here = set(int(m) for m in col_sched)
            any_disp = any(pool[m].action == "displacement" for m in slots_here)
            rows_o = rows_c_static = None
            if any_disp:
                rows_o = _pair_params_rows(table, sp_o_safe, pf)
                if not species_live:
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

            def spatial_bounds(x_new):
                """In-cell auto-reject with the x column checked GLOBALLY."""
                cx = jnp.floor(x_new[0] / box[0] * nc_glob_x).astype(jnp.int32)
                ok = cx == gx
                for j in range(1, d):
                    cj = jnp.floor(
                        x_new[j] / box[j] * spec.ncells[j]
                    ).astype(jnp.int32)
                    ok = ok & (cj == coords[:, j])
                return ok

            for kin in range(inner):
                m = int(col_sched[kin])
                mv = pool[m]
                if mv.action == "displacement":
                    rows_c = (
                        _pair_params_rows(table, jnp.maximum(center_sp, 0.0), pf)
                        if species_live
                        else rows_c_static
                    )
                    r = jnp.floor(rnd_c["up"][kin] * occ.astype(dt)).astype(
                        jnp.int32
                    )
                    pick = slot_iota[None, :] == r[:, None]
                    delta = [
                        sig_slot[ci, kin] * rnd_c["dl"][kin, j] for j in range(d)
                    ]
                    center_pos, booked_sum, accept = _disp_submove_atomic(
                        kp, pf, rows_c, rows_o, center_pos, center_sp,
                        pos_o, valid_o, pick, delta, spatial_bounds, occupied,
                        jnp.log(rnd_c["ua"][kin]), temperature,
                    )
                else:
                    p_o_1, p_o_2 = swap_o_rows[m]
                    center_sp, booked_sum, accept = _swap_submove_atomic(
                        table, kp, pf, mv.species[0], mv.species[1],
                        center_pos, center_sp, pos_o, valid_o, p_o_1, p_o_2,
                        rnd_c["up"][kin], rnd_c["up2"][kin],
                        jnp.log(rnd_c["ua"][kin]), temperature,
                    )
                energy = energy + booked_sum
                att = att.at[m].add(jnp.sum(occupied.astype(att.dtype)))
                acc = acc.at[m].add(jnp.sum(accept.astype(acc.dtype)))

            new_center = jnp.stack(
                center_pos + ([center_sp] if species_live else [])
            ).reshape((np_upd,) + tuple(A_dims_local) + (cap,))
            padded = padded.at[(slice(0, np_upd),) + csl].set(new_center)

            # refresh halos: dims >= 1 locally (one face each, as in the
            # unsharded kernel), dim 0 across devices via ppermute
            for k in range(1, d):
                nc_k = spec.ncells[k]
                if c[k] == 0:
                    src_i, dst_i = 1, nc_k + 1
                    corr = box[k]
                else:
                    src_i, dst_i = nc_k, 0
                    corr = -box[k]
                pre = (slice(0, np_upd),) + (slice(None),) * k
                src = padded[pre + (src_i,)]
                src = src.at[k].add(corr)
                padded = padded.at[pre + (dst_i,)].set(src)
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
            (
                jnp.zeros((), energy0.dtype),
                jnp.zeros((n_moves,), cdt),
                jnp.zeros((n_moves,), cdt),
            ),
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

    rnd_specs = {
        "up": P(None, None, None, axis),
        "dl": P(None, None, None, None, axis),
        "ua": P(None, None, None, axis),
    }
    if has_swap:
        rnd_specs["up2"] = P(None, None, None, axis)
    in_specs = (
        P(None, axis),  # slab [NP, x-sharded, rest replicated]
        P(),
        rnd_specs,  # bulk randoms: active axis sharded (contiguous device
        # blocks match the x-major global active ordering)
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

    def hyper_sweep_pool(cb: CBState, pool_params) -> CBState:
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
        k_pick, k_pick2, k_delta, k_acc = jax.random.split(k_rand, 4)
        rnd = dict(
            up=jax.random.uniform(
                k_pick, (R, C, inner, A_global), dt, maxval=1.0 - 1e-7
            ),
            dl=jax.random.normal(k_delta, (R, C, inner, d, A_global), dt),
            ua=jax.random.uniform(
                k_acc, (R, C, inner, A_global), dt, minval=jnp.finfo(dt).tiny
            ),
        )
        if has_swap:
            rnd["up2"] = jax.random.uniform(
                k_pick2, (R, C, inner, A_global), dt, maxval=1.0 - 1e-7
            )

        sigmas = [
            jnp.asarray(pool_params[m]["sigma"], dt)
            if pool[m].action == "displacement"
            else jnp.asarray(0.0, dt)
            for m in range(n_moves)
        ]
        sig_slot = jnp.stack(
            [
                jnp.stack([sigmas[int(schedule[c_, i_])] for i_ in range(inner)])
                for c_ in range(C)
            ]
        )  # [C, inner]

        grid_out, booked, att, acc = sharded(
            grid0, cb.system.energy, rnd, sig_slot, box,
            cb.system.temperature,
        )
        planes = grid_out.reshape(NP, spec.total, cap)
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

        # skip-on-overflow: identical semantics to the unsharded kernel
        ok = ~ovf
        system = cb.system.replace(
            position=jnp.where(ok, position, cb.system.position),
            species=jnp.where(ok, species, cb.system.species),
            energy=jnp.where(ok, cb.system.energy + booked, cb.system.energy),
        )
        zero_att = jnp.zeros_like(cb.attempted)
        return cb.replace(
            system=system,
            key=key,
            shift=jnp.where(ok, shift, cb.shift),
            planes=jnp.where(ok, planes, cb.planes),
            idx=jnp.where(ok, idx, cb.idx),
            slot=jnp.where(ok, slot, cb.slot),
            attempted=cb.attempted
            + jnp.where(ok, att.astype(cb.attempted.dtype), zero_att),
            accepted=cb.accepted
            + jnp.where(ok, acc.astype(cb.accepted.dtype), zero_att),
            overflow=cb.overflow | ovf,
            skipped=cb.skipped + ovf.astype(cb.skipped.dtype),
        )

    if legacy:

        def hyper_sweep(cb: CBState, sigma) -> CBState:
            return hyper_sweep_pool(cb, ({"sigma": sigma},))

        return hyper_sweep
    return hyper_sweep_pool
