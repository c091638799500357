"""Pallas TPU kernels for the hot checkerboard math.

The substep's dominant compute is the ΔE evaluation: ~30 elementwise
passes over [A, 27·cap] candidate planes (min-image distances, per-pair
parameter selection, two potential evaluations, masked reduce). Under XLA
each pass materialises an [A, K] temporary in HBM between fusions; this
kernel runs the whole thing in one VMEM-resident pallas program.

Layout is chosen for Mosaic friendliness: struct-of-arrays planes
[d+1, A, K] (positions + species-as-float), per-row actives [A, 8]
(x_old, x_new, s_a, padding), the species-pair table as a small [F, S, S]
VMEM block read with static indices. No gathers, no strided slices, no
dynamic indexing inside the kernel — only elementwise math and a lane
reduction, the operations Mosaic lowers best.

`delta_e_planes` is the public entry; `interpret=None` auto-selects
interpreter mode off-TPU so the same tests run on CPU.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pallas TPU backend is optional at import time (CPU test hosts)
    from jax.experimental.pallas import tpu as pltpu

    _HAVE_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAVE_PLTPU = False

from ..models.potentials import pair_potential

# table fields streamed into the kernel, in order (floats; kind/ipl_n are
# exact small ints in f32)
PAIR_FIELDS = ("kind", "eps4", "sigma2", "ipl_n", "rcut2", "shift", "c0", "c2s2", "c4s4")


class _P:
    """Attribute bundle satisfying pair_potential's parameter protocol."""

    __slots__ = PAIR_FIELDS

    def __init__(self, **kw):
        for k, v in kw.items():
            setattr(self, k, v)


def pack_table(table, dtype=jnp.float32) -> jax.Array:
    """PairTable -> [F, S, S] float array in PAIR_FIELDS order."""
    return jnp.stack(
        [jnp.asarray(getattr(table, f), dtype) for f in PAIR_FIELDS], axis=0
    )


def _kernel(d: int, s_count: int, kp, planes_ref, act_ref, mask_ref, tbl_ref, box_ref, de_ref):
    # distances, old and new, accumulated per dimension
    dtp = planes_ref.dtype
    r2o = jnp.zeros(planes_ref.shape[1:], dtp)
    r2n = jnp.zeros(planes_ref.shape[1:], dtp)
    for k in range(d):
        nb = planes_ref[k]  # [A, K]
        L = box_ref[0, k]
        dxo = nb - act_ref[:, k : k + 1]
        dxo = dxo - jnp.round(dxo / L) * L
        dxn = nb - act_ref[:, d + k : d + k + 1]
        dxn = dxn - jnp.round(dxn / L) * L
        r2o = r2o + dxo * dxo
        r2n = r2n + dxn * dxn

    sp = planes_ref[d]  # [A, K] neighbour species (float)
    sa = act_ref[:, 2 * d : 2 * d + 1]  # [A, 1] active species (float)

    # per-pair parameter planes via a static S x S where-chain, pruned to
    # the fields this table's potential kinds actually touch
    from ..models.potentials import pair_fields_needed

    fields = {}
    for fi, name in enumerate(PAIR_FIELDS):
        if name not in pair_fields_needed(kp):
            continue
        acc = jnp.full(sp.shape, tbl_ref[fi, 0, 0], dtp)
        for s1 in range(s_count):
            for s2 in range(s_count):
                if s1 == 0 and s2 == 0:
                    continue
                hit = (sa == float(s1)) & (sp == float(s2))
                acc = jnp.where(hit, tbl_ref[fi, s1, s2], acc)
        fields[name] = acc
    p = _P(**fields)
    # pair_potential treats kind/ipl_n as ints; exact small floats cast back
    if "kind" in fields:
        p.kind = p.kind.astype(jnp.int32)
    if "ipl_n" in fields:
        p.ipl_n = p.ipl_n.astype(jnp.int32)

    du = pair_potential(r2n, p, kp) - pair_potential(r2o, p, kp)
    du = jnp.where(mask_ref[:] > 0, du, jnp.zeros_like(du))
    de_ref[:] = jnp.sum(du, axis=1, keepdims=True)


def delta_e_planes(
    planes: jax.Array,  # [d+1, A, K] neighbour positions + species(float)
    act: jax.Array,  # [A, 8] rows: x_old[0:d], x_new[d:2d], s_a[2d]
    mask: jax.Array,  # [A, K] 1.0 valid / 0.0 padded-or-self
    tbl: jax.Array,  # [F, S, S] packed PairTable (pack_table)
    box: jax.Array,  # [1, d]
    s_count: int,
    interpret: Optional[bool] = None,
    kinds_present=None,
) -> jax.Array:
    """Fused ΔE over candidate planes; returns [A, 1]."""
    d = planes.shape[0] - 1
    A = planes.shape[1]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    kern = functools.partial(_kernel, d, s_count, kinds_present)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((A, 1), planes.dtype),
        interpret=interpret,
    )(planes, act, mask, tbl, box)
