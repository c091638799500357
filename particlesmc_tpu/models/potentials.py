"""Pair-potential math on squared distances.

The reference dispatches per species pair on small Julia structs
(reference: src/models.jl:26-36, 72-74, 121-123, 161-166, 215-226). A TPU wants
one branchless kernel for *all* potential kinds: every functional form is
evaluated on the vector lanes and the active one selected by an integer `kind`
gathered from a [S, S] table. All functions broadcast over arbitrary leading
shapes, so one code path serves single pairs, neighbour gathers, and vmapped
chain batches.

Potential kinds
---------------
0: none (no interaction)
1: inverse power  u = eps * (sigma^2 / r^2)^(n/2) - shift      (SoftSpheres)
2: Lennard-Jones  u = 4 eps [(s2/r2)^6 - (s2/r2)^3] - shift    (LennardJones,
   also the non-bonded part of GeneralKG, reference src/models.jl:215-217)
3: smooth LJ      u = lj + 4 eps (C0 + C2 r2/s2 + C4 r4/s4)    (SmoothLennardJones)
"""

from __future__ import annotations

import jax.numpy as jnp

KIND_NONE = 0
KIND_INVERSE_POWER = 1
KIND_LENNARD_JONES = 2
KIND_SMOOTH_LJ = 3


def lj_unshifted(r2, eps4, sigma2):
    """4*eps*[(s2/r2)^6 - (s2/r2)^3] (reference: src/models.jl:30-34)."""
    x = sigma2 / r2
    x3 = x * x * x
    return eps4 * (x3 * x3 - x3)


def _int_pow(y, n_int, nbits: int = 6):
    """y**n by square-and-multiply for an int32 array exponent 0 <= n < 2^nbits.

    XLA's pow with a floating exponent lowers to exp(log(..)) which is only
    f32-accurate even under x64; chained multiplies keep full precision, which
    the golden-energy parity gates (1e-6 on absolute energies) require.
    """
    acc = jnp.ones_like(y)
    sq = y
    for k in range(nbits):
        bit = (n_int >> k) & 1
        acc = jnp.where(bit == 1, acc * sq, acc)
        sq = sq * sq
    return acc


def inverse_power(r2, eps, sigma2, n_int):
    """eps * (sigma2/r2)^(n/2) (reference: src/models.jl:28), n integer."""
    return eps * _int_pow(jnp.sqrt(sigma2 / r2), n_int)


def fene(r2, kr02, r02):
    """FENE bond term kr02 * log(1 - r2/r02), kr02 = -k r0^2/2.

    (reference: src/models.jl:36). The r2 > r02 divergence is guarded by the
    caller (bond energy returns +inf there, reference src/models.jl:219-221).
    """
    return kr02 * jnp.log(1.0 - r2 / r02)


def pair_fields_needed(kinds_present=None):
    """Which per-pair parameter fields pair_potential will touch for these
    kinds — lets callers skip building select-chains for dead fields."""
    if kinds_present is None:
        return ("kind", "eps4", "sigma2", "ipl_n", "rcut2", "shift", "c0", "c2s2", "c4s4")
    kp = tuple(kinds_present)
    need = ["eps4", "sigma2", "rcut2"]
    if len(kp) > 1 or KIND_NONE in kp:
        need.append("kind")
    if KIND_INVERSE_POWER in kp:
        need.append("ipl_n")
    if KIND_INVERSE_POWER in kp or KIND_LENNARD_JONES in kp:
        need.append("shift")
    if KIND_SMOOTH_LJ in kp:
        need += ["c0", "c2s2", "c4s4"]
    return tuple(dict.fromkeys(need))


def pair_potential(r2, p, kinds_present=None):
    """Evaluate the pair potential for gathered per-pair parameters `p`.

    `p` is a pytree with array fields (kind, eps4, sigma2, ipl_n, shift,
    c0, c2s2, c4s4, rcut2) already gathered to the broadcast shape of `r2`
    (see tables.gather_pair). Applies the cutoff: u = 0 for r2 > rcut2
    (reference keeps r2 == rcut2, src/atoms.jl:73). Returns 0 for kind 0.

    `kinds_present` (static tuple of the kinds actually in the table, see
    tables.kinds_present) prunes the dead functional-form branches — the
    generic path wastes ~25 VPU ops/lane on e.g. the square-and-multiply
    inverse-power chain when a table is pure LJ. None keeps every branch.

    r2 == 0 lanes (self pairs / padding) are made safe and must be masked by
    the caller; we still clamp to avoid inf/nan leaking through `where`.
    """
    dt = r2.dtype if hasattr(r2, "dtype") else jnp.result_type(r2)
    kp = (
        (KIND_INVERSE_POWER, KIND_LENNARD_JONES, KIND_SMOOTH_LJ)
        if kinds_present is None
        else tuple(kinds_present)
    )
    r2s = jnp.maximum(r2, jnp.asarray(1e-12, dt))
    x = p.sigma2 / r2s
    x3 = x * x * x
    need_lj = KIND_LENNARD_JONES in kp or KIND_SMOOTH_LJ in kp
    lj = p.eps4 * (x3 * x3 - x3) if need_lj else None

    # single-kind fast paths: no per-lane kind select at all
    if kp == (KIND_LENNARD_JONES,):
        u = lj - p.shift
    elif kp == (KIND_INVERSE_POWER,):
        u = p.eps4 * _int_pow(jnp.sqrt(x), p.ipl_n) - p.shift
    elif kp == (KIND_SMOOTH_LJ,):
        u = lj + p.eps4 * (p.c0 + r2s * (p.c2s2 + r2s * p.c4s4))
    else:
        kind = p.kind
        u = jnp.zeros_like(x3)
        if KIND_SMOOTH_LJ in kp:
            smooth_add = p.eps4 * (p.c0 + r2s * (p.c2s2 + r2s * p.c4s4))
            u = jnp.where(kind == KIND_SMOOTH_LJ, lj + smooth_add, u)
        if KIND_LENNARD_JONES in kp:
            u = jnp.where(kind == KIND_LENNARD_JONES, lj - p.shift, u)
        if KIND_INVERSE_POWER in kp:
            ipl = p.eps4 * _int_pow(jnp.sqrt(x), p.ipl_n)
            u = jnp.where(kind == KIND_INVERSE_POWER, ipl - p.shift, u)

    in_range = r2 <= p.rcut2
    if kinds_present is not None and KIND_NONE not in kp and len(kp) > 0:
        mask = in_range
    else:
        mask = in_range & (p.kind != KIND_NONE)
    return jnp.where(mask, u, jnp.zeros_like(u))


def pair_virial(r2, p, kinds_present=None):
    """Pair virial w = -2 r^2 dU/dr^2 = r·f(r) for the non-bonded kinds.

    Feeds the pressure observable P = rho T + W/(d V), W = sum_{i<j} w_ij
    (an extension over the reference, whose docs advertise a pressure
    callback — docs/src/man/architecture.md — but whose code ships only
    energy/chain_correlation), and the force-bias ("smart") displacement
    drift: the force on particle a from a lane at separation dx = x_nb - x_a
    is F_j = -(w / r^2) * dx_j. Shifts don't contribute (constant in r).
    `kinds_present` prunes dead branches exactly as in pair_potential.
    """
    dt = r2.dtype if hasattr(r2, "dtype") else jnp.result_type(r2)
    kp = (
        (KIND_INVERSE_POWER, KIND_LENNARD_JONES, KIND_SMOOTH_LJ)
        if kinds_present is None
        else tuple(kinds_present)
    )
    r2s = jnp.maximum(r2, jnp.asarray(1e-12, dt))
    x = p.sigma2 / r2s
    x3 = x * x * x
    need_lj = KIND_LENNARD_JONES in kp or KIND_SMOOTH_LJ in kp
    w_lj = p.eps4 * (12.0 * x3 * x3 - 6.0 * x3) if need_lj else None

    if kp == (KIND_LENNARD_JONES,):
        w = w_lj
    elif kp == (KIND_INVERSE_POWER,):
        w = p.eps4 * p.ipl_n * _int_pow(jnp.sqrt(x), p.ipl_n)
    elif kp == (KIND_SMOOTH_LJ,):
        w = w_lj - 2.0 * r2s * p.eps4 * (p.c2s2 + 2.0 * r2s * p.c4s4)
    else:
        kind = p.kind
        w = jnp.zeros_like(x3)
        if KIND_SMOOTH_LJ in kp:
            w_smooth = w_lj - 2.0 * r2s * p.eps4 * (p.c2s2 + 2.0 * r2s * p.c4s4)
            w = jnp.where(kind == KIND_SMOOTH_LJ, w_smooth, w)
        if KIND_LENNARD_JONES in kp:
            w = jnp.where(kind == KIND_LENNARD_JONES, w_lj, w)
        if KIND_INVERSE_POWER in kp:
            w_ipl = p.eps4 * p.ipl_n * _int_pow(jnp.sqrt(x), p.ipl_n)
            w = jnp.where(kind == KIND_INVERSE_POWER, w_ipl, w)

    in_range = r2 <= p.rcut2
    if kinds_present is not None and KIND_NONE not in kp and len(kp) > 0:
        mask = in_range
    else:
        mask = in_range & (p.kind != KIND_NONE)
    return jnp.where(mask, w, jnp.zeros_like(w))


def bond_virial(r2, p):
    """Bond virial: FENE spring + shifted-LJ core, w = -2 r^2 dU/dr^2."""
    dt = r2.dtype if hasattr(r2, "dtype") else jnp.result_type(r2)
    r2s = jnp.maximum(r2, jnp.asarray(1e-12, dt))
    r02s = jnp.where(p.r02 > 0, p.r02, jnp.ones_like(p.r02))
    denom = jnp.maximum(r02s - r2s, jnp.asarray(1e-12, dt))
    w_fene = 2.0 * r2s * p.kr02 / denom
    w_fene = jnp.where(r2 <= p.r02, w_fene, jnp.zeros_like(w_fene))

    x = p.sigma2b / r2s
    x3 = x * x * x
    w_lj = p.eps4b * (12.0 * x3 * x3 - 6.0 * x3)
    w_lj = jnp.where(r2 <= p.rcut2b, w_lj, jnp.zeros_like(w_lj))

    return jnp.where(p.has_bond > 0, w_fene + w_lj, jnp.zeros_like(r2s))


def bond_potential(r2, p):
    """Bonded interaction: FENE spring + shifted LJ core.

    Matches reference src/models.jl:219-226:
      u_fene = r2 <= r0^2 ?  kr02*log(1 - r2/r0^2)  :  +inf
      u_lj   = r2 <= rcutbond^2 ? lj(r2; eps4b, s2b) - shiftb : 0
    Pairs whose model has no bond term (has_bond == 0) contribute 0.
    """
    dt = r2.dtype if hasattr(r2, "dtype") else jnp.result_type(r2)
    r2s = jnp.maximum(r2, jnp.asarray(1e-12, dt))
    inf = jnp.asarray(jnp.inf, dt)

    r02s = jnp.where(p.r02 > 0, p.r02, jnp.ones_like(p.r02))
    arg = 1.0 - r2s / r02s
    u_fene = p.kr02 * jnp.log(jnp.maximum(arg, jnp.asarray(1e-30, dt)))
    u_fene = jnp.where(r2 <= p.r02, u_fene, inf)

    x = p.sigma2b / r2s
    x3 = x * x * x
    u_lj = p.eps4b * (x3 * x3 - x3) - p.shiftb
    u_lj = jnp.where(r2 <= p.rcut2b, u_lj, jnp.zeros_like(u_lj))

    u = u_fene + u_lj
    return jnp.where(p.has_bond > 0, u, jnp.zeros_like(u))
