"""Species-pair parameter tables — the TPU replacement for per-pair structs.

The reference stores a [S, S] matrix of heterogeneous Julia structs and
dispatches `potential(r2, model)` per pair (reference: src/models.jl). On TPU
that becomes a struct-of-arrays `PairTable`: one [S, S] jnp array per
precomputed parameter, indexed by species-pair gather. Evaluation is a single
branchless kernel over all kinds (models/potentials.py).

Canned model matrices mirror the reference's parameterisations:
BHHP (src/models.jl:76-84), KobAndersen (:125-133), JBB (:168-179),
Trimer (:231-243).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Sequence

import jax
import jax.numpy as jnp
from flax import struct

from .potentials import (
    KIND_INVERSE_POWER,
    KIND_LENNARD_JONES,
    KIND_NONE,
    KIND_SMOOTH_LJ,
)

# Taylor coefficients of the smoothing polynomial (reference: src/models.jl:150-153).
_SMOOTH_C0 = 0.04049023795
_SMOOTH_C2 = -0.00970155098
_SMOOTH_C4 = 0.00062012616


@struct.dataclass
class PairTable:
    """[S, S] parameter matrices for all pair/bond interactions.

    Fields (all float [S, S] unless noted):
    - kind (int32): potential kind per pair (see models/potentials.py)
    - eps4: 4*eps for LJ-family kinds; raw eps for inverse-power
    - sigma2, rcut, rcut2, shift: precomputed as in the reference
      constructors (src/models.jl:64-70, 110-119, 150-159, 202-213);
      ipl_n (int32) is the integer inverse-power exponent n
    - c0, c2s2, c4s4: smooth-LJ polynomial coefficients (C0, C2/sigma^2,
      C4/sigma^4)
    - has_bond (int32), kr02, r02, eps4b, sigma2b, shiftb, rcut2b: FENE+LJ
      bond parameters (GeneralKG, src/models.jl:183-226)
    """

    kind: jax.Array
    eps4: jax.Array
    sigma2: jax.Array
    ipl_n: jax.Array
    rcut: jax.Array
    rcut2: jax.Array
    shift: jax.Array
    c0: jax.Array
    c2s2: jax.Array
    c4s4: jax.Array
    has_bond: jax.Array
    kr02: jax.Array
    r02: jax.Array
    eps4b: jax.Array
    sigma2b: jax.Array
    shiftb: jax.Array
    rcut2b: jax.Array

    @property
    def n_species(self) -> int:
        return self.kind.shape[0]

    @property
    def max_cutoff(self) -> float:
        """Largest pair cutoff — sizing input for neighbour structures."""
        return float(jnp.max(self.rcut))

    def astype(self, dtype) -> "PairTable":
        """Cast all float fields to `dtype` (ints stay int32)."""

        def cast(x):
            if jnp.issubdtype(x.dtype, jnp.floating):
                return x.astype(dtype)
            return x

        return jax.tree.map(cast, self)


def interaction_range(table: PairTable) -> float:
    """Largest interaction range including BOND terms — the cell-sizing input
    for molecular systems. A FENE bond reaches to r0 (and its LJ core to
    rcutbond), which can exceed the non-bonded cutoff: the Trimer matrix has
    r0 up to 1.575 vs a WCA pair cutoff of ~1.23 (reference
    src/models.jl:231-243), so grids sized on max_cutoff alone would let a
    bonded pair straddle two simultaneously-active checkerboard cells."""
    import numpy as np

    r = np.asarray(table.rcut, np.float64)
    hb = np.asarray(table.has_bond) > 0
    rb = np.sqrt(np.maximum(np.asarray(table.rcut2b), np.asarray(table.r02)))
    return float(np.maximum(r, np.where(hb, rb, 0.0)).max())


def kinds_present(table: PairTable):
    """Static tuple of potential kinds used by this table — feed to
    pair_potential(kinds_present=...) to prune dead branch math."""
    import numpy as np

    return tuple(sorted(int(k) for k in set(np.asarray(table.kind).ravel().tolist())))


def gather_pair(table: PairTable, si, sj):
    """Gather per-pair parameters for species index arrays si, sj.

    Returns a PairTable-shaped pytree whose fields have the broadcast shape of
    (si, sj) — feed directly to potentials.pair_potential / bond_potential.
    """
    return jax.tree.map(lambda a: a[si, sj], table)


# ---------------------------------------------------------------------------
# Per-pair constructors (host-side, float64 math; mirror reference semantics)
# ---------------------------------------------------------------------------


def _lj_unshifted(r2: float, eps4: float, sigma2: float) -> float:
    x = sigma2 / r2
    x3 = x**3
    return eps4 * (x3 * x3 - x3)


def _base_entry() -> Dict[str, float]:
    return dict(
        kind=KIND_NONE,
        eps4=0.0,
        sigma2=1.0,
        ipl_n=0,
        rcut=0.0,
        rcut2=0.0,
        shift=0.0,
        c0=0.0,
        c2s2=0.0,
        c4s4=0.0,
        has_bond=0,
        kr02=0.0,
        r02=0.0,
        eps4b=0.0,
        sigma2b=1.0,
        shiftb=0.0,
        rcut2b=0.0,
    )


def soft_spheres(eps: float, sigma: float, n: int, rcut: float | None = None) -> Dict:
    """Inverse-power pair, shifted to zero at rcut (reference src/models.jl:64-74)."""
    if rcut is None:
        rcut = 2.5 * sigma
    e = _base_entry()
    sigma2 = sigma * sigma
    e.update(
        kind=KIND_INVERSE_POWER,
        eps4=eps,  # raw eps for inverse power
        sigma2=sigma2,
        ipl_n=int(n),
        rcut=rcut,
        rcut2=rcut * rcut,
        shift=eps * (sigma2 / (rcut * rcut)) ** (n / 2),
        name="SoftSpheres",
        params=dict(epsilon=eps, sigma=sigma, n=n, rcut=rcut),
    )
    return e


def lennard_jones(
    eps: float, sigma: float, rcut: float | None = None, shift_potential: bool = True
) -> Dict:
    """Cut (optionally shifted) LJ pair (reference src/models.jl:110-123)."""
    if rcut is None:
        rcut = 2.5 * sigma
    e = _base_entry()
    sigma2 = sigma * sigma
    rcut2 = rcut * rcut
    shift = _lj_unshifted(rcut2, 4 * eps, sigma2) if shift_potential else 0.0
    e.update(
        kind=KIND_LENNARD_JONES,
        eps4=4 * eps,
        sigma2=sigma2,
        rcut=rcut,
        rcut2=rcut2,
        shift=shift,
        name="LennardJones",
        params=dict(epsilon=eps, sigma=sigma, rcut=rcut, shift_potential=shift_potential),
    )
    return e


def smooth_lennard_jones(eps: float, sigma: float, rcut: float | None = None) -> Dict:
    """LJ plus C0 + C2 r2 + C4 r4 smoothing (reference src/models.jl:150-166)."""
    if rcut is None:
        rcut = 2.5 * sigma
    e = _base_entry()
    sigma2 = sigma * sigma
    e.update(
        kind=KIND_SMOOTH_LJ,
        eps4=4 * eps,
        sigma2=sigma2,
        rcut=rcut,
        rcut2=rcut * rcut,
        c0=_SMOOTH_C0,
        c2s2=_SMOOTH_C2 / sigma2,
        c4s4=_SMOOTH_C4 / (sigma2 * sigma2),
        name="SmoothLennardJones",
        params=dict(epsilon=eps, sigma=sigma, rcut=rcut),
    )
    return e


def general_kg(
    eps: float,
    sigma: float,
    k: float,
    r0: float,
    rcut: float | None = None,
    epsbond: float | None = None,
    sigmabond: float | None = None,
    rcutbond: float | None = None,
) -> Dict:
    """Kremer-Grest: WCA-cut LJ pair + FENE/LJ bond (reference src/models.jl:202-226)."""
    if rcut is None:
        rcut = 2 ** (1 / 6) * sigma
    if epsbond is None:
        epsbond = eps
    if sigmabond is None:
        sigmabond = sigma
    if rcutbond is None:
        rcutbond = rcut
    e = _base_entry()
    sigma2 = sigma * sigma
    sigma2b = sigmabond * sigmabond
    rcut2 = rcut * rcut
    rcut2b = rcutbond * rcutbond
    e.update(
        kind=KIND_LENNARD_JONES,
        eps4=4 * eps,
        sigma2=sigma2,
        rcut=rcut,
        rcut2=rcut2,
        shift=_lj_unshifted(rcut2, 4 * eps, sigma2),
        has_bond=1 if k != 0.0 else 0,
        kr02=-k * r0 * r0 / 2,
        r02=r0 * r0,
        eps4b=4 * epsbond,
        sigma2b=sigma2b,
        shiftb=_lj_unshifted(rcut2b, 4 * epsbond, sigma2b),
        rcut2b=rcut2b,
        name="GeneralKG",
        params=dict(epsilon=eps, sigma=sigma, k=k, r0=r0, rcut=rcut),
    )
    return e


def build_pair_table(entries: Sequence[Sequence[Dict]], dtype=jnp.float64) -> PairTable:
    """Assemble an S x S matrix of per-pair entry dicts into a PairTable."""
    S = len(entries)
    fields = dataclasses.fields(PairTable)
    mats: Dict[str, Any] = {}
    for f in fields:
        rows = [[entries[i][j][f.name] for j in range(S)] for i in range(S)]
        if f.name in ("kind", "has_bond", "ipl_n"):
            mats[f.name] = jnp.asarray(rows, dtype=jnp.int32)
        else:
            mats[f.name] = jnp.asarray(rows, dtype=dtype)
    return PairTable(**mats)


# ---------------------------------------------------------------------------
# Canned model matrices (reference parameter values)
# ---------------------------------------------------------------------------


def BHHP(dtype=jnp.float64) -> PairTable:
    """2-species n=12 soft spheres, Bernu-Hiwatari-Hansen-Pastore mixture
    (reference src/models.jl:76-84)."""
    sig = [[1.0, 1.2], [1.2, 1.4]]
    entries = [[soft_spheres(1.0, sig[i][j], 12) for j in range(2)] for i in range(2)]
    return build_pair_table(entries, dtype)


def KobAndersen(dtype=jnp.float64) -> PairTable:
    """2-species Kob-Andersen LJ mixture (reference src/models.jl:125-133)."""
    eps = [[1.0, 1.5], [1.5, 0.5]]
    sig = [[1.0, 0.8], [0.8, 0.88]]
    entries = [
        [lennard_jones(eps[i][j], sig[i][j]) for j in range(2)] for i in range(2)
    ]
    return build_pair_table(entries, dtype)


def JBB(dtype=jnp.float64) -> PairTable:
    """3-species smooth-LJ matrix (reference src/models.jl:168-179)."""
    eps = [[1.0, 1.5, 0.75], [1.5, 0.5, 1.5], [0.75, 1.5, 0.75]]
    sig = [[1.0, 0.8, 0.9], [0.8, 0.88, 0.8], [0.9, 0.8, 0.94]]
    entries = [
        [smooth_lennard_jones(eps[i][j], sig[i][j]) for j in range(3)]
        for i in range(3)
    ]
    return build_pair_table(entries, dtype)


def Trimer(dtype=jnp.float64) -> PairTable:
    """3-species Kremer-Grest trimer matrix (reference src/models.jl:231-243)."""
    sig = [[0.9, 0.95, 1.0], [0.95, 1.0, 1.05], [1.0, 1.05, 1.1]]
    k = [[0.0, 33.241, 30.0], [33.241, 0.0, 27.210884], [30.0, 27.210884, 0.0]]
    r0 = [[0.0, 1.425, 1.5], [1.425, 0.0, 1.575], [1.5, 1.575, 0.0]]
    entries = [
        [general_kg(1.0, sig[i][j], k[i][j], r0[i][j]) for j in range(3)]
        for i in range(3)
    ]
    return build_pair_table(entries, dtype)


# Explicit registry replacing the reference's `eval(Meta.parse(...))` model
# resolution (reference src/IO/IO.jl:297-306 — flagged in SURVEY.md §5.6 as a
# security fix for the rebuild).
MODEL_REGISTRY = {
    "BHHP": BHHP,
    "KobAndersen": KobAndersen,
    "JBB": JBB,
    "Trimer": Trimer,
    "GeneralKG": Trimer,  # molecule.xyz metadata says model:GeneralKG for the trimer system
}

# Per-pair constructors by name, for TOML [model."i-j"] blocks
# (reference src/IO/IO.jl:129-156).
PAIR_CONSTRUCTORS = {
    "SoftSpheres": soft_spheres,
    "LennardJones": lennard_jones,
    "SmoothLennardJones": smooth_lennard_jones,
    "GeneralKG": general_kg,
}


def model_matrix_from_dict(model_dict: Dict[str, Dict], n_species: int, dtype=jnp.float64) -> PairTable:
    """Build a PairTable from TOML-style {"i-j": {name=..., epsilon=...}} blocks.

    Mirrors reference src/IO/IO.jl:129-156: key "i-j" with i <= j, symmetric
    fill; species indices are 1-based in the config, 0-based internally.
    """
    entries: List[List[Dict]] = [[None] * n_species for _ in range(n_species)]
    for i in range(1, n_species + 1):
        for j in range(1, n_species + 1):
            key = f"{i}-{j}" if i <= j else f"{j}-{i}"
            m = model_dict[key]
            name = m["name"]
            if name == "GeneralKG":
                entry = general_kg(
                    m["epsilon"],
                    m["sigma"],
                    m["k"],
                    m["r0"],
                    rcut=m.get("rcut"),
                    epsbond=m.get("epsilonbond"),
                    sigmabond=m.get("sigmabond"),
                    rcutbond=m.get("rcutbond"),
                )
            elif name == "SmoothLennardJones":
                entry = smooth_lennard_jones(m["epsilon"], m["sigma"], rcut=m.get("rcut"))
            elif name == "LennardJones":
                entry = lennard_jones(
                    m["epsilon"],
                    m["sigma"],
                    rcut=m.get("rcut"),
                    shift_potential=m.get("shift_potential", True),
                )
            elif name == "SoftSpheres":
                entry = soft_spheres(m["epsilon"], m["sigma"], m["n"], rcut=m.get("rcut"))
            else:
                raise ValueError(f"Model {name!r} is not implemented")
            entries[i - 1][j - 1] = entry
    return build_pair_table(entries, dtype)


def resolve_model(model: Any, n_species: int, dtype=jnp.float64) -> PairTable:
    """Resolve a model spec (registry name like "JBB"/"JBB()" or a dict of
    per-pair blocks) into a PairTable. Explicit registry, no eval."""
    if isinstance(model, PairTable):
        return model
    if isinstance(model, dict):
        return model_matrix_from_dict(model, n_species, dtype)
    if isinstance(model, str):
        name = model.strip()
        if name.endswith("()"):
            name = name[:-2]
        if name not in MODEL_REGISTRY:
            raise ValueError(
                f"Unknown model {model!r}; known: {sorted(MODEL_REGISTRY)}"
            )
        return MODEL_REGISTRY[name](dtype)
    raise TypeError(f"Cannot resolve model from {type(model)}")
