"""Periodic-boundary geometry primitives.

TPU-native equivalents of the reference geometry layer
(reference: src/utils.jl:12-28, src/utils.jl:55-59). Everything here is a pure
jnp function on arrays of arbitrary leading batch shape, so the same code path
serves one particle, a candidate gather, or a vmapped batch of chains.
"""

from __future__ import annotations

import jax.numpy as jnp


def fold_back(x, box):
    """Fold positions into the primary box [0, L) per dimension.

    Matches Julia `fold_back(x, box) = x .- fld.(x, box) .* box`
    (reference: src/utils.jl:12); `fld` is floored division.
    """
    return x - jnp.floor(x / box) * box


def min_image(dx, box):
    """Minimum-image convention displacement.

    Matches `vector_1D(c1, c2, L) = dx - round(dx/L)*L` (reference:
    src/utils.jl:15-18). Julia's `round` and `jnp.round` both round
    half-to-even, so results agree bit-for-bit at matching precision.
    """
    return dx - jnp.round(dx / box) * box


def pair_vector(xi, xj, box):
    """Minimum-image vector xi - xj (reference: src/utils.jl:20-22)."""
    return min_image(xi - xj, box)


def dist2(xi, xj, box):
    """Squared nearest-image distance (reference: src/utils.jl:24-28).

    Reduces over the last axis; broadcasts over any leading axes.
    """
    dx = pair_vector(xi, xj, box)
    return jnp.sum(dx * dx, axis=-1)


def volume_sphere(r: float, d: int) -> float:
    """Volume of the d-dimensional sphere of radius r.

    Python-level helper (static shapes only); matches the recursion at
    reference src/utils.jl:55-59.
    """
    import math

    if d == 0:
        return 1.0
    if d == 1:
        return 2.0 * r
    return 2.0 * math.pi * r * r * volume_sphere(r, d - 2) / d
