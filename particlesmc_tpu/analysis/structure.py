"""Structural observables: g(r), F_s(k,t), MSD.

The BASELINE correctness gate is per-particle energy AND pair-correlation
distributions within MC error (BASELINE.md); the reference computes its
correlation functions with an external package (atooms-pp,
examples/ortho-terphenyl/4-compute-correlation-functions) — here they are
first-class, in-repo, and jittable where it matters.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

from ..core.geometry import min_image


def radial_distribution(
    position: np.ndarray,
    box: np.ndarray,
    nbins: int = 100,
    rmax: Optional[float] = None,
    species: Optional[np.ndarray] = None,
    pair: Optional[Tuple[int, int]] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Radial distribution function g(r) with minimum-image distances.

    position: [N, d] or [M, N, d] (frames/chains are averaged).
    pair=(s1, s2) restricts to that species pair (0-based species ids).
    Returns (bin centers, g). Normalisation uses the d-dimensional shell
    volume so 2D systems work too.
    """
    position = np.asarray(position, np.float64)
    if position.ndim == 2:
        position = position[None]
    box = np.asarray(box, np.float64)
    d = position.shape[-1]
    if rmax is None:
        rmax = float(box.min()) / 2
    edges = np.linspace(0.0, rmax, nbins + 1)
    counts = np.zeros(nbins)
    n_ref = n_other = 0

    for frame in position:
        n = frame.shape[0]
        if species is not None and pair is not None:
            sel_a = np.flatnonzero(np.asarray(species) == pair[0])
            sel_b = np.flatnonzero(np.asarray(species) == pair[1])
        else:
            sel_a = sel_b = np.arange(n)
        n_ref += len(sel_a)
        n_other = len(sel_b)
        dx = frame[sel_a][:, None, :] - frame[sel_b][None, :, :]
        dx = np.asarray(min_image(dx, box))
        r = np.sqrt((dx**2).sum(-1))
        if sel_a is sel_b or pair is None or pair[0] == pair[1]:
            iu = ~np.eye(len(sel_a), dtype=bool)
            r = r[iu]
        else:
            r = r.ravel()
        h, _ = np.histogram(r, bins=edges)
        counts += h

    vol = float(np.prod(box))
    rho_other = n_other / vol
    # d-dimensional shell volumes
    if d == 2:
        shell = np.pi * (edges[1:] ** 2 - edges[:-1] ** 2)
    else:
        shell = 4.0 / 3.0 * np.pi * (edges[1:] ** 3 - edges[:-1] ** 3)
    centers = 0.5 * (edges[1:] + edges[:-1])
    with np.errstate(divide="ignore", invalid="ignore"):
        g = counts / (max(n_ref, 1) * rho_other * shell)
    return centers, g


def self_intermediate_scattering(
    positions: Sequence[np.ndarray],
    box: np.ndarray,
    k_mod: float,
    tol: float = 0.15,
    max_vectors: int = 50,
) -> np.ndarray:
    """F_s(k, t) = <cos(k · (r_i(t) − r_i(0)))>, isotropically averaged over
    box-commensurate wavevectors with |k| ≈ k_mod (the reference's stage-4
    observable, examples/ortho-terphenyl)."""
    pos = np.asarray(positions, np.float64)  # [T, N, d]
    box = np.asarray(box, np.float64)
    d = pos.shape[-1]
    base = 2 * np.pi / box  # per-dimension fundamental wavevector [d]
    nmax = [int(np.ceil(k_mod / b)) + 2 for b in base]
    grids = np.meshgrid(*[list(range(-m, m + 1)) for m in nmax], indexing="ij")
    ks = []
    for idx in np.stack([g.reshape(-1) for g in grids], -1):
        k = base * idx
        knorm = np.linalg.norm(k)
        if knorm > 0 and abs(knorm - k_mod) < tol * k_mod:
            ks.append(k)
    ks = np.asarray(ks[:max_vectors])  # [K, d]

    disp = pos - pos[0]  # positions must be unwrapped-consistent across frames
    out = np.empty(len(pos))
    for t in range(len(pos)):
        phase = disp[t] @ ks.T
        out[t] = float(np.mean(np.cos(phase)))
    return out


def unwrap_trajectory(
    positions: Sequence[np.ndarray], box: np.ndarray
) -> np.ndarray:
    """Undo periodic folding by frame-to-frame minimum-image unwrapping.

    Every engine writer emits FOLDED coordinates (the reference's writers do
    too — atooms-pp unfolds before computing MSD,
    examples/ortho-terphenyl/4-compute-correlation-functions). This is the
    in-repo equivalent: each frame-to-frame step is taken as its minimum
    image and accumulated, which is exact while every per-particle
    displacement between CONSECUTIVE stored frames is < box/2 — true for
    every schedule the engine writes (a particle would need ~(L/2σ)² accepted
    moves in one storage interval to violate it).

    positions: [T, N, d] folded frames. Returns [T, N, d] unwrapped.
    """
    pos = np.asarray(positions, np.float64)
    box = np.asarray(box, np.float64)
    steps = np.diff(pos, axis=0)
    steps -= box * np.round(steps / box)
    return np.concatenate([pos[:1], pos[0] + np.cumsum(steps, axis=0)], axis=0)


def mean_squared_displacement(
    positions: Sequence[np.ndarray], box: Optional[np.ndarray] = None
) -> np.ndarray:
    """MSD(t) relative to the first frame.

    Pass `box` for trajectories in folded coordinates (what the engine
    writes): frames are then min-image unwrapped first (unwrap_trajectory),
    so boundary crossings are counted correctly. Omit `box` only for
    positions that are already unwrapped."""
    pos = np.asarray(positions, np.float64)
    if box is not None:
        pos = unwrap_trajectory(pos, box)
    disp = pos - pos[0]
    return (disp**2).sum(-1).mean(-1)
