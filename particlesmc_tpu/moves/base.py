"""Move pool specification.

The reference couples an `Action` (what changes) with a `Policy` (how it is
proposed) and a probability into `Move(action, policy, parameters, prob)`
(reference: src/ParticlesMC.jl:243, src/moves.jl). Here a `Move` is a *static*
spec (baked into the jitted sweep kernel) while the learnable policy
parameters live in a separate pytree so PGMC can differentiate through them.

Actions: 'displacement' (src/moves.jl:34-100), 'swap' (DiscreteSwap,
src/moves.jl:137-221), 'flip' (MoleculeFlip, src/moves.jl:291-352).
Policies: 'gaussian' (SimpleGaussian, :105-123), 'double_uniform'
(DoubleUniform, :226-241), 'energy_bias' (EnergyBias, :246-280).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax.numpy as jnp

VALID = {
    "displacement": ("gaussian", "smart"),
    "swap": ("double_uniform", "energy_bias"),
    "flip": ("double_uniform",),
}


@dataclasses.dataclass(frozen=True)
class Move:
    """Static move spec. `species` is the 0-based species pair for 'swap'."""

    action: str
    policy: str
    probability: float
    species: Optional[Tuple[int, int]] = None
    params: Tuple[Tuple[str, float], ...] = ()

    def __post_init__(self):
        if self.action not in VALID:
            raise ValueError(f"Unsupported action: {self.action}")
        if self.policy not in VALID[self.action]:
            raise ValueError(
                f"Unsupported policy: {self.policy} for action: {self.action}"
            )
        if self.action == "swap" and (self.species is None or len(self.species) != 2):
            raise ValueError("'species' for action swap must be a pair")


def displacement(sigma: float, probability: float = 1.0) -> Move:
    return Move("displacement", "gaussian", probability, params=(("sigma", float(sigma)),))


def displacement_smart(sigma: float, probability: float = 1.0) -> Move:
    """Force-bias ("smart MC", Rossky-Doll-Friedman 1978) displacement:
    delta = clamp(sigma^2/(2T) * F(x)) + sigma * xi with the exact
    Metropolis-Hastings asymmetry correction. A TPU-native extension beyond
    the reference's SimpleGaussian (src/moves.jl:105-123): the force comes
    almost free from the candidate lanes the ΔE already touches, and buys
    acceptance/mixing at dense-liquid state points. Checkerboard atomic
    pools only."""
    return Move("displacement", "smart", probability, params=(("sigma", float(sigma)),))


def discrete_swap(
    s1: int, s2: int, probability: float, policy: str = "double_uniform",
    theta1: float = 0.0, theta2: float = 0.0,
) -> Move:
    params = (("theta1", float(theta1)), ("theta2", float(theta2))) if policy == "energy_bias" else ()
    return Move("swap", policy, probability, species=(int(s1), int(s2)), params=params)


def molecule_flip(probability: float) -> Move:
    return Move("flip", "double_uniform", probability)


def init_pool_params(pool, dtype=jnp.float64):
    """Initial learnable-parameter pytree: a tuple of dicts, one per move."""
    return tuple({k: jnp.asarray(v, dtype) for k, v in m.params} for m in pool)


def pool_probabilities(pool, dtype=jnp.float64):
    p = jnp.asarray([m.probability for m in pool], dtype)
    return p / jnp.sum(p)
