"""Acceptance-targeting sigma controller (AdaptiveSigma output algorithm).

Studies should not inherit a hard-coded displacement width: the optimal
Gaussian sigma depends on the state point, and the msd-optimal acceptance for
dense LJ liquids sits far below the historical 0.3-0.5 rules of thumb (the
measured sigma x cadence matrix lives in docs/man/performance.md). This
controller drives sigma to a TARGET ACCEPTANCE by a Robbins-Monro update on
log sigma between jitted chunks:

    sigma <- sigma * exp(kappa_t * (acc_window - target)),   kappa_t = kappa / sqrt(k)

with acc_window the windowed (not cumulative) acceptance of the move since
the previous controller event, summed over all chains. Updates happen on the
controller's schedule, host-side, with zero recompiles (sigma is a traced
pool parameter in both kernels).

Correctness note: adapting a proposal parameter DURING sampling breaks
detailed balance of the composite chain, so the controller follows the
standard adaptive-MCMC practice — run it over the burn-in window and FREEZE
after its last scheduled event (diminishing-adaptation via the 1/sqrt(k)
gain also keeps the bias vanishing if the schedule extends into production).
The reference has no counterpart (its sigma is fixed per-study in the TOML,
e.g. examples/lj-mixture sigma=0.05); this subsystem exists because the
checkerboard kernel's mixing-per-second is sharply sigma-sensitive.

The default target (0.22) is the measured msd-optimal acceptance of the
N=10k LJ bench point on TPU v5e (see performance.md); override per study.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


class AdaptiveSigma:
    """Bound to a Simulation; adapts every displacement move's sigma
    (or a single move's, via `move`, 0-based pool index)."""

    def __init__(
        self,
        sim,
        move: Optional[int] = None,
        target: float = 0.22,
        kappa: float = 1.0,
        sigma_min: float = 1e-4,
        sigma_max: Optional[float] = None,
    ):
        self.sim = sim
        self.target = float(target)
        self.kappa = float(kappa)
        self.sigma_min = float(sigma_min)
        if sigma_max is None and getattr(sim, "parallel_moves", False):
            # past ~cell/2 essentially every proposal exits its cell and the
            # acceptance signal dies — keep the controller in-domain
            spec = getattr(sim, "cb_spec", None)
            if spec is not None:
                box0 = np.asarray(sim.chains.states.box)[0]
                sigma_max = float(
                    np.min(box0 / np.asarray(spec.ncells, np.float64))
                ) / 2.0
        self.sigma_max = float(sigma_max) if sigma_max is not None else np.inf
        if move is None:
            self.moves = [
                m for m, mv in enumerate(sim.pool) if mv.action == "displacement"
            ]
        else:
            if sim.pool[move].action != "displacement":
                raise ValueError(
                    f"AdaptiveSigma move index {move} is not a displacement move"
                )
            self.moves = [int(move)]
        if not self.moves:
            raise ValueError("AdaptiveSigma needs a displacement move in the pool")
        self._snap = None  # (attempted, accepted) at the previous event
        self._k = 0  # update count (diminishing gain)

    def _counters(self):
        att = np.atleast_1d(np.asarray(self.sim.mc.attempted, np.int64).sum(axis=0))
        acc = np.atleast_1d(np.asarray(self.sim.mc.accepted, np.int64).sum(axis=0))
        return att, acc

    def step(self, t: int):
        att, acc = self._counters()
        if self._snap is None:
            self._snap = (att, acc)
            return
        d_att = att - self._snap[0]
        d_acc = acc - self._snap[1]
        self._snap = (att, acc)
        self._k += 1
        gain = self.kappa / np.sqrt(self._k)
        params = list(self.sim.pool_params)
        for m in self.moves:
            if d_att[m] <= 0:
                continue
            rate = float(d_acc[m]) / float(d_att[m])
            sigma = float(np.asarray(params[m]["sigma"]))
            sigma = float(
                np.clip(
                    sigma * np.exp(gain * (rate - self.target)),
                    self.sigma_min,
                    self.sigma_max,
                )
            )
            import jax.numpy as jnp

            p = dict(params[m])
            # keep the traced aval identical (same dtype, same shape) so the
            # jitted chunk cache is never invalidated by an update
            p["sigma"] = jnp.asarray(sigma, params[m]["sigma"].dtype)
            params[m] = p
            path = os.path.join(self.sim.path, "moves", str(m + 1), "sigma.dat")
            with open(path, "a") as f:
                f.write(f"{t} {sigma:.12g} {rate:.6g}\n")
        self.sim.pool_params = tuple(params)
