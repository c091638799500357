"""Policy-Guided Monte Carlo: online learning of proposal parameters.

Rebuilds the Arianna.PolicyGuided subsystem (reference call sites:
test/pgmc_ka2d.jl:36,48-49; hooks reward/log_proposal_density in
src/moves.jl). The objective per move is the expected accepted reward

    J(θ) = E_{x~π, a~q_θ(·|x)} [ min(1, e^{Δlogπ + log q_rev − log q_fwd}) · R(a) ]

with R(a) = |δ|² for displacement (mean-square accepted displacement) and 1
for swaps (acceptance rate) — reference src/moves.jl:98-100, 219-221.

The gradient estimator is the score-function form with detached actions:

    ∇J ≈ mean_b [ (∇θ log q_fwd,b) · stopgrad(A_b R_b) + ∇θ(A_b R_b) ]

implemented as `jax.grad` of the surrogate
L(θ) = mean_b[ exp(log q_fwd(a_b;θ) − stopgrad(log q_fwd(a_b;θ))) · A_b(θ) · R_b ]
— the TPU-native free lunch the reference gets from ForwardDiff: autodiff
through the already-jitted log-proposal/ΔE kernels (SURVEY.md §3.3).

Optimisers:
- VPG(lr): vanilla policy gradient ascent θ += lr·g (reference VPG).
- BLANPG(lr, reg): natural policy gradient — g preconditioned by the inverse
  Fisher matrix F = E[∇logq ∇logqᵀ] + reg·I estimated on the same batch
  (reference BLANPG).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..moves import kernel as K


@dataclasses.dataclass(frozen=True)
class VPG:
    lr: float


@dataclasses.dataclass(frozen=True)
class BLANPG:
    lr: float
    reg: float


def build_surrogate_fns(config, n: int):
    """(sample_prop, surrogate_at) for the PGMC estimator.

    sample_prop(theta, m, key, st, cell) draws one (detached) proposal from
    q_θ. surrogate_at(prop, theta, m, st, cell) evaluates the surrogate
    L(θ) = exp(log q(a;θ) − stopgrad(log q(a;θ))) · A(a;θ) · R(a) at a FIXED
    action — jax.grad of it at the sampling θ is the score-function gradient
    term plus the pathwise acceptance term (module docstring). Splitting the
    two stages makes the gradient finite-difference-checkable: at fixed
    `prop`, stop_gradient is the identity in forward evaluations, so
    (L(θ+h) − L(θ−h)) / 2h converges to the autodiff gradient
    (tests/test_pgmc.py::test_surrogate_gradient_matches_finite_differences).
    """
    propose_fns, _ = K.make_proposal_fns(config, n)
    logq_fns = K.make_logq_fns(config, n)
    delta_e = K.build_delta_e_fn(config, n)
    rewards = [K.move_reward(m) for m in config.pool]

    def sample_prop(theta, m, key, st, cell):
        return jax.lax.stop_gradient(propose_fns[m](key, st, cell, theta))

    def surrogate_at(prop, theta, m, st, cell):
        lqf, lqr = logq_fns[m](prop, st, cell, theta)
        e1, e2 = delta_e(st, cell, prop)
        e1 = jax.lax.stop_gradient(e1)
        e2 = jax.lax.stop_gradient(e2)
        dlt = -(e2 - e1) / st.temperature
        log_alpha = dlt + lqr - lqf
        log_alpha = jnp.where(
            jnp.isnan(log_alpha), jnp.asarray(-jnp.inf, e1.dtype), log_alpha
        )
        A = jnp.minimum(jnp.ones_like(log_alpha), jnp.exp(log_alpha))
        R = jax.lax.stop_gradient(rewards[m](prop, st))
        ratio = jnp.exp(lqf - jax.lax.stop_gradient(lqf))
        return ratio * A * R, lqf

    return sample_prop, surrogate_at


class PGMC:
    """Estimator + updater pair bound to a Simulation (engine/simulation.py)."""

    def __init__(self, sim, optimisers: Tuple, q_batch_size: int = 10):
        self.sim = sim
        config = sim.config
        n = sim.chains.n_particles
        if len(optimisers) != len(config.pool):
            raise ValueError("one optimiser per move in pool order (reference contract)")
        if any(m.policy == "smart" for m in config.pool):
            raise ValueError(
                "PGMC does not support the SmartGaussian (force-bias) "
                "policy: its proposal density depends on the state through "
                "the drift, which the global-proposal estimator surrogate "
                "does not model — use SimpleGaussian for learnable sigma"
            )
        self.optimisers = tuple(optimisers)
        self.q_batch_size = int(q_batch_size)
        self.learnable = [len(m.params) > 0 for m in config.pool]

        # Backend-agnostic estimation: the estimator needs only π-samples
        # (the chain states, from WHICHEVER kernel advances them) and fresh
        # proposals a ~ q_θ with their ΔE — so checkerboard-backed runs use
        # the dense ΔE path on mc.system (CBState carries no cell list).
        # The learned θ then applies to the parallel kernel's moves; for the
        # Gaussian σ the objective is evaluated with the reference's global
        # proposal semantics, an accurate proxy for the checkerboard
        # displacement while σ ≪ cell side (in-cell truncation negligible).
        self._sigma_proxy_limit = None
        if getattr(sim, "parallel_moves", False):
            config = dataclasses.replace(config, cell_spec=None)
            # The global-proposal objective is a proxy for the checkerboard
            # kernel's in-cell-truncated displacement; it is accurate while
            # σ ≪ cell side. Past ~side/4 the truncation dominates the real
            # acceptance and gradient ascent on the proxy optimises the
            # wrong objective — warn (update()) rather than fail silently.
            # (tests/test_pgmc.py pins argmax agreement below the limit.)
            spec = getattr(sim, "cb_spec", None)
            if spec is not None:
                box0 = np.asarray(sim.chains.states.box)[0]
                side = float(np.min(box0 / np.asarray(spec.ncells, np.float64)))
                self._sigma_proxy_limit = side / 4.0
        self._has_cell = config.cell_spec is not None

        sample_prop, surrogate_at = build_surrogate_fns(config, n)

        def surrogate(theta, m, key, st, cell, params_all):
            """L(θ_m) for one sampled proposal of move m in state st."""
            prop = sample_prop(theta, m, key, st, cell)
            return surrogate_at(prop, theta, m, st, cell)

        has_cell = self._has_cell

        def estimate_one_move(m):
            def per_chain(mc, params_all, key):
                st = mc.system
                cell = mc.cell if has_cell else None
                keys = jax.random.split(key, self.q_batch_size)

                def per_sample(k):
                    def L(theta):
                        val, lqf = surrogate(theta, m, k, st, cell, params_all)
                        return val, lqf

                    (val, lqf), grads = jax.value_and_grad(L, has_aux=True)(params_all[m])
                    score = jax.grad(lambda th: surrogate(th, m, k, st, cell, params_all)[1])(
                        params_all[m]
                    )
                    return grads, score

                g, s = jax.vmap(per_sample)(keys)
                g_mean = jax.tree.map(lambda x: jnp.mean(x, 0), g)
                # Fisher: E[score scoreᵀ] over the flattened parameter vector
                flat_s = jnp.stack(
                    [jnp.ravel(x) for x in jax.tree.leaves(s)], axis=-1
                ).reshape(self.q_batch_size, -1)
                fisher = flat_s.T @ flat_s / self.q_batch_size
                return g_mean, fisher

            return jax.jit(
                jax.vmap(per_chain, in_axes=(0, None, 0))
            )

        self._estimate_fns = [
            estimate_one_move(m) if self.learnable[m] else None
            for m in range(len(config.pool))
        ]
        self._acc = [None] * len(config.pool)  # (g_sum, fisher_sum, count)
        self._key = jax.random.PRNGKey(sim.seed + 777)

    # ------------------------------------------------------------------
    def estimate(self):
        """Accumulate one gradient estimate per learnable move (fired every
        Metropolis step, dependency-driven — reference test/pgmc_ka2d.jl:48)."""
        M = self.sim.chains.n_chains
        for m, fn in enumerate(self._estimate_fns):
            if fn is None:
                continue
            self._key, sub = jax.random.split(self._key)
            keys = jax.random.split(sub, M)
            g, fisher = fn(self.sim.mc, self.sim.pool_params, keys)
            g = jax.tree.map(lambda x: jnp.mean(x, 0), g)  # average over chains
            fisher = jnp.mean(fisher, 0)
            if self._acc[m] is None:
                self._acc[m] = [g, fisher, 1]
            else:
                self._acc[m][0] = jax.tree.map(jnp.add, self._acc[m][0], g)
                self._acc[m][1] = self._acc[m][1] + fisher
                self._acc[m][2] += 1

    def update(self):
        """Apply the optimiser step per move and reset the accumulator
        (reference PolicyGradientUpdate, test/pgmc_ka2d.jl:49)."""
        params = list(self.sim.pool_params)
        for m, acc in enumerate(self._acc):
            if acc is None:
                continue
            g, fisher, cnt = acc
            g = jax.tree.map(lambda x: x / cnt, g)
            fisher = fisher / cnt
            opt = self.optimisers[m]
            p = params[m]
            names = sorted(p.keys())
            flat_g = jnp.stack([jnp.ravel(g[k]) for k in names]).reshape(-1)
            if isinstance(opt, BLANPG):
                dim = flat_g.shape[0]
                nat = jnp.linalg.solve(
                    fisher + opt.reg * jnp.eye(dim, dtype=fisher.dtype), flat_g
                )
                step = opt.lr * nat
            elif isinstance(opt, VPG):
                step = opt.lr * flat_g
            else:
                raise ValueError(f"unknown optimiser {opt}")
            new_p = {}
            off = 0
            for k in names:
                sz = int(np.prod(jnp.shape(p[k]))) or 1
                new_p[k] = p[k] + step[off : off + sz].reshape(jnp.shape(p[k])).squeeze()
                off += sz
            params[m] = new_p
            self._acc[m] = None
            if self._sigma_proxy_limit is not None and "sigma" in new_p:
                s = float(np.max(np.abs(np.asarray(new_p["sigma"]))))
                if s > self._sigma_proxy_limit:
                    import warnings

                    warnings.warn(
                        f"PGMC-learned sigma = {s:.4g} exceeds cell_side/4 = "
                        f"{self._sigma_proxy_limit:.4g}: the global-proposal "
                        "objective used by the estimator on the checkerboard "
                        "backend stops tracking the in-cell-truncated kernel "
                        "here — the learned sigma may be off-optimum. "
                        "Validate it against a direct sigma sweep of the "
                        "checkerboard kernel (benchmarks/mixing_sweep.py), "
                        "or learn on the sequential kernel at this width.",
                        RuntimeWarning,
                        stacklevel=2,
                    )
        self.sim.pool_params = tuple(params)
