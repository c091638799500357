"""Parallel tempering (replica exchange) — first-class here, "(soon)" in the
reference (README.md:33; per-chain temperature plumbing already existed,
src/IO/IO.jl:263-271; required by BASELINE.json's config list).

The temperature ladder lives on the chains axis: chain k holds temperature
T_k. A swap attempt between neighbours (k, k+1) accepts with

    min(1, exp[(β_k − β_{k+1})(E_k − E_{k+1})])

and exchanges *configurations* (positions/species/energy/cell list) while
temperatures stay with their slot — implemented as a gather by a permutation
vector, which XLA lowers to `collective_permute` over ICI when the chains axis
is sharded across devices. Even/odd neighbour pairs alternate per invocation
(deterministic ladder sweep).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnums=(2,))
def replica_exchange(mc, key, parity: int):
    """One replica-exchange pass over the batched MCState.

    Returns (mc, attempted [M] bool, accepted [M] bool) where entry k refers
    to the pair (k, k+1).
    """
    st = mc.system
    M = st.energy.shape[0]
    dt = st.energy.dtype
    beta = 1.0 / st.temperature
    E = st.energy

    idx = jnp.arange(M)
    is_left = (idx % 2 == parity) & (idx + 1 < M)

    E_r = jnp.roll(E, -1)
    beta_r = jnp.roll(beta, -1)
    log_alpha = (beta - beta_r) * (E - E_r)
    u = jax.random.uniform(key, (M,), dt, minval=jnp.finfo(dt).tiny)
    accept_pair = is_left & (jnp.log(u) < log_alpha)

    # permutation: swapped pairs exchange slots
    accept_right = jnp.roll(accept_pair, 1)  # entry k: swap with k-1
    perm = jnp.where(accept_pair, idx + 1, jnp.where(accept_right, idx - 1, idx))

    swapped = jax.tree.map(lambda x: x[perm], mc)
    # temperatures, ladder bookkeeping and RNG streams stay with the slot
    swapped = swapped.replace(
        system=swapped.system.replace(temperature=st.temperature),
        key=mc.key,
        attempted=mc.attempted,
        accepted=mc.accepted,
    )
    return swapped, is_left, accept_pair


class ReplicaExchange:
    """Engine-facing wrapper: scheduled swap passes with acceptance stats."""

    def __init__(self, sim, seed: int = 0):
        self.sim = sim
        self._key = jax.random.PRNGKey(seed ^ 0x5EED)
        self._parity = 0
        self.attempted = 0
        self.accepted = 0

    def step(self):
        self._key, sub = jax.random.split(self._key)
        mc, att, acc = replica_exchange(self.sim.mc, sub, self._parity)
        self.sim.mc = mc
        self._parity ^= 1
        import numpy as np

        self.attempted += int(np.asarray(att).sum())
        self.accepted += int(np.asarray(acc).sum())

    @property
    def rate(self) -> float:
        return self.accepted / self.attempted if self.attempted else 0.0
