"""Scalar observables ("callbacks") recorded by StoreCallbacks.

The reference defines these via `Arianna.@callback` (energy: src/utils.jl:51-53,
chain_correlation: src/molecules.jl:244-246) plus Arianna's prebuilt
callback_energy / callback_acceptance (test/pgmc_ka2d.jl:42). A callback here
is `f(sim) -> np.ndarray[M]` — one value per chain, computed from the batched
device state.
"""

from __future__ import annotations

import numpy as np


def energy(sim) -> np.ndarray:
    """Energy per particle (reference src/utils.jl:51-53)."""
    st = sim.mc.system
    return np.asarray(st.energy) / st.position.shape[-2]


def acceptance(sim) -> np.ndarray:
    """Overall acceptance rate per chain (Arianna callback_acceptance)."""
    att = np.asarray(sim.mc.attempted)
    acc = np.asarray(sim.mc.accepted)
    if att.ndim > 1:  # MCState keeps per-move counters; CBState scalars
        att = att.sum(axis=-1)
        acc = acc.sum(axis=-1)
    with np.errstate(invalid="ignore"):
        return np.where(att > 0, acc / np.maximum(att, 1), 0.0)


def chain_correlation(sim) -> np.ndarray:
    """Squared chain species-correlation order parameter for monodisperse
    chains (reference src/molecules.jl:224-242). Species values follow the
    file convention (1-based) with species 2 mapped to -1."""
    st = sim.mc.system
    if st.molecule is None:
        raise ValueError("chain_correlation requires a molecular system")
    L = int(sim.mol_len[0])
    if not (sim.mol_len == L).all():
        raise ValueError("All chains must have the same length")
    if L < 2:
        raise ValueError("Chains must have at least two particles")
    sp = np.asarray(st.species) + 1  # [M, N], back to file species values
    M = sp.shape[0]
    nmol = len(sim.mol_len)
    poly = sp.reshape(M, nmol, L).astype(np.float64)
    poly[poly == 2] = -1
    out = np.zeros(M)
    for i in range(L - 1):
        for j in range(i + 1, L):
            cross = (poly[:, :, i] * poly[:, :, j]).sum(axis=1) / nmol
            out += cross**2
    return out


def pressure(sim) -> np.ndarray:
    """Virial pressure per chain, P = rho T + W/(d V) (the pressure
    observable the reference's architecture docs advertise)."""
    import jax
    import jax.numpy as jnp

    from ..core import energy as E

    st = sim.mc.system
    table = sim.chains.table

    @jax.jit
    def one(s):
        return E.pressure(
            s.position, s.species, s.box, table, s.density, s.temperature, s.bonds
        )

    return np.asarray(jax.vmap(one)(st))


CALLBACK_REGISTRY = {
    "energy": energy,
    "acceptance": acceptance,
    "pressure": pressure,
    "callback_energy": energy,
    "callback_acceptance": acceptance,
    "chain_correlation": chain_correlation,
}
