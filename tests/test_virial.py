"""Virial / pressure observable tests: the analytic w = -2 r^2 dU/dr^2 must
match autodiff of the potential for every kind, and the LJ pressure must be
physically sane."""

import jax
import jax.numpy as jnp
import numpy as np

from particlesmc_tpu.core import energy as E
from particlesmc_tpu.core.state import make_system
from particlesmc_tpu.models import tables as T
from particlesmc_tpu.models.potentials import (
    bond_potential,
    bond_virial,
    pair_potential,
    pair_virial,
)
from particlesmc_tpu.models.tables import gather_pair


def _check_pairs(table, r2_values, si, sj):
    p = gather_pair(table, jnp.asarray(si), jnp.asarray(sj))

    def u(r2):
        return pair_potential(r2, p)

    for r2 in r2_values:
        r2 = jnp.asarray(r2, jnp.float64)
        w_analytic = float(pair_virial(r2, p))
        w_autodiff = float(-2.0 * r2 * jax.grad(u)(r2))
        np.testing.assert_allclose(w_analytic, w_autodiff, rtol=1e-9, atol=1e-12)


def test_pair_virial_matches_autodiff_all_kinds():
    # LJ (KobAndersen), inverse power (BHHP), smooth LJ (JBB)
    for table, si, sj in [
        (T.KobAndersen(jnp.float64), 0, 1),
        (T.BHHP(jnp.float64), 0, 1),
        (T.JBB(jnp.float64), 1, 2),
    ]:
        _check_pairs(table, [0.81, 1.0, 1.44, 2.25], si, sj)


def test_bond_virial_matches_autodiff():
    table = T.Trimer(jnp.float64)
    p = gather_pair(table, jnp.asarray(0), jnp.asarray(1))

    def u(r2):
        return bond_potential(r2, p)

    for r2 in [0.81, 1.0, 1.21, 1.69]:
        r2 = jnp.asarray(r2, jnp.float64)
        w_analytic = float(bond_virial(r2, p))
        w_autodiff = float(-2.0 * r2 * jax.grad(u)(r2))
        np.testing.assert_allclose(w_analytic, w_autodiff, rtol=1e-9, atol=1e-9)


def test_lj_pressure_sane():
    """Dense LJ liquid should have positive pressure with a large virial
    contribution; a dilute one should approach the ideal gas."""
    table = T.KobAndersen(jnp.float64)
    rng = np.random.default_rng(0)
    n, d = 216, 3

    def P(density, temperature):
        L = (n / density) ** (1 / d)
        per = int(np.ceil(n ** (1 / d)))
        a = L / per
        grid = np.stack(
            np.meshgrid(*[np.arange(per) * a + a / 2] * d, indexing="ij"), -1
        ).reshape(-1, d)[:n]
        pos = grid + rng.uniform(-0.02 * a, 0.02 * a, (n, d))
        sp = np.ones(n, np.int64)
        st = make_system(pos, sp, density, temperature, dtype=jnp.float64)
        return float(
            E.pressure(st.position, st.species, st.box, table, density, temperature)
        )

    p_dilute = P(0.01, 2.0)
    assert abs(p_dilute - 0.01 * 2.0) < 0.01  # ~ideal gas
    p_dense = P(1.2, 2.0)
    assert p_dense > 5.0  # strongly repulsive lattice at rho=1.2
