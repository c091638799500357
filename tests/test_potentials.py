"""Differential tests of potential tables against closed forms
(build step 1 gate, SURVEY.md §7)."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from particlesmc_tpu.models import potentials as P
from particlesmc_tpu.models import tables as T


def eval_pair(table, r, si, sj):
    p = T.gather_pair(table, jnp.asarray(si), jnp.asarray(sj))
    return float(P.pair_potential(jnp.asarray(r * r, jnp.float64), p))


def test_lennard_jones_closed_form():
    tab = T.build_pair_table([[T.lennard_jones(1.5, 0.8)]])
    r = 1.0
    sr6 = (0.8 / r) ** 12 - (0.8 / r) ** 6
    rc = 2.5 * 0.8
    shift = 4 * 1.5 * ((0.8 / rc) ** 12 - (0.8 / rc) ** 6)
    assert eval_pair(tab, r, 0, 0) == pytest.approx(4 * 1.5 * sr6 - shift, rel=1e-12)
    # zero at and beyond cutoff
    assert eval_pair(tab, rc, 0, 0) == pytest.approx(0.0, abs=1e-12)
    assert eval_pair(tab, rc + 0.1, 0, 0) == 0.0


def test_lj_unshifted_option():
    tab = T.build_pair_table([[T.lennard_jones(1.0, 1.0, shift_potential=False)]])
    r = 2.4999
    expect = 4 * ((1 / r) ** 12 - (1 / r) ** 6)
    assert eval_pair(tab, r, 0, 0) == pytest.approx(expect, rel=1e-10)


def test_soft_spheres_closed_form():
    tab = T.build_pair_table([[T.soft_spheres(1.0, 1.2, 12)]])
    r = 1.1
    rc = 2.5 * 1.2
    expect = (1.2 / r) ** 12 - (1.2 / rc) ** 12
    assert eval_pair(tab, r, 0, 0) == pytest.approx(expect, rel=1e-12)


def test_soft_spheres_odd_exponent():
    tab = T.build_pair_table([[T.soft_spheres(2.0, 1.0, 9)]])
    r = 1.3
    rc = 2.5
    expect = 2.0 * (1.0 / r) ** 9 - 2.0 * (1.0 / rc) ** 9
    assert eval_pair(tab, r, 0, 0) == pytest.approx(expect, rel=1e-12)


def test_smooth_lj_closed_form():
    eps, sig = 1.5, 0.8
    tab = T.build_pair_table([[T.smooth_lennard_jones(eps, sig)]])
    r = 1.0
    r2 = r * r
    lj = 4 * eps * ((sig * sig / r2) ** 6 - (sig * sig / r2) ** 3)
    C0, C2, C4 = 0.04049023795, -0.00970155098, 0.00062012616
    smooth = 4 * eps * (C0 + C2 * r2 / sig**2 + C4 * r2 * r2 / sig**4)
    assert eval_pair(tab, r, 0, 0) == pytest.approx(lj + smooth, rel=1e-12)


def test_kg_bond_potential():
    # Trimer 1-2 pair: eps=1, sigma=0.95, k=33.241, r0=1.425
    tab = T.Trimer()
    r = 1.0
    r2 = r * r
    p = T.gather_pair(tab, jnp.asarray(0), jnp.asarray(1))
    u = float(P.bond_potential(jnp.asarray(r2, jnp.float64), p))
    k, r0, sig = 33.241, 1.425, 0.95
    fene = -k * r0**2 / 2 * math.log(1 - r2 / r0**2)
    rc = 2 ** (1 / 6) * sig
    lj = 4 * ((sig**2 / r2) ** 6 - (sig**2 / r2) ** 3)
    ljshift = 4 * ((sig / rc) ** 12 - (sig / rc) ** 6)
    assert u == pytest.approx(fene + (lj - ljshift), rel=1e-10)


def test_kg_bond_overstretch_is_inf():
    tab = T.Trimer()
    p = T.gather_pair(tab, jnp.asarray(0), jnp.asarray(1))
    u = float(P.bond_potential(jnp.asarray(1.425**2 + 0.01, jnp.float64), p))
    assert u == float("inf")


def test_diagonal_kg_has_no_bond():
    # Trimer diagonal has k=0 → no bond term
    tab = T.Trimer()
    p = T.gather_pair(tab, jnp.asarray(0), jnp.asarray(0))
    assert float(P.bond_potential(jnp.asarray(1.0, jnp.float64), p)) == 0.0


def test_model_matrix_symmetry():
    for name in ("BHHP", "KobAndersen", "JBB", "Trimer"):
        tab = T.MODEL_REGISTRY[name]()
        for field in ("eps4", "sigma2", "rcut2", "shift", "kr02"):
            m = np.asarray(getattr(tab, field))
            np.testing.assert_allclose(m, m.T)


def test_model_matrix_from_dict_matches_registry():
    d = {
        "1-1": dict(name="LennardJones", epsilon=1.0, sigma=1.0),
        "1-2": dict(name="LennardJones", epsilon=1.5, sigma=0.8),
        "2-2": dict(name="LennardJones", epsilon=0.5, sigma=0.88),
    }
    tab = T.model_matrix_from_dict(d, 2)
    ka = T.KobAndersen()
    np.testing.assert_allclose(np.asarray(tab.eps4), np.asarray(ka.eps4))
    np.testing.assert_allclose(np.asarray(tab.sigma2), np.asarray(ka.sigma2))
    np.testing.assert_allclose(np.asarray(tab.shift), np.asarray(ka.shift))


def test_resolve_model_strings():
    assert T.resolve_model("JBB", 3).n_species == 3
    assert T.resolve_model("JBB()", 3).n_species == 3
    with pytest.raises(ValueError):
        T.resolve_model("Nope", 2)
