"""Golden initial-energy parity with the reference (build step 2 gate).

Reference golden values: −2.676832 per particle for the 1290-particle 2D JBB
system (test/runtests.jl:36-38) and 25.65865662277199 for the 3000-particle
Trimer molecular system (test/runtests.jl:148).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from particlesmc_tpu.core import energy as E

from .helpers import atomic_system, molecular_system


def test_atomic_golden_energy():
    st, table, fx = atomic_system()
    e = float(st.energy) / st.n_particles
    assert e == pytest.approx(float(fx["golden_energy_per_particle"]), abs=1e-6)


def test_molecular_golden_energy():
    st, table, fx, *_ = molecular_system()
    e = float(st.energy) / st.n_particles
    assert e == pytest.approx(float(fx["golden_energy_per_particle"]), abs=1e-6)


def test_particle_energy_sum_matches_total():
    st, table, fx = atomic_system()
    per = E.per_particle_energies(st.position, st.species, st.box, table)
    assert float(jnp.sum(per)) / 2 == pytest.approx(float(st.energy), rel=1e-12)


def test_override_displacement_consistency():
    """Energy after a virtual displacement == recomputed energy of the moved
    configuration (pins the Override machinery against brute force)."""
    st, table, fx = atomic_system()
    i = 17
    delta = jnp.asarray([0.03, -0.02], st.position.dtype)
    ov = E.Override(
        i=jnp.asarray(i, jnp.int32),
        j=jnp.asarray(i, jnp.int32),
        pos_i=st.position[i] + delta,
        sp_i=st.species[i],
        sp_j=st.species[i],
    )
    e_virtual = E.particle_energy_dense(
        jnp.asarray(i, jnp.int32), st.position, st.species, st.box, table, ov=ov
    )
    moved = st.position.at[i].add(delta)
    e_real = E.particle_energy_dense(
        jnp.asarray(i, jnp.int32), moved, st.species, st.box, table
    )
    assert float(e_virtual) == pytest.approx(float(e_real), rel=1e-12)


def test_override_swap_consistency():
    st, table, fx = atomic_system()
    sp = np.asarray(st.species)
    i = int(np.flatnonzero(sp == 0)[0])
    j = int(np.flatnonzero(sp == 2)[0])
    ov = E.Override(
        i=jnp.asarray(i, jnp.int32),
        j=jnp.asarray(j, jnp.int32),
        pos_i=st.position[i],
        sp_i=st.species[j],
        sp_j=st.species[i],
    )
    e_i_virtual = E.particle_energy_dense(
        jnp.asarray(i, jnp.int32), st.position, st.species, st.box, table, ov=ov
    )
    e_j_virtual = E.particle_energy_dense(
        jnp.asarray(j, jnp.int32), st.position, st.species, st.box, table, ov=ov
    )
    swapped = st.species.at[i].set(st.species[j]).at[j].set(st.species[i])
    e_i_real = E.particle_energy_dense(
        jnp.asarray(i, jnp.int32), st.position, swapped, st.box, table
    )
    e_j_real = E.particle_energy_dense(
        jnp.asarray(j, jnp.int32), st.position, swapped, st.box, table
    )
    assert float(e_i_virtual) == pytest.approx(float(e_i_real), rel=1e-12)
    assert float(e_j_virtual) == pytest.approx(float(e_j_real), rel=1e-12)
