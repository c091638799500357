"""particlesmc-tpu: TPU-native Monte Carlo particle-simulation framework.

A from-scratch JAX/XLA/pjit rebuild of the capability set of
TheDisorderedOrganization/ParticlesMC (+ its Arianna.jl engine layer):
Metropolis(-Hastings) MC over atomic and molecular particle systems with
pair potentials, neighbour structures, policy-guided proposals, parallel
tempering, scheduler-driven outputs, XYZ/EXYZ/LAMMPS I/O, and a TOML CLI —
redesigned TPU-first: fixed-shape functional state, fused sweep kernels under
`lax.scan`, `vmap` over thousands of chains, `jax.sharding` across device
meshes.
"""

from .core.state import SystemState, make_system
from .core.energy import initialize_energy, particle_energy_dense, total_energy_dense
from .models.tables import (
    BHHP,
    JBB,
    KobAndersen,
    MODEL_REGISTRY,
    PairTable,
    Trimer,
    build_pair_table,
    general_kg,
    lennard_jones,
    resolve_model,
    smooth_lennard_jones,
    soft_spheres,
)

__version__ = "0.1.0"
