from .base import (
    Move,
    discrete_swap,
    displacement,
    displacement_smart,
    init_pool_params,
    molecule_flip,
    pool_probabilities,
)
from .kernel import (
    KernelConfig,
    MCState,
    Proposal,
    build_delta_e_fn,
    build_run_fn,
    build_step_fn,
    build_sweep_fn,
    init_mc_state,
)
