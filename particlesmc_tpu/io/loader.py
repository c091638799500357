"""Configuration loading — the `load_configuration` / `load_chains` layer.

Mirrors reference src/IO/IO.jl:27-100 (single-file parse) and :210-331
(multi-file ingest, metadata extraction, density rescale, temperature/model
override, fold-back, nsim replica cloning, neighbour-list heuristic, System
construction) — except model/list names resolve through explicit registries
instead of `eval` (SURVEY.md §5.6).

Returns a batched `Chains` bundle: all chains stacked on a leading axis, ready
for `vmap`/`pjit` — the TPU-native replacement for the reference's
`Vector{System}`.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core import geometry
from ..core.energy import initialize_energy
from ..core.state import SystemState, bonds_from_pairs, make_system, pad_bonds
from ..models.tables import PairTable, resolve_model
from . import formats


@dataclass
class Chains:
    """A batch of M independent chains (leading axis) plus shared statics."""

    states: SystemState  # leading axis M on all array fields
    table: PairTable
    list_type: str  # 'dense' | 'cell' | 'verlet'
    list_parameters: Dict[str, Any] = field(default_factory=dict)
    n_chains: int = 1
    mol_start: Optional[np.ndarray] = None  # [Nmol] static molecule layout
    mol_len: Optional[np.ndarray] = None

    @property
    def n_particles(self) -> int:
        return self.states.position.shape[1]

    @property
    def dim(self) -> int:
        return self.states.position.shape[2]


# Reference list names → our neighbour modes. LinkedList and CellList are both
# bucketed cell grids in the rebuild (one fused implementation). VerletList
# (reference src/neighbours.jl:387-543) maps to the cell-backed path BY DESIGN,
# with a load-time warning (engine/simulation.py): a per-particle skin list is
# a [N, K] data-dependent gather structure, and vector-index gathers serialize
# on TPU (measured ~3 ms per ΔE, docs/man/performance.md) — the skin variant's
# entire benefit on a CPU (fewer candidates per move) is the thing a TPU cannot
# exploit. The checkerboard backend's static-slice candidate blocks are the
# TPU-shaped replacement for both LinkedList and VerletList.
LIST_REGISTRY = {
    "EmptyList": "dense",
    "CellList": "cell",
    "LinkedList": "cell",
    "VerletList": "verlet",
    "dense": "dense",
    "cell": "cell",
    "verlet": "verlet",
}


def _meta_value(metadata: List[str], key: str) -> Optional[str]:
    for tok in metadata:
        if f"{key}:" in tok:
            return tok.split(f"{key}:", 1)[1]
    return None


def load_configuration(path: str, frame: int = 0) -> Dict:
    """Parse one configuration file by extension (reference src/IO/IO.jl:27-39)."""
    return formats.read_configuration(path, frame)


def _gather_input_files(init_path: str, filename: str = "") -> List[str]:
    files: List[str] = []
    if os.path.isfile(init_path):
        files.append(init_path)
    elif os.path.isdir(init_path):
        for root, _dirs, names in os.walk(init_path):
            for name in sorted(names):
                if filename in name:
                    files.append(os.path.join(root, name))
    return files


def load_chains(
    init_path: str,
    args: Optional[Dict[str, Any]] = None,
    filename: str = "",
    verbose: bool = False,
    dtype=jnp.float64,
    energy_dtype=None,
) -> Chains:
    """Build a batch of chains from one file / a directory of files.

    `args` accepts the reference keys (src/IO/IO.jl:210-331): temperature
    (scalar or list), density, model (name string or per-pair dict), list_type,
    list_parameters, nsim. `energy_dtype` upcasts the incremental-energy
    accumulator (mixed precision, see core.energy.initialize_energy).
    """
    args = dict(args or {})
    input_files = _gather_input_files(init_path, filename)
    if not input_files:
        raise FileNotFoundError(f"No configuration files found at {init_path!r}")
    if verbose:
        print(f"Processing {len(input_files)} configuration file(s)")

    configs = [load_configuration(f) for f in input_files]
    N, d = configs[0]["N"], configs[0]["d"]
    for c in configs:
        if c["N"] != N or c["d"] != d:
            raise ValueError("All chains must share N and d")

    positions = [c["position"].copy() for c in configs]
    boxes = [c["box"].copy() for c in configs]
    species = [c["species"] for c in configs]
    densities = [c["N"] / np.prod(c["box"]) for c in configs]

    # Metadata temperature / model (reference src/IO/IO.jl:238-252)
    temps = [_meta_value(c["metadata"], "T") for c in configs]
    temps = [float(t) if t is not None else None for t in temps]
    models = [
        _meta_value(c["metadata"], "model") or _meta_value(c["metadata"], "Model")
        for c in configs
    ]

    # Density rescale (reference src/IO/IO.jl:255-260)
    if args.get("density") is not None:
        rho = float(args["density"])
        lam = [(dens / rho) ** (1.0 / d) for dens in densities]
        positions = [X * l for X, l in zip(positions, lam)]
        boxes = [b * l for b, l in zip(boxes, lam)]
        densities = [rho] * len(configs)

    # Temperature override (reference src/IO/IO.jl:263-271)
    t_arg = args.get("temperature")
    if t_arg is not None:
        if isinstance(t_arg, (list, tuple, np.ndarray)):
            temps = [float(t) for t in t_arg]
        else:
            temps = [float(t_arg)] * len(configs)
    if any(t is None for t in temps):
        raise ValueError("temperature has not been found in metadata or args")

    # Model override (reference src/IO/IO.jl:273-281)
    m_arg = args.get("model")
    if m_arg is not None:
        model_spec = m_arg[0] if isinstance(m_arg, (list, tuple)) else m_arg
    else:
        if models[0] is None:
            raise ValueError("model has not been found in metadata or args")
        model_spec = models[0]

    # Fold back (reference src/IO/IO.jl:284)
    positions = [
        np.asarray(geometry.fold_back(jnp.asarray(X), jnp.asarray(b)))
        for X, b in zip(positions, boxes)
    ]

    # Temperature LADDER from one configuration: a vector temperature with a
    # single config replicates the frame across the ladder — the
    # parallel-tempering entry point (the reference accepts a temperature
    # vector, src/IO/IO.jl:263-271; chain k keeps temperature T_k while
    # ReplicaExchange swaps configurations between slots). With nsim, each
    # rung is subsequently cloned nsim times.
    if len(temps) > 1 and len(positions) == 1:
        positions = positions * len(temps)
        species = species * len(temps)
        densities = densities * len(temps)
        configs = configs * len(temps)
    if len(temps) != len(positions):
        raise ValueError(
            f"temperature vector length {len(temps)} does not match the "
            f"{len(positions)} chains (pass one T, a length-matched vector, "
            "or a vector with a single configuration)"
        )

    # nsim replica cloning (reference src/IO/IO.jl:287-294)
    nsim = int(args.get("nsim") or 1)
    if nsim > 1:
        positions = [p for p in positions for _ in range(nsim)]
        species = [s for s in species for _ in range(nsim)]
        densities = [r for r in densities for _ in range(nsim)]
        temps = [t for t in temps for _ in range(nsim)]
        configs = [c for c in configs for _ in range(nsim)]

    n_species = len(np.unique(np.concatenate(species)))
    table = resolve_model(model_spec, n_species, dtype)

    # Neighbour-list heuristic Z/N < 0.1 → cell list (reference src/IO/IO.jl:308-310)
    maxcut = table.max_cutoff
    Z = float(np.mean(densities)) * geometry.volume_sphere(maxcut, d)
    list_type = "cell" if Z / N < 0.1 else "dense"
    if args.get("list_type"):
        key = str(args["list_type"])
        if key not in LIST_REGISTRY:
            raise ValueError(f"Unknown list_type {key!r}; known: {sorted(LIST_REGISTRY)}")
        list_type = LIST_REGISTRY[key]
    list_parameters = dict(args.get("list_parameters") or {})

    molecular = "molecule" in configs[0]
    mol_start = mol_len = None
    states = []
    for k in range(len(positions)):
        kwargs: Dict[str, Any] = {}
        if molecular:
            kwargs["molecule"] = configs[k]["molecule"]
            kwargs["bonds"] = bonds_from_pairs(configs[k]["bond_pairs"] - 1, N)
        st = make_system(
            positions[k],
            species[k],
            float(densities[k]),
            float(temps[k]),
            dtype=dtype,
            **kwargs,
        )
        st = initialize_energy(st, table, energy_dtype=energy_dtype)
        states.append(st)
    if molecular:
        from ..core.state import mol_table

        mol0 = np.asarray(states[0].molecule)
        mol_start, mol_len = mol_table(mol0)

    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *states)
    if verbose:
        print(f"{len(states)} chains created")
    return Chains(
        states=stacked,
        table=table,
        list_type=list_type,
        list_parameters=list_parameters,
        n_chains=len(states),
        mol_start=mol_start,
        mol_len=mol_len,
    )
