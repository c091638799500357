"""Full simulation checkpointing.

The reference's only restart mechanism is the lastframe config file, which
loses RNG state and learned policy parameters (SURVEY.md §5.4). Here a
checkpoint is the complete sampler state: positions, species, box, per-chain
temperatures, incremental energies, PRNG keys, acceptance counters, and the
pool's learnable parameters — written as one npz (portable, no pickle). Cell
lists are rebuilt on load (derived state).

Interchange with the reference stays possible through lastframe files; this
adds exact-resume on top.
"""

from __future__ import annotations

import json
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def save_checkpoint(path: str, mc, pool_params, step: int, extra: Optional[dict] = None):
    """Write sampler state (batched MCState) + pool params + step counter."""
    st = mc.system
    arrays = {
        "position": np.asarray(st.position),
        "species": np.asarray(st.species),
        "box": np.asarray(st.box),
        "temperature": np.asarray(st.temperature),
        "density": np.asarray(st.density),
        "energy": np.asarray(st.energy),
        "key": np.asarray(mc.key),
        "attempted": np.asarray(mc.attempted),
        "accepted": np.asarray(mc.accepted),
        "step": np.asarray(step, np.int64),
    }
    if getattr(mc, "skipped", None) is not None:  # checkerboard backend
        arrays["skipped"] = np.asarray(mc.skipped)
    if st.molecule is not None:
        arrays["molecule"] = np.asarray(st.molecule)
        arrays["bonds"] = np.asarray(st.bonds)
    for m, p in enumerate(pool_params):
        for k, v in p.items():
            arrays[f"pool_{m}_{k}"] = np.asarray(v)
    meta = {
        "n_moves": len(pool_params),
        "param_names": [sorted(p.keys()) for p in pool_params],
        "extra": extra or {},
    }
    arrays["meta_json"] = np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8)
    np.savez_compressed(path, **arrays)


def load_checkpoint(path: str, config, dtype=None) -> Tuple["MCState", tuple, int]:
    """Rebuild (mc_state, pool_params, step) from an npz written by
    save_checkpoint. `config` is the KernelConfig (cell lists are rebuilt)."""
    from ..core import neighbours as NB
    from ..core.state import SystemState
    from ..moves.kernel import MCState

    z = np.load(path)
    meta = json.loads(bytes(z["meta_json"]).decode())
    dt = dtype or z["position"].dtype

    st = SystemState(
        position=jnp.asarray(z["position"], dt),
        species=jnp.asarray(z["species"], jnp.int32),
        box=jnp.asarray(z["box"], dt),
        temperature=jnp.asarray(z["temperature"], dt),
        density=jnp.asarray(z["density"], dt),
        energy=jnp.asarray(z["energy"]),  # ledger keeps its own dtype (mixed precision)
        molecule=jnp.asarray(z["molecule"], jnp.int32) if "molecule" in z else None,
        bonds=jnp.asarray(z["bonds"], jnp.int32) if "bonds" in z else None,
    )
    cell = None
    if config.cell_spec is not None:
        build = lambda pos, box: NB.build_cell_list(pos, box, config.cell_spec)
        if st.position.ndim == 3:  # batched
            cell = jax.vmap(build)(st.position, st.box)
        else:
            cell = build(st.position, st.box)
    mc = MCState(
        system=st,
        key=jnp.asarray(z["key"]),
        cell=cell,
        attempted=jnp.asarray(z["attempted"], jnp.int64),
        accepted=jnp.asarray(z["accepted"], jnp.int64),
    )
    pool_params = tuple(
        {k: jnp.asarray(z[f"pool_{m}_{k}"]) for k in names}
        for m, names in enumerate(meta["param_names"])
    )
    return mc, pool_params, int(z["step"])


def load_checkpoint_checkerboard(path: str, spec, dtype=None):
    """Rebuild a (batched) CBState + pool params + step from a checkpoint
    written while running the checkerboard backend. The plane grid and
    shift are derived state (a fresh shift is drawn at the next hyper-sweep
    anyway), so they are rebuilt with rebin rather than stored."""
    from ..core.state import SystemState
    from ..moves.checkerboard import CBState, rebin

    z = np.load(path)
    meta = json.loads(bytes(z["meta_json"]).decode())
    dt = dtype or z["position"].dtype

    st = SystemState(
        position=jnp.asarray(z["position"], dt),
        species=jnp.asarray(z["species"], jnp.int32),
        box=jnp.asarray(z["box"], dt),
        temperature=jnp.asarray(z["temperature"], dt),
        density=jnp.asarray(z["density"], dt),
        energy=jnp.asarray(z["energy"]),  # ledger keeps its own dtype (mixed precision)
        molecule=jnp.asarray(z["molecule"], jnp.int32) if "molecule" in z else None,
        bonds=jnp.asarray(z["bonds"], jnp.int32) if "bonds" in z else None,
    )
    d = st.position.shape[-1]

    def build(sys_one):
        shift = jnp.zeros((d,), dt)
        planes, idx, slot, ovf = rebin(sys_one, spec, shift)
        return planes, idx, slot, ovf, shift

    cdt = jnp.int64 if jax.config.jax_enable_x64 else jnp.int32
    if st.position.ndim == 3:
        planes, idx, slot, ovf, shift = jax.vmap(build)(st)
    else:
        planes, idx, slot, ovf, shift = build(st)
    cb = CBState(
        system=st,
        key=jnp.asarray(z["key"]),
        shift=shift,
        planes=planes,
        idx=idx,
        slot=slot,
        attempted=jnp.asarray(z["attempted"], cdt),
        accepted=jnp.asarray(z["accepted"], cdt),
        overflow=ovf,
        skipped=(
            jnp.asarray(z["skipped"], cdt)
            if "skipped" in z
            else jnp.zeros(np.shape(z["attempted"])[:-1], cdt)
        ),
    )
    pool_params = tuple(
        {k: jnp.asarray(z[f"pool_{m}_{k}"]) for k in names}
        for m, names in enumerate(meta["param_names"])
    )
    return cb, pool_params, int(z["step"])
