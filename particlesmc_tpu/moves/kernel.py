"""The fused Metropolis(-Hastings) sweep kernel.

This is the TPU-native rebuild of the Arianna hot loop `mc_step!`/`mc_sweep!`
(SURVEY.md §3.2; reference call sites benchmark/particles_benchmarks.jl:28-29).
Design inversion vs the reference (which mutates one particle and pays
O(neighbours) per move in scalar Julia):

- one *generic* proposal record covers all actions: "particle i moves to
  pos_i, species of (i, j) become (sp_i, sp_j)" — displacement sets j = i,
  swaps/flips set pos_i = position[i];
- ΔE is evaluated functionally through an energy Override (core/energy.py) —
  no mutate/revert/invert machinery (reference src/moves.jl:76-90,201-214)
  is needed: rejected proposals simply don't update the state;
- every step is a fixed-shape masked gather-reduce, so the whole sweep is a
  `lax.scan` under one jit, `vmap`-able over thousands of chains;
- acceptance: log u < Δlog-target + log q_rev − log q_fwd with
  Δlog-target = −(e₂−e₁)/T (reference src/utils.jl:8-10); +inf e₂ rejects
  and leaves the incremental energy untouched (src/moves.jl:13-18).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ..core import energy as E
from ..core import neighbours as NB
from ..core.state import SystemState
from ..models.tables import PairTable
from .base import Move, pool_probabilities


# Below this particle count the gather-free dense ΔE (O(N) contiguous VPU
# lanes per move) beats cell-list candidates on TPU, where a vector-index
# gather serialises per index. Engine-level backend selection keys off this.
DENSE_DELTA_MAX = 32768


class Proposal(NamedTuple):
    i: jax.Array  # particle whose position/species changes
    j: jax.Array  # second particle (species change only); == i for displacement
    pos_i: jax.Array  # proposed position of i [d]
    sp_i: jax.Array  # proposed species of i
    sp_j: jax.Array  # proposed species of j
    delta: jax.Array  # displacement vector (zeros for swaps) — PGMC reward input
    log_q_fwd: jax.Array
    log_q_rev: jax.Array


@struct.dataclass
class MCState:
    """Sampler state for one chain (leading axis for batches)."""

    system: SystemState
    key: jax.Array
    cell: Optional[NB.CellList] = None
    attempted: Optional[jax.Array] = None  # [n_moves] i64
    accepted: Optional[jax.Array] = None  # [n_moves] i64


@dataclasses.dataclass(frozen=True)
class KernelConfig:
    """Static ingredients of the jitted kernels."""

    pool: Tuple[Move, ...]
    table: PairTable
    cell_spec: Optional[NB.CellSpec]  # None → dense O(N) candidates
    mol_start: Optional[tuple] = None  # molecule layout (static, shared by chains)
    mol_len: Optional[tuple] = None
    sweepstep: Optional[int] = None  # moves per sweep; default N


def init_mc_state(system: SystemState, config: KernelConfig, seed) -> MCState:
    """Set up sampler state (cell list built if configured). `seed` may be an
    int or a PRNG key."""
    key = jax.random.PRNGKey(seed) if jnp.ndim(seed) == 0 else seed
    cell = None
    if config.cell_spec is not None:
        cell = NB.build_cell_list(system.position, system.box, config.cell_spec)
    nm = len(config.pool)
    cdt = jnp.int64 if jax.config.jax_enable_x64 else jnp.int32
    return MCState(
        system=system,
        key=key,
        cell=cell,
        attempted=jnp.zeros((nm,), cdt),
        accepted=jnp.zeros((nm,), cdt),
    )


# ---------------------------------------------------------------------------
# Candidate sets
# ---------------------------------------------------------------------------


def _make_cand_fn(config: KernelConfig, n: int):
    """Candidate-index function, or None for the gather-free dense path.

    Dense mode deliberately returns None instead of arange(N): a vector-index
    gather of ~N rows lowers to a serial loop on TPU (measured ~3 ms per ΔE),
    while the no-gather dense kernel is ~30N contiguous VPU lanes.
    """
    if config.cell_spec is None:
        return None

    spec = config.cell_spec

    def cand_fn(x, box, cell):
        return NB.candidates_around(x, box, cell, spec)

    return cand_fn


# ---------------------------------------------------------------------------
# Per-particle energy helpers bound to a config
# ---------------------------------------------------------------------------


def _nth_member(species, s, r):
    """Index of the r-th particle (0-based rank) with species == s.

    Replaces the reference's SpeciesList bookkeeping (src/utils.jl:31-49,
    src/moves.jl:175-179) with a rank-select over the species array — O(N)
    vectorised, no mutable index lists to maintain.
    """
    csum = jnp.cumsum((species == s).astype(jnp.int32))
    return jnp.searchsorted(csum, r + 1, side="left").astype(jnp.int32)


def _masked_logsumexp(vals, mask):
    neg = jnp.asarray(-jnp.inf, vals.dtype)
    v = jnp.where(mask, vals, neg)
    m = jnp.max(v)
    m = jnp.where(jnp.isfinite(m), m, jnp.zeros_like(m))
    return m + jnp.log(jnp.sum(jnp.where(mask, jnp.exp(v - m), jnp.zeros_like(v))))


# ---------------------------------------------------------------------------
# Proposal samplers (one per action/policy combo)
# ---------------------------------------------------------------------------


def _propose_displacement(key, st: SystemState, cell, params, cand_fn):
    """Uniform particle + isotropic Gaussian δ (reference src/moves.jl:120-123);
    log q per src/moves.jl:110-112 (symmetric, but kept exact for PGMC)."""
    n, d = st.position.shape
    k1, k2 = jax.random.split(key)
    i = jax.random.randint(k1, (), 0, n, dtype=jnp.int32)
    sigma = params["sigma"]
    delta = sigma * jax.random.normal(k2, (d,), st.position.dtype)
    dt = st.position.dtype
    two_pi = jnp.asarray(2.0 * jnp.pi, dt)

    def logq(dvec):
        return -jnp.sum(dvec * dvec) / (2 * sigma**2) - d * jnp.log(two_pi * sigma**2) / 2

    sp_i = st.species[i]
    return Proposal(
        i=i,
        j=i,
        pos_i=st.position[i] + delta,
        sp_i=sp_i,
        sp_j=sp_i,
        delta=delta,
        log_q_fwd=logq(delta),
        log_q_rev=logq(-delta),
    )


def _propose_swap_uniform(key, st: SystemState, cell, params, cand_fn, s1: int, s2: int):
    """DiscreteSwap + DoubleUniform (reference src/moves.jl:226-241):
    one particle uniform from each species population. A swap on an empty
    species population is rejected outright (log q_rev = -inf) instead of
    silently proposing a clamped index."""
    k1, k2 = jax.random.split(key)
    n1 = jnp.sum(st.species == s1)
    n2 = jnp.sum(st.species == s2)
    r1 = jax.random.randint(k1, (), 0, jnp.maximum(n1, 1))
    r2 = jax.random.randint(k2, (), 0, jnp.maximum(n2, 1))
    i = _nth_member(st.species, s1, r1)
    j = _nth_member(st.species, s2, r2)
    dt = st.position.dtype
    valid = (n1 > 0) & (n2 > 0)
    logq = -jnp.log(jnp.maximum(n1 * n2, 1).astype(dt))
    d = st.position.shape[-1]
    return Proposal(
        i=i,
        j=j,
        pos_i=st.position[i],
        sp_i=st.species[j],
        sp_j=st.species[i],
        delta=jnp.zeros((d,), dt),
        log_q_fwd=logq,
        log_q_rev=jnp.where(valid, logq, jnp.asarray(-jnp.inf, dt)),
    )


def _energy_bias_logq(st: SystemState, cell, params, cand_fn, s1, s2, table, i, j):
    """(log q_fwd, log q_rev) of selecting the pair (i, j) under EnergyBias
    (reference src/moves.jl:254-263). The reverse density is evaluated in the
    *post-swap* configuration (the reference computes log_proposal_density of
    the inverted action after perform_action!, SURVEY.md §3.2)."""
    th1, th2 = params["theta1"], params["theta2"]

    cfn = None
    if cand_fn is not None:
        def cfn(k):
            return cand_fn(st.position[k], st.box, cell)

    e_all = E.per_particle_energies(
        st.position, st.species, st.box, table, st.bonds, cand_fn=cfn
    )
    m1 = st.species == s1
    m2 = st.species == s2
    lse1 = _masked_logsumexp(th1 * e_all, m1)
    lse2 = _masked_logsumexp(th2 * e_all, m2)
    log_q_fwd = th1 * e_all[i] + th2 * e_all[j] - lse1 - lse2

    sp2 = st.species.at[i].set(st.species[j]).at[j].set(st.species[i])
    e2_all = E.per_particle_energies(
        st.position, sp2, st.box, table, st.bonds, cand_fn=cfn
    )
    lse1b = _masked_logsumexp(th1 * e2_all, sp2 == s1)
    lse2b = _masked_logsumexp(th2 * e2_all, sp2 == s2)
    log_q_rev = th1 * e2_all[j] + th2 * e2_all[i] - lse1b - lse2b
    return e_all, log_q_fwd, log_q_rev


def _propose_swap_energy_bias(
    key, st: SystemState, cell, params, cand_fn, s1: int, s2: int, table, bonds
):
    """DiscreteSwap + EnergyBias (reference src/moves.jl:269-280): categorical
    over exp(θ·E_i) within each species population."""
    k1, k2 = jax.random.split(key)
    th1, th2 = params["theta1"], params["theta2"]

    cfn = None
    if cand_fn is not None:
        def cfn(k):
            return cand_fn(st.position[k], st.box, cell)

    e_all = E.per_particle_energies(
        st.position, st.species, st.box, table, bonds, cand_fn=cfn
    )
    dt = e_all.dtype
    m1 = st.species == s1
    m2 = st.species == s2
    neg = jnp.asarray(-jnp.inf, dt)
    i = jax.random.categorical(k1, jnp.where(m1, th1 * e_all, neg))
    j = jax.random.categorical(k2, jnp.where(m2, th2 * e_all, neg))
    i = jnp.clip(i, 0, e_all.shape[0] - 1).astype(jnp.int32)
    j = jnp.clip(j, 0, e_all.shape[0] - 1).astype(jnp.int32)
    _, log_q_fwd, log_q_rev = _energy_bias_logq(
        st, cell, params, cand_fn, s1, s2, table, i, j
    )
    # empty population: categorical over all -inf is undefined — reject
    valid = jnp.any(m1) & jnp.any(m2)
    log_q_fwd = jnp.where(valid, log_q_fwd, jnp.zeros_like(log_q_fwd))
    log_q_rev = jnp.where(valid, log_q_rev, neg)

    d = st.position.shape[-1]
    return Proposal(
        i=i,
        j=j,
        pos_i=st.position[i],
        sp_i=st.species[j],
        sp_j=st.species[i],
        delta=jnp.zeros((d,), st.position.dtype),
        log_q_fwd=log_q_fwd,
        log_q_rev=log_q_rev,
    )


def _propose_flip(key, st: SystemState, cell, params, cand_fn, mol_start, mol_len):
    """MoleculeFlip + DoubleUniform (reference src/moves.jl:344-352): uniform
    molecule, two distinct sites, resampled until species differ."""
    nmol = mol_start.shape[0]
    dt = st.position.dtype

    def draw(k):
        ka, kb, kc = jax.random.split(k, 3)
        m = jax.random.randint(ka, (), 0, nmol)
        L = mol_len[m]
        a = jax.random.randint(kb, (), 0, L)
        b = jax.random.randint(kc, (), 0, jnp.maximum(L - 1, 1))
        b = jnp.where(b >= a, b + 1, b)
        return mol_start[m] + a, mol_start[m] + b

    def cond(carry):
        _k, i, j = carry
        return st.species[i] == st.species[j]

    def body(carry):
        k, _i, _j = carry
        k, sub = jax.random.split(k)
        i, j = draw(sub)
        return (k, i, j)

    key, sub = jax.random.split(key)
    i0, j0 = draw(sub)
    _, i, j = jax.lax.while_loop(cond, body, (key, i0, j0))
    i = i.astype(jnp.int32)
    j = j.astype(jnp.int32)
    logq = -jnp.log(jnp.asarray(2.0, dt))
    d = st.position.shape[-1]
    return Proposal(
        i=i,
        j=j,
        pos_i=st.position[i],
        sp_i=st.species[j],
        sp_j=st.species[i],
        delta=jnp.zeros((d,), dt),
        log_q_fwd=logq,
        log_q_rev=logq,
    )


def make_proposal_fns(config: KernelConfig, n: int):
    """One `propose(key, system, cell, params) -> Proposal` per pool move."""
    cand_fn = _make_cand_fn(config, n)
    fns = []
    for mv in config.pool:
        if mv.action == "displacement":
            if mv.policy == "smart":
                raise ValueError(
                    "SmartGaussian (force-bias) displacement runs on the "
                    "checkerboard backend only — set parallel_moves=true"
                )
            fns.append(partial(_propose_displacement, cand_fn=cand_fn))
        elif mv.action == "swap" and mv.policy == "double_uniform":
            s1, s2 = mv.species
            fns.append(partial(_propose_swap_uniform, cand_fn=cand_fn, s1=s1, s2=s2))
        elif mv.action == "swap" and mv.policy == "energy_bias":
            s1, s2 = mv.species

            def f(key, st, cell, params, cand_fn=cand_fn, s1=s1, s2=s2):
                return _propose_swap_energy_bias(
                    key, st, cell, params, cand_fn, s1, s2, config.table, st.bonds
                )

            fns.append(f)
        elif mv.action == "flip":
            if config.mol_start is None:
                raise ValueError("MoleculeFlip requires a molecular system")
            ms = jnp.asarray(config.mol_start, jnp.int32)
            ml = jnp.asarray(config.mol_len, jnp.int32)
            fns.append(partial(_propose_flip, cand_fn=cand_fn, mol_start=ms, mol_len=ml))
        else:  # pragma: no cover
            raise ValueError(f"unsupported move {mv}")
    return fns, cand_fn


def make_logq_fns(config: KernelConfig, n: int):
    """Per-move `logq(prop, system, cell, params) -> (log q_fwd, log q_rev)`
    recomputed from a (detached) proposal — the differentiable path PGMC
    takes through the policy parameters (reference hook
    Arianna.log_proposal_density, SURVEY.md §1.2)."""
    cand_fn = _make_cand_fn(config, n)
    fns = []
    for mv in config.pool:
        if mv.action == "displacement":

            def f(prop, st, cell, params):
                d = st.position.shape[-1]
                sigma = params["sigma"]
                dt = st.position.dtype
                two_pi = jnp.asarray(2.0 * jnp.pi, dt)
                norm2 = jnp.sum(prop.delta * prop.delta)
                lq = -norm2 / (2 * sigma**2) - d * jnp.log(two_pi * sigma**2) / 2
                return lq, lq

        elif mv.action == "swap" and mv.policy == "double_uniform":
            s1, s2 = mv.species

            def f(prop, st, cell, params, s1=s1, s2=s2):
                dt = st.position.dtype
                n1 = jnp.sum(st.species == s1)
                n2 = jnp.sum(st.species == s2)
                lq = -jnp.log((n1 * n2).astype(dt))
                return lq, lq

        elif mv.action == "swap" and mv.policy == "energy_bias":
            s1, s2 = mv.species

            def f(prop, st, cell, params, s1=s1, s2=s2):
                _, lqf, lqr = _energy_bias_logq(
                    st, cell, params, cand_fn, s1, s2, config.table, prop.i, prop.j
                )
                return lqf, lqr

        elif mv.action == "flip":

            def f(prop, st, cell, params):
                lq = -jnp.log(jnp.asarray(2.0, st.position.dtype))
                return lq, lq

        else:  # pragma: no cover
            raise ValueError(f"unsupported move {mv}")
        fns.append(f)
    return fns


def move_reward(mv: Move):
    """PGMC reward per action (reference src/moves.jl:98-100, 219-221,
    329-331): |δ|² for displacement, 1 for swaps/flips."""
    if mv.action == "displacement":
        return lambda prop, st: jnp.sum(prop.delta * prop.delta)
    return lambda prop, st: jnp.asarray(1.0, st.position.dtype)


# ---------------------------------------------------------------------------
# The MC step / sweep
# ---------------------------------------------------------------------------


def build_delta_e_fn(config: KernelConfig, n: int) -> Callable:
    """delta_e(system, cell, prop) -> (e1, e2): pre/post energies of the
    touched particles, evaluated through the functional Override — the
    TPU equivalent of the reference's perform_action! energy bookkeeping
    (src/moves.jl:57-67, 187-194)."""
    cand_fn = _make_cand_fn(config, n)
    table = config.table

    if cand_fn is None:

        def delta_e(st: SystemState, cell, prop: Proposal):
            dt = st.position.dtype
            mi = jnp.asarray(-1, jnp.int32)
            z = jnp.asarray(0, jnp.int32)
            null_pos = jnp.zeros_like(prop.pos_i)
            # all four evaluations as ONE [4, N] vmapped pass (4x fewer
            # kernel dispatches per scan step than sequential [N] passes):
            # rows (k, override) = (i, null), (j, null), (i, ov), (j, ov)
            ks = jnp.stack([prop.i, prop.j, prop.i, prop.j])
            ovs = E.Override(
                i=jnp.stack([mi, mi, prop.i, prop.i]),
                j=jnp.stack([mi, mi, prop.j, prop.j]),
                pos_i=jnp.stack([null_pos, null_pos, prop.pos_i, prop.pos_i]),
                sp_i=jnp.stack([z, z, prop.sp_i, prop.sp_i]),
                sp_j=jnp.stack([z, z, prop.sp_j, prop.sp_j]),
            )

            def one(k, ov):
                return E.particle_energy_nogather(
                    k, st.position, st.species, st.box, table, st.bonds, ov
                )

            e4 = jax.vmap(one)(ks, ovs)
            pair_mask = (prop.j != prop.i).astype(dt)
            e1 = e4[0] + pair_mask * e4[1]
            e2 = e4[2] + pair_mask * e4[3]
            return e1, e2

        return delta_e

    def delta_e(st: SystemState, cell, prop: Proposal):
        dt = st.position.dtype
        ov = E.Override(i=prop.i, j=prop.j, pos_i=prop.pos_i, sp_i=prop.sp_i, sp_j=prop.sp_j)
        box = st.box
        pe = partial(
            E.particle_energy,
            position=st.position,
            species=st.species,
            box=box,
            table=table,
            bonds=st.bonds,
        )
        pair_mask = (prop.j != prop.i).astype(dt)
        cands_i_old = cand_fn(st.position[prop.i], box, cell)
        cands_j = cand_fn(st.position[prop.j], box, cell)
        e1 = pe(prop.i, cands_i_old) + pair_mask * pe(prop.j, cands_j)
        cands_i_new = cand_fn(prop.pos_i, box, cell)
        e2 = pe(prop.i, cands_i_new, ov=ov) + pair_mask * pe(prop.j, cands_j, ov=ov)
        return e1, e2

    return delta_e


def build_step_fn(config: KernelConfig, n: int) -> Callable:
    """Returns step(mc_state, pool_params, key) -> (mc_state, info)."""
    propose_fns, cand_fn = make_proposal_fns(config, n)
    delta_e = build_delta_e_fn(config, n)
    n_moves = len(config.pool)

    def step(mc: MCState, pool_params, key):
        st = mc.system
        dt = st.position.dtype
        probs = pool_probabilities(config.pool, dt)
        k_move, k_prop, k_acc = jax.random.split(key, 3)

        move_k = jax.random.choice(k_move, n_moves, p=probs)

        if n_moves == 1:
            prop = propose_fns[0](k_prop, st, mc.cell, pool_params[0])
        else:
            props = [
                fn(k_prop, st, mc.cell, pool_params[m])
                for m, fn in enumerate(propose_fns)
            ]
            stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *props)
            prop = jax.tree.map(lambda x: x[move_k], stacked)

        # ΔE through the functional override — 2 evals of (i, j) each
        e1, e2 = delta_e(st, mc.cell, prop)
        box = st.box

        # Metropolis-Hastings acceptance (SURVEY.md §1.2 kernel semantics)
        d_log_target = -(e2 - e1) / st.temperature
        log_alpha = d_log_target + prop.log_q_rev - prop.log_q_fwd
        log_alpha = jnp.where(jnp.isnan(log_alpha), jnp.asarray(-jnp.inf, dt), log_alpha)
        u = jax.random.uniform(k_acc, (), dt, minval=jnp.finfo(dt).tiny)
        accept = jnp.log(u) < log_alpha

        # Incremental energy bookkeeping with Inf guard (src/moves.jl:11-20)
        de = jnp.where(jnp.isinf(e1) | jnp.isinf(e2), jnp.zeros_like(e2), e2 - e1)
        energy = st.energy + jnp.where(accept, de, jnp.zeros_like(de))

        new_pos_i = jnp.where(accept, prop.pos_i, st.position[prop.i])
        new_sp_i = jnp.where(accept, prop.sp_i, st.species[prop.i])
        new_sp_j = jnp.where(accept, prop.sp_j, st.species[prop.j])
        position = st.position.at[prop.i].set(new_pos_i)
        species = st.species.at[prop.i].set(new_sp_i).at[prop.j].set(new_sp_j)

        cell = mc.cell
        if config.cell_spec is not None:
            new_cell_id = NB.cell_index(new_pos_i, box, config.cell_spec)
            cell = NB.move_particle(cell, prop.i, new_cell_id)

        attempted = mc.attempted.at[move_k].add(1)
        accepted = mc.accepted.at[move_k].add(accept.astype(mc.accepted.dtype))

        mc2 = mc.replace(
            system=st.replace(position=position, species=species, energy=energy),
            cell=cell,
            attempted=attempted,
            accepted=accepted,
        )
        return mc2, accept

    return step


def build_sweep_fn(config: KernelConfig, n: int) -> Callable:
    """sweep(mc_state, pool_params) -> mc_state: `sweepstep` MC steps under
    one `lax.scan` (the reference's mc_sweep!, SURVEY.md §3.2)."""
    step = build_step_fn(config, n)
    sweepstep = config.sweepstep or n

    def sweep(mc: MCState, pool_params) -> MCState:
        key, sub = jax.random.split(mc.key)
        step_keys = jax.random.split(sub, sweepstep)
        mc = mc.replace(key=key)

        def body(carry, k):
            out, _ = step(carry, pool_params, k)
            return out, None

        mc, _ = jax.lax.scan(body, mc, step_keys)
        return mc

    return sweep


def build_run_fn(config: KernelConfig, n: int) -> Callable:
    """run(mc_state, pool_params, n_sweeps static) -> mc_state: chunk of
    sweeps under one jit — the unit the engine dispatches between scheduled
    output events."""
    sweep = build_sweep_fn(config, n)

    @partial(jax.jit, static_argnums=(2,))
    def run(mc: MCState, pool_params, n_sweeps: int) -> MCState:
        def body(carry, _):
            return sweep(carry, pool_params), None

        mc, _ = jax.lax.scan(body, mc, None, length=n_sweeps)
        return mc

    return run
