"""Headline benchmark: aggregate MC sweeps/s at N=10k LJ (BASELINE.json metric).

Default mode runs the checkerboard hyper-sweep kernel (moves/checkerboard.py)
— the massively-parallel TPU Metropolis backend — on a binary Kob-Andersen LJ
mixture, N=10,000, 3D, with many independent chains batched per chip.
BENCH_MODE=seq measures the sequential per-move kernel instead (the
reference-semantics path).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Baseline accounting (BASELINE.md north star: ">=10x single-NODE Julia"):
the reference runs 1 chain/core via Julia threads (Metropolis parallel=true,
reference src/ParticlesMC.jl:246). A single core sustains ~200 sweeps/s at
N=10k on its LinkedList path (extrapolated from the published 5.1 us/step at
N=216, benchmark/particles_benchmarks.jl:28, assuming ~0.5 us/step with O(1)
neighbour iteration at N=10k). `vs_baseline` divides by the NODE aggregate
(cores x 200); the per-core ratio is also reported. Override the assumed
core count with BASELINE_NODE_CORES.

Mixing honesty: a checkerboard "sweep" counts cell-exit auto-rejects as
attempts, so raw sweeps/s overstates effective sampling vs the reference.
The JSON therefore also carries accepted moves/s (`accepted_per_s`) and the
acceptance rate over the SAME timed window, plus `vs_baseline_accepted`
(accepted/s divided by the node-aggregate accepted/s at the reference's
measured 0.55 displacement acceptance, examples/lj-mixture README). Bucket
overflow skips the affected rebin block (identity kernel — unbiased); the
JSON carries the timed-window skip fraction (`skip_frac`), which is pure
throughput loss already reflected in the sweeps/s value.

A mixing-honest metric rides along: `msd_per_s` is the mean-square
displacement per particle per wall-second over the timed window (min-image;
valid while per-window drift < box/2) — checkerboard cell-exit auto-rejects
cannot inflate it, so it tracks actual configuration-space mixing.
`vs_baseline_msd` anchors it: the reference's per-chain MSD gain per sweep
is at most acc * E|delta|^2 = acc * 3 sigma^2 (each particle attempts one
Gaussian move per sweep; ignoring reverse-move suppression makes this an
UPPER bound, i.e. conservative against us), so a 64-core node mixes at
<= cores * 200 sweeps/s * 0.55 * 3 * 0.05^2 in sigma^2/s aggregated over
chains. Ours aggregates the measured per-chain msd_per_s over the chain
batch. Both sides count every chain once, so the ratio compares total
configuration-space mixing per wall-second per node vs per chip.

Env knobs: BENCH_N, BENCH_CHAINS, BENCH_SWEEPS, BENCH_BURNIN,
BENCH_MODE (cb|seq),
BENCH_SIGMA, BENCH_SWAP (swap-move fraction, 0 disables), BENCH_REBIN,
BENCH_INNER (default 48 — measured best on TPU v5e with msd_per_s held),
BENCH_CAP,
BENCH_MOL (1 = Kremer-Grest trimer melt with a disp+10%-flip pool on the
molecular checkerboard path; N is rounded to a multiple of 3),
BASELINE_NODE_CORES.
"""

import json
import os
import sys
import time

N = int(os.environ.get("BENCH_N", 10_000))
MOL = os.environ.get("BENCH_MOL", "0") == "1"
if MOL:
    N -= N % 3
CHAINS = int(os.environ.get("BENCH_CHAINS", 256))
SWEEPS_TIMED = int(os.environ.get("BENCH_SWEEPS", 8))
# advance() calls run before the timed window (beyond the 1 compile call).
# The default start is a perturbed lattice whose geometric aliasing against
# the cell grid inflates the max bucket occupancy well above the liquid's
# equilibrated fluctuations — burn-in measures the production regime and is
# required for tight caps (BENCH_CAP < 32 at the default state point).
# Default 8 calls (= 8*REBIN sweeps): rounds 1-3 measured from the lattice
# start (BURNIN=0), whose relaxation transient inflated msd_per_s ~2x over
# the equilibrated liquid's (measured: 0.0124 from the lattice vs 0.0059
# equilibrated at identical settings, benchmarks/mixing_sweep.py r4 matrix).
# Sweeps/s is start-insensitive; only the mixing metric was affected.
BURNIN = int(os.environ.get("BENCH_BURNIN", 8))
MODE = os.environ.get("BENCH_MODE", "cb")
# sigma=0.06 is the MEASURED msd_per_s optimum at this state point — swept
# over sigma in [0.05, 0.30] x rebin in {4,8,16} x inner in {8,16,48} on the
# TPU (benchmarks/mixing_sweep.py, matrix in docs/man/performance.md):
# acceptance falls steeply enough with sigma (0.37 @ 0.05 -> 0.01 @ 0.30)
# that acc*sigma^2 is flat and cell-exit rejects tip the balance to 0.06.
# Studies should not hard-code this: the engine's AdaptiveSigma output
# algorithm (engine/adaptive.py) targets an acceptance on any state point.
SIGMA = float(os.environ.get("BENCH_SIGMA", 0.06))
P_SWAP = float(os.environ.get("BENCH_SWAP", "0"))
REBIN = int(os.environ.get("BENCH_REBIN", 16))  # sweeps per rebin block (cb mode)

# benchmark state point (keyed into BENCH_CAP defaults below)
DIM, DENSITY, TEMPERATURE = 3, 1.2, 1.0

JULIA_CORE_SWEEPS_PER_S = 200.0  # 1 chain/core at N=10k (see module docstring)
NODE_CORES = int(os.environ.get("BASELINE_NODE_CORES", 64))
JULIA_NODE_SWEEPS_PER_S = JULIA_CORE_SWEEPS_PER_S * NODE_CORES
JULIA_DISP_ACCEPTANCE = 0.55  # reference lj-mixture displacement acceptance
JULIA_SIGMA = 0.05  # reference lj-mixture displacement width (their script)
# analytic upper bound on the reference's per-chain per-particle MSD per
# sweep (see module docstring); x3 for the 3 Gaussian components
JULIA_MSD_PER_SWEEP = JULIA_DISP_ACCEPTANCE * 3 * JULIA_SIGMA**2


def _config(dtype):
    import numpy as np

    rng = np.random.default_rng(0)
    L = (N / DENSITY) ** (1 / DIM)
    per_dim = int(np.ceil(N ** (1 / DIM)))
    a = L / per_dim
    grid = np.stack(
        np.meshgrid(*[np.arange(per_dim) * a + a / 2] * DIM, indexing="ij"), -1
    ).reshape(-1, DIM)[:N]
    pos = np.asarray(grid + rng.uniform(-0.05 * a, 0.05 * a, (N, DIM)), np.float32)
    species = (rng.random(N) < 0.2).astype(np.int32) + 1
    return pos, species


def _mol_config(dtype):
    """Trimer melt: planar 3-site molecules on a molecular lattice."""
    import numpy as np

    n_mol = N // 3
    L = (N / DENSITY) ** (1 / DIM)
    per = int(np.ceil(n_mol ** (1 / DIM)))
    a = L / per
    rng = np.random.default_rng(0)
    centers = np.stack(
        np.meshgrid(*[np.arange(per) * a + a / 2] * DIM, indexing="ij"), -1
    ).reshape(-1, DIM)[:n_mol]
    tri = np.array([[0.0, 0.0, 0.0], [0.97, 0.0, 0.0], [0.5, 0.85, 0.0]])
    pos = (centers[:, None, :] + tri[None]).reshape(N, DIM)
    pos += rng.uniform(-0.02, 0.02, pos.shape)
    species = np.tile([1, 2, 3], n_mol).astype(np.int32)
    molecule = np.repeat(np.arange(1, n_mol + 1), 3)
    pairs = []
    for m in range(n_mol):
        b = 3 * m
        pairs += [(b, b + 1), (b, b + 2), (b + 1, b + 2)]
    return np.asarray(pos, np.float32), species, molecule, pairs


def main():
    import jax
    import jax.numpy as jnp

    plat = os.environ.get("JAX_PLATFORMS")
    if plat:  # sitecustomize-registered plugins may override the env var
        jax.config.update("jax_platforms", plat)
    jax.config.update(
        "jax_compilation_cache_dir",
        # per-platform cache: CPU AOT entries poison the TPU dir (and are
        # host-machine-feature specific -> SIGILL across hosts)
        "/tmp/jax_cache_cpu"
        if os.environ.get("JAX_PLATFORMS") == "cpu"
        else "/tmp/jax_cache",
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from particlesmc_tpu.core.state import bonds_from_pairs, make_system
    from particlesmc_tpu.models import tables as T

    dtype = jnp.float32
    max_bonds = 0
    if MOL:
        pos, species, molecule, pairs = _mol_config(dtype)
        table = T.Trimer(dtype)
        st = make_system(
            pos, species, DENSITY, TEMPERATURE,
            molecule=molecule, bonds=bonds_from_pairs(pairs, N), dtype=dtype,
        )
        max_bonds = int(st.bonds.shape[-1])
    else:
        pos, species = _config(dtype)
        table = T.KobAndersen(dtype)
        st = make_system(pos, species, DENSITY, TEMPERATURE, dtype=dtype)

    from particlesmc_tpu.moves import base as MB

    # BENCH_SMART=1 switches displacements to the force-bias policy
    # (moves/base.displacement_smart) — atomic checkerboard pools only
    smart_disp = os.environ.get("BENCH_SMART", "0") == "1" and not MOL
    mk_disp = MB.displacement_smart if smart_disp else MB.displacement
    if MOL:
        pool = (
            MB.displacement(SIGMA, probability=0.9),
            MB.molecule_flip(probability=0.1),
        )
    elif P_SWAP > 0:
        pool = (
            mk_disp(SIGMA, probability=1.0 - P_SWAP),
            MB.discrete_swap(0, 1, probability=P_SWAP),
        )
    else:
        pool = (mk_disp(SIGMA),)
    pool_params = MB.init_pool_params(pool, dtype)

    mode = MODE
    spec = None
    if mode == "cb":
        from particlesmc_tpu.moves import checkerboard as CB

        # cap=32 ~= 1.64x the mean occupancy — overflow-free over 768 sweeps
        # from the lattice start at EXACTLY this state point (skip_frac in
        # the JSON guards the result regardless); any other state point
        # falls back to the conservative library default. NOTE the lattice
        # start's grid aliasing needs cap >= ~29; the equilibrated liquid is
        # tighter — use BENCH_BURNIN to measure the production regime.
        at_validated_point = (
            (N, DENSITY, TEMPERATURE) == (10_000, 1.2, 1.0) and not MOL
        )
        cap_env = os.environ.get("BENCH_CAP", "32" if at_validated_point else "")
        cb_rcut = T.interaction_range(table) if MOL else table.max_cutoff
        spec = CB.make_cb_spec(
            __import__("numpy").asarray(st.box),
            cb_rcut,
            N,
            cap=int(cap_env) if cap_env else None,
            occ_factor=4.0 if MOL else 2.5,
        )
        if spec is None:  # box too small for a 4-cell checkerboard grid
            print(
                "# N too small for the checkerboard grid — falling back to seq",
                file=sys.stderr,
            )
            mode = "seq"
    if MOL:
        pool_label = "trimer disp+10%flip"
    elif P_SWAP > 0:
        pool_label = f"disp+{P_SWAP:.0%}swap"
    else:
        pool_label = "disp"
    if mode == "cb":
        # per-substep candidate compaction (moves/checkerboard.py trim_k):
        # OFF by default — measured a net LOSS on TPU v5e (see the
        # "candidate compaction" subsection of docs/man/performance.md: all
        # three compaction mechanisms serialize over the chain batch or
        # out-cost the lanes they save). BENCH_TRIM=auto/int opts in.
        trim_env = os.environ.get("BENCH_TRIM", "off")
        cb_rcut_trim = T.interaction_range(table)
        if trim_env == "auto":
            trim_k = CB.auto_trim_k(
                spec, __import__("numpy").asarray(st.box), cb_rcut_trim, N
            )
        elif trim_env in ("0", "off"):
            trim_k = None
        else:
            trim_k = int(trim_env)
        hs = CB.build_hyper_sweep_fn(
            spec,
            table,
            N,
            inner=int(os.environ.get("BENCH_INNER", "48")),
            sweeps=REBIN,
            pool=pool,
            max_bonds=max_bonds,
            trim_k=trim_k,
        )

        @jax.jit
        def init_all(st):
            keys = jax.random.split(jax.random.PRNGKey(0), CHAINS)
            batch = jax.tree.map(lambda x: jnp.broadcast_to(x, (CHAINS,) + x.shape), st)
            return jax.vmap(
                lambda s, k: CB.init_cb_state(s, spec, k, len(pool))
            )(batch, keys)

        state = init_all(st)
        step = jax.jit(jax.vmap(lambda m: hs(m, pool_params), in_axes=(0,)))

        def advance(s, i):
            return step(s)

        model_label = "KG" if MOL else "LJ"
        label = (
            f"checkerboard MC sweeps/s/chip, N={N} {model_label} "
            f"{pool_label}, {CHAINS} chains"
        )
    else:
        from particlesmc_tpu.moves import kernel as K

        mol_kw = {}
        if MOL:
            from particlesmc_tpu.core.state import mol_table

            ms, ml = mol_table(__import__("numpy").asarray(st.molecule))
            mol_kw = dict(mol_start=tuple(ms), mol_len=tuple(ml))
        config = K.KernelConfig(pool=pool, table=table, cell_spec=None, **mol_kw)

        @jax.jit
        def init_all(st):
            keys = jax.random.split(jax.random.PRNGKey(0), CHAINS)
            batch = jax.tree.map(lambda x: jnp.broadcast_to(x, (CHAINS,) + x.shape), st)
            return jax.vmap(lambda s, k: K.init_mc_state(s, config, k))(batch, keys)

        state = init_all(st)
        sweep = K.build_sweep_fn(config, N)
        step = jax.jit(jax.vmap(lambda m: sweep(m, pool_params), in_axes=(0,)))

        def advance(s, i):
            return step(s)

        model_label = "KG" if MOL else "LJ"
        label = (
            f"sequential MC sweeps/s/chip, N={N} {model_label} "
            f"{pool_label}, {CHAINS} chains"
        )

    jax.block_until_ready(state.system.position)

    t0 = time.perf_counter()
    state = advance(state, 0)
    jax.block_until_ready(state.system.position)
    compile_s = time.perf_counter() - t0

    for i in range(BURNIN):
        state = advance(state, -(i + 1))
    if BURNIN:
        jax.block_until_ready(state.system.position)

    import numpy as np

    def _sum64(x):  # i32 counters overflow a device-side sum at 256 chains
        return float(np.sum(np.asarray(x, np.int64)))

    # snapshot BOTH counters so acceptance covers the same timed window
    att0 = _sum64(state.attempted)
    acc0 = _sum64(state.accepted)
    skip0 = _sum64(state.skipped) if mode == "cb" else 0.0
    pos0 = np.asarray(state.system.position)  # [chains, N, d]
    trace_dir = os.environ.get("BENCH_TRACE_DIR")
    if trace_dir:  # profile ONLY the steady-state timed window
        jax.profiler.start_trace(trace_dir)
    t0 = time.perf_counter()
    for i in range(SWEEPS_TIMED):
        state = advance(state, i + 1)
    jax.block_until_ready(state.system.position)
    elapsed = time.perf_counter() - t0
    if trace_dir:
        jax.profiler.stop_trace()
        print(f"# trace written to {trace_dir}", file=sys.stderr)

    # one sweep = N attempted moves (the reference convention, sweepstep=N,
    # src/ParticlesMC.jl:246) — counted from the kernel's attempt counter so
    # rounding of rounds*colors*inner*cells up to >= N is not under-reported
    attempted = _sum64(state.attempted) - att0
    accepted = _sum64(state.accepted) - acc0
    sweeps_per_s = attempted / N / elapsed
    accepted_per_s = accepted / elapsed
    acc_rate = accepted / max(1.0, attempted)
    # Checkerboard overflow now means blocks were SKIPPED (identity kernel,
    # unbiased — moves/checkerboard.py): the result stays valid and the
    # throughput cost is already reflected in attempted/elapsed. Report the
    # skip fraction so cap tuning stays honest.
    skip_frac = 0.0
    overflow = False
    if mode == "cb":
        # skip fraction over the TIMED window only (burn-in skips excluded)
        calls = SWEEPS_TIMED * CHAINS
        skip_frac = (_sum64(state.skipped) - skip0) / max(1, calls)
        overflow = skip_frac > 0
        if overflow:
            print(
                f"# NOTE: {skip_frac:.1%} of rebin blocks skipped "
                "(bucket overflow -> identity kernel; unbiased)",
                file=sys.stderr,
            )
    # --- VPU / HBM utilization (analytic roofline, VERDICT r4 item 3) ----
    # The tunnelled `axon` runtime hangs on jax.profiler.start_trace, so the
    # utilization numbers are computed from the kernel's known per-attempt
    # work instead of a trace (cross-checked against the round-2 xprof
    # observation that the ΔE fusions run at VPU peak; on a standard TPU
    # runtime BENCH_TRACE_DIR + tools/parse_xplane.py gives the per-op
    # table). Per attempted move the kernel evaluates `lanes` candidate
    # lanes (cap live-center lanes + trim_k — or 26*cap untrimmed — static
    # lanes) over two position passes at ~35 VPU ops/lane-pass (r² fma
    # chain + branchless LJ + masking); the smart policy adds the
    # pair_virial force evaluation (~15 ops) per lane-pass. HBM traffic per
    # attempt is one read of the candidate planes (d+1 f32 planes) shared
    # by both passes of a Gaussian sub-move (the fusion keeps them
    # resident), twice that for smart (two separate passes).
    vpu_util = hbm_util = None
    if mode == "cb" and not MOL:
        lanes = (trim_k if trim_k else 26 * spec.cap) + spec.cap
        smart = any(mv.policy == "smart" for mv in pool)
        ops_lane_pass = 50.0 if smart else 35.0
        ops_per_attempt = 2.0 * lanes * ops_lane_pass
        bytes_per_attempt = lanes * (DIM + 1) * 4.0 * (2.0 if smart else 1.0)
        attempts_per_s = attempted / elapsed
        vpu_peak = float(os.environ.get("BENCH_VPU_PEAK_TOPS", 3.9)) * 1e12
        hbm_peak = float(os.environ.get("BENCH_HBM_PEAK_GBPS", 819.0)) * 1e9
        vpu_util = attempts_per_s * ops_per_attempt / vpu_peak
        hbm_util = attempts_per_s * bytes_per_attempt / hbm_peak

    # mixing metric: per-particle MSD per wall-second over the timed window
    # (min-image displacement; exact while per-window drift < box/2)
    box = np.asarray(st.box)
    dx = np.asarray(state.system.position) - pos0
    dx -= box * np.round(dx / box)
    msd = float(np.mean(np.sum(dx * dx, axis=-1)))
    msd_per_s = msd / elapsed
    baseline_accepted_per_s = JULIA_NODE_SWEEPS_PER_S * N * JULIA_DISP_ACCEPTANCE
    # aggregate mixing: chip total (chains x measured per-chain rate) vs the
    # node-aggregate analytic upper bound (see module docstring)
    baseline_msd_per_s = JULIA_NODE_SWEEPS_PER_S * JULIA_MSD_PER_SWEEP
    print(
        json.dumps(
            {
                "metric": label,
                "value": round(sweeps_per_s, 2),
                "unit": "sweeps/s",
                "vs_baseline": round(sweeps_per_s / JULIA_NODE_SWEEPS_PER_S, 3),
                "vs_baseline_core": round(sweeps_per_s / JULIA_CORE_SWEEPS_PER_S, 3),
                "baseline_node_cores": NODE_CORES,
                "accepted_per_s": round(accepted_per_s, 1),
                "vs_baseline_accepted": round(
                    accepted_per_s / baseline_accepted_per_s, 3
                ),
                "acceptance": round(acc_rate, 4),
                "msd_per_s": round(msd_per_s, 6),
                "vs_baseline_msd": round(
                    CHAINS * msd_per_s / baseline_msd_per_s, 3
                ),
                "sigma": SIGMA,
                "p_swap": P_SWAP,
                "overflow": overflow,
                "skip_frac": round(skip_frac, 4),
                **(
                    {
                        "vpu_util": round(vpu_util, 3),
                        "hbm_util": round(hbm_util, 3),
                        "trim_k": trim_k,
                    }
                    if vpu_util is not None
                    else {}
                ),
            }
        )
    )
    print(
        f"# device={jax.devices()[0].platform} compile={compile_s:.1f}s "
        f"timed={elapsed:.2f}s accept_rate={acc_rate:.3f}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
