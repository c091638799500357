"""Worker for the two-process `jax.distributed` smoke test.

Validates the multi-host story (SURVEY.md §5.8) in an environment without
real multi-chip hardware: two OS processes, each with 4 virtual CPU devices,
form ONE 8-device global mesh via `jax.distributed.initialize`; the chains
axis is sharded 4+4 across the processes and a jitted vmapped MC sweep runs
SPMD over the global mesh. Process 0 writes the final per-chain energies,
which tests/test_multiprocess.py compares against a single-process run of
the identical computation.

Usage (launched by the test or by hand, once per process):
    python tools/multiprocess_worker.py <proc_id> <num_procs> <coord_addr> <outdir>

This is the same bring-up sequence a TPU pod uses — on Cloud TPU,
`jax.distributed.initialize()` auto-detects the coordinator and process id,
and the identical mesh/sharding code spans hosts over DCN
(docs/man/performance.md, "Multi-host bring-up").
"""

import os
import sys


def main():
    proc_id, num_procs, coord, outdir = (
        int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4],
    )
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=4"
    ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    from particlesmc_tpu.parallel.mesh import init_distributed

    init_distributed(
        coordinator_address=coord, num_processes=num_procs, process_id=proc_id
    )
    assert jax.process_count() == num_procs
    assert len(jax.devices()) == num_procs * 4  # global view
    assert len(jax.local_devices()) == 4

    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from tools.multiprocess_common import build_batch, run_sweeps

    chains = 8
    mc, params, sweep = build_batch(chains)

    mesh = jax.sharding.Mesh(np.asarray(jax.devices()), ("chains",))
    shard = NamedSharding(mesh, P("chains"))
    repl = NamedSharding(mesh, P())

    # every process holds the full host batch; hand each its local shard
    lo = proc_id * (chains // num_procs)
    hi = lo + chains // num_procs
    mc_global = jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            NamedSharding(mesh, P("chains")), np.asarray(x)[lo:hi]
        ),
        mc,
    )
    params_global = jax.device_put(params, repl)

    out = run_sweeps(mc_global, params_global, sweep, shard)

    from jax.experimental import multihost_utils

    energies = multihost_utils.process_allgather(out.system.energy, tiled=True)
    if proc_id == 0:
        np.save(os.path.join(outdir, "energies.npy"), np.asarray(energies))
        with open(os.path.join(outdir, "ok"), "w") as f:
            f.write("ok\n")
    jax.distributed.shutdown()


if __name__ == "__main__":
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    main()
