"""Two-process `jax.distributed` smoke test (SURVEY.md §5.8).

The reference never leaves one process (its `parallel=true` is shared-memory
Julia threads, reference src/ParticlesMC.jl:246). The TPU-native multi-host
story is `jax.distributed.initialize` + a global mesh; real multi-chip
hardware is not available in this environment, so this test stands the stack
up with two local OS processes × 4 virtual CPU devices each and checks the
cross-process sharded run reproduces the single-process result.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

# statistical/parity long-runners: fast tier skips this module
pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tools", "multiprocess_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_sharded_run_matches_single_process(tmp_path):
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    env = dict(os.environ)
    # children configure their own JAX env; scrub the parent's test settings
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(i), "2", coord, str(tmp_path)],
            env=env,
            cwd=REPO,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=540)
            outs.append(out.decode(errors="replace"))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"
    assert (tmp_path / "ok").exists()

    got = np.load(tmp_path / "energies.npy")

    # single-process reference of the identical computation
    sys.path.insert(0, REPO)
    from tools.multiprocess_common import build_batch, run_sweeps

    mc, params, sweep = build_batch(8)
    ref = run_sweeps(mc, params, sweep)
    np.testing.assert_allclose(
        got, np.asarray(ref.system.energy), rtol=1e-12
    )
