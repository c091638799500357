"""build_schedule semantics, pinned against hand-computed expectations.

The reference's contract (Arianna `build_schedule`, reconstructed from
test/runtests.jl:47-48 and src/ParticlesMC.jl:255-261) is load-bearing for
production output schedules; these unit tests pin each form directly
(VERDICT r4 item 7 — previously only exercised indirectly).
"""

import numpy as np
import pytest

from particlesmc_tpu.engine.schedule import build_schedule


def test_linear_interval():
    np.testing.assert_array_equal(
        build_schedule(10, 0, 2), [0, 2, 4, 6, 8, 10]
    )


def test_linear_with_burn_offset():
    # times start at burn and stride by the interval, clipped to steps
    np.testing.assert_array_equal(build_schedule(10, 3, 4), [3, 7])
    np.testing.assert_array_equal(build_schedule(11, 3, 4), [3, 7, 11])


def test_linear_rejects_nonpositive_interval():
    with pytest.raises(ValueError):
        build_schedule(10, 0, 0)


def test_block_tiling():
    # the reference's canonical log-block [0, 1, 2, 4, 8] tiles every
    # block[-1] = 8 steps (test/runtests.jl:47-48)
    np.testing.assert_array_equal(
        build_schedule(16, 0, [0, 1, 2, 4, 8]),
        [0, 1, 2, 4, 8, 9, 10, 12, 16],
    )


def test_block_tiling_with_burn_and_clip():
    # tiles start at burn; times past steps are clipped; duplicates (the
    # block end coinciding with the next block's 0) collapse
    np.testing.assert_array_equal(
        build_schedule(20, 5, [0, 1, 2, 4, 8]),
        [5, 6, 7, 9, 13, 14, 15, 17],
    )


def test_block_rejects_bad_period():
    with pytest.raises(ValueError):
        build_schedule(10, 0, [])
    with pytest.raises(ValueError):
        build_schedule(10, 0, [0])  # period must be positive


def test_geometric_base2():
    # the CLI's log_base path: build_schedule(interval, 0, 2.0) makes the
    # base-2 block 0, 1, 2, 4, ... <= interval (src/ParticlesMC.jl:256-258)
    np.testing.assert_array_equal(
        build_schedule(4096, 0, 2.0),
        [0, 1, 2, 4, 8, 16, 32, 64, 128, 256, 512, 1024, 2048, 4096],
    )


def test_geometric_noninteger_base_rounds():
    np.testing.assert_array_equal(
        build_schedule(10, 0, 3.0), [0, 1, 3, 9]
    )
    # 1.5: 0, 1, then 1.5->2 (round), 2.25->2 (dup), 3.375->3, 5.0625->5, 7.59->8
    np.testing.assert_array_equal(
        build_schedule(10, 0, 1.5), [0, 1, 2, 3, 5, 8]
    )


def test_geometric_with_burn_offset():
    np.testing.assert_array_equal(
        build_schedule(8, 100, 2.0), [100, 101, 102, 104, 108]
    )


def test_cli_composition_log_block_production():
    # the ortho-terphenyl production pattern: a base-2 block of one interval
    # tiled over the run (scheduler_params = {linear_interval, log_base})
    block = build_schedule(16, 0, 2.0)
    sched = build_schedule(48, 0, list(block))
    np.testing.assert_array_equal(
        sched,
        [0, 1, 2, 4, 8, 16, 17, 18, 20, 24, 32, 33, 34, 36, 40, 48],
    )
