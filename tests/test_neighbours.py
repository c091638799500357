"""Cell-list correctness: candidate completeness vs brute force, incremental
surgery vs rebuild (the reference's differential-oracle pattern, SURVEY.md §4.1)."""

import jax
import jax.numpy as jnp
import numpy as np

from particlesmc_tpu.core import neighbours as NB
from particlesmc_tpu.core.geometry import dist2, fold_back


def _random_system(n=100, d=3, box_l=9.0, seed=0):
    rng = np.random.default_rng(seed)
    box = jnp.full((d,), box_l)
    pos = jnp.asarray(rng.uniform(0, box_l, (n, d)))
    return pos, box


def test_spec_sizing():
    spec = NB.make_spec(np.full(3, 9.0), rcut=2.5, n=100)
    assert spec is not None
    assert spec.ncells == (3, 3, 3)
    spec2 = NB.make_spec(np.full(3, 6.0), rcut=2.5, n=100)
    assert spec2 is None  # fewer than 3 cells → dense fallback


def test_candidates_complete():
    """Every particle within rcut of a query point must appear in candidates."""
    pos, box = _random_system()
    spec = NB.make_spec(np.asarray(box), 2.5, pos.shape[0])
    cl = NB.build_cell_list(pos, box, spec)
    assert not bool(cl.overflow)
    for qi in [0, 13, 57, 99]:
        x = pos[qi]
        cands = np.asarray(NB.candidates_around(x, box, cl, spec))
        cands = set(int(c) for c in cands if c >= 0)
        r2 = np.asarray(dist2(pos, x, box))
        within = set(np.flatnonzero(r2 <= 2.5**2).tolist())
        assert within <= cands, f"missing neighbours for {qi}: {within - cands}"


def test_counts_match():
    pos, box = _random_system(n=200)
    spec = NB.make_spec(np.asarray(box), 2.5, 200)
    cl = NB.build_cell_list(pos, box, spec)
    assert int(jnp.sum(cl.count)) == 200
    # each particle appears exactly once across buckets
    all_ids = np.asarray(cl.bucket).ravel()
    ids = sorted(i for i in all_ids if i >= 0)
    assert ids == list(range(200))


def test_incremental_matches_rebuild():
    """Random particle moves maintained incrementally must match a fresh build
    (up to bucket ordering)."""
    pos, box = _random_system(n=100)
    spec = NB.make_spec(np.asarray(box), 2.5, 100)
    cl = NB.build_cell_list(pos, box, spec)
    rng = np.random.default_rng(1)

    move = jax.jit(NB.move_particle)
    for _ in range(200):
        i = int(rng.integers(0, 100))
        newx = jnp.asarray(rng.uniform(-5, 14, (3,)))  # may leave the box (unwrapped)
        pos = pos.at[i].set(newx)
        new_cell = NB.cell_index(newx, box, spec)
        cl = move(cl, jnp.asarray(i, jnp.int32), new_cell)

    fresh = NB.build_cell_list(pos, box, spec)
    assert not bool(cl.overflow)
    np.testing.assert_array_equal(np.asarray(cl.count), np.asarray(fresh.count))
    np.testing.assert_array_equal(np.asarray(cl.cell_of), np.asarray(fresh.cell_of))
    for c in range(spec.total):
        a = sorted(x for x in np.asarray(cl.bucket[c]) if x >= 0)
        b = sorted(x for x in np.asarray(fresh.bucket[c]) if x >= 0)
        assert a == b


def test_overflow_flag():
    pos, box = _random_system(n=100)
    spec = NB.CellSpec(ncells=(3, 3, 3), cap=2)  # deliberately tiny
    cl = NB.build_cell_list(pos, box, spec)
    assert bool(cl.overflow)
