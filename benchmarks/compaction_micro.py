"""Microbenchmark: per-substep candidate compaction mechanisms on TPU.

Shapes match one checkerboard color substep at the N=10k bench point:
others payload [CHAINS, A, L] x P planes compacted to [CHAINS, A, K] by an
in-range mask (mean ~372 of 832 lanes in range). Mechanisms:

  scatter  - rank = cumsum(mask); 1-D flat scatter .at[flat].set (drop mode)
  sortgat  - lax.sort of (dst, lane) then per-row take_along_axis (monotone)
  onehot   - compacted = einsum(plane, onehot(rank)) on the MXU
  baseline - one sub-move-equivalent arithmetic pass over L lanes (x2 r2+LJ)

Prints us/substep for each; the compaction amortises over `inner` sub-moves,
so viability = cost(mechanism) << inner * cost(baseline_L_to_K_saving).

CAUTION — recorded outcome (round 5): these STANDALONE timings (tens of
us) did NOT predict in-situ behaviour. Embedded in the real hyper-sweep
(vmapped, inside the rounds scan, fused against the ΔE pipeline) the
scatter and gather mechanisms serialized over the chain batch
(~1 ms/chain/substep) and the value-sort cost ~45 ms/substep — see the
"candidate compaction" section of docs/man/performance.md. Standalone op
microbenchmarks on TPU measure the best-case lowering, which XLA does not
necessarily reproduce inside a larger fused program; always confirm with
an end-to-end kernel measurement before building on one.
"""

import time

import jax
import jax.numpy as jnp

CHAINS, A, L, K, P = 256, 64, 832, 512, 4


def _mask_and_planes(key):
    kp, km = jax.random.split(key)
    planes = jax.random.normal(kp, (P, CHAINS, A, L), jnp.float32)
    # ~45% in-range, like the real dilated-cube criterion
    mask = jax.random.uniform(km, (CHAINS, A, L)) < 0.45
    return planes, mask


@jax.jit
def compact_scatter(planes, mask):
    rank = jnp.cumsum(mask.astype(jnp.int32), axis=-1) - 1
    dst = jnp.where(mask, jnp.minimum(rank, K), K)  # K = dump slot
    row = (
        jnp.arange(CHAINS)[:, None, None] * (A * (K + 1))
        + jnp.arange(A)[None, :, None] * (K + 1)
    )
    flat = (row + dst).reshape(-1)
    outs = []
    for p in range(P):
        o = (
            jnp.zeros((CHAINS * A * (K + 1),), jnp.float32)
            .at[flat]
            .set(planes[p].reshape(-1), mode="drop")
        )
        outs.append(o.reshape(CHAINS, A, K + 1)[..., :K])
    return jnp.stack(outs)


@jax.jit
def compact_sortgat(planes, mask):
    lane = jnp.broadcast_to(jnp.arange(L, dtype=jnp.int32), mask.shape)
    dst = jnp.where(mask, 0, 1).astype(jnp.int32)
    _, src = jax.lax.sort((dst, lane), dimension=-1, num_keys=1, is_stable=True)
    src_k = src[..., :K]
    outs = [
        jnp.take_along_axis(planes[p], src_k, axis=-1) for p in range(P)
    ]
    return jnp.stack(outs)


@jax.jit
def compact_onehot(planes, mask):
    rank = jnp.cumsum(mask.astype(jnp.int32), axis=-1) - 1
    dst = jnp.where(mask, rank, K)
    oh = (dst[..., None] == jnp.arange(K)[None, None, None, :]).astype(
        jnp.float32
    )  # [CHAINS, A, L, K]
    outs = [jnp.einsum("cal,calk->cak", planes[p], oh) for p in range(P)]
    return jnp.stack(outs)


@jax.jit
def baseline_pass(planes):
    # one sub-move-equivalent: 2x (r2 + branchless LJ) over L lanes
    x = planes
    acc = jnp.zeros(planes.shape[1:], jnp.float32)
    for _ in range(2):
        r2 = x[0] * x[0] + x[1] * x[1] + x[2] * x[2] + 0.1
        inv = 1.0 / r2
        i6 = inv * inv * inv
        u = 4.0 * (i6 * i6 - i6)
        acc = acc + jnp.where(x[3] > 0, u, 0.0)
        x = x + 0.01
    return jnp.sum(acc, axis=-1)


def timeit(fn, *args, reps=20):
    out = fn(*args)
    jax.tree.map(lambda a: a.block_until_ready(), out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.tree.map(lambda a: a.block_until_ready(), out)
    return (time.perf_counter() - t0) / reps * 1e6


def main():
    planes, mask = _mask_and_planes(jax.random.PRNGKey(0))
    res = {}
    res["baseline_832"] = timeit(baseline_pass, planes)
    for name, fn in (
        ("scatter", compact_scatter),
        ("sortgat", compact_sortgat),
        ("onehot", compact_onehot),
    ):
        try:
            res[name] = timeit(fn, planes, mask)
        except Exception as e:  # noqa: BLE001
            res[name] = f"FAIL {type(e).__name__}"
    for k, v in res.items():
        print(f"{k:>14}: {v if isinstance(v, str) else f'{v:9.1f} us'}")


if __name__ == "__main__":
    main()
