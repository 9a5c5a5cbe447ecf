#!/usr/bin/env python3
"""Microbenchmarks for the suffix-sort hot path on the real TPU.

Builds the cost model that drives the build-stage optimisation (VERDICT r2 #1):
fixed vs marginal operand cost of jax.lax.sort, random-gather cost, u64-key
packing, batched (bucketed) sorts, and radix-style counting-sort passes.
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)


def _sync(out):
    """Force completion: on the axon platform block_until_ready does not
    actually synchronise, so fetch one element of every output to host."""
    x = jax.tree_util.tree_leaves(out)[0]
    np.asarray(x[:1] if getattr(x, "ndim", 0) else x)
    return out


def timeit(fn, *args, reps=3):
    out = _sync(fn(*args))
    best = None
    for _ in range(reps):
        t = time.time()
        out = _sync(fn(*args))
        dt = time.time() - t
        best = dt if best is None else min(best, dt)
    return best * 1e3, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=20_400_000)
    args = ap.parse_args()
    n = args.n
    rng = np.random.default_rng(0)
    print(f"n = {n}  devices = {jax.devices()}")

    words32 = [jnp.asarray(rng.integers(0, 6**12, n, dtype=np.uint32)) for _ in range(12)]
    idx = jnp.arange(n, dtype=jnp.int32)

    # 1) sort with k u32 keys + idx payload
    for k in (1, 2, 3, 5, 9):
        f = jax.jit(lambda *ops: jax.lax.sort(ops, num_keys=len(ops) - 1, is_stable=True))
        ms, _ = timeit(f, *words32[:k], idx)
        print(f"sort u32 keys={k} +idx stable: {ms:8.1f} ms")

    # unstable variant
    for k in (3, 9):
        f = jax.jit(lambda *ops: jax.lax.sort(ops, num_keys=len(ops) - 1, is_stable=False))
        ms, _ = timeit(f, *words32[:k], idx)
        print(f"sort u32 keys={k} +idx UNstable: {ms:8.1f} ms")

    # 2) u64 keys (pack 24 base-6 digits)
    words64 = [
        (words32[2 * i].astype(jnp.uint64) << 32) | words32[2 * i + 1].astype(jnp.uint64)
        for i in range(5)
    ]
    for k in (3, 5):
        f = jax.jit(lambda *ops: jax.lax.sort(ops, num_keys=len(ops) - 1, is_stable=True))
        ms, _ = timeit(f, *words64[:k], idx)
        print(f"sort u64 keys={k} +idx stable: {ms:8.1f} ms")

    # 3) random gather of n i32
    perm = jnp.asarray(rng.permutation(n).astype(np.int32))
    g = jax.jit(lambda x, p: x[p])
    ms, _ = timeit(g, words32[0], perm)
    print(f"random gather n x u32:          {ms:8.1f} ms")
    ms, _ = timeit(g, idx, perm)
    print(f"random gather n x i32:          {ms:8.1f} ms")

    # 4) contiguous scan (cumsum)
    c = jax.jit(lambda x: jnp.cumsum(x.astype(jnp.int32)))
    ms, _ = timeit(c, words32[0] & 1)
    print(f"cumsum n:                       {ms:8.1f} ms")

    # 5) batched sort: [B, n/B] rows sorted independently
    for b in (36, 216):
        m = n // b
        mat = [w[: b * m].reshape(b, m) for w in words32[:9]]
        imat = jnp.broadcast_to(jnp.arange(m, dtype=jnp.int32), (b, m))
        f = jax.jit(
            lambda *ops: jax.lax.sort(ops, dimension=1, num_keys=len(ops) - 1, is_stable=True)
        )
        ms, _ = timeit(f, *mat, imat)
        print(f"batched sort [{b},{m}] 9 keys:  {ms:8.1f} ms")

    # 6) scatter (at[].set) of n i32
    s = jax.jit(lambda x, p: jnp.zeros_like(x).at[p].set(x, mode="drop", unique_indices=True))
    ms, _ = timeit(s, idx, perm)
    print(f"scatter n x i32:                {ms:8.1f} ms")

    # 7) sort with 9 keys but NO payload vs 3 payloads (marginal payload cost)
    f = jax.jit(lambda *ops: jax.lax.sort(ops, num_keys=len(ops), is_stable=True))
    ms, _ = timeit(f, *words32[:9])
    print(f"sort u32 keys=9 no payload:     {ms:8.1f} ms")
    f = jax.jit(lambda *ops: jax.lax.sort(ops, num_keys=9, is_stable=True))
    ms, _ = timeit(f, *words32[:9], idx, words32[9], words32[10])
    print(f"sort u32 keys=9 +3 payloads:    {ms:8.1f} ms")


if __name__ == "__main__":
    main()
