#!/usr/bin/env python3
"""Microbenchmarks of the primitive ops the pipeline is built from, on the
real device.  Drives the design choices in ops/smooth.py / ops/suffix.py
(see BASELINE.md 'primitive costs' table)."""
import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def timed(label, fn, *args, reps=5):
    t0 = time.time()
    out = jax.block_until_ready(fn(*args))
    compile_s = time.time() - t0
    best = 1e9
    for _ in range(reps):
        t = time.time()
        out = jax.block_until_ready(fn(*args))
        best = min(best, time.time() - t)
    print(f"{label:42s} {best*1e3:9.2f} ms   (compile {compile_s:6.1f}s)")
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=256 * 81920)  # ~21M
    args = ap.parse_args()
    n = args.n
    B = 256
    nb = n // B
    C = 27
    ncap = n // 5 + 2

    rng = np.random.default_rng(0)
    x32 = jnp.asarray(rng.integers(0, 1 << 20, n).astype(np.int32))
    x8 = jnp.asarray(rng.integers(0, 6, n).astype(np.uint8))
    # sorted cluster ids (expansion gather pattern)
    cid = jnp.asarray(np.minimum(np.sort(rng.integers(0, ncap, n)), ncap - 1).astype(np.int32))
    word = jnp.asarray(rng.integers(0, 1 << 30, ncap).astype(np.int32))
    cend = jnp.asarray(np.sort(rng.choice(n, ncap, replace=False)).astype(np.int32))

    timed("cumsum 1D i32 [n]", jax.jit(lambda a: jnp.cumsum(a)), x32)
    timed("cummax 1D i32 [n]", jax.jit(lambda a: jax.lax.cummax(a)), x32)

    def big_cumsum(a):
        X = jnp.stack([(a == c).astype(jnp.int32) for c in range(C)], axis=1)
        return jnp.cumsum(X, axis=0)[cend]

    timed("cumsum [n,27] i32 axis0 + end-gather", jax.jit(big_cumsum), x8)

    def blocked(a):
        Xb = jnp.stack([(a == c).astype(jnp.int32) for c in range(C)], axis=1).reshape(nb, B, C)
        bs = jnp.sum(Xb, axis=1, dtype=jnp.int32)  # [nb, C]
        bp = jnp.cumsum(bs, axis=0) - bs  # exclusive
        L = jnp.tril(jnp.ones((B, B), jnp.bfloat16))
        Pb = jax.lax.dot_general(
            L, Xb.astype(jnp.bfloat16), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [B, nb, C]
        Pb = jnp.transpose(Pb, (1, 0, 2)).astype(jnp.int32)
        return bp[cend // B] + Pb.reshape(n, C)[cend]

    timed("blocked sums+MXU prefix + end-gather", jax.jit(blocked), x8)

    def blocked_noP(a):
        Xb = jnp.stack([(a == c).astype(jnp.int32) for c in range(C)], axis=1).reshape(nb, B, C)
        bs = jnp.sum(Xb, axis=1, dtype=jnp.int32)
        return jnp.cumsum(bs, axis=0)

    timed("blocked sums only (no in-block prefix)", jax.jit(blocked_noP), x8)

    timed("gather word[cid] (sorted) [n]", jax.jit(lambda w, c: w[c]), word, cid)
    timed("gather rows X[cend] [ncap,27]",
          jax.jit(lambda a, e: jnp.stack([(a == c).astype(jnp.int32) for c in range(C)], 1)[e]),
          x8, cend)
    timed("scatter set [n]->[ncap]",
          jax.jit(lambda p, c: jnp.zeros((ncap,), jnp.int32).at[c].set(p)),
          jnp.arange(n, dtype=jnp.int32), cid)
    timed("scatter-add rows [nb*64,27]->[ncap,27]",
          jax.jit(lambda r, i: jnp.zeros((ncap, C), jnp.int32).at[i].add(r)),
          jnp.ones((nb * 64, C), jnp.int32),
          jnp.asarray(np.sort(rng.integers(0, ncap, nb * 64)).astype(np.int32)))
    timed("sort 2-op [n]", jax.jit(lambda a, b: jax.lax.sort((a, b), num_keys=1)), x32, x32)
    timed("sort 4-op [n]", jax.jit(lambda a, b: jax.lax.sort((a, a, b, b), num_keys=2)), x32, x32)
    timed(
        "sort 13-op [n]",
        jax.jit(lambda a, b: jax.lax.sort(tuple([a] * 11 + [b, b]), num_keys=11)),
        x32,
        x32,
    )
    # segment-local one-hot expansion of word[cid] via two f32 matmuls
    def expand_mm(w, c):
        c0 = c.reshape(nb, B)[:, 0]  # first cid of each block
        KL = 64
        rows = c0[:, None] + jnp.arange(KL, dtype=jnp.int32)[None, :]
        ws = w[jnp.minimum(rows, ncap - 1)]  # [nb, 64] slice-ish gather
        local = c.reshape(nb, B) - c0[:, None]  # [nb, B] in [0, 64)
        oh = (local[:, :, None] == jnp.arange(KL, dtype=jnp.int32)[None, None, :]).astype(jnp.float32)
        lo = jax.lax.dot_general(oh, (ws & 0x7FFF).astype(jnp.float32)[..., None],
                                 (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32)
        hi = jax.lax.dot_general(oh, (ws >> 15).astype(jnp.float32)[..., None],
                                 (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32)
        return (lo[..., 0].astype(jnp.int32) | (hi[..., 0].astype(jnp.int32) << 15)).reshape(n)

    timed("expand word[cid] via one-hot MXU", jax.jit(expand_mm), word, cid)


if __name__ == "__main__":
    main()
