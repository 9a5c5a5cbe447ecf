#!/usr/bin/env python3
"""Microbenchmarks round 2: segmented-scan candidates for ops/smooth.py."""
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
    print(f"{label:44s} {best*1e3:9.2f} ms   (compile {compile_s:6.1f}s)", flush=True)
    return out


n = 256 * 81920
rng = np.random.default_rng(0)
x = jnp.asarray(rng.integers(0, 100, n).astype(np.int32))
x5 = jnp.asarray(rng.integers(0, 100, (n, 5)).astype(np.int32))
reset = jnp.asarray((rng.random(n) < 0.01))


def seg_sum_1(xv, rs):
    def op(a, b):
        av, af = a
        bv, bf = b
        return (jnp.where(bf, bv, av + bv), af | bf)

    v, _ = jax.lax.associative_scan(op, (xv, rs))
    return v


timed("assoc_scan seg-sum ([n] i32, flag)", jax.jit(seg_sum_1), x, reset)


def seg_sum_5(xv, rs):
    def op(a, b):
        av, af = a
        bv, bf = b
        return (jnp.where(bf, bv, av + bv), af | bf)

    v, _ = jax.lax.associative_scan(op, (xv, rs[:, None]))
    return v


timed("assoc_scan seg-sum ([n,5] i32, flag)", jax.jit(seg_sum_5), x5, reset)


def seg_or(xv, rs):
    def op(a, b):
        av, af = a
        bv, bf = b
        return (jnp.where(bf, bv, av | bv), af | bf)

    v, _ = jax.lax.associative_scan(op, (xv, rs))
    return v


timed("assoc_scan seg-or ([n] i32, flag)", jax.jit(seg_or), x, reset)


def last_marked(xv, mk):
    def op(a, b):
        av, af = a
        bv, bf = b
        return (jnp.where(bf, bv, av), af | bf)

    v, _ = jax.lax.associative_scan(op, (xv, mk))
    return v


timed("assoc_scan last-marked ([n] i32, flag)", jax.jit(last_marked), x, reset)


def two_level(xv, rs, B=8):
    """In-block lax.scan (B steps) + cross-block associative_scan."""
    nb = n // B
    xb = xv.reshape(nb, B).T  # [B, nb]
    rb = rs.reshape(nb, B).T

    def step(carry, inp):
        xi, ri = inp
        v = jnp.where(ri, xi, carry + xi)
        return v, v

    _, vs = jax.lax.scan(step, jnp.zeros((nb,), jnp.int32), (xb, rb))
    hseen = jax.lax.associative_scan(jnp.logical_or, rb, axis=0)
    tail = vs[-1]
    hr = hseen[-1]

    def op(a, b):
        av, af = a
        bv, bf = b
        return (jnp.where(bf, bv, av + bv), af | bf)

    pt, _ = jax.lax.associative_scan(op, (tail, hr))
    pexcl = jnp.concatenate([jnp.zeros((1,), jnp.int32), pt[:-1]])
    out = jnp.where(hseen, vs, vs + pexcl[None, :])
    return out.T.reshape(-1)


timed("two-level(B=8) seg-sum [n] i32", jax.jit(two_level), x, reset)

# honest variadic sort cost: distinct operands so nothing is CSE'd
ops = tuple(jnp.asarray(rng.integers(0, 1 << 30, n).astype(np.int32)) for _ in range(7))
timed("sort 7-op honest [n]", jax.jit(lambda *a: jax.lax.sort(a, num_keys=5)), *ops)
