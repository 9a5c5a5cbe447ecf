#!/usr/bin/env python3
"""Experiment: unstable sort with idx promoted to a key (total order) vs the
stable 9-key build sort, and the same trick for the invert sort.

Stability costs ~30ms at 9 keys / 20.4M on v5e (tools/microbench_sort.py);
when the key set is a TOTAL order (append idx as the last key — exactly the
tie-break stability was providing) the unstable comparator yields the
identical permutation, so the build can switch if the measured win holds on
the real packed data.  The invert sort's key is a permutation (all distinct),
so unstable is safe there with no extra key.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

import numpy as np


def _sync(out):
    import jax

    x = jax.tree_util.tree_leaves(out)[0]
    np.asarray(x[:1] if getattr(x, "ndim", 0) else x)
    return out


def timeit(fn, *args, reps=3):
    _sync(fn(*args))
    best = None
    for _ in range(reps):
        t = time.time()
        _sync(fn(*args))
        dt = time.time() - t
        best = dt if best is None else min(best, dt)
    return best * 1e3


if __name__ == "__main__":
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp

    from bfqzip_tpu import alphabet
    from bfqzip_tpu.ops import suffix
    from make_realistic import make

    n_reads, width = 200_000, 101
    wp = width + 1
    n_pad = n_reads * wp
    seq_ascii, quals = make(n_reads, width, 0.6, 0, 0.005, 0.001)
    seqs = jnp.asarray(alphabet.encode(seq_ascii))
    qualsd = jnp.asarray(quals + 33, dtype=jnp.uint8)
    lengths = jnp.full(n_reads, width, jnp.int32)

    # reuse the real builder's packing by calling its internals via a jit
    n_words = -(-wp // suffix.PACK6)

    def pack(seqs, quals, lengths):
        lens = lengths.astype(jnp.int32)
        ext = suffix.PACK6 * n_words
        k = jnp.arange(wp + ext, dtype=jnp.int32)[None, :]
        base6 = jnp.pad(seqs, ((0, 0), (0, 1 + ext))).astype(jnp.uint8)
        wcodes = jnp.where(k < lens[:, None], base6, jnp.uint8(0))

        def pack6(word):
            o = suffix.PACK6 * word
            acc = jnp.zeros((n_reads, wp), jnp.uint32)
            for t in range(suffix.PACK6):
                acc = acc * jnp.uint32(6) + wcodes[:, o + t : o + t + wp].astype(jnp.uint32)
            return acc.reshape(-1)

        words = [pack6(w) for w in range(n_words)]
        kk = jnp.arange(wp, dtype=jnp.int32)[None, :]
        is_pad = (kk > lens[:, None]).reshape(-1)
        words[0] = jnp.where(is_pad, jnp.uint32(0xF0000000), words[0])
        text_codes = jnp.where(
            (kk < lens[:, None]),
            jnp.pad(seqs, ((0, 0), (0, 1))).astype(jnp.uint8) + 1,
            jnp.uint8(0),
        )
        tflat = text_codes.reshape(-1)
        qtext = jnp.pad(quals, ((0, 0), (0, 1))).reshape(-1)
        p1 = jnp.roll(tflat, 1).astype(jnp.int32)
        aux = (
            p1
            | (jnp.roll(qtext, 1).astype(jnp.int32) << 3)
            | (jnp.roll(tflat, 2).astype(jnp.int32) << 11)
        )
        return (*words, aux)

    packed = _sync(jax.jit(pack)(seqs, qualsd, lengths))
    words, aux = list(packed[:-1]), packed[-1]
    idx0 = jnp.arange(n_pad, dtype=jnp.int32)

    stable = jax.jit(
        lambda *ops: jax.lax.sort(ops, num_keys=n_words, is_stable=True)
    )
    unstable = jax.jit(
        lambda *ops: jax.lax.sort(ops, num_keys=n_words + 1, is_stable=False)
    )

    res = {}
    res["build_stable_ms"] = round(timeit(stable, *words, idx0, aux), 1)
    res["build_unstable_idxkey_ms"] = round(timeit(unstable, *words, idx0, aux), 1)

    a = _sync(stable(*words, idx0, aux))
    b = _sync(unstable(*words, idx0, aux))
    res["build_identical"] = all(
        np.array_equal(np.asarray(x), np.asarray(y)) for x, y in zip(a, b)
    )

    # invert sort: key is a permutation -> unstable safe with no extra key
    rng = np.random.default_rng(0)
    target = jnp.asarray(rng.permutation(n_pad).astype(np.int32))
    payload = jnp.asarray(rng.integers(0, 1 << 16, n_pad, dtype=np.int32))
    inv_s = jax.jit(lambda t, p: jax.lax.sort((t, p), num_keys=1, is_stable=True))
    inv_u = jax.jit(lambda t, p: jax.lax.sort((t, p), num_keys=1, is_stable=False))
    res["invert_stable_ms"] = round(timeit(inv_s, target, payload), 1)
    res["invert_unstable_ms"] = round(timeit(inv_u, target, payload), 1)
    sa_, pa_ = _sync(inv_s(target, payload))
    sb_, pb_ = _sync(inv_u(target, payload))
    res["invert_identical"] = np.array_equal(np.asarray(pa_), np.asarray(pb_))

    print(json.dumps(res))
