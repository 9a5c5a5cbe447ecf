#!/usr/bin/env python3
"""Attribute the build-stage wall time op-by-op on the real chip (r3 verdict #3a).

Splits `ops/suffix.py:_build_ebwt_flat` into separately jitted pieces and
times each at the bench workload size, so BASELINE.md can carry a measured
breakdown of the ~390 ms build stage plus an effective-bandwidth figure
against the platform's HBM peak:

  pack    — window codes + base-6 packing + payload assembly (elementwise)
  sort    — the 9-key variadic jax.lax.sort with 2 payloads (the claim to
            verify: >=80% of build wall is this op at its operand cost)
  post    — BWT/QS/pre extraction from the sorted payload (elementwise)
  lcp     — leading-equal-digit count over consecutive sorted keys

Also optionally captures a jax.profiler trace (--trace DIR) for op-level
inspection where the platform supports it.
"""

import argparse
import json
import time

import numpy as np

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

HBM_PEAK_GBPS = {  # advertised HBM bandwidth per chip
    "TPU v5 lite": 819.0,  # v5e
    "TPU v4": 1228.0,
    "TPU v5p": 2765.0,
    "TPU v6e": 1640.0,
}


def _sync(out):
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
    ap = argparse.ArgumentParser()
    ap.add_argument("--reads", type=int, default=200_000)
    ap.add_argument("--len", dest="read_len", type=int, default=101)
    ap.add_argument("--trace", default=None, help="jax.profiler trace output dir")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp

    from bfqzip_tpu import alphabet
    from bfqzip_tpu.ops import suffix
    from make_realistic import make

    genome_mb = max(args.reads * args.read_len / 34e6, 0.05)
    seq_ascii, quals = make(args.reads, args.read_len, genome_mb, 0, 0.005, 0.001)
    seqs = jnp.asarray(alphabet.encode(seq_ascii))
    quals = jnp.asarray(quals + 33, dtype=jnp.uint8)
    lengths = jnp.full(args.reads, args.read_len, jnp.int32)

    n_reads, width = args.reads, args.read_len
    wp = width + 1
    n_pad = n_reads * wp
    n_words = -(-wp // suffix.PACK6)

    # ---- pack: everything before the sort (mirrors _build_ebwt_flat) ----
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

    jpack = jax.jit(pack)
    packed = _sync(jpack(seqs, quals, lengths))
    words, aux = list(packed[:-1]), packed[-1]
    idx0 = jnp.arange(n_pad, dtype=jnp.int32)

    # ---- sort ----
    def dosort(*ops):
        return jax.lax.sort(ops, num_keys=n_words, is_stable=True)

    jsort = jax.jit(dosort)
    sorted_ops = _sync(jsort(*words, idx0, aux))
    skeys, saux = sorted_ops[:n_words], sorted_ops[-1]

    # ---- post: payload decode ----
    def post(saux):
        cprev = (saux & 7).astype(jnp.uint8)
        is_term = cprev == 0
        bwt = jnp.where(is_term, jnp.uint8(alphabet.TERM), cprev - 1)
        qs = jnp.where(
            is_term, jnp.uint8(alphabet.TERM_CHAR), ((saux >> 3) & 0xFF).astype(jnp.uint8)
        )
        c2 = ((saux >> 11) & 7).astype(jnp.uint8)
        pre = jnp.where(c2 == 0, jnp.uint8(alphabet.TERM), c2 - 1)
        return bwt, qs, pre

    jpost = jax.jit(post)

    # ---- lcp ----
    def lcp_of(skeys):
        lcp = jnp.zeros((n_pad,), jnp.int32)
        eq = jnp.ones((n_pad,), bool)
        nz = jnp.ones((n_pad,), bool)
        for w in range(n_words):
            bw = skeys[w]
            aw = jnp.concatenate([jnp.zeros((1,), jnp.uint32), bw[:-1]])
            for t in range(suffix.PACK6):
                div = jnp.uint32(6 ** (suffix.PACK6 - 1 - t))
                da = (aw // div) % jnp.uint32(6)
                db = (bw // div) % jnp.uint32(6)
                eq = eq & (da == db)
                nz = nz & (da != 0)
                lcp = lcp + (eq & nz).astype(jnp.int32)
        return lcp

    jlcp = jax.jit(lcp_of)

    jfull = jax.jit(suffix.build_ebwt)

    res = {
        "n_pad": n_pad,
        "n_words": n_words,
        "pack_ms": round(timeit(jpack, seqs, quals, lengths), 1),
        "sort_ms": round(timeit(jsort, *words, idx0, aux), 1),
        "post_ms": round(timeit(jpost, saux), 1),
        "lcp_ms": round(timeit(jlcp, skeys), 1),
        "full_build_ms": round(timeit(jfull, seqs, quals, lengths), 1),
    }
    res["sum_stages_ms"] = round(
        res["pack_ms"] + res["sort_ms"] + res["post_ms"] + res["lcp_ms"], 1
    )
    res["sort_frac_of_full"] = round(res["sort_ms"] / res["full_build_ms"], 3)

    # effective bandwidth of the sort against the single-pass bound:
    # 11 u32 operands read+written once = the absolute traffic floor; a
    # comparison sort needs ~log2(n) merge passes over the keys, so also
    # report per-pass effective bandwidth under that model.
    op_bytes = (n_words + 2) * 4 * n_pad
    floor_gb = 2 * op_bytes / 1e9
    t_s = res["sort_ms"] / 1e3
    kind = jax.devices()[0].device_kind
    peak = next((v for k, v in HBM_PEAK_GBPS.items() if kind.startswith(k)), None)
    res["device_kind"] = kind
    res["sort_singlepass_bound_gb"] = round(floor_gb, 2)
    res["sort_effective_gbps_singlepass_model"] = round(floor_gb / t_s, 1)
    import math

    passes = math.ceil(math.log2(n_pad))
    res["sort_effective_gbps_perpass_model"] = round(passes * floor_gb / t_s, 1)
    res["merge_passes_log2n"] = passes
    if peak:
        res["hbm_peak_gbps"] = peak
        res["sort_pct_of_peak_perpass_model"] = round(
            100 * passes * floor_gb / t_s / peak, 1
        )

    if args.trace:
        try:
            with jax.profiler.trace(args.trace):
                _sync(jfull(seqs, quals, lengths))
            res["trace_dir"] = args.trace
        except Exception as e:  # platform may not support profiling
            res["trace_error"] = str(e)

    print(json.dumps(res))
