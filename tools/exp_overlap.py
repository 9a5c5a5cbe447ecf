#!/usr/bin/env python3
"""Measure cross-chunk stage overlap on the single chip (round-4 verdict #3).

Hypothesis under test: splitting the bench workload into C sub-batches and
dispatching build(k+1) before smooth/invert(k) completes lets jax's async
dispatch hide smooth+invert behind the next chunk's sort, approaching the
sort-bound ceiling (~57M bases/s at the 200K-read workload).

The null hypothesis: a v5e chip executes ONE XLA program at a time, so
enqueued stage programs serialize and chunking only changes sort sizes
(n log n: two n/2 sorts do ~4% less comparison work than one n sort) and
removes host dispatch gaps (already absent in the fused single-jit bench).

Prints one JSON line per configuration; each sub-batch is an independent
EBWT (the reference parallel driver's block semantics,
BFQzip_parallel.py:288-323).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reads", type=int, default=200_000)
    ap.add_argument("--len", dest="read_len", type=int, default=101)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import jax.numpy as jnp
    import numpy as np

    from bfqzip_tpu import SmoothConfig, alphabet
    from bfqzip_tpu.engine import smooth_step
    from bfqzip_tpu.ops import pallas_scan
    from bfqzip_tpu.ops.invert import invert_via_sa
    from bfqzip_tpu.ops.smooth import smooth
    from bfqzip_tpu.ops.suffix import build_ebwt
    from make_realistic import make

    pallas_scan.ensure_calibrated()
    cfg = SmoothConfig()
    genome_mb = max(args.reads * args.read_len / 34e6, 0.05)
    seq_ascii, quals = make(args.reads, args.read_len, genome_mb, 0, 0.005, 0.001)
    seqs = alphabet.encode(seq_ascii)
    lengths = np.full(args.reads, args.read_len, np.int32)
    total_bases = args.reads * args.read_len

    def bench(fn, warm=1):
        for _ in range(warm):
            fn()
        best = None
        for _ in range(args.reps):
            t = time.time()
            fn()
            dt = time.time() - t
            best = dt if best is None else min(best, dt)
        return best

    results = {}

    # --- baseline: one fused jit over the whole batch -----------------------
    sd, qd, ld = jnp.asarray(seqs), jnp.asarray(quals), jnp.asarray(lengths)
    np.asarray(ld[:2])

    def fused():
        inv, _ = smooth_step(sd, qd, ld, cfg)
        np.asarray(inv.lengths[:2])

    results["fused_1chunk_ms"] = round(bench(fused) * 1e3, 1)

    # --- chunked: per-stage jits, async dispatch, sync only at the end ------
    jb = jax.jit(build_ebwt)
    jsm = jax.jit(lambda e: smooth(e, cfg, pre=e.pre))

    for n_chunks in (2, 4):
        per = args.reads // n_chunks
        chunks = [
            (
                jnp.asarray(seqs[i * per : (i + 1) * per]),
                jnp.asarray(quals[i * per : (i + 1) * per]),
                jnp.asarray(lengths[i * per : (i + 1) * per]),
            )
            for i in range(n_chunks)
        ]
        np.asarray(chunks[-1][2][:2])
        jin = jax.jit(
            lambda e, o: invert_via_sa(e.sa, e.bwt, o.bwt_sub, o.qs, e.n, per, args.read_len)
        )

        def chunked_overlap():
            # dispatch the whole DAG without any host sync: build k+1 is
            # enqueued while smooth/invert k are still in the device queue
            outs = []
            for s, q, l in chunks:
                e = jb(s, q, l)
                o = jsm(e)
                outs.append(jin(e, o))
            for inv in outs:
                np.asarray(inv.lengths[:2])

        def chunked_serial():
            # force a device sync between every stage call: no queue overlap
            outs = []
            for s, q, l in chunks:
                e = jax.block_until_ready(jb(s, q, l))
                o = jax.block_until_ready(jsm(e))
                outs.append(jax.block_until_ready(jin(e, o)))
            for inv in outs:
                np.asarray(inv.lengths[:2])

        results[f"chunked_{n_chunks}_overlap_ms"] = round(bench(chunked_overlap) * 1e3, 1)
        results[f"chunked_{n_chunks}_serial_ms"] = round(bench(chunked_serial) * 1e3, 1)

    for k, v in sorted(results.items()):
        results[k + "_mbases_per_s"] = round(total_bases / (v / 1e3) / 1e6, 1)
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.exit(main())
