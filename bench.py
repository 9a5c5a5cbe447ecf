#!/usr/bin/env python3
"""Benchmark the end-to-end pipeline (EBWT -> smooth -> reconstruct) on TPU.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

The workload is Illumina-like coverage data (reads sampled from a synthetic
genome with errors + realistic qualities — tools/make_realistic.py), so the
clustering/smoothing path does real substitution work; uniform-random DNA
yields almost no LCP>=16 clusters and under-stresses the pipeline.

vs_baseline compares against the reference implementation measured on this
machine (BASELINE.md "Measured" table): bfq_int (compiled from the reference
sources, M=2 B=0, `-m 5`) processes the SAME default workload as this script
(200K x 101bp realistic reads) in 9.56 s = 2.114 Mbases/s — and that covers
only its steps 2-5 (load+index, cluster detect, smooth, invert); the
reference's step-1 gsufsort EBWT construction is NOT included because its
submodule is not vendored.  Our number covers the FULL pipeline including
EBWT+LCP construction, so vs_baseline understates the true speedup.
"""

import argparse
import json
import os
import sys
import time

# measured on this machine (BASELINE.md): reference bfq_int steps 2-5 on the
# same 200K x 101bp realistic workload this script runs by default
REF_BASES_PER_SEC = 2.114e6


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reads", type=int, default=200_000)
    ap.add_argument("--len", dest="read_len", type=int, default=101)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--uniform", action="store_true", help="uniform-random DNA (no clusters)")
    args = ap.parse_args()
    if args.reads <= 0 or args.read_len <= 0 or args.reps <= 0:
        ap.error("--reads, --len and --reps must be positive")

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import numpy as np

    from bfqzip_tpu import SmoothConfig, alphabet
    from bfqzip_tpu.engine import smooth_step

    if args.uniform:
        rng = np.random.default_rng(0)
        bases = np.array([1, 2, 3, 5], dtype=np.uint8)
        seqs = bases[rng.integers(0, 4, size=(args.reads, args.read_len))]
        quals = (33 + rng.integers(2, 42, size=(args.reads, args.read_len))).astype(np.uint8)
    else:
        sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools"))
        from make_realistic import make

        genome_mb = max(args.reads * args.read_len / 34e6, 0.05)  # ~34x coverage
        seq_ascii, quals = make(args.reads, args.read_len, genome_mb, 0, 0.005, 0.001)
        seqs = alphabet.encode(seq_ascii)
    lengths = np.full(args.reads, args.read_len, np.int32)
    total_bases = args.reads * args.read_len
    cfg = SmoothConfig()

    # pre-place inputs on device: the session's TPU is behind a tunnel whose
    # host<->device link (~40MB in 0.6-1.1s measured) is not representative of
    # a production TPU host's PCIe; the metric is the device pipeline
    import jax.numpy as jnp

    seqs_d, quals_d, lengths_d = jnp.asarray(seqs), jnp.asarray(quals), jnp.asarray(lengths)
    np.asarray(lengths_d[:2])

    # resolve the Pallas-vs-XLA scan decision eagerly (one-shot per platform,
    # cached; cannot run mid-trace under stackless tracing)
    from bfqzip_tpu.ops import pallas_scan

    pallas_scan.ensure_calibrated()

    # warmup (includes compile)
    inv, _ = smooth_step(seqs_d, quals_d, lengths_d, cfg)
    np.asarray(inv.lengths[:2])

    best = None
    for _ in range(args.reps):
        t = time.time()
        inv, _ = smooth_step(seqs_d, quals_d, lengths_d, cfg)
        np.asarray(inv.lengths[:2])
        dt = time.time() - t
        best = dt if best is None else min(best, dt)

    bases_per_sec = total_bases / best

    # per-stage breakdown (same data, stages timed separately)
    import jax
    import jax.numpy as jnp

    from bfqzip_tpu.ops.invert import invert_via_sa
    from bfqzip_tpu.ops.smooth import smooth
    from bfqzip_tpu.ops.suffix import build_ebwt

    sj, qj, lj = jnp.asarray(seqs), jnp.asarray(quals), jnp.asarray(lengths)
    jb = jax.jit(build_ebwt)
    jsm = jax.jit(lambda e: smooth(e, cfg, pre=e.pre))
    n_r, w_r = seqs.shape
    jin = jax.jit(
        lambda e, o: invert_via_sa(e.sa, e.bwt, o.bwt_sub, o.qs, e.n, n_r, w_r)
    )
    stages = {}
    ebwt = jax.block_until_ready(jb(sj, qj, lj))
    t = time.time(); ebwt = jax.block_until_ready(jb(sj, qj, lj)); stages["build_ms"] = round((time.time() - t) * 1e3, 1)
    out = jax.block_until_ready(jsm(ebwt))
    t = time.time(); out = jax.block_until_ready(jsm(ebwt)); stages["smooth_ms"] = round((time.time() - t) * 1e3, 1)
    inv2 = jax.block_until_ready(jin(ebwt, out))
    t = time.time(); inv2 = jax.block_until_ready(jin(ebwt, out)); stages["invert_ms"] = round((time.time() - t) * 1e3, 1)

    print(
        json.dumps(
            {
                "metric": "e2e_smooth_bases_per_sec",
                "value": round(bases_per_sec, 1),
                "unit": "bases/s",
                "vs_baseline": round(bases_per_sec / REF_BASES_PER_SEC, 3),
                "baseline_scope": "reference bfq_int steps 2-5 only (2.114 Mbases/s, "
                "no EBWT build); ours includes step-1 EBWT+LCP construction",
                "reads": args.reads,
                "read_len": args.read_len,
                "stages": stages,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
