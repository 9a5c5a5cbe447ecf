#!/usr/bin/env python3
"""Per-stage timing of the pipeline on the real device (build / smooth / invert)."""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from bfqzip_tpu import SmoothConfig, alphabet
from bfqzip_tpu.ops.invert import invert_via_sa
from bfqzip_tpu.ops.smooth import smooth
from bfqzip_tpu.ops.suffix import build_ebwt


def timed(fn, *args, reps=3, label=""):
    out = fn(*args)
    jax.block_until_ready(out)
    best = None
    for _ in range(reps):
        t = time.time()
        out = fn(*args)
        jax.block_until_ready(out)
        dt = time.time() - t
        best = dt if best is None else min(best, dt)
    print(f"{label:24s} {best*1e3:9.2f} ms")
    return out, best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reads", type=int, default=200_000)
    ap.add_argument("--len", dest="read_len", type=int, default=101)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    bases = np.array([1, 2, 3, 5], dtype=np.uint8)
    seqs = jnp.asarray(bases[rng.integers(0, 4, size=(args.reads, args.read_len))])
    quals = jnp.asarray(
        (33 + rng.integers(2, 42, size=(args.reads, args.read_len))).astype(np.uint8)
    )
    lengths = jnp.full(args.reads, args.read_len, jnp.int32)
    total = args.reads * args.read_len
    cfg = SmoothConfig()

    jb = jax.jit(build_ebwt)
    ebwt, t1 = timed(jb, seqs, quals, lengths, label="build_ebwt")

    @jax.jit
    def jsmooth(ebwt):
        return smooth(ebwt, cfg, pre=ebwt.pre)

    out, t2 = timed(jsmooth, ebwt, label="smooth")

    n_reads, width = seqs.shape

    @jax.jit
    def jinv(ebwt, out):
        return invert_via_sa(
            ebwt.sa, ebwt.bwt, out.bwt_sub, out.qs, ebwt.n, n_reads, width, binning=cfg.binning
        )

    _, t3 = timed(jinv, ebwt, out, label="invert_via_sa")

    tot = t1 + t2 + t3
    print(f"{'TOTAL':24s} {tot*1e3:9.2f} ms   {total/tot/1e6:.1f} Mbases/s")
    for name, t in (("build", t1), ("smooth", t2), ("invert", t3)):
        print(f"  {name:8s} {100*t/tot:5.1f}%")


if __name__ == "__main__":
    main()
