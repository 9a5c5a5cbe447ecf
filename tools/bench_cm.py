#!/usr/bin/env python3
"""BQZC encode/decode speed + ratio on the realistic workload streams.

Iteration harness for native/cm_codec.cpp work: measures single-thread
decode MB/s (the per-core figure the thread-scaling model multiplies) and
compressed size for the DNA and QS streams, per profile.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from make_realistic import make


def load_streams(reads: int, read_len: int, cache_dir: str = "/tmp/bfq_cm_bench"):
    os.makedirs(cache_dir, exist_ok=True)
    dna_p = os.path.join(cache_dir, f"dna_{reads}x{read_len}.raw")
    qs_p = os.path.join(cache_dir, f"qs_{reads}x{read_len}.raw")
    if not (os.path.exists(dna_p) and os.path.exists(qs_p)):
        seq_ascii, quals = make(reads, read_len, max(reads * read_len / 34e6, 0.05),
                                0, 0.005, 0.001)
        nl = np.full((reads, 1), ord("\n"), np.uint8)
        with open(dna_p, "wb") as f:
            f.write(np.concatenate([seq_ascii, nl], axis=1).tobytes())
        with open(qs_p, "wb") as f:
            f.write(np.concatenate([quals, nl], axis=1).tobytes())
    return open(dna_p, "rb").read(), open(qs_p, "rb").read()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reads", type=int, default=100_000)
    ap.add_argument("--len", dest="read_len", type=int, default=101)
    ap.add_argument("--block", type=int, default=0, help="block size (0=default)")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from bfqzip_tpu.utils import native

    assert native.cm_available()
    dna, qs = load_streams(args.reads, args.read_len)

    out = {}
    for name, stream, pos_reset in (("dna", dna, -1), ("qs", qs, ord("\n"))):
        t0 = time.time()
        blob = native.cm_encode(stream, block_size=args.block, threads=1,
                                pos_reset=pos_reset)
        t_enc = time.time() - t0
        os.environ["BFQ_CM_THREADS"] = "1"
        try:
            best = None
            for _ in range(args.reps):
                t0 = time.time()
                dec = native.cm_decode(blob)
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            assert dec.tobytes() == stream, f"{name}: decode mismatch"
        finally:
            os.environ.pop("BFQ_CM_THREADS", None)
        mb = len(stream) / 1e6
        out[name] = {
            "raw": len(stream),
            "compressed": len(blob),
            "enc_mb_s": round(mb / t_enc, 2),
            "dec_mb_s_1t": round(mb / best, 2),
        }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
