#!/usr/bin/env python3
"""BQZC decode thread-scaling: measured where cores exist, modelled beyond.

The round-3 verdict asks how decode scales past the 2 threads this box has
(reference analog: bsc -T, BFQzip.py:271).  Blocks are fully independent
(fresh model per block, disjoint output ranges), so the k-thread makespan is
an LPT schedule over the measured per-block decode times — the only shared
resources are memory bandwidth (the model tables are ~1MB/thread, cache
resident) and the final join.  We therefore:

  1. encode the realistic 100K-read DNA and QS streams with ~40 blocks,
  2. decode with 1 thread, capturing per-block wall times
     (BFQ_CM_BLOCKTIME instrumentation in native/cm_codec.cpp),
  3. measure the real 2-thread decode and compare it to the LPT model's
     2-thread prediction (calibration for the modelling step),
  4. report modelled makespans for 4/8/16/32 threads.
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from make_realistic import make


def lpt_makespan(times, k):
    bins = [0.0] * k
    for t in sorted(times, reverse=True):
        i = min(range(k), key=bins.__getitem__)
        bins[i] += t
    return max(bins)


def measure(stream: bytes, name: str, block_size: int):
    from bfqzip_tpu.utils import native

    blob = native.cm_encode(stream, block_size=block_size)
    blob_b = bytes(blob) if not isinstance(blob, (bytes, bytearray)) else blob

    def decode_timed(threads, bt_path=None):
        os.environ["BFQ_CM_THREADS"] = str(threads)
        if bt_path:
            os.environ["BFQ_CM_BLOCKTIME"] = bt_path
        try:
            t0 = time.time()
            out = native.cm_decode(blob_b)
            dt = time.time() - t0
        finally:
            os.environ.pop("BFQ_CM_THREADS", None)
            os.environ.pop("BFQ_CM_BLOCKTIME", None)
        assert out is not None and bytes(out.tobytes()) == stream, "decode mismatch"
        return dt

    # warm (page in blob + tables)
    decode_timed(1)
    with tempfile.NamedTemporaryFile("r", suffix=".bt", delete=False) as f:
        bt_path = f.name
    try:
        t1 = min(decode_timed(1, bt_path) for _ in range(2))
        with open(bt_path) as f:
            ns = [int(x) for x in f.read().split()]
    finally:
        os.unlink(bt_path)
    nblocks = len(ns) // 2  # two timed runs appended
    block_s = [v / 1e9 for v in ns[:nblocks]]
    t2 = min(decode_timed(2) for _ in range(2))

    mb = len(stream) / 1e6
    model = {k: lpt_makespan(block_s, k) for k in (1, 2, 4, 8, 16, 32)}
    return {
        "stream": name,
        "raw_mb": round(mb, 1),
        "compressed_b": len(blob_b),
        "nblocks": nblocks,
        "measured_1t_s": round(t1, 2),
        "measured_2t_s": round(t2, 2),
        "measured_1t_mbps": round(mb / t1, 1),
        "measured_2t_mbps": round(mb / t2, 1),
        "model_2t_s": round(model[2], 2),
        "model_vs_measured_2t": round(model[2] / t2, 3),
        "modelled_mbps": {k: round(mb / v, 1) for k, v in model.items()},
    }


def main():
    n_reads = int(os.environ.get("BENCH_READS", 100_000))
    seq, qs = make(n_reads, 101, max(n_reads * 101 / 34e6, 0.05), 0, 0.005, 0.001)
    nl = np.full((n_reads, 1), ord("\n"), np.uint8)
    dna = np.concatenate([seq, nl], axis=1).tobytes()
    qsb = np.concatenate([qs, nl], axis=1).tobytes()
    bs = 1 << 18  # ~40 blocks on the 10.2MB streams
    for stream, name in ((dna, "dna"), (qsb, "qs")):
        print(json.dumps(measure(stream, name, bs)))


if __name__ == "__main__":
    main()
