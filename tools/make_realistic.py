#!/usr/bin/env python3
"""Generate a realistic Illumina-like FASTQ: reads sampled with coverage from
a synthetic genome (so positional clusters exist), substitution errors,
position-dependent quality profile, rare Ns, both strands, Illumina headers.

Uniform-random DNA (bench.py's default) produces almost no LCP>=16 clusters,
so it under-stresses the smoothing path (round-1 verdict, Weak #5); this
generator is the workload for parity/ratio/perf at scale.
"""
import argparse

import numpy as np

COMP = {0: 3, 1: 2, 2: 1, 3: 0}


def make(n_reads: int, read_len: int, genome_mb: float, seed: int, err: float, n_rate: float):
    rng = np.random.default_rng(seed)
    glen = int(genome_mb * 1e6)
    genome = rng.integers(0, 4, glen).astype(np.int8)  # 0..3 = ACGT

    starts = rng.integers(0, glen - read_len, n_reads)
    offs = np.arange(read_len)
    reads = genome[starts[:, None] + offs[None, :]].copy()

    # reverse-complement half the reads (strand)
    rc = rng.random(n_reads) < 0.5
    comp = np.array([3, 2, 1, 0], np.int8)
    reads[rc] = comp[reads[rc][:, ::-1]]

    # position-dependent quality: high plateau, 3' decline, noise
    pos_mean = 38.0 - 8.0 * (offs / read_len) ** 2
    qual = rng.normal(pos_mean[None, :], 3.0, (n_reads, read_len))
    qual = np.clip(qual, 2, 40).astype(np.int8)

    # substitution errors, biased to low-quality positions
    perr = err * 10 ** ((20 - qual) / 30.0)
    is_err = rng.random((n_reads, read_len)) < perr
    shift = rng.integers(1, 4, (n_reads, read_len)).astype(np.int8)
    reads = np.where(is_err, (reads + shift) % 4, reads)

    # rare N calls with quality 2
    is_n = rng.random((n_reads, read_len)) < n_rate
    qual = np.where(is_n, 2, qual)

    base_ascii = np.array([ord(c) for c in "ACGT"], np.uint8)
    seq = base_ascii[reads]
    seq = np.where(is_n, ord("N"), seq).astype(np.uint8)
    qs = (qual + 33).astype(np.uint8)
    return seq, qs


def write_fastq(path: str, seq: np.ndarray, qs: np.ndarray, instrument: str = "SIM001"):
    n_reads, read_len = seq.shape
    nl = ord("\n")
    plus = np.full((n_reads, 2), nl, np.uint8)
    plus[:, 0] = ord("+")
    headers = [
        f"@{instrument}.{i+1} {i+1} length={read_len}\n".encode() for i in range(n_reads)
    ]
    with open(path, "wb") as f:
        hblob = b"".join(headers)
        # interleave per-record: header, seq\n, +\n, qs\n
        seq_nl = np.concatenate([seq, np.full((n_reads, 1), nl, np.uint8)], axis=1)
        qs_nl = np.concatenate([qs, np.full((n_reads, 1), nl, np.uint8)], axis=1)
        # write in chunks to bound memory
        step = 1 << 17
        hoff = 0
        hl = [len(h) for h in headers]
        for lo in range(0, n_reads, step):
            hi = min(lo + step, n_reads)
            parts = []
            for i in range(lo, hi):
                parts.append(headers[i])
                parts.append(seq_nl[i].tobytes())
                parts.append(b"+\n")
                parts.append(qs_nl[i].tobytes())
            f.write(b"".join(parts))
        del hblob, hoff, hl


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out")
    ap.add_argument("--reads", type=int, default=1_000_000)
    ap.add_argument("--len", dest="read_len", type=int, default=101)
    ap.add_argument("--genome-mb", type=float, default=3.0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--err", type=float, default=0.005)
    ap.add_argument("--n-rate", type=float, default=0.001)
    args = ap.parse_args()
    seq, qs = make(args.reads, args.read_len, args.genome_mb, args.seed, args.err, args.n_rate)
    write_fastq(args.out, seq, qs)
    print(f"wrote {args.out}: {args.reads} x {args.read_len}bp, genome {args.genome_mb}Mb "
          f"(~{args.reads*args.read_len/args.genome_mb/1e6:.0f}x coverage)")


if __name__ == "__main__":
    main()
