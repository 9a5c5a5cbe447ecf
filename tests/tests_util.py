"""Shared helpers for tests."""

import numpy as np

from bfqzip_tpu import alphabet
from bfqzip_tpu.io.fastq import ReadBatch


def tiny_batch(rng, n_reads=20, min_len=3, max_len=10, n_frac=0.05) -> ReadBatch:
    lengths = rng.integers(min_len, max_len + 1, size=n_reads).astype(np.int32)
    width = int(lengths.max())
    bases = np.array([alphabet.A, alphabet.C, alphabet.G, alphabet.T], dtype=np.uint8)
    seqs = bases[rng.integers(0, 4, size=(n_reads, width))]
    nmask = rng.random((n_reads, width)) < n_frac
    seqs[nmask] = alphabet.N
    quals = (33 + rng.integers(2, 42, size=(n_reads, width))).astype(np.uint8)
    mask = np.arange(width)[None, :] < lengths[:, None]
    seqs = np.where(mask, seqs, 0).astype(np.uint8)
    quals = np.where(mask, quals, 0).astype(np.uint8)
    headers = [b"@t%d" % i for i in range(n_reads)]
    return ReadBatch(seqs=seqs, quals=quals, lengths=lengths, headers=headers)
