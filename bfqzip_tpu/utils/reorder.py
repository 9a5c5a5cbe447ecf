"""Read reordering to boost compression of independently-coded blocks.

The reference offers two pre-compression reorders (BFQzip_parallel.py:59-75):
random shuffling (randomFASTQ.py:52-102) and SPRING's reorder-only mode
(clustering similar reads together).  Here:

  mode 1 — random permutation (same contract as randomFASTQ.py; paired mode
           applies one permutation to both mates)
  mode 2 — similarity reorder: lexicographic sort of the read prefixes, a
           sort-based stand-in for SPRING's minhash clustering that brings
           overlapping reads together with one vectorised lexsort
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from bfqzip_tpu.io.fastq import ReadBatch


def reorder_permutation(batch: ReadBatch, mode: int, seed: int = 0) -> np.ndarray:
    if mode == 1:
        rng = np.random.default_rng(seed)
        return rng.permutation(batch.num_reads)
    if mode == 2:
        # sort by read content, most-significant column last in lexsort order
        cols = [batch.seqs[:, i] for i in range(min(batch.max_len, 32) - 1, -1, -1)]
        return np.lexsort(cols)
    raise ValueError(f"unknown reorder mode {mode}")


def apply_permutation(batch: ReadBatch, perm: np.ndarray) -> ReadBatch:
    headers = [batch.headers[i] for i in perm] if batch.headers is not None else None
    return ReadBatch(
        seqs=batch.seqs[perm],
        quals=batch.quals[perm],
        lengths=batch.lengths[perm],
        headers=headers,
    )


def reorder_batch(
    batch: ReadBatch, mode: int, mate: Optional[ReadBatch] = None, seed: int = 0
):
    """Reorder a batch (and optionally its mate with the same permutation,
    randomFASTQ.py paired contract)."""
    perm = reorder_permutation(batch, mode, seed)
    out = apply_permutation(batch, perm)
    if mate is not None:
        return out, apply_permutation(mate, perm)
    return out
