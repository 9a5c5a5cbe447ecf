"""Trusted NumPy model of the reference semantics (test oracle / CPU fallback).

This module re-implements, in plain NumPy + Python loops, the exact observable
behaviour of the reference pipeline:

  * EBWT + quality permutation construction with gsufsort's conventions
    (distinct per-read end markers ordered by read index, all smaller than any
    base; invoked at reference BFQzip.py:184),
  * LCP array under the convention implied by the bwt2lcp suffix-tree traversal
    (terminators never match: sa_leaf.depth = |W| semantics, include.hpp:513-527),
  * positional clustering + smoothing (bfq_int.cpp:376-737),
  * LF inversion to FASTQ (bfq_int.cpp:748-819).

It exists so the JAX/TPU path can be validated against byte-exact golden data,
including golden outputs produced by compiling the reference's own bfq_int.
Nothing here is performance-critical.
"""

from __future__ import annotations

import dataclasses
import math
from typing import List, Optional, Tuple

import numpy as np

from bfqzip_tpu import alphabet
from bfqzip_tpu.config import SmoothConfig
from bfqzip_tpu.io.fastq import ReadBatch

# the reference's internal base ordering for frequency arrays
# (bfq_int.cpp:106-110: A->0, C->1, G->2, T->3, N->4)
_REF_ORD = {alphabet.A: 0, alphabet.C: 1, alphabet.G: 2, alphabet.T: 3, alphabet.N: 4}
_REF_DNA = [alphabet.A, alphabet.C, alphabet.G, alphabet.T, alphabet.N]

QS_FILLER = alphabet.TERM_CHAR  # quality byte emitted at terminator BWT positions


@dataclasses.dataclass
class EbwtArrays:
    """The step-1 artifacts: ebwt(S), qs(S) and lcp(S)."""

    bwt: np.ndarray  # [n] u8 codes (alphabet.py)
    qs: np.ndarray  # [n] u8 raw ASCII quality bytes (filler at TERM positions)
    lcp: np.ndarray  # [n] i32, lcp[0] = 0
    num_reads: int


def build_ebwt(batch: ReadBatch) -> EbwtArrays:
    """Compute the EBWT of a read collection, naive but vectorised.

    Convention (gsufsort, built with TERMINATOR=0 DNA=1 at reference Makefile:18):
    sort all suffixes of T = s_0 $_0 s_1 $_1 ... s_{N-1} $_{N-1} where the $_i are
    pairwise-distinct symbols smaller than every base and $_i < $_j iff i < j.
    BWT[r] = character of T cyclically preceding suffix SA[r].
    """
    n_reads = batch.num_reads
    lengths = batch.lengths.astype(np.int64)
    lmax = int(lengths.max(initial=0))
    w = lmax + 1  # suffix window: a suffix is resolved within L+1 symbols

    # i32 text: terminator of read i gets value i; base c gets n_reads + code(c)
    starts = np.concatenate(([0], np.cumsum(lengths + 1)))[:-1]
    n = int((lengths + 1).sum())
    text = np.zeros(n, dtype=np.int64)
    qtext = np.full(n, QS_FILLER, dtype=np.uint8)
    for i in range(n_reads):
        s, L = starts[i], int(lengths[i])
        text[s : s + L] = batch.seqs[i, :L].astype(np.int64) + n_reads
        text[s + L] = i
        qtext[s : s + L] = batch.quals[i, :L]

    # suffix matrix [n, w]: row g = text[g : g+w], zero-padded past n.
    # Any two distinct suffixes differ at or before their first terminator
    # (terminator values are unique), so lexsort over these w columns is a
    # total order identical to the infinite-suffix order.
    pad = np.zeros(w, dtype=np.int64)
    ext = np.concatenate([text, pad])
    mat = np.lib.stride_tricks.sliding_window_view(ext, w)[:n]
    sa = np.lexsort(mat.T[::-1])

    prev = (sa - 1) % n
    bwt_vals = text[prev]
    bwt = np.where(bwt_vals < n_reads, alphabet.TERM, bwt_vals - n_reads).astype(np.uint8)
    qs = qtext[prev]

    # adjacent-suffix LCP: first mismatching column of consecutive sorted rows
    sorted_rows = mat[sa]
    eq = sorted_rows[1:] == sorted_rows[:-1]
    # first False along axis 1 (always exists: rows are distinct within w cols)
    lcp_tail = np.argmin(eq, axis=1)
    lcp = np.zeros(n, dtype=np.int32)
    lcp[1:] = lcp_tail.astype(np.int32)
    return EbwtArrays(bwt=bwt, qs=qs, lcp=lcp, num_reads=n_reads)


def lf_array(bwt: np.ndarray) -> np.ndarray:
    """LF[i] = C[bwt[i]] + rank_{bwt[i]}(i)  (dna_bwt_n.hpp:78-101).

    Equivalently the inverse of the stable sort of bwt by (symbol, position).
    """
    order = np.argsort(bwt, kind="stable")
    lf = np.empty_like(order)
    lf[order] = np.arange(bwt.size, dtype=order.dtype)
    return lf


def lcp_bitvectors(lcp: np.ndarray, k: int) -> Tuple[np.ndarray, np.ndarray]:
    """LCP_threshold and LCP_minima.

    threshold[i] = LCP[i] >= K  (update_LCP_leaf / update_lcp_threshold,
    include.hpp:888-925).

    minima[p] = LCP[p] < LCP[p-1] and LCP[p+1] >= LCP[p], p in [1, n-2]
    — the LCP-array form of update_lcp_minima (bfq_int.cpp:147-181): a child
    border of an ST node is marked iff the preceding (non-TERM) child has >= 2
    elements (== strict LCP decrease into p; a TERM-preceded border can never
    decrease strictly because LCP inside a terminator run equals the node
    depth) and the border is not within one position of the node end
    (== LCP[p+1] >= LCP[p]).  Identical to the streaming definition of
    bfq_ext.cpp:377-390.
    """
    n = lcp.size
    thr = lcp >= k
    minima = np.zeros(n, dtype=bool)
    if n >= 3:
        p = np.arange(1, n - 1)
        minima[1:-1] = (lcp[p] < lcp[p - 1]) & (lcp[p + 1] >= lcp[p])
    return thr, minima


@dataclasses.dataclass
class SmoothStats:
    num_clust: int = 0
    num_clust_discarded: int = 0
    num_clust_amb_discarded: int = 0
    num_clust_mod: int = 0
    num_clust_alleq: int = 0
    bases_inside: int = 0
    qs_smoothed: int = 0
    modified: int = 0


def _new_qs(cfg: SmoothConfig, bwt: np.ndarray, qs: np.ndarray, start: int, end: int) -> int:
    """The four M strategies (bfq_int.cpp:307-373,462-473), raw ASCII result."""
    sl = slice(start, end + 1)
    mask = bwt[sl] != alphabet.TERM
    q = qs[sl][mask].astype(np.int64)
    if cfg.mode == 2:
        return cfg.default_qs
    if q.size == 0:
        # unreachable: callers bail out earlier when base_num == 0
        return 0
    if cfg.mode == 0:  # max_qs
        return int(q.max())
    if cfg.mode == 3:  # avg_qs: truncating integer division of raw ASCII values
        return int(q.sum() // q.size)
    # mode 1: mean_error in double precision, then round (bfq_int.cpp:357-373)
    err = np.power(10.0, -(q.astype(np.float64) - 33.0) / 10.0)
    avg_err = float(err.sum()) / q.size
    return int(round(-10.0 * math.log10(avg_err))) + 33


def smooth(
    ebwt: EbwtArrays, cfg: SmoothConfig
) -> Tuple[np.ndarray, np.ndarray, SmoothStats]:
    """Cluster detection + smoothing; returns (bwt_sub, qs_new, stats).

    bwt_sub is the BWT with base corrections applied (the functional equivalent
    of BWT_MOD + rankbv indirection, bfq_int.cpp:782); qs_new is the smoothed
    quality permutation.  Semantics follow bfq_int.cpp:376-737 line by line.
    """
    bwt, lcp = ebwt.bwt, ebwt.lcp
    qs = ebwt.qs.copy()
    bwt_sub = bwt.copy()
    n = bwt.size
    stats = SmoothStats()

    thr, minima = lcp_bitvectors(lcp, cfg.k)
    pred = thr & ~minima
    lf = None  # built lazily; only needed for two-frequent-symbol clusters

    # maximal runs of pred; cluster interval = [run_start - border, run_end]
    # (process_cluster(begin, i) with start=begin-1, end=i-1; bfq_int.cpp:416-417)
    d = np.diff(pred.astype(np.int8))
    run_starts = np.flatnonzero(d == 1) + 1
    run_ends = np.flatnonzero(d == -1)  # inclusive end of run == close position - 1
    if pred[0]:
        run_starts = np.concatenate(([0], run_starts))
    if pred[-1]:
        run_ends = np.concatenate((run_ends, [n - 1]))

    qt = cfg.quality_threshold + 33

    for rs, re in zip(run_starts, run_ends):
        start = max(rs - cfg.border, 0)
        end = re  # == close_pos - border for border=1
        size = end - start + 1
        if size < cfg.min_cluster:
            continue

        csl = slice(start, end + 1)
        cb = bwt[csl]
        cq = qs[csl]
        nonterm = cb != alphabet.TERM

        freqs = np.zeros(5, dtype=np.int64)
        low_qs = np.zeros(5, dtype=np.int64)  # 1 iff some occurrence has QS >= qt
        for code, o in _REF_ORD.items():
            sel = cb == code
            freqs[o] = int(sel.sum())
            if sel.any() and int(cq[sel].max(initial=0)) >= qt:
                low_qs[o] = 1
        base_num = int(freqs.sum())

        stats.num_clust += 1
        if base_num == 0:
            continue
        stats.bases_inside += base_num

        newqs = _new_qs(cfg, bwt, qs, start, end)

        freq_symb = []  # codes, in reference ord order A,C,G,T,N
        nnn = 0
        for o, code in enumerate(_REF_DNA):
            if freqs[o] > 0:
                nnn += 1
                perc = (100 * freqs[o]) // base_num
                if perc >= cfg.freq_threshold:
                    freq_symb.append(code)
        if nnn == 1:
            stats.num_clust_alleq += 1
        assert len(freq_symb) < 3

        def smooth_single(new_symb: int):
            """modBasesSmoothQS (bfq_int.cpp:376-405)."""
            for j in range(start, end + 1):
                if bwt[j] == alphabet.TERM:
                    continue
                o = _REF_ORD[int(bwt[j])]
                if bwt[j] != new_symb and low_qs[o] == 0:
                    bwt_sub[j] = new_symb
                    stats.modified += 1
                elif bwt[j] == new_symb:
                    qs[j] = newqs
                    stats.qs_smoothed += 1
                else:
                    if newqs < qs[j]:
                        qs[j] = newqs
                        stats.qs_smoothed += 1

        if len(freq_symb) == 0:
            stats.num_clust_discarded += 1
        elif len(freq_symb) == 1:
            if freq_symb[0] == alphabet.N:
                stats.num_clust_discarded += 1
            else:
                smooth_single(freq_symb[0])
        elif base_num < cfg.min_cluster:
            stats.num_clust_discarded += 1
        elif freq_symb[0] == alphabet.N:
            smooth_single(freq_symb[1])
            stats.num_clust_mod += 1
        elif freq_symb[1] == alphabet.N:
            smooth_single(freq_symb[0])
            stats.num_clust_mod += 1
        else:
            # two frequent non-N symbols: SNP-candidate rule (bfq_int.cpp:538-618)
            if lf is None:
                lf = lf_array(bwt)
            prec_set = [set(), set()]
            for j in range(start, end + 1):
                for t in (0, 1):
                    if bwt[j] == freq_symb[t]:
                        c = int(bwt[lf[j]])
                        if c != alphabet.TERM and c != alphabet.N:
                            prec_set[t].add(c)
            if (
                len(prec_set[0]) == 1
                and len(prec_set[1]) == 1
                and prec_set[0] != prec_set[1]
            ):
                stats.num_clust_mod += 1
                p0 = next(iter(prec_set[0]))
                p1 = next(iter(prec_set[1]))
                for j in range(start, end + 1):
                    if bwt[j] == alphabet.TERM:
                        continue
                    o = _REF_ORD[int(bwt[j])]
                    if (
                        bwt[j] != freq_symb[0]
                        and bwt[j] != freq_symb[1]
                        and low_qs[o] == 0
                    ):
                        c = int(bwt[lf[j]])
                        if c == p0:
                            bwt_sub[j] = freq_symb[0]
                            stats.modified += 1
                        elif c == p1:
                            bwt_sub[j] = freq_symb[1]
                            stats.modified += 1
                    elif bwt[j] == freq_symb[0] or bwt[j] == freq_symb[1]:
                        qs[j] = newqs
                        stats.qs_smoothed += 1
                    else:
                        if newqs < qs[j]:
                            qs[j] = newqs
                            stats.qs_smoothed += 1
            else:
                stats.num_clust_amb_discarded += 1

    return bwt_sub, qs, stats


def illumina_8_level(q0: np.ndarray) -> np.ndarray:
    """Illumina 8-level binning on Phred values (bfq_int.cpp:307-319), +33 applied."""
    q = np.asarray(q0, dtype=np.int64)
    out = q.copy()
    out[q >= 2] = 6
    out[q >= 10] = 15
    out[q >= 20] = 22
    out[q >= 25] = 27
    out[q >= 30] = 33
    out[q >= 35] = 37
    out[q >= 40] = 40
    return (out + 33).astype(np.uint8)


def invert(
    ebwt: EbwtArrays,
    bwt_sub: np.ndarray,
    qs_new: np.ndarray,
    binning: bool = False,
) -> ReadBatch:
    """Reconstruct the smoothed FASTQ via backward LF walks (bfq_int.cpp:748-819).

    Read i starts at BWT position i (the terminator suffixes occupy SA[0..N-1]
    in read order) and collects characters right-to-left until the preceding
    character is the terminator.
    """
    bwt = ebwt.bwt
    n_reads = ebwt.num_reads
    lf = lf_array(bwt)

    seq_rows: List[np.ndarray] = []
    q_rows: List[np.ndarray] = []
    for i in range(n_reads):
        j = i
        rb: List[int] = []
        rq: List[int] = []
        while bwt[j] != alphabet.TERM:
            rb.append(int(bwt_sub[j]))
            rq.append(int(qs_new[j]))
            j = lf[j]
        rb.reverse()
        rq.reverse()
        seq_rows.append(np.array(rb, dtype=np.uint8))
        q_rows.append(np.array(rq, dtype=np.uint8))

    lengths = np.array([r.size for r in seq_rows], dtype=np.int32)
    width = int(lengths.max(initial=0))
    seqs = np.zeros((n_reads, width), dtype=np.uint8)
    quals = np.zeros((n_reads, width), dtype=np.uint8)
    for i, (rb, rq) in enumerate(zip(seq_rows, q_rows)):
        seqs[i, : rb.size] = rb
        if binning:
            rq = illumina_8_level(np.asarray(rq, dtype=np.int64) - 33)
        quals[i, : rq.size] = rq
    return ReadBatch(seqs=seqs, quals=quals, lengths=lengths, headers=None)


def smooth_fastq(
    batch: ReadBatch, cfg: Optional[SmoothConfig] = None
) -> Tuple[ReadBatch, SmoothStats]:
    """End-to-end golden pipeline: EBWT -> smooth -> invert."""
    cfg = cfg or SmoothConfig()
    ebwt = build_ebwt(batch)
    bwt_sub, qs_new, stats = smooth(ebwt, cfg)
    out = invert(ebwt, bwt_sub, qs_new, binning=cfg.binning)
    out.headers = batch.headers
    return out, stats
