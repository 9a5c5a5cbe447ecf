"""EBWT + quality-permutation + LCP construction as a JAX sort pipeline.

Replaces the reference's external gsufsort / eGap step-1 tools (invoked at
reference BFQzip.py:184 and BFQzip_ext.py:177).  The construction is a packed
prefix-doubling suffix sort over the read collection; the LCP of adjacent
sorted suffixes is recovered by binary lifting over the doubling ranks — both
pure array programs that map onto XLA's sort/gather and shard over meshes.

Layout
------
Reads are presented as padded arrays [N, L]; position g = r*(L+1) + k denotes
suffix k of read r (k == len_r is the read's terminator suffix).  Suffix order
follows gsufsort's convention (built with TERMINATOR=0 DNA=1 at reference
Makefile:18): per-read terminators are pairwise distinct, smaller than every
base, ordered by read index.  Padding positions (k > len_r) are given keys
that sort strictly after all real suffixes, so the n real suffixes occupy
SA[0:n] and every shape stays static under jit; n = sum(len)+N is only ever
used as a mask.

Sort
----
Round 0 sorts by PACK_WORDS 30-bit keys, each packing 10 window symbols
(3 bits each: terminator->0 < bases 1..6; symbols at and after the terminator
are zeroed so prefix-equal suffixes have equal keys), with a tie-break key
that encodes the read index when the window contains the read's terminator
(prefix-equal suffixes of different reads order by read index) and a unique
large value for padding positions.  Each subsequent round is one variadic
XLA sort doubling the span: 30 -> 60 -> 120 -> ... until the span covers
L+1, at which point every real suffix rank is unique.  For 101bp reads that
is 3 sorts total (the reference-equivalent plain doubling needs 8).

LCP
---
lcp(SA[i-1], SA[i]) is decomposed greedily over the saved per-round ranks
(span-s ranks equal iff the next s symbols match; terminator distinctness is
embedded in the ranks, reproducing the reference's convention that LCP never
extends past a terminator — sa_leaf depth semantics, include.hpp:513-527).
The sub-span remainder is counted from the packed keys: leading equal 3-bit
groups, gated by the first zero group (= terminator).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from bfqzip_tpu import alphabet

PACK = 10  # symbols per packed word (3 bits each, 30 bits used)
PACK_WORDS = 3  # words in the round-0 key: initial span = PACK * PACK_WORDS
SPAN0 = PACK * PACK_WORDS
_EXT = SPAN0 + PACK  # row extension so every packed word is in-row


class EbwtDevice(NamedTuple):
    """Step-1 artifacts on device; valid data occupies [0, n) of each array."""

    bwt: jax.Array  # [n_pad] u8 codes; PAD_CODE past n
    qs: jax.Array  # [n_pad] u8 raw ASCII quality bytes (filler at TERM positions)
    lcp: jax.Array  # [n_pad] i32 (lcp[0] == 0; garbage past n)
    sa: jax.Array  # [n_pad] i32 positions into the padded text
    text: jax.Array  # [n_pad] u8: 1+code per base, 0 at terminator/padding slots
    n: jax.Array  # scalar i32: number of real BWT positions


PAD_CODE = jnp.uint8(alphabet.SIGMA)  # sentinel code for padding region


def _window_codes(seqs: jax.Array, lengths: jax.Array) -> jax.Array:
    """[N, wp+_EXT] u8 symbol rows: 1+code for bases, zeros from the
    terminator on (zeros make prefix comparisons stop at the terminator)."""
    n_reads, width = seqs.shape
    wp = width + 1
    k = jnp.arange(wp + _EXT, dtype=jnp.int32)[None, :]
    lens = lengths[:, None].astype(jnp.int32)
    base = jnp.pad(seqs, ((0, 0), (0, 1 + _EXT))).astype(jnp.uint8) + 1
    return jnp.where(k < lens, base, jnp.uint8(0))


def _pack_word(wcodes: jax.Array, wp: int, word: int) -> jax.Array:
    """[N, wp] i32 key packing symbols [10*word, 10*word+10) of each window."""
    o = PACK * word
    acc = jnp.zeros(wcodes.shape[:-1] + (wp,), jnp.int32)
    for t in range(PACK):
        acc = acc | (wcodes[:, o + t : o + t + wp].astype(jnp.int32) << (3 * (PACK - 1 - t)))
    return acc


def _dense_rank(eq_prev: jax.Array, sa: jax.Array) -> jax.Array:
    """Scatter dense ranks (cumsum of 'key changed') back to position order."""
    n_pad = sa.shape[0]
    changed = jnp.concatenate([jnp.zeros((1,), jnp.int32), (~eq_prev[1:]).astype(jnp.int32)])
    dense = jnp.cumsum(changed, dtype=jnp.int32)
    return jnp.zeros((n_pad,), jnp.int32).at[sa].set(dense, mode="drop", unique_indices=True)


def _spans(wp: int):
    spans = [SPAN0]
    while spans[-1] < wp:
        spans.append(spans[-1] * 2)
    return spans  # doubling rounds sort spans[1:]; ranks kept for spans[:-1]


@functools.partial(jax.jit, static_argnames=())
def build_ebwt(seqs: jax.Array, quals: jax.Array, lengths: jax.Array) -> EbwtDevice:
    """Compute ebwt(S), qs(S) and lcp(S) for a padded read batch.

    Returns fixed-shape arrays of size N*(L+1) whose first n entries are the
    real EBWT/QS/LCP (n = sum(lengths) + N); the rest is inert padding
    (PAD_CODE bases, zero quality).
    """
    n_reads, width = seqs.shape
    wp = width + 1
    n_pad = n_reads * wp
    idx0 = jnp.arange(n_pad, dtype=jnp.int32)
    lens = lengths.astype(jnp.int32)
    n = (jnp.sum(lens, dtype=jnp.int32) + n_reads).astype(jnp.int32)

    wcodes = _window_codes(seqs, lengths)  # [N, wp+_EXT]
    words = [_pack_word(wcodes, wp, w).reshape(-1) for w in range(PACK_WORDS)]

    k = jnp.arange(wp, dtype=jnp.int32)[None, :]
    rid = jnp.arange(n_reads, dtype=jnp.int32)[:, None]
    is_pad = (k > lens[:, None]).reshape(-1)
    term_near = (lens[:, None] - k >= 0) & (lens[:, None] - k < SPAN0)
    # tie-break: read index when the terminator is inside the packed span
    # (prefix-equal reads order by index); unique large values for padding so
    # it sorts after all real suffixes (its first word is forced to the max).
    tb = jnp.where(term_near, rid + 1, 0)
    g2 = rid * wp + k
    tb = jnp.where(is_pad.reshape(n_reads, wp), n_reads + 1 + g2, tb).reshape(-1)
    w0 = jnp.where(is_pad, jnp.int32(2**30), words[0])

    # round 0: one sort by the 30-symbol packed key + tie-break
    sorted_ops = jax.lax.sort((w0, *words[1:], tb, idx0), num_keys=PACK_WORDS + 1)
    sa = sorted_ops[-1]
    keys = sorted_ops[:-1]
    eq = jnp.ones((n_pad,), bool)
    for ks in keys:
        eq = eq & jnp.concatenate([jnp.ones((1,), bool), ks[1:] == ks[:-1]])
    rank = _dense_rank(eq, sa)

    spans = _spans(wp)
    ranks = [rank]  # ranks[i] = rank after span spans[i]
    for i, h in enumerate(spans[:-1]):
        rank_ahead = jnp.where(idx0 + h < n_pad, jnp.roll(rank, -h), -1)
        r1, r2, sa = jax.lax.sort((rank, rank_ahead, idx0), num_keys=2)
        if i + 1 < len(spans) - 1:  # the final span's rank is never used
            eq = jnp.concatenate(
                [jnp.ones((1,), bool), (r1[1:] == r1[:-1]) & (r2[1:] == r2[:-1])]
            )
            rank = _dense_rank(eq, sa)
            ranks.append(rank)

    # ---- BWT + permuted qualities ----
    # Symbol cyclically preceding each suffix.  A padding predecessor can only
    # occur when the suffix starts a read, whose true predecessor in the
    # compact text is the previous read's terminator — emit TERM either way.
    text_codes = jnp.where(
        (k < lens[:, None]), jnp.pad(seqs, ((0, 0), (0, 1))).astype(jnp.uint8) + 1, jnp.uint8(0)
    )  # 0 for terminator AND padding slots
    tflat = text_codes.reshape(-1)
    qtext = jnp.pad(quals, ((0, 0), (0, 1))).reshape(-1)
    prev = (sa - 1) % n_pad
    cprev = tflat[prev]
    is_term = cprev == 0
    bwt = jnp.where(is_term, jnp.uint8(alphabet.TERM), cprev - 1)
    qs = jnp.where(is_term, jnp.uint8(alphabet.TERM_CHAR), qtext[prev])

    valid = idx0 < n
    bwt = jnp.where(valid, bwt, PAD_CODE)
    qs = jnp.where(valid, qs, jnp.uint8(0))

    # ---- LCP by binary lifting over the doubling ranks ----
    a = jnp.concatenate([jnp.zeros((1,), jnp.int32), sa[:-1]])
    b = sa
    h = jnp.zeros((n_pad,), jnp.int32)
    for span, r in zip(reversed(spans[:-1]), reversed(ranks)):
        ah, bh = a + h, b + h
        ok = (ah < n_pad) & (bh < n_pad)
        same = r[jnp.minimum(ah, n_pad - 1)] == r[jnp.minimum(bh, n_pad - 1)]
        h = jnp.where(ok & same, h + span, h)

    # remainder < SPAN0 symbols, from the packed keys alone: count leading
    # equal 3-bit groups, gated at the first zero group (= terminator; the
    # gate also neutralises any out-of-row garbage in later words).  a+h and
    # b+h land on base/terminator slots of valid rows (h <= lcp keeps the
    # offset within the read), so the padding-key masking of w0 is never
    # observed here — use the unmasked word array.
    # NB: keep these gathers strictly 1-D — an [n, W] gather gets tiled to
    # (8,128) lanes by XLA:TPU, a ~40x memory blowup at scale.
    rem = jnp.zeros((n_pad,), jnp.int32)
    nz = jnp.ones((n_pad,), bool)  # no zero group seen yet
    eq = jnp.ones((n_pad,), bool)  # all groups equal so far
    for w in range(PACK_WORDS):
        aw = words[0][jnp.minimum(a + h + PACK * w, n_pad - 1)]
        bw = words[0][jnp.minimum(b + h + PACK * w, n_pad - 1)]
        for j in range(1, PACK + 1):
            sh = 3 * (PACK - j)
            eq = eq & ((aw >> sh) == (bw >> sh))
            nz = nz & (((aw >> sh) & 7) != 0)
            rem = rem + (eq & nz).astype(jnp.int32)
    lcp = h + rem
    lcp = jnp.where(valid, lcp, 0).at[0].set(0)

    return EbwtDevice(bwt=bwt, qs=qs, lcp=lcp, sa=sa, text=tflat, n=n)
