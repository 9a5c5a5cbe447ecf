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
Round 0 sorts by a 30-bit key packing the next 10 window symbols (3 bits
each: terminator->0 < bases 1..6), with a tie-break key that encodes the read
index when the window contains the read's terminator (prefix-equal suffixes
of different reads order by read index) and a unique large value for padding
positions.  Each subsequent round is one variadic XLA sort doubling the span:
10 -> 20 -> 40 -> 80 -> ... until the span covers L+1, at which point every
real suffix rank is unique.  ceil(log2((L+1)/10)) + 1 sorts total.

LCP
---
lcp(SA[i-1], SA[i]) is decomposed greedily over the saved per-round ranks
(span s chars are equal iff the span-s ranks are equal; terminator
distinctness is embedded in the ranks, which reproduces the reference's
convention that LCP never extends past a terminator — sa_leaf depth
semantics, include.hpp:513-527).  The sub-10-symbol remainder is a 16-byte
window comparison on a zero-terminated symbol matrix.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from bfqzip_tpu import alphabet

PACK = 10  # symbols per initial radix key (3 bits each, 30 bits used)
REM_W = 16  # remainder comparison window (>= PACK, multiple of 8)


class EbwtDevice(NamedTuple):
    """Step-1 artifacts on device; valid data occupies [0, n) of each array."""

    bwt: jax.Array  # [n_pad] u8 codes; PAD_CODE past n
    qs: jax.Array  # [n_pad] u8 raw ASCII quality bytes (filler at TERM positions)
    lcp: jax.Array  # [n_pad] i32 (lcp[0] == 0; garbage past n)
    sa: jax.Array  # [n_pad] i32 positions into the padded text
    n: jax.Array  # scalar i32: number of real BWT positions


PAD_CODE = jnp.uint8(alphabet.SIGMA)  # sentinel code for padding region


def _window_codes(seqs: jax.Array, lengths: jax.Array) -> jax.Array:
    """[N, wp+REM_W] u8 symbol rows for window keys.

    Row r: 1+code for the read's bases, then zeros from the terminator on
    (zeros make prefix comparisons stop at the terminator).
    """
    n_reads, width = seqs.shape
    wp = width + 1
    k = jnp.arange(wp + REM_W, dtype=jnp.int32)[None, :]
    lens = lengths[:, None].astype(jnp.int32)
    base = jnp.pad(seqs, ((0, 0), (0, 1 + REM_W))).astype(jnp.uint8) + 1
    return jnp.where(k < lens, base, jnp.uint8(0))


def _pack_keys(wcodes: jax.Array, wp: int) -> jax.Array:
    """[N, wp] i32: 30-bit key of the next PACK symbols at each position."""
    acc = jnp.zeros(wcodes.shape[:-1] + (wp,), jnp.int32)
    for t in range(PACK):
        acc = acc | (wcodes[:, t : t + wp].astype(jnp.int32) << (3 * (PACK - 1 - t)))
    return acc


def _dense_rank(eq_prev: jax.Array, sa: jax.Array) -> jax.Array:
    """Scatter dense ranks (cumsum of 'key changed') back to position order."""
    n_pad = sa.shape[0]
    changed = jnp.concatenate([jnp.zeros((1,), jnp.int32), (~eq_prev[1:]).astype(jnp.int32)])
    dense = jnp.cumsum(changed, dtype=jnp.int32)
    return jnp.zeros((n_pad,), jnp.int32).at[sa].set(dense, mode="drop", unique_indices=True)


def _spans(wp: int):
    spans = [PACK]
    while spans[-1] < wp:
        spans.append(spans[-1] * 2)
    return spans  # ranks exist for spans[:-1]; spans[-1] is the final (unique) span


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

    wcodes = _window_codes(seqs, lengths)  # [N, wp+REM_W]
    p10 = _pack_keys(wcodes, wp).reshape(-1)  # [n_pad]

    k = jnp.arange(wp, dtype=jnp.int32)[None, :]
    rid = jnp.arange(n_reads, dtype=jnp.int32)[:, None]
    is_pad = k > lens[:, None]
    term_near = (lens[:, None] - k >= 0) & (lens[:, None] - k < PACK)
    # tie-break: read index when the terminator is inside the packed window
    # (prefix-equal reads order by index); unique large keys for padding so it
    # sorts after all real suffixes (p10 of padding is 0, so tb must dominate).
    tb = jnp.where(term_near, rid + 1, 0)
    g2 = rid * wp + k
    tb = jnp.where(is_pad, n_reads + 1 + g2, tb).reshape(-1)
    p10 = jnp.where(is_pad.reshape(-1), jnp.int32(2**30), p10)

    # round 0: sort by (packed 10 symbols, tie-break)
    k1, k2, sa = jax.lax.sort((p10, tb, idx0), num_keys=2)
    eq = jnp.concatenate([jnp.ones((1,), bool), (k1[1:] == k1[:-1]) & (k2[1:] == k2[:-1])])
    rank = _dense_rank(eq, sa)

    spans = _spans(wp)
    ranks = [rank]  # rank after span `spans[i]`
    for h in spans[:-1]:
        rank_ahead = jnp.where(idx0 + h < n_pad, jnp.roll(rank, -h), -1)
        r1, r2, sa = jax.lax.sort((rank, rank_ahead, idx0), num_keys=2)
        eq = jnp.concatenate([jnp.ones((1,), bool), (r1[1:] == r1[:-1]) & (r2[1:] == r2[:-1])])
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
    for span, r in zip(reversed(spans[:-1]), reversed(ranks[:-1])):
        ah, bh = a + h, b + h
        ok = (ah < n_pad) & (bh < n_pad)
        same = r[jnp.minimum(ah, n_pad - 1)] == r[jnp.minimum(bh, n_pad - 1)]
        h = jnp.where(ok & same, h + span, h)
    # remainder < PACK symbols, from the packed keys alone: count leading
    # equal 3-bit groups of p10[a+h] vs p10[b+h], capped at the first
    # terminator (zero group) — no window materialisation.
    # a+h / b+h always land on base/terminator slots for valid rows (h <= lcp
    # keeps the offset within the read), so the padding-key masking of p10 is
    # never observed by this lookup.
    pa = p10[jnp.minimum(a + h, n_pad - 1)]
    pb = p10[jnp.minimum(b + h, n_pad - 1)]
    rem = jnp.zeros((n_pad,), jnp.int32)
    nz = jnp.ones((n_pad,), bool)  # prefix of pa has no zero group so far
    eq = jnp.ones((n_pad,), bool)  # prefixes equal so far
    for j in range(1, PACK + 1):
        sh = 3 * (PACK - j)
        eq = eq & ((pa >> sh) == (pb >> sh))
        nz = nz & (((pa >> sh) & 7) != 0)
        rem = rem + (eq & nz).astype(jnp.int32)
    lcp = h + rem
    lcp = jnp.where(valid, lcp, 0).at[0].set(0)

    return EbwtDevice(bwt=bwt, qs=qs, lcp=lcp, sa=sa, n=n)
