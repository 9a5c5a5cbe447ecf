"""EBWT + quality-permutation + LCP construction as a JAX sort pipeline.

Replaces the reference's external gsufsort / eGap step-1 tools (invoked at
reference BFQzip.py:184 and BFQzip_ext.py:177).  The construction is a
prefix-doubling suffix sort over the read collection followed by a windowed
adjacent-suffix comparison for the LCP — both pure array programs that map onto
XLA's sort and gather primitives and shard over device meshes.

Layout
------
Reads are presented as padded arrays [N, L].  The working text T is the
row-major padded layout of N*(L+1) i32 symbols:

    T[r*(L+1) + k] = N + code(s_r[k])   for k <  len_r     (bases)
                   = r                  for k == len_r      (distinct terminator)
                   = N + SIGMA + g      for k >  len_r      (distinct padding)

Terminator symbols are pairwise distinct and smaller than every base, ordered
by read index — exactly gsufsort's convention (built with TERMINATOR=0 DNA=1 at
reference Makefile:18), so the suffix array of T restricted to non-padding
positions IS the EBWT order of the collection.  Padding symbols are distinct
and larger than everything, so the n real suffixes occupy SA[0:n] and all
shapes stay static under jit; n = sum(len)+N is only ever used as a mask.

The LCP of adjacent sorted suffixes is bounded by L+1 (comparisons never cross
a terminator), so it is computed exactly by comparing (L+1)-symbol windows —
a contiguous row gather, done in chunks to bound memory.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from bfqzip_tpu import alphabet


class EbwtDevice(NamedTuple):
    """Step-1 artifacts on device; valid data occupies [0, n) of each array."""

    bwt: jax.Array  # [n_pad] u8 codes; PAD_CODE past n
    qs: jax.Array  # [n_pad] u8 raw ASCII quality bytes (filler at TERM positions)
    lcp: jax.Array  # [n_pad] i32 (lcp[0] == 0; garbage past n)
    sa: jax.Array  # [n_pad] i32 positions into the padded text
    n: jax.Array  # scalar i32: number of real BWT positions


PAD_CODE = jnp.uint8(alphabet.SIGMA)  # sentinel code for padding region


def _num_rounds(width: int) -> int:
    """Doubling rounds so that the span reaches width = L+1 symbols."""
    r = 0
    while (1 << r) < width:
        r += 1
    return r


def build_text(seqs: jax.Array, lengths: jax.Array):
    """Build the padded i32 text and u8 quality text from [N, L] arrays."""
    n_reads, width = seqs.shape
    wp = width + 1
    k = jnp.arange(wp, dtype=jnp.int32)[None, :]
    lens = lengths[:, None].astype(jnp.int32)
    rid = jnp.arange(n_reads, dtype=jnp.int32)[:, None]
    g = rid * wp + k
    base_vals = jnp.pad(seqs.astype(jnp.int32), ((0, 0), (0, 1))) + n_reads
    text = jnp.where(k < lens, base_vals, jnp.where(k == lens, rid, n_reads + alphabet.SIGMA + g))
    return text.reshape(-1)


def suffix_array(text: jax.Array, width_p1: int) -> jax.Array:
    """Prefix-doubling suffix sort of the padded text.

    All suffixes of T are pairwise distinct within width_p1 symbols (each read's
    suffixes hit its unique terminator; padding symbols are unique), so
    ceil(log2(width_p1)) doubling rounds suffice.  Each round is one variadic
    XLA sort of (rank, rank_ahead, index) — the TPU analog of the pointer-free
    Larsson–Sadakane iteration.
    """
    n_pad = text.shape[0]
    idx0 = jnp.arange(n_pad, dtype=jnp.int32)

    # round 0: sort by single symbol
    key0, sa = jax.lax.sort((text, idx0), num_keys=1)
    changed = jnp.concatenate([jnp.zeros((1,), jnp.int32), (key0[1:] != key0[:-1]).astype(jnp.int32)])
    dense = jnp.cumsum(changed, dtype=jnp.int32)
    rank = jnp.zeros((n_pad,), jnp.int32).at[sa].set(dense)

    h = 1
    for _ in range(_num_rounds(width_p1)):
        rank_ahead = jnp.where(idx0 + h < n_pad, jnp.roll(rank, -h), -1)
        r1, r2, sa = jax.lax.sort((rank, rank_ahead, idx0), num_keys=2)
        changed = jnp.concatenate(
            [
                jnp.zeros((1,), jnp.int32),
                ((r1[1:] != r1[:-1]) | (r2[1:] != r2[:-1])).astype(jnp.int32),
            ]
        )
        dense = jnp.cumsum(changed, dtype=jnp.int32)
        rank = jnp.zeros((n_pad,), jnp.int32).at[sa].set(dense)
        h *= 2
    return sa


def _lcp_from_windows(surrogate: jax.Array, sa: jax.Array, width_p1: int, chunk: int) -> jax.Array:
    """LCP[i] = #leading symbols shared by suffixes SA[i-1], SA[i].

    Works on a u8 surrogate text where every terminator maps to 0: the match
    run is cut at a mismatch OR at a terminator, which is exactly the
    distinct-terminator LCP convention of the reference's suffix-tree traversal
    (sa_leaf depth semantics, include.hpp:513-527).
    """
    n_pad = sa.shape[0]
    ext = jnp.concatenate([surrogate, jnp.zeros((width_p1,), jnp.uint8)])

    def window(start):
        return jax.lax.dynamic_slice(ext, (start,), (width_p1,))

    pad_to = ((n_pad + chunk - 1) // chunk) * chunk
    sa_prev = jnp.concatenate([jnp.zeros((1,), jnp.int32), sa[:-1]])
    sa_c = jnp.pad(sa, (0, pad_to - n_pad)).reshape(-1, chunk)
    sp_c = jnp.pad(sa_prev, (0, pad_to - n_pad)).reshape(-1, chunk)

    def body(args):
        s, p = args
        wa = jax.vmap(window)(s)
        wb = jax.vmap(window)(p)
        ok = (wa == wb) & (wa != 0)
        # length of leading all-True run per row
        run = jnp.cumprod(ok.astype(jnp.int32), axis=1, dtype=jnp.int32)
        return jnp.sum(run, axis=1, dtype=jnp.int32)

    lcp = jax.lax.map(body, (sa_c, sp_c)).reshape(-1)[:n_pad]
    return lcp.at[0].set(0)


@functools.partial(jax.jit, static_argnames=("lcp_chunk",))
def build_ebwt(seqs: jax.Array, quals: jax.Array, lengths: jax.Array, lcp_chunk: int = 4096) -> EbwtDevice:
    """Compute ebwt(S), qs(S) and lcp(S) for a padded read batch.

    Returns fixed-shape arrays of size N*(L+1) whose first n entries are the
    real EBWT/QS/LCP (n = sum(lengths) + N); the rest is inert padding
    (PAD_CODE bases, zero quality).
    """
    n_reads, width = seqs.shape
    wp = width + 1
    n_pad = n_reads * wp

    text = build_text(seqs, lengths)
    qtext = jnp.pad(quals, ((0, 0), (0, 1))).reshape(-1)
    n = (jnp.sum(lengths.astype(jnp.int32), dtype=jnp.int32) + n_reads).astype(jnp.int32)

    sa = suffix_array(text, wp)

    # BWT: symbol cyclically preceding each suffix.  A padding predecessor can
    # only occur when the suffix starts a read, whose true predecessor in the
    # compact text is the previous read's terminator — emit TERM either way.
    prev = (sa - 1) % n_pad
    tprev = text[prev]
    is_term = (tprev < n_reads) | (tprev >= n_reads + alphabet.SIGMA)
    bwt = jnp.where(is_term, jnp.uint8(alphabet.TERM), (tprev - n_reads).astype(jnp.uint8))
    qs = jnp.where(is_term, jnp.uint8(alphabet.TERM_CHAR), qtext[prev])

    valid = jnp.arange(n_pad, dtype=jnp.int32) < n
    bwt = jnp.where(valid, bwt, PAD_CODE)
    qs = jnp.where(valid, qs, jnp.uint8(0))

    # u8 surrogate for LCP equality: terminators -> 0, bases -> 1+code, pad -> 7
    surrogate = jnp.where(
        text < n_reads,
        jnp.uint8(0),
        jnp.where(text < n_reads + alphabet.SIGMA, (text - n_reads + 1).astype(jnp.uint8), jnp.uint8(7)),
    )
    lcp = _lcp_from_windows(surrogate, sa, wp, lcp_chunk)
    lcp = jnp.where(valid, lcp, 0)

    return EbwtDevice(bwt=bwt, qs=qs, lcp=lcp, sa=sa, n=n)
