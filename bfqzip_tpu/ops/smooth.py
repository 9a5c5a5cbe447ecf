"""Positional clustering + noise reduction + quality smoothing, vectorised.

Replaces the sequential cluster scan and per-cluster loops of the reference
(bfq_int.cpp:376-737) with segment reductions over the whole EBWT:

  * LCP_threshold / LCP_minima are elementwise predicates on the explicit LCP
    array (the LCP-array form of the suffix-tree traversal, see
    ref_golden.lcp_bitvectors for the equivalence argument),
  * clusters are maximal runs of (threshold & ~minima) extended one position
    left (border=1, bfq_int.cpp:67,416-417),
  * per-cluster statistics (symbol frequencies, trusted flags, replacement
    quality under M=0..3) are jax.ops.segment_* reductions keyed by a cluster-id
    array derived from a cumulative sum of run-open marks,
  * the SNP-candidate rule for two frequent symbols uses predecessor symbols
    bwt[LF[j]] — a single global gather instead of per-occurrence pointer
    chasing (bfq_int.cpp:545-611).

Outputs are the substituted BWT, the smoothed quality permutation, and the
reference's cluster/quality/base counters (bfq_int.cpp:53-65).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from bfqzip_tpu import alphabet
from bfqzip_tpu.config import SmoothConfig
from bfqzip_tpu.ops.rank import lf_array
from bfqzip_tpu.ops.suffix import EbwtDevice

# reference ord order (bfq_int.cpp:106-110): index o -> alphabet code
_ORD_CODES = (alphabet.A, alphabet.C, alphabet.G, alphabet.T, alphabet.N)
_N_ORD = 4  # index of 'N' in ord order — always last, so FreqSymb[0] is never N


class SmoothOut(NamedTuple):
    bwt_sub: jax.Array  # [n_pad] u8, base-corrected BWT
    qs: jax.Array  # [n_pad] u8, smoothed qualities
    stats: dict  # reference counters, scalar i64


def _seg_sum(data, cid, ncap):
    return jax.ops.segment_sum(data, cid, num_segments=ncap, indices_are_sorted=True)


def _seg_max(data, cid, ncap):
    return jax.ops.segment_max(data, cid, num_segments=ncap, indices_are_sorted=True)


def smooth(ebwt: EbwtDevice, cfg: SmoothConfig) -> SmoothOut:
    bwt, qs, lcp, n = ebwt.bwt, ebwt.qs, ebwt.lcp, ebwt.n
    n_pad = bwt.shape[0]
    pos = jnp.arange(n_pad, dtype=jnp.int32)
    valid = pos < n

    # ---- bitvectors (bfq_int.cpp:183-300 via the LCP array) ----
    thr = (lcp >= cfg.k) & valid
    lcp_prev = jnp.concatenate([jnp.zeros((1,), lcp.dtype), lcp[:-1]])
    lcp_next = jnp.concatenate([lcp[1:], jnp.zeros((1,), lcp.dtype)])
    minima = (lcp < lcp_prev) & (lcp_next >= lcp) & (pos >= 1) & (pos <= n - 2)
    pred = thr & ~minima

    # ---- maximal runs -> clusters [run_start-1, run_end] ----
    pred_next = jnp.concatenate([pred[1:], jnp.zeros((1,), bool)])
    open_mark = ~pred & pred_next  # position run_start-1 opens the cluster
    in_cluster = pred | open_mark
    cid_all = jnp.cumsum(open_mark.astype(jnp.int32), dtype=jnp.int32) - 1  # valid where in_cluster

    ncap = n_pad // 2 + 2
    dump = ncap - 1
    cid = jnp.where(in_cluster, cid_all, dump)

    c_start = jnp.zeros((ncap,), jnp.int32).at[jnp.where(open_mark, cid_all, dump)].set(pos)
    close_mark = pred & ~pred_next
    c_end = jnp.zeros((ncap,), jnp.int32).at[jnp.where(close_mark, cid_all, dump)].set(pos)
    c_size = c_end - c_start + 1
    c_active = c_size >= cfg.min_cluster  # bfq_int.cpp:422

    nonterm = in_cluster & (bwt != alphabet.TERM) & (bwt != jnp.uint8(alphabet.SIGMA))
    qt = cfg.quality_threshold + 33

    # ---- per-cluster symbol stats ----
    freq = []
    high = []  # "lowQS" flag of the reference: 1 iff some occurrence has QS >= qt
    for code in _ORD_CODES:
        is_c = nonterm & (bwt == code)
        freq.append(_seg_sum(is_c.astype(jnp.int32), cid, ncap))
        high.append(_seg_max(jnp.where(is_c & (qs >= qt), 1, 0).astype(jnp.int32), cid, ncap))
    c_freq = jnp.stack(freq, axis=1)  # [ncap, 5] in ord order
    c_high = jnp.stack(high, axis=1)
    c_basenum = jnp.sum(c_freq, axis=1, dtype=jnp.int32)
    safe_basenum = jnp.maximum(c_basenum, 1)

    # ---- replacement quality newqs (bfq_int.cpp:307-373,462-473) ----
    if cfg.mode == 2:
        c_newqs = jnp.full((ncap,), cfg.default_qs, jnp.int32)
    elif cfg.mode == 0:
        c_newqs = _seg_max(jnp.where(nonterm, qs.astype(jnp.int32), 0), cid, ncap)
    elif cfg.mode == 3:
        c_qsum = _seg_sum(jnp.where(nonterm, qs.astype(jnp.int32), 0), cid, ncap)
        c_newqs = c_qsum // safe_basenum
    else:  # mode 1: mean error
        # The reference computes this in C double (bfq_int.cpp:357-373); use
        # f64 when x64 is enabled (tests/CLI do) so half-boundary clusters
        # round identically.  The f32 fallback can differ by +-1 on
        # adversarially close half-boundaries.
        ftype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
        err = jnp.where(nonterm, jnp.power(ftype(10.0), -(qs.astype(ftype) - 33.0) / 10.0), ftype(0.0))
        c_esum = _seg_sum(err, cid, ncap)
        avg = c_esum / safe_basenum.astype(ftype)
        # C round(): half away from zero (the argument is always positive here)
        c_newqs = jnp.floor(-10.0 * jnp.log10(jnp.maximum(avg, ftype(1e-300 if ftype == jnp.float64 else 1e-30))) + 0.5).astype(jnp.int32) + 33

    # ---- frequent symbols (integer percentage, bfq_int.cpp:487-497) ----
    c_perc = (100 * c_freq) // safe_basenum[:, None]
    c_isfreq = (c_perc >= cfg.freq_threshold) & (c_freq > 0)
    c_nfreq = jnp.sum(c_isfreq.astype(jnp.int32), axis=1, dtype=jnp.int32)
    ord_idx = jnp.arange(5, dtype=jnp.int32)[None, :]
    # first/second frequent symbol in ord order A,C,G,T,N
    c_f0 = jnp.min(jnp.where(c_isfreq, ord_idx, 5), axis=1)
    c_f1 = jnp.max(jnp.where(c_isfreq, ord_idx, -1), axis=1)
    codes_arr = jnp.array(_ORD_CODES + (0,), jnp.uint8)  # index 5 -> harmless 0
    c_f0_code = codes_arr[c_f0]
    c_f1_code = codes_arr[jnp.maximum(c_f1, 0)]

    c_has_bases = c_active & (c_basenum > 0)

    # single-symbol smoothing applies when:
    #   nf==1 and symbol != N                    (bfq_int.cpp:512-519)
    #   nf==2, base_num >= m, one of them is N   (bfq_int.cpp:528-537)
    c_single1 = c_has_bases & (c_nfreq == 1) & (c_f0 != _N_ORD)
    c_single2 = c_has_bases & (c_nfreq == 2) & (c_basenum >= cfg.min_cluster) & (c_f1 == _N_ORD)
    c_single = c_single1 | c_single2
    c_two = c_has_bases & (c_nfreq == 2) & (c_basenum >= cfg.min_cluster) & (c_f1 != _N_ORD)
    c_ssym = c_f0_code  # for both single cases FreqSymb[0] is the non-N symbol

    # ---- two-frequent-symbol rule: unique distinct predecessors ----
    lf = lf_array(bwt, valid)
    pre = bwt[lf]  # symbol preceding each BWT position (one global gather)

    cl_f0 = c_f0_code[cid]
    cl_f1 = c_f1_code[cid]
    u = []
    for t, cl_f in ((0, cl_f0), (1, cl_f1)):
        masks = []
        for d in (alphabet.A, alphabet.C, alphabet.G, alphabet.T):
            m_ = nonterm & (bwt == cl_f) & (pre == d)
            masks.append(_seg_max(m_.astype(jnp.int32), cid, ncap))
        u.append(jnp.stack(masks, axis=1))  # [ncap, 4]
    pred_codes = jnp.array((alphabet.A, alphabet.C, alphabet.G, alphabet.T, 0), jnp.uint8)
    c_u0sum = jnp.sum(u[0], axis=1, dtype=jnp.int32)
    c_u1sum = jnp.sum(u[1], axis=1, dtype=jnp.int32)
    # with u*sum==1 the single set bit IS the unique predecessor
    c_p0 = pred_codes[jnp.min(jnp.where(u[0] > 0, jnp.arange(4, dtype=jnp.int32)[None, :], 4), axis=1).astype(jnp.int32)]
    c_p1 = pred_codes[jnp.min(jnp.where(u[1] > 0, jnp.arange(4, dtype=jnp.int32)[None, :], 4), axis=1).astype(jnp.int32)]
    c_p0 = jnp.where(c_u0sum == 1, c_p0, jnp.uint8(0))
    c_p1 = jnp.where(c_u1sum == 1, c_p1, jnp.uint8(0))
    c_two_ok = c_two & (c_u0sum == 1) & (c_u1sum == 1) & (c_p0 != c_p1)

    # ---- apply per-position updates ----
    cl_single = c_single[cid]
    cl_two_ok = c_two_ok[cid]
    cl_ssym = c_ssym[cid]
    cl_newqs = c_newqs[cid].astype(jnp.uint8)
    cl_p0 = c_p0[cid]
    cl_p1 = c_p1[cid]
    # trusted flag of this position's own symbol (lowQS[ord(bwt[j])])
    cl_high_own = jnp.zeros((n_pad,), jnp.int32)
    for o, code in enumerate(_ORD_CODES):
        cl_high_own = jnp.where(bwt == code, c_high[:, o][cid], cl_high_own)

    # single-symbol case (modBasesSmoothQS, bfq_int.cpp:376-405)
    s_act = nonterm & cl_single
    s_replace = s_act & (bwt != cl_ssym) & (cl_high_own == 0)
    s_qs_const = s_act & (bwt == cl_ssym)
    s_qs_min = s_act & (bwt != cl_ssym) & (cl_high_own == 1) & (cl_newqs < qs)

    # two-frequent case (bfq_int.cpp:568-611)
    t_act = nonterm & cl_two_ok
    t_isf = (bwt == cl_f0) | (bwt == cl_f1)
    t_candidate = t_act & ~t_isf & (cl_high_own == 0)
    t_rep0 = t_candidate & (pre == cl_p0)
    t_rep1 = t_candidate & (pre == cl_p1) & ~t_rep0
    t_qs_const = t_act & t_isf
    t_qs_min = t_act & ~t_isf & ~(cl_high_own == 0) & (cl_newqs < qs)

    bwt_sub = jnp.where(s_replace, cl_ssym, bwt)
    bwt_sub = jnp.where(t_rep0, cl_f0, bwt_sub)
    bwt_sub = jnp.where(t_rep1, cl_f1, bwt_sub)
    qs_out = jnp.where(s_qs_const | s_qs_min | t_qs_const | t_qs_min, cl_newqs, qs)

    # ---- counters (bfq_int.cpp:53-65,1004-1020) ----
    c_nnn = jnp.sum((c_freq > 0).astype(jnp.int32), axis=1, dtype=jnp.int32)
    c_disc = c_has_bases & (
        (c_nfreq == 0)
        | ((c_nfreq == 1) & (c_f0 == _N_ORD))
        | ((c_nfreq == 2) & (c_basenum < cfg.min_cluster))
    )
    real = jnp.arange(ncap, dtype=jnp.int32) < (jnp.max(cid_all) + 1)
    real = real & (jnp.arange(ncap, dtype=jnp.int32) != dump)

    def ccount(mask):
        return jnp.sum((mask & real & c_active).astype(jnp.int32))

    stats = {
        "num_clust": ccount(jnp.ones((ncap,), bool)),
        "num_clust_discarded": ccount(c_disc),
        "num_clust_amb_discarded": ccount(c_two & ~c_two_ok),
        "num_clust_mod": ccount(c_single2 | c_two_ok),
        "num_clust_alleq": ccount(c_has_bases & (c_nnn == 1)),
        "bases_inside": jnp.sum(jnp.where(c_active & real, c_basenum, 0)).astype(jnp.int32),
        "modified": jnp.sum((s_replace | t_rep0 | t_rep1).astype(jnp.int32)),
        "qs_smoothed": jnp.sum((s_qs_const | s_qs_min | t_qs_const | t_qs_min).astype(jnp.int32)),
    }
    return SmoothOut(bwt_sub=bwt_sub, qs=qs_out, stats=stats)
