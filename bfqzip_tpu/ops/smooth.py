"""Positional clustering + noise reduction + quality smoothing, vectorised.

Replaces the sequential cluster scan and per-cluster loops of the reference
(bfq_int.cpp:376-737) with interval reductions over the whole EBWT.  The
kernel-level design targets TPU execution cost = (few fused passes) rather
than a literal translation:

  * LCP_threshold / LCP_minima are elementwise predicates on the explicit LCP
    array (the LCP-array form of the suffix-tree traversal, see
    ref_golden.lcp_bitvectors for the equivalence argument);
  * clusters are maximal runs of (threshold & ~minima) extended one position
    left (border=1, bfq_int.cpp:67,416-417).  Runs shorter than
    min_cluster-1 are filtered out before numbering — the reference discards
    them before touching any counter (bfq_int.cpp:422), and filtering bounds
    the cluster count by n/min_cluster, shrinking every per-cluster array;
  * ALL per-cluster sums ride ONE cumulative-sum over a masked [n, C] channel
    matrix, sampled by a single row-gather at cluster ends (channels are
    masked to cluster members, so prefix sums are constant between clusters
    and consecutive end-samples difference to per-cluster sums);
  * per-cluster decisions are packed into one 30-bit word so a single gather
    word[cid] drives every per-position update;
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
# code -> ord (TERM/PAD -> 0, harmless under masks)
_CODE2ORD = (0, 0, 1, 2, 4, 3, 0, 0)

# decision-word bit layout
_B_SINGLE = 0
_B_TWO = 1
_B_SSYM = 2  # 3 bits
_B_F0 = 5  # 3 bits
_B_F1 = 8  # 3 bits
_B_P0 = 11  # 3 bits
_B_P1 = 14  # 3 bits
_B_NEWQS = 17  # 8 bits
_B_HIGH = 25  # 5 bits, ord order


class SmoothOut(NamedTuple):
    bwt_sub: jax.Array  # [n_pad] u8, base-corrected BWT
    qs: jax.Array  # [n_pad] u8, smoothed qualities
    stats: dict  # reference counters, scalar i32


def smooth(ebwt: EbwtDevice, cfg: SmoothConfig, pre=None) -> SmoothOut:
    bwt, qs, lcp, n = ebwt.bwt, ebwt.qs, ebwt.lcp, ebwt.n
    n_pad = bwt.shape[0]
    pos = jnp.arange(n_pad, dtype=jnp.int32)
    valid = pos < n
    m = cfg.min_cluster

    # ---- bitvectors (bfq_int.cpp:183-300 via the LCP array) ----
    thr = (lcp >= cfg.k) & valid
    lcp_prev = jnp.concatenate([jnp.zeros((1,), lcp.dtype), lcp[:-1]])
    lcp_next = jnp.concatenate([lcp[1:], jnp.zeros((1,), lcp.dtype)])
    minima = (lcp < lcp_prev) & (lcp_next >= lcp) & (pos >= 1) & (pos <= n - 2)
    pred = thr & ~minima

    # ---- eligible runs -> clusters [run_start-1, run_end] ----
    pred_prev = jnp.concatenate([jnp.zeros((1,), bool), pred[:-1]])
    pred_next = jnp.concatenate([pred[1:], jnp.zeros((1,), bool)])
    rs_mark = pred & ~pred_prev
    # run has length >= m-1 iff pred holds at its first m-1 positions
    ext = pred
    for t in range(1, max(m - 1, 1)):
        ext = ext & jnp.concatenate([pred[t:], jnp.zeros((t,), bool)])
    elig_start = rs_mark & ext
    # propagate eligibility across each run (cummax of start positions)
    run_start = jax.lax.cummax(jnp.where(elig_start, pos, -1))
    in_run_elig = pred & (run_start >= 0) & (run_start <= pos)
    # ... but run_start could point at an older eligible run across a gap;
    # cut at the most recent run boundary:
    last_gap = jax.lax.cummax(jnp.where(~pred, pos, -1))
    in_run_elig = in_run_elig & (run_start > last_gap)

    open_mark = ~pred & jnp.concatenate([in_run_elig[1:], jnp.zeros((1,), bool)])
    in_cluster = in_run_elig | open_mark
    cid_all = jnp.cumsum(open_mark.astype(jnp.int32), dtype=jnp.int32) - 1

    ncap = n_pad // max(m, 2) + 2
    dump = ncap - 1
    cid = jnp.where(in_cluster, cid_all, dump)
    close_mark = in_run_elig & ~pred_next
    c_end = jnp.zeros((ncap,), jnp.int32).at[jnp.where(close_mark, cid_all, dump)].set(pos)

    nonterm_pos = (bwt != alphabet.TERM) & (bwt != jnp.uint8(alphabet.SIGMA))
    qt = cfg.quality_threshold + 33

    # ---- one fused channel matrix, one cumsum, one end-sample row-gather ----
    if pre is None:
        # symbol preceding each BWT position: bwt[LF[j]] (bfq_int.cpp:547)
        lf = lf_array(bwt, valid)
        pre = bwt[lf]

    chans = []  # list of [n_pad] i32, masked to cluster members
    mask_i = in_cluster.astype(jnp.int32)
    for code in _ORD_CODES:
        chans.append((bwt == code).astype(jnp.int32) * mask_i)  # freq, 5
    for code in _ORD_CODES:
        chans.append(((bwt == code) & (qs >= qt)).astype(jnp.int32) * mask_i)  # high, 5
    # predecessor-presence channels for the SNP rule: (symbol s, predecessor d)
    for s in (alphabet.A, alphabet.C, alphabet.G, alphabet.T):
        for d in (alphabet.A, alphabet.C, alphabet.G, alphabet.T):
            chans.append(((bwt == s) & (pre == d)).astype(jnp.int32) * mask_i)  # 16
    if cfg.mode == 3:
        chans.append(jnp.where(nonterm_pos, qs.astype(jnp.int32), 0) * mask_i)
    X = jnp.stack(chans, axis=1)  # [n_pad, C]
    inc = jnp.cumsum(X, axis=0, dtype=jnp.int32)
    G = inc[c_end]  # [ncap, C]; garbage rows masked later
    S = G - jnp.concatenate([jnp.zeros((1, G.shape[1]), jnp.int32), G[:-1]], axis=0)

    c_freq = S[:, 0:5]
    c_high = (S[:, 5:10] > 0).astype(jnp.int32)
    c_uall = (S[:, 10:26].reshape(ncap, 4, 4) > 0).astype(jnp.int32)  # [ncap, s, d]
    c_basenum = jnp.sum(c_freq, axis=1, dtype=jnp.int32)
    safe_basenum = jnp.maximum(c_basenum, 1)

    # every numbered cluster has size >= m by construction (runs shorter than
    # m-1 are filtered before numbering), so the reference's size check at
    # bfq_int.cpp:422 is a tautology here — no c_start/c_size materialisation

    # ---- replacement quality newqs (bfq_int.cpp:307-373,462-473) ----
    if cfg.mode == 2:
        c_newqs = jnp.full((ncap,), cfg.default_qs, jnp.int32)
    elif cfg.mode == 0:
        # interval max is not prefix-decomposable; one segment_max only here
        c_newqs = jax.ops.segment_max(
            jnp.where(in_cluster & nonterm_pos, qs.astype(jnp.int32), 0),
            cid,
            num_segments=ncap,
            indices_are_sorted=True,
        )
    elif cfg.mode == 3:
        c_newqs = S[:, 26] // safe_basenum
    else:  # mode 1: mean error in the reference's double precision when x64
        # is on (tests/CLI); f32 fallback can differ +-1 on half-boundaries.
        ftype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
        err = jnp.where(nonterm_pos & in_cluster, jnp.power(ftype(10.0), -(qs.astype(ftype) - 33.0) / 10.0), ftype(0.0))
        einc = jnp.cumsum(err)
        eG = einc[c_end]
        c_esum = eG - jnp.concatenate([jnp.zeros((1,), ftype), eG[:-1]])
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
    codes_arr = jnp.array(_ORD_CODES + (0,), jnp.int32)  # index 5 -> harmless 0
    c_f0_code = codes_arr[c_f0]
    c_f1_code = codes_arr[jnp.maximum(c_f1, 0)]

    c_has_bases = c_basenum > 0

    # single-symbol smoothing applies when:
    #   nf==1 and symbol != N                    (bfq_int.cpp:512-519)
    #   nf==2, base_num >= m, one of them is N   (bfq_int.cpp:528-537)
    c_single1 = c_has_bases & (c_nfreq == 1) & (c_f0 != _N_ORD)
    c_single2 = c_has_bases & (c_nfreq == 2) & (c_basenum >= m) & (c_f1 == _N_ORD)
    c_single = c_single1 | c_single2
    c_two = c_has_bases & (c_nfreq == 2) & (c_basenum >= m) & (c_f1 != _N_ORD)

    # ---- two-frequent-symbol rule: unique distinct predecessors ----
    # select the predecessor-presence rows of the two frequent symbols
    # (codes A=1,C=2,G=3,T=5 -> row 0..3; N/none only occur under masks)
    code2sidx = jnp.array((0, 0, 1, 2, 0, 3, 0, 0), jnp.int32)
    s0 = code2sidx[c_f0_code]
    s1 = code2sidx[c_f1_code]
    u0 = jnp.take_along_axis(c_uall, s0[:, None, None], axis=1)[:, 0, :]  # [ncap, 4]
    u1 = jnp.take_along_axis(c_uall, s1[:, None, None], axis=1)[:, 0, :]
    pred_codes = jnp.array((alphabet.A, alphabet.C, alphabet.G, alphabet.T, 0), jnp.int32)
    c_u0sum = jnp.sum(u0, axis=1, dtype=jnp.int32)
    c_u1sum = jnp.sum(u1, axis=1, dtype=jnp.int32)
    didx = jnp.arange(4, dtype=jnp.int32)[None, :]
    c_p0 = pred_codes[jnp.min(jnp.where(u0 > 0, didx, 4), axis=1)]
    c_p1 = pred_codes[jnp.min(jnp.where(u1 > 0, didx, 4), axis=1)]
    c_p0 = jnp.where(c_u0sum == 1, c_p0, 0)
    c_p1 = jnp.where(c_u1sum == 1, c_p1, 0)
    c_two_ok = c_two & (c_u0sum == 1) & (c_u1sum == 1) & (c_p0 != c_p1)

    # ---- pack per-cluster decisions into one word; one gather ----
    high_bits = jnp.zeros((ncap,), jnp.int32)
    for o in range(5):
        high_bits = high_bits | (c_high[:, o] << (_B_HIGH + o))
    word = (
        c_single.astype(jnp.int32) << _B_SINGLE
        | c_two_ok.astype(jnp.int32) << _B_TWO
        | c_f0_code << _B_SSYM  # ssym == FreqSymb[0] for both single cases
        | c_f0_code << _B_F0
        | c_f1_code << _B_F1
        | c_p0 << _B_P0
        | c_p1 << _B_P1
        | jnp.clip(c_newqs, 0, 255) << _B_NEWQS
        | high_bits
    )
    w = word[cid]  # [n_pad]

    apply_mask = in_cluster & nonterm_pos
    cl_single = ((w >> _B_SINGLE) & 1) == 1
    cl_two_ok = ((w >> _B_TWO) & 1) == 1
    cl_ssym = ((w >> _B_SSYM) & 7).astype(jnp.uint8)
    cl_f0 = ((w >> _B_F0) & 7).astype(jnp.uint8)
    cl_f1 = ((w >> _B_F1) & 7).astype(jnp.uint8)
    cl_p0 = ((w >> _B_P0) & 7).astype(jnp.uint8)
    cl_p1 = ((w >> _B_P1) & 7).astype(jnp.uint8)
    cl_newqs = ((w >> _B_NEWQS) & 0xFF).astype(jnp.uint8)
    ord_of = jnp.array(_CODE2ORD, jnp.int32)[bwt.astype(jnp.int32)]
    cl_high_own = (w >> (_B_HIGH + ord_of)) & 1

    # single-symbol case (modBasesSmoothQS, bfq_int.cpp:376-405)
    s_act = apply_mask & cl_single
    s_replace = s_act & (bwt != cl_ssym) & (cl_high_own == 0)
    s_qs_const = s_act & (bwt == cl_ssym)
    s_qs_min = s_act & (bwt != cl_ssym) & (cl_high_own == 1) & (cl_newqs < qs)

    # two-frequent case (bfq_int.cpp:568-611)
    t_act = apply_mask & cl_two_ok
    t_isf = (bwt == cl_f0) | (bwt == cl_f1)
    t_candidate = t_act & ~t_isf & (cl_high_own == 0)
    t_rep0 = t_candidate & (pre == cl_p0)
    t_rep1 = t_candidate & (pre == cl_p1) & ~t_rep0
    t_qs_const = t_act & t_isf
    t_qs_min = t_act & ~t_isf & (cl_high_own == 1) & (cl_newqs < qs)

    bwt_sub = jnp.where(s_replace, cl_ssym, bwt)
    bwt_sub = jnp.where(t_rep0, cl_f0, bwt_sub)
    bwt_sub = jnp.where(t_rep1, cl_f1, bwt_sub)
    qs_out = jnp.where(s_qs_const | s_qs_min | t_qs_const | t_qs_min, cl_newqs, qs)

    # ---- counters (bfq_int.cpp:53-65,1004-1020) ----
    c_nnn = jnp.sum((c_freq > 0).astype(jnp.int32), axis=1, dtype=jnp.int32)
    c_disc = c_has_bases & (
        (c_nfreq == 0)
        | ((c_nfreq == 1) & (c_f0 == _N_ORD))
        | ((c_nfreq == 2) & (c_basenum < m))
    )
    real = jnp.arange(ncap, dtype=jnp.int32) < (jnp.max(cid_all) + 1)
    real = real & (jnp.arange(ncap, dtype=jnp.int32) != dump)

    def ccount(mask):
        return jnp.sum((mask & real).astype(jnp.int32))

    stats = {
        "num_clust": ccount(jnp.ones((ncap,), bool)),
        "num_clust_discarded": ccount(c_disc),
        "num_clust_amb_discarded": ccount(c_two & ~c_two_ok),
        "num_clust_mod": ccount(c_single2 | c_two_ok),
        "num_clust_alleq": ccount(c_has_bases & (c_nnn == 1)),
        "bases_inside": jnp.sum(jnp.where(real, c_basenum, 0)).astype(jnp.int32),
        "modified": jnp.sum((s_replace | t_rep0 | t_rep1).astype(jnp.int32)),
        "qs_smoothed": jnp.sum((s_qs_const | s_qs_min | t_qs_const | t_qs_min).astype(jnp.int32)),
    }
    return SmoothOut(bwt_sub=bwt_sub, qs=qs_out, stats=stats)
