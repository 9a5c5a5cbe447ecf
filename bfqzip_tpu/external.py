"""Out-of-core (external-memory) pipeline: datasets larger than device HBM.

The reference's external-memory engine streams pile-partitioned BWT files and
an explicit 1-byte LCP from disk (src_ext_mem/bfq_ext.cpp:190-412), built by
eGap under a --mem budget (BFQzip_ext.py:172-177).  The TPU-native analog
keeps the DEVICE footprint bounded by a memory budget and the full arrays in
host RAM:

  1. chunked stage 1: each read chunk's suffixes are sorted on the device
     (ops/suffix.build_ebwt, bounded by the budget); only the chunk's suffix
     positions come back to the host;
  2. the chunk orders are interleaved by the native k-way loser-tree merge
     (native/extmerge.cpp) which walks the text directly — emitting BWT, the
     quality permutation, 1-byte LCP (the eGap --lbytes 1 convention), the
     smoothing predecessor and SA, all as host u8/i32 arrays;
  3. STREAMING cluster smoothing: ops/smooth.cluster_words runs per device
     segment through SeqChunkOps — every left-to-right scan op carries one
     boundary summary between segments (the sequential-chunk analog of
     parallel/dist_scan.DistScanOps), right-dependencies read a small
     lookahead halo, and the one long-range right-to-left op (the decision
     word broadcast) is resolved IN the forward pass for every cluster that
     closes within the segment+halo window; only positions whose cluster
     extends past the halo ("pending", a bounded tail of each segment) are
     re-applied afterwards by a tiny fixed-size fix-up call once the later
     segments have produced the closing decision word.  This keeps the whole
     per-position output down-transfer at one u16 per position (measured on
     the 1.02G-position round-3 run, phase B's full-segment re-uploads were
     ~780s of tunnel time — the fix-up scheme removes them);
  4. inversion is the host-side permutation scatter grid[(SA-1) mod n_pad]
     (the invert_via_sa argument, ops/invert.py:50-58), done per segment in
     the forward pass.

Byte-equality with the in-core engine holds whenever every read is shorter
than 255 bp (the 1-byte LCP cap only saturates beyond that; the reference
shares the cap, src_ext_mem/parameters.h:66-74 — and this path has no
255 bp READ-length limit, only LCP saturation above it).
"""

from __future__ import annotations

import functools
import logging
import os
import time
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

_LOG = logging.getLogger("bfqzip.external")

from bfqzip_tpu import alphabet
from bfqzip_tpu.config import SmoothConfig
from bfqzip_tpu.io.fastq import ReadBatch
from bfqzip_tpu.ops.invert import illumina_bin_jax
from bfqzip_tpu.ops.smooth import apply_words, cluster_words
from bfqzip_tpu.ops.suffix import build_ebwt
from bfqzip_tpu.utils import native

# rough device bytes per position for the stage-1 sort (13 i32 operands plus
# XLA temporaries) and for one smoothing segment's intermediates
_BUILD_BYTES_PER_POS = 160
_SMOOTH_BYTES_PER_POS = 120


class SeqChunkOps:
    """ops/scan.LocalScanOps interface for ONE segment of a longer array.

    Arrays passed in are [seg_len + halo] (halo = right lookahead, garbage in
    the output tail is discarded by the caller).  Left-to-right ops consume a
    carry recorded by the SAME call (by order) on the previous segment and
    record the value at the true boundary seg_len-1 for the next one.
    """

    def __init__(self, base: int, seg_len: int, carries_in):
        self.base = base
        self.seg_len = seg_len
        self.carries_in = carries_in  # list (may be None on first segment)
        self.carries_out = []
        self._i = 0

    def _carry(self, default):
        i = self._i
        self._i += 1
        if self.carries_in is None:
            return default, i
        return self.carries_in[i], i

    def _record(self, value):
        self.carries_out.append(value)

    # -- interface ---------------------------------------------------------
    def iota(self, n: int) -> jax.Array:
        return self.base + jnp.arange(n, dtype=jnp.int32)

    def shift_prev(self, x, fill):
        carry, _ = self._carry(jnp.asarray(fill, x.dtype))
        self._record(x[self.seg_len - 1])
        return jnp.concatenate([carry[None].astype(x.dtype), x[:-1]])

    def shift_next(self, x, fill):
        return jnp.concatenate([x[1:], jnp.full((1,), fill, x.dtype)])

    def shift_next_k(self, x, k: int, fill):
        return jnp.concatenate([x[k:], jnp.full((k,), fill, x.dtype)])

    def cummax(self, x):
        lo = jnp.iinfo(x.dtype).min if jnp.issubdtype(x.dtype, jnp.integer) else -jnp.inf
        carry, _ = self._carry(jnp.asarray(lo, x.dtype))
        out = jnp.maximum(jax.lax.cummax(x), carry)
        self._record(out[self.seg_len - 1])
        return out

    def seg_scan(self, x, flag, combine, init):
        from bfqzip_tpu.ops.scan import _seg_scan

        local = _seg_scan(x, flag, combine, init)
        carry, _ = self._carry(jnp.full(local[..., 0].shape, init, x.dtype))
        seen = jnp.cumsum(flag.astype(jnp.int32)) > 0
        carried = combine(carry[..., None] if x.ndim == 2 else carry, local)
        out = jnp.where(seen, local, carried)
        self._record(out[..., self.seg_len - 1])
        return out

    def seg_cumsum(self, x, reset):
        return self.seg_scan(x, reset, jnp.add, 0)

    def seg_cummax(self, x, reset):
        return self.seg_scan(x, reset, jnp.maximum, 0)

    def seg_cumor(self, x, reset):
        return self.seg_scan(x, reset, jnp.bitwise_or, 0)

    def next_marked(self, x, mark, init=0):
        raise NotImplementedError(
            "right-to-left broadcast is the phase-B reverse sweep, not an op"
        )

    def sum(self, x):
        return jnp.sum(x[: self.seg_len])


def _part1_segment(bwtpre, qs, lcp, base, n, carries, cfg: SmoothConfig,
                   seg_len: int, fix_cap: int):
    """cluster_words + apply on one [seg_len + halo] window, forward pass.

    bwtpre packs the 3-bit BWT symbol (codes 0..5, pad 6) and the 3-bit
    smoothing predecessor into one byte (bwt | pre << 3) — host->device
    uploads dominate this stage's wall on thin links, and the pack cuts
    them from 4 to 3 bytes per position.

    The decision-word broadcast (next close's word, leftward) is resolved
    over the FULL window including the halo, so a cluster closing within
    `halo` of the boundary needs no cross-segment information.  Positions
    whose cluster extends past the window ("pending") are applied with
    word 0 — a no-op by construction (apply_words gates every action on the
    decision bits) — and re-applied later by _fix_tail with the true carry.
    Returns the packed u16 output, stats, scan carries, the (first-close
    word, any-close) summary, this segment's modified/smoothed counts, the
    fix-cap tail slices for the fix-up, and the full word/close/in-cluster
    arrays (fetched by the host ONLY for the rare fallback segment whose
    pending region exceeds fix_cap — a cluster spanning almost the whole
    segment)."""
    from bfqzip_tpu.ops.scan import next_marked

    bwt = bwtpre & jnp.uint8(7)
    pre = bwtpre >> jnp.uint8(3)
    ops = SeqChunkOps(int(base) if isinstance(base, int) else base, seg_len, carries)
    word, close_mark, in_cluster, stats = cluster_words(
        bwt, qs, lcp.astype(jnp.int32), n, cfg, pre, ops
    )
    cm = close_mark[:seg_len]
    idx = jnp.argmax(cm)  # first close (0 if none)
    any_close = jnp.any(cm)
    first_word = jnp.where(any_close, word[idx], 0)

    # leftward broadcast over the whole window: halo closes resolve clusters
    # that span the segment boundary by < halo.  A cluster spanning the
    # WINDOW end produces a spurious close at the last window position
    # (shift_next fills False past the edge) whose decision word holds only
    # partial cluster counts — mask it unless the data truly ends inside
    # this window; masked positions degrade to pending and are re-applied
    # with the true carry word.  (Closes elsewhere in the halo are exact:
    # every segmented scan is carried left-to-right, and edge effects in the
    # eligibility lookahead can only MISS a close, which is also safe.)
    win_len = bwt.shape[0]
    at_end = (ops.base + jnp.int32(win_len)) >= n
    cm_w = close_mark.at[-1].set(close_mark[-1] & at_end)
    w_ext = next_marked(jnp.where(cm_w, word, 0), cm_w, init=0)
    seen = jnp.cumsum(cm_w[::-1].astype(jnp.int32))[::-1] > 0
    w_use = jnp.where(seen, w_ext, 0)[:seg_len]

    bwt_t, qs_t, pre_t = bwt[:seg_len], qs[:seg_len], pre[:seg_len]
    inclu_t = in_cluster[:seg_len]
    bwt_sub, qs_out, modified, smoothed = apply_words(
        bwt_t, qs_t, pre_t, w_use, inclu_t, cfg
    )
    if cfg.binning:
        qs_out = illumina_bin_jax(qs_out)
    pos = jnp.arange(seg_len, dtype=jnp.int32)
    valid = pos < (n - ops.base)
    is_char = (bwt_t != alphabet.TERM) & (bwt_t != jnp.uint8(alphabet.SIGMA)) & valid
    packed = jnp.where(
        is_char, (qs_out.astype(jnp.uint16) << 8) | bwt_sub.astype(jnp.uint16), 0
    ).astype(jnp.uint16)

    pending = inclu_t & ~seen[:seg_len] & valid
    any_pending = jnp.any(pending)
    fallback = jnp.any(pending & (pos < seg_len - fix_cap))
    tail = lambda x: x[seg_len - fix_cap : seg_len]  # noqa: E731
    mod_count = jnp.sum((modified & valid).astype(jnp.int32))
    smo_count = jnp.sum((smoothed & valid).astype(jnp.int32))
    return (packed, stats, ops.carries_out, first_word, any_close,
            mod_count, smo_count,
            tail(bwtpre[:seg_len]), tail(qs_t), tail(pending),
            any_pending, fallback,
            word, close_mark, in_cluster)


def _fix_tail(bp_t, qs_t, pending, right_carry, cfg: SmoothConfig):
    """Re-apply the pending tail positions with the true carry word.

    Inputs are [fix_cap] slices (bp_t = packed bwt|pre<<3); with word 0 the
    forward pass left these positions untouched, so the deltas returned
    here add directly."""
    bwt_t = bp_t & jnp.uint8(7)
    pre_t = bp_t >> jnp.uint8(3)
    w = jnp.full(bwt_t.shape, right_carry, jnp.int32)
    bwt_sub, qs_out, modified, smoothed = apply_words(bwt_t, qs_t, pre_t, w, pending, cfg)
    if cfg.binning:
        qs_out = illumina_bin_jax(qs_out)
    is_char = (bwt_t != alphabet.TERM) & (bwt_t != jnp.uint8(alphabet.SIGMA))
    packed = jnp.where(
        is_char, (qs_out.astype(jnp.uint16) << 8) | bwt_sub.astype(jnp.uint16), 0
    ).astype(jnp.uint16)
    return packed, jnp.sum(modified.astype(jnp.int32)), jnp.sum(smoothed.astype(jnp.int32))


def smooth_fastq_external(
    batch: ReadBatch,
    cfg: SmoothConfig | None = None,
    mem_bytes: int = 4 << 30,
    *,
    _seg_len: int | None = None,
    _reads_per_chunk: int | None = None,
    spill=None,
    out_path: str | None = None,
    report: dict | None = None,
) -> Tuple[ReadBatch, dict]:
    """Out-of-core engine.smooth_fastq: same output, bounded device memory —
    and, with spill active, bounded HOST memory: every O(n) host array lives
    in an np.memmap scratch directory (io/spill.py) with finished ranges
    evicted, the analog of the reference's pile/cyc files
    (src_ext_mem/bfq_ext.cpp:190-348, decode.cpp:409-496).

    spill: an io.spill.Spill, True (create one), False (force in-RAM), or
    None — auto: spill when the workload exceeds ~64M positions or
    BFQ_EXT_SPILL=1.  out_path additionally streams the smoothed FASTQ to
    disk slab-by-slab (headers '@', reference BCR convention for absent
    headers).  report (optional dict) receives per-stage wall seconds and
    peak-RSS watermarks for the at-scale record.

    The underscore knobs pin the chunk/segment sizes directly (tests force
    many tiny segments to exercise every carry path)."""
    import resource

    from bfqzip_tpu.io.spill import Spill
    from bfqzip_tpu.ops import pallas_scan

    pallas_scan.ensure_calibrated()  # auto Pallas/XLA pick; no-op mid-trace
    cfg = cfg or SmoothConfig()
    if not native.ext_merge_available():
        raise RuntimeError("external mode needs the native library (make -C native)")
    n_reads, width = batch.seqs.shape
    wp = width + 1
    n_pad = n_reads * wp

    env_spill = os.environ.get("BFQ_EXT_SPILL")
    if isinstance(spill, Spill):
        sp = spill
    elif spill is True:
        sp = Spill()
    elif spill is False or env_spill == "0":
        sp = None
    else:
        sp = Spill() if (n_pad >= (1 << 26) or env_spill == "1") else None

    if sp is not None:
        # a full scratch disk SIGBUSes the memmap writers mid-run — check
        # the projected footprint up front (~19 B/pos at the merge peak:
        # 2 text + 5 sa/lcp + 8 merge outputs + staging) and degrade to the
        # in-RAM host path with a warning instead
        import shutil as _shutil

        free = _shutil.disk_usage(sp.dir).free
        # measured peak footprint: input arrays (2 B/pos) + text/qtext (2)
        # + sa/lcp chunks (5/9) + merge outputs (8/12) + slack — the later
        # packed/output arrays allocate after text/sa/lcp drop; 64-bit
        # suffix positions (needed beyond 2^31 positions) add 8 B/pos
        need = n_pad * (27 if n_pad >= (1 << 31) else 19)
        if free < need:
            _LOG.warning(
                "spill dir %s has %.1f GB free but ~%.1f GB projected; "
                "falling back to in-RAM host arrays (set BFQ_SPILL_DIR to a "
                "larger volume to keep host memory bounded)",
                sp.dir, free / 1e9, need / 1e9,
            )
            if not isinstance(spill, Spill):
                sp.close()
            sp = None

    rep = report if report is not None else {}

    def mark(stage, t0):
        rep[f"{stage}_s"] = round(time.time() - t0, 2)
        rep[f"{stage}_peak_rss_gb"] = round(
            resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6, 2)

    # ---- stage 1: chunked device sorts + native host merge ----
    t_text = time.time()
    reads_per_chunk = _reads_per_chunk or max(int(mem_bytes / _BUILD_BYTES_PER_POS / wp), 1)
    if sp is not None:
        text = sp.alloc("text", (n_pad,), np.uint8)
        qtext = sp.alloc("qtext", (n_pad,), np.uint8)
        slab = max(min(reads_per_chunk, (64 << 20) // wp), 1)
        k = np.arange(wp)[None, :]
        for lo in range(0, n_reads, slab):
            hi = min(lo + slab, n_reads)
            seqs_s = np.asarray(batch.seqs[lo:hi])
            text[lo * wp : hi * wp] = np.where(
                k < np.asarray(batch.lengths[lo:hi])[:, None],
                np.pad(seqs_s, ((0, 0), (0, 1))).astype(np.uint8) + 1, 0,
            ).reshape(-1)
            qtext[lo * wp : hi * wp] = np.pad(
                np.asarray(batch.quals[lo:hi]), ((0, 0), (0, 1))).reshape(-1)
            Spill.evict(text, lo * wp, (hi - lo) * wp)
            Spill.evict(qtext, lo * wp, (hi - lo) * wp)
            Spill.evict(batch.seqs, lo * width, (hi - lo) * width)
            Spill.evict(batch.quals, lo * width, (hi - lo) * width)
    else:
        k = np.arange(wp)[None, :]
        text = np.where(
            k < batch.lengths[:, None],
            np.pad(batch.seqs, ((0, 0), (0, 1))).astype(np.uint8) + 1,
            0,
        ).reshape(-1)
        qtext = np.pad(batch.quals, ((0, 0), (0, 1))).reshape(-1)

    n_chunks = -(-n_reads // reads_per_chunk)
    _LOG.info("stage 1: %d reads in %d device chunks of <=%d%s",
              n_reads, n_chunks, reads_per_chunk,
              f" (spill: {sp.dir})" if sp is not None else "")
    # global suffix positions overflow int32 beyond 2^31 total positions
    # (~21M 101bp reads); the 64-bit merge path (ext_merge_mt3) takes over —
    # the reference's dataTypeNChar=ulong analog (parameters.h:86-96).
    # BFQ_EXT_SA64=1 forces it for testing.
    sa_dtype = (np.int64 if n_pad >= (1 << 31)
                or os.environ.get("BFQ_EXT_SA64") == "1" else np.int32)
    if sp is not None:
        sa_store = sp.alloc("sa_all", (n_pad,), sa_dtype)
        lcp_store = sp.alloc("lcp_all", (n_pad,), np.uint8)
    else:
        sa_store = np.empty(n_pad, sa_dtype)
        lcp_store = np.empty(n_pad, np.uint8)
    offs = [0]
    t0 = time.time()

    def drain(pend):
        """Force a dispatched chunk sort and write its results to the host."""
        dev, lo, hi, lcp_u8, ci = pend
        nloc = int(dev.n)
        base = offs[-1]
        sa_store[base : base + nloc] = (
            np.asarray(dev.sa)[:nloc].astype(np.int64) + lo * wp).astype(sa_dtype)
        # intra-chunk LCPs (255-capped, cast on device: 1 B/pos transfer)
        # feed the merge's LCP loser tree
        lcp_store[base : base + nloc] = np.asarray(lcp_u8)[:nloc]
        offs.append(base + nloc)
        if sp is not None:
            Spill.evict(sa_store, base * sa_store.itemsize, nloc * sa_store.itemsize)
            Spill.evict(lcp_store, base, nloc)
            # the input batch may itself be spill-backed (read_fastq_spill):
            # this chunk's rows are consumed, drop their pages too
            Spill.evict(batch.seqs, lo * width, (hi - lo) * width)
            Spill.evict(batch.quals, lo * width, (hi - lo) * width)
        _LOG.info("stage 1: chunk %d/%d done (%.1fs elapsed)",
                  ci + 1, n_chunks, time.time() - t0)

    # double-buffered dispatch: chunk k+1's upload + sort are enqueued
    # (async) BEFORE chunk k's results are downloaded, so the host packing
    # and memmap writes overlap the device work instead of serialising
    # after it; only the previous chunk's outputs are held on device (~12
    # B/pos extra, inside the budget's slack)
    pending = None
    for ci, lo in enumerate(range(0, n_reads, reads_per_chunk)):
        hi = min(lo + reads_per_chunk, n_reads)
        seqs_c = np.asarray(batch.seqs[lo:hi])
        quals_c = np.asarray(batch.quals[lo:hi])
        lens_c = np.asarray(batch.lengths[lo:hi])
        if hi - lo < reads_per_chunk and n_chunks > 1:
            # pad the remainder chunk to the compiled shape with length -1
            # dummy rows (no terminator, no suffixes — ops/suffix.py:156),
            # so ONE compiled sort kernel serves every chunk (the round-3
            # 10M run spent 431s recompiling for the last chunk)
            padn = reads_per_chunk - (hi - lo)
            seqs_c = np.concatenate([seqs_c, np.zeros((padn, width), seqs_c.dtype)])
            quals_c = np.concatenate([quals_c, np.zeros((padn, width), quals_c.dtype)])
            lens_c = np.concatenate([lens_c, np.full(padn, -1, lens_c.dtype)])
        dev = build_ebwt(jnp.asarray(seqs_c), jnp.asarray(quals_c), jnp.asarray(lens_c))
        lcp_u8 = jnp.minimum(dev.lcp, 255).astype(jnp.uint8)
        if pending is not None:
            drain(pending)
        pending = (dev, lo, hi, lcp_u8, ci)
        del dev, lcp_u8
    if pending is not None:
        drain(pending)
        pending = None
    n = offs[-1]
    rep["n_chunks"] = n_chunks
    mark("chunk_sorts", t_text)

    t_merge = time.time()
    offs_a = np.asarray(offs, np.int64)
    if sp is not None:
        bwt_h = sp.alloc("bwt", (n,), np.uint8)
        qs_h = sp.alloc("qs", (n,), np.uint8)
        lcp_h = sp.alloc("lcp", (n,), np.uint8)
        pre_h = sp.alloc("pre", (n,), np.uint8)
        sa_h = sp.alloc("sa", (n,), sa_dtype)
        # the merge streams k cursors through the inputs and writes the
        # outputs sequentially; a watcher thread keeps dropping finished
        # pages so the resident set stays at the active windows
        watcher = sp.watcher("text", "qtext", "sa_all", "lcp_all",
                             "bwt", "qs", "lcp", "pre", "sa")
        watcher.__enter__()
    else:
        bwt_h = np.empty(n, np.uint8)
        qs_h = np.empty(n, np.uint8)
        lcp_h = np.empty(n, np.uint8)
        pre_h = np.empty(n, np.uint8)
        sa_h = np.empty(n, sa_dtype)
        watcher = None

    # merge || smooth overlap: the host merge threads and the device
    # smoothing segments use disjoint resources, so stage 2 consumes the
    # merged PREFIX live (the merge workers publish per-range cursors and
    # only mark a range complete after fixing its successor's boundary LCP).
    # This is the genuinely-parallel counterpart of the single-chip stage
    # overlap that measured ~0 (tools/exp_overlap.py: one XLA program at a
    # time); here the merge wall hides behind the smoothing wall (or vice
    # versa).  BFQ_EXT_OVERLAP=0 restores the serial stages.
    overlap = (os.environ.get("BFQ_EXT_OVERLAP", "1") != "0"
               and native.ext_merge_async_available())
    merge_state = {"done": False}

    def finish_merge():
        if merge_state["done"]:
            return
        merge_state["done"] = True
        nonlocal text, qtext, sa_store, lcp_store
        if watcher is not None:
            watcher.__exit__(None, None, None)
            sp.evict_all("bwt", "qs", "lcp", "pre", "sa")
        text = qtext = sa_store = lcp_store = None
        if sp is not None:
            sp.drop("text"); sp.drop("qtext"); sp.drop("sa_all"); sp.drop("lcp_all")
        _LOG.info("stage 1: native k-way merge done (%.1fs)", time.time() - t_merge)
        mark("merge", t_merge)

    if overlap:
        merge_handle = native.ext_merge_async(
            text, qtext, (sa_store[:n], offs_a), lcp_chunks=lcp_store[:n],
            out=(bwt_h, qs_h, lcp_h, pre_h, sa_h))
        rep["overlap"] = True
    else:
        merge_handle = None
        try:
            native.ext_merge(text, qtext, (sa_store[:n], offs_a),
                             lcp_chunks=lcp_store[:n],
                             out=(bwt_h, qs_h, lcp_h, pre_h, sa_h))
        finally:
            finish_merge()

    # ---- stage 2: streaming cluster smoothing (forward pass applies) ----
    seg_len = _seg_len or max(int(mem_bytes / _SMOOTH_BYTES_PER_POS), 1 << 16)
    # right lookahead: close_mark/open_mark at seg_len-1 reach pred at
    # seg_len+m-2 which reads lcp at seg_len+m-1
    halo = cfg.min_cluster + 4
    n_seg = -(-n // seg_len)
    fix_cap = min(4096, seg_len)

    part1 = jax.jit(
        functools.partial(_part1_segment, cfg=cfg, seg_len=seg_len, fix_cap=fix_cap),
        static_argnames=(),
    )

    # the segment kernels carry GLOBAL positions between segments (the
    # run-start/last-gap cummax carries in ops/smooth.cluster_words), so
    # coordinates must stay globally consistent — beyond 2^31 positions
    # they need int64, which requires jax x64 (the positional arrays
    # promote to the base scalar's dtype; every other array in the kernel
    # is explicitly dtyped, so enabling x64 changes nothing else)
    idx_dtype = jnp.int32
    if sa_dtype == np.int64:
        jax.config.update("jax_enable_x64", True)
        idx_dtype = jnp.int64

    def seg_slice(arr, s, fill):
        lo = s * seg_len
        hi = min(lo + seg_len + halo, n)
        out = arr[lo:hi]
        pad = seg_len + halo - out.size
        if pad:
            out = np.concatenate([out, np.full(pad, fill, arr.dtype)])
        return jnp.asarray(out)

    def seg_slice_bp(s):
        # pack bwt|pre<<3 on the host: one 3 B/pos upload instead of 4
        lo = s * seg_len
        hi = min(lo + seg_len + halo, n)
        out = bwt_h[lo:hi] | (pre_h[lo:hi] << np.uint8(3))
        pad = seg_len + halo - out.size
        if pad:
            out = np.concatenate([out, np.full(pad, alphabet.SIGMA, np.uint8)])
        return jnp.asarray(out)

    _LOG.info("stage 2: streaming smooth over %d segments of %d", n_seg, seg_len)
    t_smooth = time.time()
    if sp is not None:
        from bfqzip_tpu.io.spill import Spill

        packed_h = sp.alloc("packed", (n_pad,), np.uint16)
    else:
        packed_h = np.zeros(n_pad, np.uint16)
    firsts, anys = [], []
    tails = {}  # s -> (bwt, qs, pre, pending) fix-cap slices (host)
    fallbacks = {}  # s -> (word, close, inclu) full windows (host, rare)
    seg_mod = np.zeros(n_seg, np.int64)
    seg_smo = np.zeros(n_seg, np.int64)
    stats_acc: dict = {}
    carries = None
    t0 = time.time()
    for s in range(n_seg):
        if merge_handle is not None and not merge_state["done"]:
            # consume only the final merged prefix: this segment's window
            # (incl. halo) must be fully merged with boundary LCPs fixed
            merge_handle.wait_until(min((s + 1) * seg_len + halo, n))
            if not merge_handle._thread.is_alive():
                merge_handle.join()
                finish_merge()
        (packed, stats, carries, fw, ac, mod, smo,
         tb, tq, tpend, any_pend, fb,
         word, close, inclu) = part1(
            seg_slice_bp(s),
            seg_slice(qs_h, s, 0),
            seg_slice(lcp_h, s, 0),
            jnp.asarray(s * seg_len, idx_dtype),
            jnp.asarray(n, idx_dtype),
            carries,
        )
        lo = s * seg_len
        hi = min(lo + seg_len, n)
        target = (sa_h[lo:hi].astype(np.int64) - 1) % n_pad
        packed_h[target] = np.asarray(packed)[: hi - lo]
        firsts.append(int(fw))
        anys.append(bool(ac))
        seg_mod[s] = int(mod)
        seg_smo[s] = int(smo)
        if bool(fb):
            # a cluster spans (nearly) the whole segment: keep the full
            # window decisions for a whole-segment re-apply in phase B
            fallbacks[s] = (np.asarray(word[:seg_len]),
                            np.asarray(close[:seg_len]),
                            np.asarray(inclu[:seg_len]))
        elif bool(any_pend):
            tails[s] = (np.asarray(tb), np.asarray(tq), np.asarray(tpend))
        for key, v in stats.items():
            stats_acc[key] = stats_acc.get(key, 0) + int(v)
        if sp is not None and s > 0:
            # the previous segment (minus the halo the current one read) is
            # fully consumed — drop its resident pages
            plo = (s - 1) * seg_len
            for arr in (bwt_h, qs_h, lcp_h, pre_h):
                Spill.evict(arr, plo, seg_len)
            Spill.evict(sa_h, plo * sa_h.itemsize, seg_len * sa_h.itemsize)
        _LOG.info("stage 2: segment %d/%d done (%.1fs elapsed)",
                  s + 1, n_seg, time.time() - t0)
    if merge_handle is not None and not merge_state["done"]:
        merge_handle.join()
        finish_merge()

    # phase B: reverse sweep of (first-close word) carries + tiny fix-ups
    right_carry = np.zeros(n_seg, np.int32)
    carry = 0
    for s in range(n_seg - 1, -1, -1):
        right_carry[s] = carry
        if anys[s]:
            carry = firsts[s]

    fix_j = jax.jit(functools.partial(_fix_tail, cfg=cfg))
    apply_j = jax.jit(functools.partial(_apply_segment, cfg=cfg, seg_len=seg_len))
    for s, (tb, tq, tpend) in tails.items():
        if right_carry[s] == 0:
            continue  # no later cluster close: word 0 was already correct
        pk, mod, smo = fix_j(jnp.asarray(tb), jnp.asarray(tq),
                             jnp.asarray(tpend), jnp.int32(right_carry[s]))
        lo = s * seg_len + seg_len - fix_cap
        idx = np.flatnonzero(tpend)
        target = (sa_h[lo + idx].astype(np.int64) - 1) % n_pad
        packed_h[target] = np.asarray(pk)[idx]
        seg_mod[s] += int(mod)
        seg_smo[s] += int(smo)
    for s, (word_s, close_s, inclu_s) in fallbacks.items():
        lo = s * seg_len
        hi = min(lo + seg_len, n)
        packed, mod, smo = apply_j(
            seg_slice_bp(s),
            seg_slice(qs_h, s, 0),
            jnp.asarray(word_s),
            jnp.asarray(close_s),
            jnp.asarray(inclu_s),
            jnp.int32(right_carry[s]),
            jnp.asarray(min(n - lo, seg_len + 1), idx_dtype),
        )
        target = (sa_h[lo:hi].astype(np.int64) - 1) % n_pad
        packed_h[target] = np.asarray(packed)[: hi - lo]
        seg_mod[s] = int(mod)  # whole-segment recompute replaces part A's
        seg_smo[s] = int(smo)
    stats_acc["modified"] = int(seg_mod.sum())
    stats_acc["qs_smoothed"] = int(seg_smo.sum())
    mark("smooth", t_smooth)

    # ---- stage 3: emission (the scatters above WERE the inversion) ----
    t_emit = time.time()
    lengths_out = np.asarray(batch.lengths).astype(np.int32)
    if sp is None:
        grid = packed_h.reshape(n_reads, wp)
        seqs = (grid[:, :width] & 0xFF).astype(np.uint8)
        quals = ((grid[:, :width] >> 8) & 0xFF).astype(np.uint8)
        if out_path:
            from bfqzip_tpu.io.fastq import write_fastq

            tmp = ReadBatch(seqs=seqs, quals=quals, lengths=lengths_out)
            write_fastq(out_path, tmp, headers=None)
    else:
        from bfqzip_tpu.io.fastq import format_fastq

        seqs = sp.alloc("out_seqs", (n_reads, width), np.uint8)
        quals = sp.alloc("out_quals", (n_reads, width), np.uint8)
        slab = max((64 << 20) // wp, 1)
        fh = open(out_path, "wb") if out_path else None
        try:
            for lo in range(0, n_reads, slab):
                hi = min(lo + slab, n_reads)
                grid = np.asarray(packed_h[lo * wp : hi * wp]).reshape(hi - lo, wp)
                s_s = (grid[:, :width] & 0xFF).astype(np.uint8)
                q_s = ((grid[:, :width] >> 8) & 0xFF).astype(np.uint8)
                seqs[lo:hi] = s_s
                quals[lo:hi] = q_s
                if fh is not None:
                    fh.write(format_fastq(ReadBatch(
                        seqs=s_s, quals=q_s, lengths=lengths_out[lo:hi])))
                Spill.evict(packed_h, lo * wp * 2, (hi - lo) * wp * 2)
                Spill.evict(seqs, lo * width, (hi - lo) * width)
                Spill.evict(quals, lo * width, (hi - lo) * width)
        finally:
            if fh is not None:
                fh.close()
        for name in ("packed", "bwt", "qs", "lcp", "pre", "sa"):
            sp.drop(name)
    out = ReadBatch(
        seqs=seqs,
        quals=quals,
        lengths=lengths_out,
        headers=batch.headers,
    )
    mark("emit", t_emit)
    return out, stats_acc


def _apply_segment(bwtpre, qs, word, close, inclu, right_carry, n_rem,
                   cfg: SmoothConfig, seg_len: int):
    """Phase B per segment: local decision-word broadcast + apply + pack."""
    from bfqzip_tpu.ops.scan import next_marked

    w_local = next_marked(jnp.where(close, word, 0), close, init=0)
    seen_right = jnp.cumsum(close[::-1].astype(jnp.int32))[::-1] > 0
    w = jnp.where(seen_right, w_local, right_carry)
    bwt_t = bwtpre[:seg_len] & jnp.uint8(7)
    qs_t = qs[:seg_len]
    pre_t = bwtpre[:seg_len] >> jnp.uint8(3)
    bwt_sub, qs_out, modified, smoothed = apply_words(bwt_t, qs_t, pre_t, w, inclu, cfg)
    if cfg.binning:
        qs_out = illumina_bin_jax(qs_out)
    valid = jnp.arange(seg_len, dtype=jnp.int32) < n_rem
    is_char = (bwt_t != alphabet.TERM) & (bwt_t != jnp.uint8(alphabet.SIGMA)) & valid
    packed = jnp.where(
        is_char, (qs_out.astype(jnp.uint16) << 8) | bwt_sub.astype(jnp.uint16), 0
    ).astype(jnp.uint16)
    return packed, jnp.sum((modified & valid).astype(jnp.int32)), jnp.sum(
        (smoothed & valid).astype(jnp.int32)
    )
