"""Sequence-sharded end-to-end pipeline: ONE global EBWT, smoothed and
inverted across the mesh — the no-ratio-cost scale-out mode.

parallel/block.py mirrors the reference's parallel driver (independent EBWTs
per block, compression-ratio cost, README.md:107).  This module instead runs
the ENTIRE bfq_int-equivalent core (reference BFQzip.py:206-228) on a single
EBWT of the whole collection with the position space sharded over a mesh
axis:

  1. distributed suffix sort (global_ebwt._sort_body: sample-sorted doubling
     rounds, halo rank lookahead, routed gathers for BWT/QS/LCP);
  2. EXACT rebalance of the sorted order to equal [m]-per-shard contiguous
     slices (ctx.rebalance — the diagonal stays put, only sample-sort drift
     rides an all_to_all);
  3. cluster smoothing with the single-chip maths of ops/smooth.py running
     on DistScanOps (parallel/dist_scan.py): every segmented scan carries one
     per-shard summary over the axis, shifts exchange one-element halos;
     the predecessor symbols bwt[LF[j]] come from one routed global gather
     of text[(SA[j]-2) mod n_pad] (no LF array, no global rank);
  4. inversion as ONE routed global scatter: BWT slot j holds the corrected
     read character of text position (SA[j]-1) mod n_pad (the invert_via_sa
     argument, ops/invert.py), and position shards own whole reads — the
     scatter IS the reconstruction (decode.cpp:499-686 without files).

Every exchange reports bucket overflow; the host wrapper retries with doubled
capacity.  Output is byte-identical to the single-chip engine.smooth_fastq
(tested on an 8-device CPU mesh in tests/test_global_pipeline.py).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from bfqzip_tpu import alphabet
from bfqzip_tpu.config import SmoothConfig
from bfqzip_tpu.io.fastq import ReadBatch
from bfqzip_tpu.ops.invert import illumina_bin_jax
from bfqzip_tpu.ops.smooth import smooth
from bfqzip_tpu.ops.suffix import EbwtDevice
from bfqzip_tpu.parallel.dist_scan import DistScanOps
from bfqzip_tpu.parallel.global_ebwt import (
    _make_ctx,
    _sort_body,
    pad_reads_to_multiple,
)

_STAT_KEYS = (
    "num_clust", "num_clust_discarded", "num_clust_amb_discarded",
    "num_clust_mod", "num_clust_alleq", "bases_inside", "modified",
    "qs_smoothed",
)


@functools.lru_cache(maxsize=8)
def _make_pipeline_kernel(mesh, axis, n_reads, width, cap_factor_milli, cfg):
    d = mesh.shape[axis]
    wp = width + 1
    n_pad = n_reads * wp
    m = n_pad // d
    nl = n_reads // d
    cap_sorted = int(cap_factor_milli * m / 1000) + 64
    rebalance_cap = min(int(cap_factor_milli * m / 1000 / 8) + 1024, m)
    ctx = _make_ctx(axis, d, m, n_pad, cap_sorted, rebalance_cap=rebalance_cap)
    ops = DistScanOps(axis, d)
    spec = P(axis)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=(spec, spec, spec, {k: P() for k in _STAT_KEYS}, P()),
    )
    def kernel(seqs_l, quals_l, lens_l):
        r = _sort_body(ctx, n_reads, width, seqs_l, quals_l, lens_l)

        # ---- exact rebalance: sorted order as equal contiguous [m] slices ----
        pre_s = getattr(r, "pre", None)
        payloads = [
            (r.bwt, jnp.uint8(alphabet.SIGMA)),
            (r.qs, jnp.uint8(0)),
            (r.lcp, jnp.int32(0)),
            (r.sa, jnp.int32(-1)),
        ]
        if pre_s is not None:
            payloads.append((pre_s, jnp.uint8(0)))
            (bwt_e, qs_e, lcp_e, sa_e, pre), ovf_rb = ctx.rebalance(r.count, payloads)
            ovf_pre = jnp.zeros((), jnp.int32)
        else:
            (bwt_e, qs_e, lcp_e, sa_e), ovf_rb = ctx.rebalance(r.count, payloads)
            # predecessor symbols: text[(SA-2) mod n_pad] (engine.py:32-40)
            prev2 = (sa_e.astype(jnp.int64) - 2) % n_pad
            tprev2, ovf_pre = ctx.global_gather(r.text, prev2, jnp.uint8(0))
            pre = jnp.where(tprev2 == 0, jnp.uint8(alphabet.TERM), tprev2 - 1)

        # ---- cluster smoothing on the distributed scan ops ----
        ebwt = EbwtDevice(bwt=bwt_e, qs=qs_e, lcp=lcp_e, sa=sa_e,
                          text=r.text, n=r.n)
        out = smooth(ebwt, cfg, pre=pre, ops=ops)

        # ---- inversion: one routed scatter back to read coordinates ----
        qs_fin = illumina_bin_jax(out.qs) if cfg.binning else out.qs
        pos = ops.iota(m)
        is_char = (bwt_e != alphabet.TERM) & (pos < r.n)
        packed = jnp.where(
            is_char,
            (qs_fin.astype(jnp.int32) << 8) | out.bwt_sub.astype(jnp.int32),
            0,
        )
        target = (sa_e.astype(jnp.int64) - 1) % n_pad
        grid, ovf_sc = ctx.global_scatter(packed, target, jnp.int32(0))
        grid = grid.reshape(nl, wp)
        seqs_o = (grid[:, :width] & 0xFF).astype(jnp.uint8)
        quals_o = ((grid[:, :width] >> 8) & 0xFF).astype(jnp.uint8)
        lengths_o = jnp.sum((seqs_o != 0).astype(jnp.int32), axis=1)

        overflow = r.overflow + jax.lax.psum(
            (ovf_rb + ovf_pre + ovf_sc).astype(jnp.int32), axis
        )
        return seqs_o, quals_o, lengths_o, out.stats, overflow

    return jax.jit(kernel)


def smooth_fastq_sharded(
    batch: ReadBatch,
    cfg: SmoothConfig | None = None,
    mesh: Mesh | None = None,
    axis: str = "seq",
    capacity_factor: float = 2.5,
) -> Tuple[ReadBatch, dict]:
    """Host wrapper: numpy ReadBatch in, smoothed numpy ReadBatch out, with
    the single global EBWT sharded over `mesh.shape[axis]` devices.  Requires
    x64 (i64 sort keys).  Retries with doubled exchange capacity if any
    fixed-capacity bucket overflows."""
    if not jax.config.jax_enable_x64:
        raise RuntimeError("smooth_fastq_sharded requires jax_enable_x64")
    cfg = cfg or SmoothConfig()
    d = mesh.shape[axis]
    seqs, quals, lengths = pad_reads_to_multiple(
        batch.seqs, batch.quals, batch.lengths, d
    )
    n_reads, width = seqs.shape

    for _ in range(3):
        fn = _make_pipeline_kernel(
            mesh, axis, n_reads, width, int(capacity_factor * 1000), cfg
        )
        o_seqs, o_quals, o_lengths, stats, overflow = fn(
            jnp.asarray(seqs), jnp.asarray(quals), jnp.asarray(lengths)
        )
        if int(overflow) == 0:
            break
        capacity_factor *= 2

    n0 = batch.num_reads
    out = ReadBatch(
        seqs=np.asarray(o_seqs)[:n0],
        quals=np.asarray(o_quals)[:n0],
        lengths=np.asarray(o_lengths)[:n0].astype(np.int32),
        headers=batch.headers,
    )
    return out, {k: int(v) for k, v in stats.items()}
