"""Out-of-core pipeline (bfqzip_tpu/external.py) vs the in-core engine.

Byte equality across forced-tiny chunk/segment sizes exercises every carry
path: stage-1 chunked sorts + native merge, streaming cluster_words carries,
the reverse decision-word sweep, and the host scatter inversion.
"""

import numpy as np
import pytest

from bfqzip_tpu import SmoothConfig
from bfqzip_tpu.engine import smooth_fastq
from bfqzip_tpu.external import smooth_fastq_external
from bfqzip_tpu.io.fastq import read_fastq
from bfqzip_tpu.utils import native

from conftest import golden_path
from tests_util import tiny_batch

pytestmark = pytest.mark.skipif(
    not native.ext_merge_available(), reason="native library not built"
)


def _cmp(batch, cfg, **kw):
    want, wstats = smooth_fastq(batch, cfg)
    got, gstats = smooth_fastq_external(batch, cfg, **kw)
    w = int(want.lengths.max())
    assert np.array_equal(got.lengths, want.lengths)
    assert np.array_equal(got.seqs[:, :w], want.seqs[:, :w])
    assert np.array_equal(got.quals[:, :w], want.quals[:, :w])
    assert gstats == wstats


@pytest.mark.parametrize(
    "cfg,seg,rpc",
    [
        (SmoothConfig(), None, None),  # single segment / single chunk
        (SmoothConfig(), 997, 17),  # many tiny segments + chunks
        (SmoothConfig(mode=0), 1024, 33),
        (SmoothConfig(mode=1), 1500, 29),
        (SmoothConfig(mode=3, binning=True), 2048, 40),
    ],
)
def test_external_matches_engine_example(cfg, seg, rpc):
    batch = read_fastq(golden_path("example.in.fastq"))
    _cmp(batch, cfg, _seg_len=seg, _reads_per_chunk=rpc)


def test_external_matches_engine_varlen():
    rng = np.random.default_rng(7)
    batch = tiny_batch(rng, n_reads=80, min_len=16, max_len=24, n_frac=0.03)
    _cmp(batch, SmoothConfig(k=4, min_cluster=3), _seg_len=301, _reads_per_chunk=13)


def test_external_fallback_giant_cluster():
    """A cluster spanning (nearly) a whole segment overflows the fix-cap tail
    buffer and must take the whole-segment phase-B fallback.  Thousands of
    identical reads produce clusters longer than a segment."""
    from bfqzip_tpu.io.fastq import ReadBatch

    from bfqzip_tpu import alphabet

    rng = np.random.default_rng(21)
    bases = np.array(
        [alphabet.A, alphabet.C, alphabet.G, alphabet.T], dtype=np.uint8
    )
    one_seq = bases[rng.integers(0, 4, 30)]
    n = 6000
    seqs = np.tile(one_seq, (n, 1))
    quals = (33 + rng.integers(2, 42, (n, 30))).astype(np.uint8)
    lengths = np.full(n, 30, np.int32)
    batch = ReadBatch(seqs=seqs, quals=quals, lengths=lengths, headers=None)
    # seg_len > fix_cap (4096) so a spanning cluster cannot fit the tail
    _cmp(batch, SmoothConfig(), _seg_len=4200, _reads_per_chunk=977)
    # mode 0 (cluster max QS) exposes partial-count decision words: a close
    # taken at the window edge instead of the true cluster close would
    # replace with the wrong (window-local) maximum
    _cmp(batch, SmoothConfig(mode=0), _seg_len=4200, _reads_per_chunk=977)


def test_native_merge_matches_oracle():
    """The k-way loser-tree merge interleaves per-chunk suffix orders into
    exactly the oracle's global order (BWT/QS/LCP byte-equal; LCP capped at
    255 per the eGap --lbytes 1 convention)."""
    import jax.numpy as jnp

    from bfqzip_tpu import ref_golden
    from bfqzip_tpu.io.fastq import ReadBatch
    from bfqzip_tpu.ops.suffix import build_ebwt

    rng = np.random.default_rng(3)
    batch = tiny_batch(rng, n_reads=60, min_len=15, max_len=22, n_frac=0.02)
    N, W = batch.seqs.shape
    wp = W + 1
    k = np.arange(wp)[None, :]
    text = np.where(
        k < batch.lengths[:, None],
        np.pad(batch.seqs, ((0, 0), (0, 1))).astype(np.uint8) + 1,
        0,
    ).reshape(-1)
    qtext = np.pad(batch.quals, ((0, 0), (0, 1))).reshape(-1)
    bounds = np.linspace(0, N, 5).astype(int)
    sa_chunks, lcp_chunks = [], []
    for c in range(4):
        lo, hi = bounds[c], bounds[c + 1]
        dev = build_ebwt(
            jnp.asarray(batch.seqs[lo:hi]),
            jnp.asarray(batch.quals[lo:hi]),
            jnp.asarray(batch.lengths[lo:hi]),
        )
        sa_chunks.append((np.asarray(dev.sa)[: int(dev.n)] + lo * wp).astype(np.int32))
        lcp_chunks.append(
            np.minimum(np.asarray(dev.lcp), 255).astype(np.uint8)[: int(dev.n)]
        )
    bwt, qs, lcp, pre, sa = native.ext_merge(text, qtext, sa_chunks)
    ref = ref_golden.build_ebwt(batch)
    assert np.array_equal(bwt, ref.bwt)
    assert np.array_equal(qs, ref.qs)
    assert np.array_equal(lcp, np.minimum(ref.lcp, 255).astype(np.uint8))
    # splitter-partitioned parallel merge must be byte-equal to 1 thread
    mt = native.ext_merge(text, qtext, sa_chunks, threads=4)
    for a, b in zip((bwt, qs, lcp, pre, sa), mt):
        assert np.array_equal(a, b)
    # LCP loser tree (intra-chunk LCPs from the device) must be byte-equal
    lcp_tree = native.ext_merge(text, qtext, sa_chunks, threads=3,
                                lcp_chunks=lcp_chunks)
    for a, b in zip((bwt, qs, lcp, pre, sa), lcp_tree):
        assert np.array_equal(a, b)


def _chunked_text(batch):
    N, W = batch.seqs.shape
    wp = W + 1
    k = np.arange(wp)[None, :]
    text = np.where(
        k < batch.lengths[:, None],
        np.pad(batch.seqs, ((0, 0), (0, 1))).astype(np.uint8) + 1,
        0,
    ).reshape(-1)
    qtext = np.pad(batch.quals, ((0, 0), (0, 1))).reshape(-1)
    return text, qtext, wp


def test_native_merge_parallel_matches_serial_large():
    """Threaded merge (splitter partition + boundary LCP fix-up) is byte-equal
    to the single-threaded path on a workload big enough to produce many
    ranges per thread and repeated long-LCP runs."""
    import jax.numpy as jnp

    from bfqzip_tpu.ops.suffix import build_ebwt

    rng = np.random.default_rng(13)
    # duplicated reads -> many maximal-LCP ties crossing splitter boundaries
    base = tiny_batch(rng, n_reads=400, min_len=30, max_len=48, n_frac=0.02)
    from bfqzip_tpu.io.fastq import ReadBatch

    seqs = np.concatenate([base.seqs] * 4)
    quals = np.concatenate([base.quals] * 4)
    lengths = np.concatenate([base.lengths] * 4)
    batch = ReadBatch(seqs=seqs, quals=quals, lengths=lengths, headers=None)
    text, qtext, wp = _chunked_text(batch)
    N = seqs.shape[0]
    bounds = np.linspace(0, N, 9).astype(int)
    sa_chunks, lcp_chunks = [], []
    for c in range(8):
        lo, hi = bounds[c], bounds[c + 1]
        dev = build_ebwt(
            jnp.asarray(batch.seqs[lo:hi]),
            jnp.asarray(batch.quals[lo:hi]),
            jnp.asarray(batch.lengths[lo:hi]),
        )
        sa_chunks.append((np.asarray(dev.sa)[: int(dev.n)] + lo * wp).astype(np.int32))
        lcp_chunks.append(
            np.minimum(np.asarray(dev.lcp), 255).astype(np.uint8)[: int(dev.n)]
        )
    ser = native.ext_merge(text, qtext, sa_chunks, threads=1)
    for t in (2, 3, 8):
        par = native.ext_merge(text, qtext, sa_chunks, threads=t)
        for a, b in zip(ser, par):
            assert np.array_equal(a, b), f"threads={t}"
    # LCP loser tree on a max-tie workload (identical reads: every intra-
    # chunk LCP saturates the 255 cap as a bound) must still be byte-equal
    for t in (1, 4):
        lt = native.ext_merge(text, qtext, sa_chunks, threads=t,
                              lcp_chunks=lcp_chunks)
        for a, b in zip(ser, lt):
            assert np.array_equal(a, b), f"lcp threads={t}"


def test_native_merge_async_progress():
    """The live-progress merge (ext_merge_async) is byte-equal to the serial
    merge at every thread count, its merged-prefix cursor is monotone while
    the workers run, and wait_until() returns only once the requested prefix
    — including the fixed boundary LCPs at splitter seams — is final."""
    import jax.numpy as jnp

    from bfqzip_tpu.io.fastq import ReadBatch
    from bfqzip_tpu.ops.suffix import build_ebwt

    if not native.ext_merge_async_available():
        pytest.skip("progress entry points absent (rebuild native)")
    rng = np.random.default_rng(17)
    base = tiny_batch(rng, n_reads=400, min_len=30, max_len=48, n_frac=0.02)
    seqs = np.concatenate([base.seqs] * 8)
    quals = np.concatenate([base.quals] * 8)
    lengths = np.concatenate([base.lengths] * 8)
    batch = ReadBatch(seqs=seqs, quals=quals, lengths=lengths, headers=None)
    text, qtext, wp = _chunked_text(batch)
    N = seqs.shape[0]
    bounds = np.linspace(0, N, 9).astype(int)
    sa_chunks, lcp_chunks = [], []
    for c in range(8):
        lo, hi = bounds[c], bounds[c + 1]
        dev = build_ebwt(
            jnp.asarray(batch.seqs[lo:hi]),
            jnp.asarray(batch.quals[lo:hi]),
            jnp.asarray(batch.lengths[lo:hi]),
        )
        sa_chunks.append((np.asarray(dev.sa)[: int(dev.n)] + lo * wp).astype(np.int32))
        lcp_chunks.append(
            np.minimum(np.asarray(dev.lcp), 255).astype(np.uint8)[: int(dev.n)]
        )
    ser = native.ext_merge(text, qtext, sa_chunks, threads=1,
                           lcp_chunks=lcp_chunks)
    total = ser[0].size
    for t in (1, 2, 8):
        h = native.ext_merge_async(text, qtext, sa_chunks, threads=t,
                                   lcp_chunks=lcp_chunks)
        last = 0
        while h._thread.is_alive():
            p = h.merged_prefix()
            assert last <= p <= total
            last = p
        assert h.join() == total
        assert h.merged_prefix() == total
        for a, b in zip(ser, h.outputs):
            assert np.array_equal(a, b), f"threads={t}"
    h = native.ext_merge_async(text, qtext, sa_chunks, threads=4,
                               lcp_chunks=lcp_chunks)
    h.wait_until(total // 2)
    p = h.merged_prefix()
    assert p >= total // 2
    # everything inside the final prefix must already be byte-final
    for a, b in zip(ser, h.outputs):
        assert np.array_equal(a[:p], b[:p])
    h.join()


def test_external_overlap_off_matches_on(monkeypatch):
    """BFQ_EXT_OVERLAP=0 (serial merge then smooth) and the default live
    merge||smooth overlap produce identical outputs and stats."""
    rng = np.random.default_rng(23)
    batch = tiny_batch(rng, n_reads=200, min_len=18, max_len=26, n_frac=0.02)
    cfg = SmoothConfig(k=4, min_cluster=3)
    on, on_stats = smooth_fastq_external(batch, cfg, _seg_len=701,
                                         _reads_per_chunk=23)
    monkeypatch.setenv("BFQ_EXT_OVERLAP", "0")
    off, off_stats = smooth_fastq_external(batch, cfg, _seg_len=701,
                                           _reads_per_chunk=23)
    assert np.array_equal(on.seqs, off.seqs)
    assert np.array_equal(on.quals, off.quals)
    assert on_stats == off_stats


def test_native_merge_rejects_bad_sa():
    """Out-of-range suffix positions (untrusted input) must fail cleanly with
    a negative rc, never index out of bounds (round-3 hardening ask)."""
    rng = np.random.default_rng(5)
    batch = tiny_batch(rng, n_reads=20, min_len=10, max_len=14, n_frac=0.0)
    text, qtext, wp = _chunked_text(batch)
    for bad in (-1, text.size, text.size + 100):
        sa = np.array([1, 2, bad], np.int32)
        with pytest.raises(RuntimeError, match="rc=-4"):
            native.ext_merge(text, qtext, [sa])


def test_external_spill_matches_engine(tmp_path):
    """Forced spill path (file-backed scratch arrays + per-range eviction +
    streamed emission, io/spill.py — the pile/cyc-file analog,
    bfq_ext.cpp:190-348): byte-equal to the in-core engine, out_path streams
    the same FASTQ, and the report carries per-stage wall + RSS marks."""
    from bfqzip_tpu.io.fastq import format_fastq

    batch = read_fastq(golden_path("example.in.fastq"), with_headers=False)
    cfg = SmoothConfig()
    want, wstats = smooth_fastq(batch, cfg)
    ref_bytes = format_fastq(want)
    rep = {}
    out_fq = str(tmp_path / "sp.fq")
    got, gstats = smooth_fastq_external(
        batch, cfg, _seg_len=1500, _reads_per_chunk=17,
        spill=True, out_path=out_fq, report=rep,
    )
    assert format_fastq(got) == ref_bytes
    assert gstats == wstats
    assert open(out_fq, "rb").read() == ref_bytes
    assert rep["n_chunks"] > 1
    for stage in ("chunk_sorts", "merge", "smooth", "emit"):
        assert rep[stage + "_s"] >= 0
        assert rep[stage + "_peak_rss_gb"] > 0


def test_read_fastq_spill_matches_reader():
    """The streaming record-aligned slab parser (io/spill.read_fastq_spill)
    must agree with the whole-file reader on every golden input, including
    slabs far smaller than the file."""
    from bfqzip_tpu.io.spill import Spill, read_fastq_spill

    for name, slab in (("example.in.fastq", 1 << 20),
                       ("synth_var.in.fastq", 4096),
                       ("synth_long.in.fastq", 8192)):
        ref = read_fastq(golden_path(name))
        sp = Spill()
        got = read_fastq_spill(golden_path(name), sp, with_headers=True,
                               slab_bytes=slab)
        assert np.array_equal(np.asarray(got.seqs), ref.seqs), name
        assert np.array_equal(np.asarray(got.quals), ref.quals), name
        assert np.array_equal(got.lengths, ref.lengths), name
        assert got.headers == ref.headers, name
        sp.close()


def test_read_fastq_spill_malformed_inputs(tmp_path):
    """The slab parser must reject malformed FASTQ cleanly (checkFASTQ.py
    semantics) and fall back to the whole-file reader for gzip inputs."""
    import gzip

    from bfqzip_tpu.io.spill import Spill, read_fastq_spill

    sp = Spill()
    # record bigger than the slab
    big = tmp_path / "big.fastq"
    big.write_bytes(b"@r\n" + b"A" * 9000 + b"\n+\n" + b"I" * 9000 + b"\n")
    with pytest.raises(ValueError):
        read_fastq_spill(str(big), sp, slab_bytes=4096)
    # dna/qs length mismatch
    bad = tmp_path / "bad.fastq"
    bad.write_bytes(b"@r\nACGT\n+\nIII\n")
    with pytest.raises(ValueError):
        read_fastq_spill(str(bad), sp)
    # truncated record count (not a multiple of 4 lines)
    trunc = tmp_path / "trunc.fastq"
    trunc.write_bytes(b"@r\nACGT\n+\n")
    with pytest.raises(ValueError):
        read_fastq_spill(str(trunc), sp)
    # gzip falls back to the whole-file reader
    raw = open(golden_path("example.in.fastq"), "rb").read()
    gz = tmp_path / "r.fastq.gz"
    gz.write_bytes(gzip.compress(raw))
    got = read_fastq_spill(str(gz), sp, with_headers=True)
    ref = read_fastq(golden_path("example.in.fastq"))
    assert np.array_equal(np.asarray(got.seqs), ref.seqs)
    assert got.headers == ref.headers
    sp.close()


def test_ext_merge_64bit_positions(monkeypatch):
    """Global suffix positions overflow int32 beyond 2^31 total positions
    (~21M 101bp reads — the 50M-read run hit this); the 64-bit merge
    (ext_merge_mt3, the reference's dataTypeNChar=ulong analog) must be
    byte-equal to the 32-bit path, and BFQ_EXT_SA64=1 must route the full
    external pipeline through it."""
    import jax.numpy as jnp

    from bfqzip_tpu.io.fastq import format_fastq
    from bfqzip_tpu.ops.suffix import build_ebwt

    batch = read_fastq(golden_path("example.in.fastq"), with_headers=False)
    N, W = batch.seqs.shape
    wp = W + 1
    text, qtext, _ = _chunked_text(batch)
    bounds = np.linspace(0, N, 4).astype(int)
    sa32, lcps = [], []
    for c in range(3):
        lo, hi = bounds[c], bounds[c + 1]
        dev = build_ebwt(jnp.asarray(batch.seqs[lo:hi]),
                         jnp.asarray(batch.quals[lo:hi]),
                         jnp.asarray(batch.lengths[lo:hi]))
        sa32.append((np.asarray(dev.sa)[: int(dev.n)] + lo * wp).astype(np.int32))
        lcps.append(np.minimum(np.asarray(dev.lcp), 255).astype(np.uint8)[: int(dev.n)])
    r32 = native.ext_merge(text, qtext, sa32, threads=2, lcp_chunks=lcps)
    r64 = native.ext_merge(text, qtext, [c.astype(np.int64) for c in sa32],
                           threads=2, lcp_chunks=lcps)
    assert r64[4].dtype == np.int64
    for a, b in zip(r32, r64):
        assert np.array_equal(np.asarray(a, np.int64), np.asarray(b, np.int64))

    monkeypatch.setenv("BFQ_EXT_SA64", "1")
    want, wstats = smooth_fastq(batch, SmoothConfig())
    got, gstats = smooth_fastq_external(batch, SmoothConfig(), _seg_len=1500,
                                        _reads_per_chunk=17, spill=True)
    assert format_fastq(got) == format_fastq(want)
    assert gstats == wstats
