"""Sequence-sharded global EBWT vs the single-chip builder."""

import numpy as np
import pytest

from bfqzip_tpu import ref_golden
from bfqzip_tpu.io.fastq import read_fastq
from bfqzip_tpu.parallel import make_mesh
from bfqzip_tpu.parallel.global_ebwt import build_ebwt_sharded

from conftest import golden_path
from tests_util import tiny_batch


@pytest.mark.parametrize("shape", [(1, 4), (1, 8)])
def test_sharded_matches_reference_model(shape):
    mesh = make_mesh(shape)
    d = shape[1]
    rng = np.random.default_rng(9)
    batch = tiny_batch(rng, n_reads=var_reads(d), min_len=20, max_len=24, n_frac=0.02)
    ref = ref_golden.build_ebwt(batch)
    out = build_ebwt_sharded(batch.seqs, batch.quals, batch.lengths, mesh, axis="seq")
    assert out.overflow == 0
    assert out.n == ref.bwt.size
    assert np.array_equal(out.bwt, ref.bwt)
    assert np.array_equal(out.qs, ref.qs)
    assert np.array_equal(out.lcp, ref.lcp)


def var_reads(d):
    return 16 * d


def test_sharded_on_example():
    mesh = make_mesh((1, 4))
    batch = read_fastq(golden_path("example.in.fastq"))  # 100 reads, 101bp
    ref = ref_golden.build_ebwt(batch)
    out = build_ebwt_sharded(batch.seqs, batch.quals, batch.lengths, mesh, axis="seq")
    assert out.overflow == 0
    assert np.array_equal(out.bwt, ref.bwt)
    assert np.array_equal(out.lcp, ref.lcp)


def test_non_divisible_reads_padded():
    """Read counts not divisible by the mesh axis are padded with zero-length
    rows that sort last and are trimmed — output identical to the oracle."""
    mesh = make_mesh((1, 4))
    rng = np.random.default_rng(1)
    batch = tiny_batch(rng, n_reads=30, min_len=10, max_len=12)
    ref = ref_golden.build_ebwt(batch)
    out = build_ebwt_sharded(batch.seqs, batch.quals, batch.lengths, mesh)
    assert out.overflow == 0
    assert out.n == ref.bwt.size
    assert np.array_equal(out.bwt, ref.bwt)
    assert np.array_equal(out.qs, ref.qs)
    assert np.array_equal(out.lcp, ref.lcp)


def test_sharded_doubling_path_long_reads():
    """Reads beyond the 5-word flat pack budget (wp > 120) take the
    prefix-doubling body; it must stay byte-equal to the NumPy oracle."""
    mesh = make_mesh((1, 4))
    rng = np.random.default_rng(11)
    batch = tiny_batch(rng, n_reads=24, min_len=122, max_len=140, n_frac=0.01)
    ref = ref_golden.build_ebwt(batch)
    out = build_ebwt_sharded(batch.seqs, batch.quals, batch.lengths, mesh, axis="seq")
    assert out.overflow == 0
    assert np.array_equal(out.bwt, ref.bwt)
    assert np.array_equal(out.qs, ref.qs)
    assert np.array_equal(out.lcp, ref.lcp)


def test_sharded_flat_path_ties_across_shards():
    """Identical reads on different shards: full-window key ties must resolve
    in read order (the distinct-terminator convention) through the exchange."""
    mesh = make_mesh((1, 4))
    rng = np.random.default_rng(12)
    base = tiny_batch(rng, n_reads=4, min_len=30, max_len=30, n_frac=0.0)
    seqs = np.tile(base.seqs, (8, 1))  # 32 reads: each unique read x8 copies
    quals = np.tile(base.quals, (8, 1))
    lengths = np.tile(base.lengths, 8)
    from bfqzip_tpu.io.fastq import ReadBatch

    batch = ReadBatch(seqs=seqs, quals=quals, lengths=lengths.astype(np.int32))
    ref = ref_golden.build_ebwt(batch)
    out = build_ebwt_sharded(seqs, quals, batch.lengths, mesh, axis="seq")
    assert out.overflow == 0
    assert np.array_equal(out.bwt, ref.bwt)
    assert np.array_equal(out.qs, ref.qs)
    assert np.array_equal(out.lcp, ref.lcp)
