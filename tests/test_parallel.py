"""Multi-device tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import pytest

from bfqzip_tpu.config import SmoothConfig
from bfqzip_tpu.engine import smooth_fastq
from bfqzip_tpu.io.fastq import ReadBatch, read_fastq
from bfqzip_tpu.parallel import block_smooth_fastq, make_mesh, sharded_sort

from conftest import golden_path
from tests_util import tiny_batch


def test_mesh_devices():
    assert len(jax.devices()) == 8


def test_block_pipeline_matches_per_block():
    """Block-parallel output == sequential per-block pipeline, concatenated in
    block order (the reference's split/merge contract,
    BFQzip_parallel.py:288-323,137-152)."""
    batch = read_fastq(golden_path("example.in.fastq"))  # 100 reads
    cfg = SmoothConfig()
    mesh = make_mesh((4, 1))
    n_dev = 4
    out, stats = block_smooth_fastq(batch, cfg, mesh, axes=("data", "seq"))

    # sequential reference: same block boundaries (contiguous quarters)
    blk = batch.num_reads // n_dev
    parts = []
    tot = 0
    for b in range(n_dev):
        sub = ReadBatch(
            seqs=batch.seqs[b * blk : (b + 1) * blk],
            quals=batch.quals[b * blk : (b + 1) * blk],
            lengths=batch.lengths[b * blk : (b + 1) * blk],
        )
        o, st = smooth_fastq(sub, cfg)
        parts.append(o)
        tot += st["num_clust"]
    assert stats["num_clust"] == tot
    w = out.max_len
    got_seqs = np.concatenate([p.seqs[:, :w] if p.max_len >= w else
                               np.pad(p.seqs, ((0, 0), (0, w - p.max_len))) for p in parts])
    got_quals = np.concatenate([p.quals[:, :w] if p.max_len >= w else
                                np.pad(p.quals, ((0, 0), (0, w - p.max_len))) for p in parts])
    assert np.array_equal(out.seqs, got_seqs)
    assert np.array_equal(out.quals, got_quals)


def test_block_pipeline_2d_mesh_with_padding():
    rng = np.random.default_rng(5)
    batch = tiny_batch(rng, n_reads=50, min_len=10, max_len=20)  # 50 % 8 != 0
    mesh = make_mesh((4, 2))
    out, _ = block_smooth_fastq(batch, SmoothConfig(k=4, min_cluster=3), mesh)
    assert out.num_reads == 50
    assert np.array_equal(out.lengths, batch.lengths)


@pytest.mark.parametrize("shape", [(1, 8), (1, 4)])
def test_sharded_sort(shape):
    mesh = make_mesh(shape)
    d = shape[1]
    rng = np.random.default_rng(7)
    x = rng.integers(0, 1 << 24, size=d * 8192).astype(np.int32)
    buf, count, overflow = sharded_sort(jax.numpy.asarray(x), mesh, axis="seq")
    assert int(np.sum(np.asarray(overflow))) == 0
    assert int(np.sum(np.asarray(count))) == x.size
    buf = np.asarray(buf)
    vals = buf[buf != np.iinfo(np.int32).max]
    assert np.array_equal(vals, np.sort(x))


def test_graft_entry():
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out[0].shape == args[0].shape
    ge.dryrun_multichip(8)
