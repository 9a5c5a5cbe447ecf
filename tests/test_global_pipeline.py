"""Sequence-sharded pipeline vs the single-chip engine: byte equality.

DistScanOps (the distributed scan toolbox) is property-tested against the
single-device LocalScanOps, then the full sharded pipeline output is compared
byte-for-byte with engine.smooth_fastq.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from bfqzip_tpu import SmoothConfig
from bfqzip_tpu.engine import smooth_fastq
from bfqzip_tpu.io.fastq import read_fastq
from bfqzip_tpu.ops.scan import LOCAL_OPS
from bfqzip_tpu.parallel import make_mesh
from bfqzip_tpu.parallel.dist_scan import DistScanOps
from bfqzip_tpu.parallel.global_pipeline import smooth_fastq_sharded

from conftest import golden_path
from tests_util import tiny_batch

D = 4


def _dist_run(fn):
    """Run fn(ops, *locals) under shard_map on a (1, D) mesh, seq axis."""
    mesh = make_mesh((1, D))
    ops = DistScanOps("seq", D)

    def wrapped(*arrays):
        spec = P("seq")
        f = jax.shard_map(
            functools.partial(fn, ops),
            mesh=mesh,
            in_specs=tuple(spec for _ in arrays),
            out_specs=spec,
        )
        return jax.jit(f)(*arrays)

    return wrapped


@pytest.mark.parametrize("seed", [0, 1])
def test_dist_scan_matches_local(seed):
    rng = np.random.default_rng(seed)
    n = 64 * D
    x = jnp.asarray(rng.integers(0, 100, n).astype(np.int32))
    flag = jnp.asarray(rng.random(n) < 0.1)
    mark = jnp.asarray(rng.random(n) < 0.05)
    xc = jnp.asarray(rng.integers(0, 100, (5, n)).astype(np.int32))

    cases = [
        (lambda o, a: o.iota(a.shape[0] // 1) * 0 + o.iota(a.shape[0]), (x,),
         LOCAL_OPS.iota(n)),
        (lambda o, a: o.shift_prev(a, 7), (x,), LOCAL_OPS.shift_prev(x, 7)),
        (lambda o, a: o.shift_next(a, 7), (x,), LOCAL_OPS.shift_next(x, 7)),
        (lambda o, a: o.shift_next_k(a, 3, 9), (x,), LOCAL_OPS.shift_next_k(x, 3, 9)),
        (lambda o, a: o.cummax(a), (x,), LOCAL_OPS.cummax(x)),
        (lambda o, a, f: o.seg_cumsum(a, f), (x, flag), LOCAL_OPS.seg_cumsum(x, flag)),
        (lambda o, a, f: o.seg_cumor(a, f), (x, flag), LOCAL_OPS.seg_cumor(x, flag)),
        (lambda o, a, f: o.seg_scan(a, f, jnp.maximum, 0), (x, flag),
         LOCAL_OPS.seg_scan(x, flag, jnp.maximum, 0)),
        (lambda o, a, mk: o.next_marked(a, mk, 3), (x, mark),
         LOCAL_OPS.next_marked(x, mark, 3)),
    ]
    for i, (fn, args, want) in enumerate(cases):
        got = _dist_run(fn)(*args)
        assert np.array_equal(np.asarray(got), np.asarray(want)), f"case {i}"

    # channel-first segmented cumsum ([C, n] data, [n] flags)
    mesh = make_mesh((1, D))
    ops = DistScanOps("seq", D)
    f = jax.jit(
        jax.shard_map(
            lambda a, fl: ops.seg_cumsum(a, fl),
            mesh=mesh,
            in_specs=(P(None, "seq"), P("seq")),
            out_specs=P(None, "seq"),
        )
    )
    got = f(xc, flag)
    assert np.array_equal(np.asarray(got), np.asarray(LOCAL_OPS.seg_cumsum(xc, flag)))


def test_dist_sum():
    mesh = make_mesh((1, D))
    ops = DistScanOps("seq", D)
    x = jnp.arange(32 * D, dtype=jnp.int32)
    f = jax.jit(
        jax.shard_map(
            lambda a: ops.sum(a)[None], mesh=mesh, in_specs=(P("seq"),),
            out_specs=P("seq"),
        )
    )
    assert int(np.asarray(f(x)).sum()) == int(x.sum()) * D


def _assert_batches_equal(got, want):
    """Content equality modulo width padding (smooth_fastq returns
    compile-bucket column padding; the sharded path returns raw width)."""
    assert np.array_equal(got.lengths, want.lengths)
    w = int(want.lengths.max())
    assert np.array_equal(got.seqs[:, :w], want.seqs[:, :w])
    assert np.array_equal(got.quals[:, :w], want.quals[:, :w])


@pytest.mark.parametrize("mode,binning", [(2, False), (0, False), (3, True), (1, False)])
def test_sharded_pipeline_matches_single_chip(mode, binning):
    mesh = make_mesh((1, D))
    batch = read_fastq(golden_path("example.in.fastq"))
    cfg = SmoothConfig(mode=mode, binning=binning)
    want, want_stats = smooth_fastq(batch, cfg)
    got, got_stats = smooth_fastq_sharded(batch, cfg, mesh)
    _assert_batches_equal(got, want)
    assert got_stats == want_stats


def test_sharded_pipeline_variable_lengths():
    mesh = make_mesh((1, D))
    rng = np.random.default_rng(5)
    batch = tiny_batch(rng, n_reads=50, min_len=18, max_len=24, n_frac=0.02)
    cfg = SmoothConfig(k=4, min_cluster=3)
    want, want_stats = smooth_fastq(batch, cfg)
    got, got_stats = smooth_fastq_sharded(batch, cfg, mesh)
    _assert_batches_equal(got, want)
    assert got_stats == want_stats
