"""Segmented-scan primitives (ops/scan.py) and the round-2 codec family
(native cm_codec "BQZC", EBWT-domain DNA "BQZE", best-of dispatch)."""

import lzma

import numpy as np
import pytest

from bfqzip_tpu.ops import rans
from bfqzip_tpu.ops.scan import (
    last_marked,
    next_marked,
    seg_cummax,
    seg_cumsum,
    seg_cumsum_nn,
)
from bfqzip_tpu.utils import native

from conftest import golden_path


def _ref_scan(x, r, comb, init):
    out = np.empty_like(x)
    cur = np.full(x.shape[:-1] if x.ndim == 2 else (), init, x.dtype)
    for i in range(x.shape[-1]):
        col = x[..., i]
        cur = col.copy() if r[i] else comb(cur, col)
        out[..., i] = cur
    return out


@pytest.mark.parametrize("n", [1, 15, 16, 4096, 16 * 5000 + 3])
def test_seg_cumsum_matches_oracle(n):
    import jax.numpy as jnp

    rng = np.random.default_rng(n)
    x = rng.integers(0, 100, n).astype(np.int32)
    r = rng.random(n) < 0.03
    r[0] = True
    got = np.asarray(seg_cumsum(jnp.asarray(x), jnp.asarray(r)))
    assert (got == _ref_scan(x, r, np.add, 0)).all()


def test_seg_scan_variants():
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    n = 5000
    x = rng.integers(0, 100, n).astype(np.int32)
    xc = rng.integers(0, 100, (7, n)).astype(np.int32)  # channel-first
    r = rng.random(n) < 0.02
    r[0] = True
    jx, jr = jnp.asarray(x), jnp.asarray(r)
    assert (np.asarray(seg_cumsum(jnp.asarray(xc), jr)) == _ref_scan(xc, r, np.add, 0)).all()
    assert (
        np.asarray(seg_cummax(jx, jr))
        == _ref_scan(x, r, np.maximum, np.iinfo(np.int32).min)
    ).all()
    assert (np.asarray(last_marked(jx, jr, 7)) == _ref_scan(x, r, lambda a, b: a, 7)).all()
    nm = np.full(n, 7, np.int32)
    cur = 7
    for i in range(n - 1, -1, -1):
        if r[i]:
            cur = x[i]
        nm[i] = cur
    assert (np.asarray(next_marked(jx, jr, 7)) == nm).all()
    # free-scan variant agrees wherever a reset has been seen
    seen = np.cumsum(r) > 0
    assert (
        np.asarray(seg_cumsum_nn(jx, jr))[seen] == _ref_scan(x, r, np.add, 0)[seen]
    ).all()
    # no flags anywhere == plain cumsum
    r0 = jnp.zeros(n, bool)
    assert (np.asarray(seg_cumsum(jx, r0)) == np.cumsum(x)).all()


@pytest.mark.skipif(not native.cm_available(), reason="native lib not built")
def test_cm_codec_roundtrip():
    rng = np.random.default_rng(0)
    cases = [
        b"",
        b"A",
        b"AAAAABBBBBCCCCC" * 100,
        rng.integers(0, 256, 100000, dtype=np.uint8).tobytes(),
        open(golden_path("example.in.fastq"), "rb").read(),
    ]
    for data in cases:
        blob = native.cm_encode(data)
        assert native.cm_decode(blob).tobytes() == data


@pytest.mark.skipif(not native.cm_available(), reason="native lib not built")
def test_cm_beats_static_rans_on_quality_stream():
    fq = open(golden_path("example.m2b0h.fq"), "rb").read()
    qs = b"\n".join(fq.split(b"\n")[3::4]) + b"\n"
    cm = len(native.cm_encode(qs))
    rn = len(rans.encode(qs))
    assert cm < rn


def test_encode_blob_best_dispatch():
    data = b"the quick brown fox jumps over the lazy dog\n" * 50
    blob = rans.encode_blob_best(data)
    assert bytes(rans.decode_blob(blob)) == data


def test_dna_ebwt_codec_roundtrip_and_ratio():
    from bfqzip_tpu.models.dna_ebwt import decode_dna_stream, encode_dna_stream

    for golden in ("example.m2b0h.fq", "synth_var.in.fastq"):
        fq = open(golden_path(golden), "rb").read()
        dna = b"\n".join(fq.split(b"\n")[1::4]) + b"\n"
        blob = encode_dna_stream(dna)
        assert blob is not None
        assert decode_dna_stream(blob) == dna
    # ineligible streams are rejected, not corrupted
    assert encode_dna_stream(b"hello world\n") is None
    assert encode_dna_stream(b"") is None
    assert encode_dna_stream(b"ACGT") is None  # no trailing newline


def test_dna_ebwt_beats_xz_on_synthetic_variable_stream():
    from bfqzip_tpu.models.dna_ebwt import encode_dna_stream

    fq = open(golden_path("synth_var.in.fastq"), "rb").read()
    dna = b"\n".join(fq.split(b"\n")[1::4]) + b"\n"
    assert len(encode_dna_stream(dna)) < len(lzma.compress(dna, preset=9))
