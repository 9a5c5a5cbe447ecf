"""rANS coder round-trip and compression-ratio sanity tests."""

import numpy as np
import pytest

from bfqzip_tpu.models.context import Order0Spec, Order1Spec, Order2Spec
from bfqzip_tpu.ops import rans

from conftest import golden_path


@pytest.mark.parametrize("spec", [Order0Spec, Order1Spec, Order2Spec])
def test_roundtrip_dna(spec):
    rng = np.random.default_rng(0)
    data = rng.choice(np.frombuffer(b"ACGT", np.uint8), size=100_000).astype(np.uint8)
    blob = rans.encode(data, spec, lanes=64)
    out = rans.decode(blob)
    assert np.array_equal(out, data)


def test_roundtrip_skewed():
    rng = np.random.default_rng(1)
    data = rng.choice(256, p=np.r_[0.9, np.full(255, 0.1 / 255)], size=50_000).astype(np.uint8)
    blob = rans.encode(data, lanes=128)
    assert np.array_equal(rans.decode(blob), data)


@pytest.mark.parametrize("n", [0, 1, 5, 63, 64, 65, 100_001])
def test_roundtrip_sizes(n):
    rng = np.random.default_rng(n)
    data = rng.integers(0, 5, n).astype(np.uint8)
    blob = rans.encode(data, lanes=64)
    assert np.array_equal(rans.decode(blob), data)


def test_roundtrip_real_streams():
    fq = open(golden_path("example.m2b0.fq"), "rb").read()
    lines = fq.split(b"\n")
    dna = b"\n".join(lines[1::4]) + b"\n"
    qs = b"\n".join(lines[3::4]) + b"\n"
    for stream in (dna, qs):
        blob = rans.encode(stream)
        assert bytes(rans.decode(blob)) == stream


def test_ratio_on_smoothed_qs():
    fq = open(golden_path("example.m2b0.fq"), "rb").read()
    qs = b"\n".join(fq.split(b"\n")[3::4]) + b"\n"
    blob = rans.encode_best(qs)
    assert bytes(rans.decode(blob)) == qs
    # smoothed qualities are highly repetitive: expect strong compression
    assert len(blob) < len(qs) // 2


def test_ratio_on_dna_stream():
    fq = open(golden_path("example.m2b0.fq"), "rb").read()
    dna = b"\n".join(fq.split(b"\n")[1::4]) + b"\n"
    blob = rans.encode_best(dna)
    assert bytes(rans.decode(blob)) == dna
    # ~2 bits/base upper bound for random DNA
    assert len(blob) < len(dna) * 2 // 7


def test_bad_magic():
    with pytest.raises(ValueError):
        rans.decode(b"NOPE" + b"\x00" * 64)
