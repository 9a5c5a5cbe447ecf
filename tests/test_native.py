"""Native C++ runtime tests (skipped when the library isn't built)."""

import numpy as np
import pytest

from bfqzip_tpu import alphabet
from bfqzip_tpu.models.context import Order1Spec, Order2Spec
from bfqzip_tpu.ops import rans
from bfqzip_tpu.utils import native

from conftest import golden_path

pytestmark = pytest.mark.skipif(not native.available(), reason="libbfqnative.so not built")


def test_native_fastq_parse_matches_python():
    from bfqzip_tpu.io.fastq import parse_fastq

    data = open(golden_path("synth_var.in.fastq"), "rb").read()
    py = parse_fastq(data)
    from bfqzip_tpu.alphabet import _ENCODE

    res = native.fastq_parse(data, _ENCODE)
    seqs, quals, lengths, hoff, hlen = res
    assert np.array_equal(seqs, py.seqs)
    assert np.array_equal(quals, py.quals)
    assert np.array_equal(lengths, py.lengths)
    hdrs = [data[o : o + l] for o, l in zip(hoff, hlen)]
    assert hdrs == py.headers


def test_native_fastq_format_roundtrip():
    data = open(golden_path("example.in.fastq"), "rb").read()
    from bfqzip_tpu.alphabet import _DECODE, _ENCODE

    seqs, quals, lengths, hoff, hlen = native.fastq_parse(data, _ENCODE)
    out = native.fastq_format(seqs, quals, lengths, _DECODE, data, hoff, hlen)
    assert out == data
    out2 = native.fastq_format(seqs, quals, lengths, _DECODE)
    assert out2.startswith(b"@\n")


def test_native_rans_roundtrip_and_interop():
    rng = np.random.default_rng(0)
    data = rng.choice(np.frombuffer(b"ACGTN", np.uint8), size=60_000).astype(np.uint8).tobytes()
    # native encode -> native decode
    blob = native.rans_encode(data, spec_order=2, lanes=64)
    assert native.rans_decode(blob).tobytes() == data
    # native encode -> JAX decode
    assert bytes(rans.decode(blob)) == data
    # JAX encode -> native decode
    blob2 = rans.encode(np.frombuffer(data, np.uint8), Order2Spec, lanes=64)
    assert native.rans_decode(blob2).tobytes() == data


def test_native_rans_order1_qs_stream():
    qs = b"\n".join(open(golden_path("example.m2b0.fq"), "rb").read().split(b"\n")[3::4]) + b"\n"
    blob = native.rans_encode(qs, spec_order=1, lanes=32)
    assert native.rans_decode(blob).tobytes() == qs
    assert bytes(rans.decode(blob)) == qs
