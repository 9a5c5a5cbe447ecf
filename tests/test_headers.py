"""Header-codec tests."""

import numpy as np
import pytest

from bfqzip_tpu.io.fastq import read_fastq
from bfqzip_tpu.models.headers import decode_headers, encode_headers

from conftest import golden_path


def test_roundtrip_illumina():
    batch = read_fastq(golden_path("example.in.fastq"))
    blob = encode_headers(batch.headers)
    assert decode_headers(blob) == batch.headers
    raw = b"\n".join(batch.headers) + b"\n"
    # tokenised headers must compress far better than raw bytes
    assert len(blob) < len(raw) // 4


def test_roundtrip_nonuniform():
    headers = [b"@read_one", b"@2 another kind", b"@x 9 9 9"]
    blob = encode_headers(headers)
    assert decode_headers(blob) == headers


def test_roundtrip_leading_zeros():
    headers = [b"@s.%04d" % i for i in (1, 7, 42, 999)]
    blob = encode_headers(headers)
    assert decode_headers(blob) == headers


def test_roundtrip_empty():
    assert decode_headers(encode_headers([])) == []


def test_mixed_width_numbers():
    headers = [b"@r%d suff" % v for v in (5, 50, 500, 4999)]
    blob = encode_headers(headers)
    assert decode_headers(blob) == headers
