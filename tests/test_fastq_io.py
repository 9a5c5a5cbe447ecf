import numpy as np
import pytest

from bfqzip_tpu import alphabet
from bfqzip_tpu.io.fastq import format_fastq, parse_fastq, read_fastq

from conftest import golden_path


def test_roundtrip_example():
    data = open(golden_path("example.in.fastq"), "rb").read()
    batch = parse_fastq(data)
    assert batch.num_reads == 100
    assert batch.max_len == 101
    assert (batch.lengths == 101).all()
    assert format_fastq(batch) == data


def test_roundtrip_varlen():
    data = open(golden_path("synth_var.in.fastq"), "rb").read()
    batch = parse_fastq(data)
    assert batch.lengths.min() >= 40
    assert format_fastq(batch) == data


def test_headerless_format():
    data = b"@r0\nACGT\n+\nIIII\n"
    batch = parse_fastq(data)
    assert format_fastq(batch, headers=None) == b"@\nACGT\n+\nIIII\n"


def test_alphabet_roundtrip():
    s = np.frombuffer(b"ACGTN#", dtype=np.uint8)
    assert (alphabet.decode(alphabet.encode(s)) == s).all()
    assert alphabet.encode(np.frombuffer(b"acgtn", dtype=np.uint8)).tolist() == [1, 2, 3, 5, 4]


def test_invalid_base_raises():
    with pytest.raises(ValueError):
        parse_fastq(b"@r0\nACGX\n+\nIIII\n")


def test_length_mismatch_raises():
    with pytest.raises(ValueError):
        parse_fastq(b"@r0\nACGT\n+\nIII\n")


def test_missing_final_newline():
    data = b"@r0\nACGT\n+\nIIII"
    batch = parse_fastq(data)
    assert batch.num_reads == 1
    assert bytes(alphabet.decode(batch.seqs[0])) == b"ACGT"
