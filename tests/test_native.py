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


# ---- BQZC v3 blocked container + decode hardening --------------------------


def _matchy_bytes(n=600_000, seed=0):
    rng = np.random.default_rng(seed)
    frag = rng.integers(65, 69, 1000, dtype=np.uint8)
    parts = [frag[rng.integers(0, 900):][: rng.integers(50, 100)] for _ in range(n // 60)]
    return bytes(np.concatenate(parts)[:n])


@pytest.mark.skipif(not native.cm_available(), reason="cm codec not built")
def test_cm_blocked_roundtrip_and_parallel_decode():
    data = _matchy_bytes()
    blob = native.cm_encode(data, block_size=100_000, threads=2)
    assert blob[4] == 5  # v5 container (blocked + per-block model gating)
    assert bytes(native.cm_decode(blob)) == data
    # single-block (v3 with one block) also round-trips
    blob1 = native.cm_encode(data, block_size=len(data) + 1)
    assert bytes(native.cm_decode(blob1)) == data
    # blocking costs ratio, bounded (fresh model per block; the v4
    # high-order models warm up slower, so 100K blocks cost more than the
    # default 16M ones where warmup is negligible)
    assert len(blob) < len(data) // 2
    assert len(blob) <= int(len(blob1) * 1.35)


def test_rans_decode_fuzz_never_crashes():
    """Corrupt BQZR containers must raise (negative rc) or decode to garbage,
    never crash — same standard as the cm_decode fuzz (round-3 verdict #5).
    .rans files are user-facing untrusted input to decompress_stream."""
    rng = np.random.default_rng(7)
    data = rng.choice(np.frombuffer(b"ACGTN", np.uint8), size=80_000).astype(np.uint8).tobytes()
    blob = bytearray(native.rans_encode(data, spec_order=2, lanes=32))
    for trial in range(80):
        bad = bytearray(blob)
        for _ in range(rng.integers(1, 8)):
            pos = int(rng.integers(0, len(bad)))
            bad[pos] ^= 1 << int(rng.integers(0, 8))
        try:
            out = native.rans_decode(bytes(bad))
            assert out is None or len(out) >= 0
        except (ValueError, RuntimeError, MemoryError, OverflowError):
            pass
    # truncations at every region boundary
    for cut in (0, 3, 5, 12, 20, 23, 24, 30, len(blob) // 2, len(blob) - 1):
        try:
            native.rans_decode(bytes(blob[:cut]))
        except (ValueError, RuntimeError, MemoryError, OverflowError):
            pass


def test_rans_decode_rejects_hostile_headers():
    """Header-derived sizes (lanes, contexts, payload) must be bounded
    against the blob, zero lanes rejected (division by zero), and freq rows
    that do not tile the 4096 slots rejected (slot-table overflow)."""
    import struct

    data = b"ACGT" * 1000
    blob = bytearray(native.rans_encode(data, spec_order=1, lanes=8))
    # lanes = 0
    bad = bytearray(blob)
    bad[16:20] = struct.pack("<I", 0)
    with pytest.raises(ValueError):
        native.rans_decode(bytes(bad))
    # absurd lanes (would read states far past the blob)
    bad = bytearray(blob)
    bad[16:20] = struct.pack("<I", 0xFFFFFF00)
    with pytest.raises(ValueError):
        native.rans_decode(bytes(bad))
    # corrupt a freq-table entry so the context row no longer sums to 4096
    k = blob[6] + 1
    foff = 24 + k
    bad = bytearray(blob)
    bad[foff : foff + 2] = struct.pack("<H", 0xFFFF)
    with pytest.raises(ValueError):
        native.rans_decode(bytes(bad))
    # intact blob still round-trips after all this
    assert native.rans_decode(bytes(blob)).tobytes() == data


@pytest.mark.skipif(not native.cm_available(), reason="cm codec not built")
def test_cm_v4_rc_match_dna_roundtrip_and_gain():
    """The v4 reverse-complement match model: half of Illumina reads are
    RC-strand, so their inter-read repeats are invisible to the forward
    match model.  A workload of fragments + their reverse complements must
    round-trip and compress far better than shuffled (non-RC) content."""
    comp = {65: 84, 84: 65, 67: 71, 71: 67, 78: 78}  # A<->T C<->G N->N
    rng = np.random.default_rng(11)
    genome = rng.choice(np.frombuffer(b"ACGT", np.uint8), size=40_000)
    reads = []
    for _ in range(3000):
        s = int(rng.integers(0, genome.size - 100))
        frag = genome[s : s + 100]
        if rng.random() < 0.5:
            frag = np.array([comp[b] for b in frag[::-1]], np.uint8)
        reads.append(frag.tobytes())
    data = b"\n".join(reads) + b"\n"
    blob = native.cm_encode(data, threads=2)
    assert bytes(native.cm_decode(blob)) == data
    # forward-only content for comparison: same fragments, never flipped
    reads_f = []
    rng = np.random.default_rng(11)
    for _ in range(3000):
        s = int(rng.integers(0, genome.size - 100))
        reads_f.append(genome[s : s + 100].tobytes())
        rng.random()
    data_f = b"\n".join(reads_f) + b"\n"
    blob_f = native.cm_encode(data_f, threads=2)
    assert bytes(native.cm_decode(blob_f)) == data_f
    # RC-strand data must not cost much more than forward-only data: the RC
    # match model recovers the other strand's repeats
    assert len(blob) < int(len(blob_f) * 1.35)


@pytest.mark.skipif(not native.cm_available(), reason="cm codec not built")
def test_cm_v4_container_still_decodes():
    """Container back-compat: a golden v4 archive (generated with the pre-v5
    library) must keep decoding bit-exactly — v5's model/policy changes are
    version-gated in the shared coding path."""
    from conftest import golden_path

    blob = open(golden_path("cm_v4_sample.bqzc"), "rb").read()
    assert blob[4] == 4
    rng = np.random.default_rng(0)
    frag = rng.integers(65, 69, 1000, dtype=np.uint8)
    parts = [frag[rng.integers(0, 900):][: rng.integers(50, 100)]
             for _ in range(200_000 // 60)]
    data = bytes(np.concatenate(parts)[:200_000])
    assert bytes(native.cm_decode(blob)) == data


@pytest.mark.skipif(not native.cm_available(), reason="cm codec not built")
def test_cm_profile_fast_roundtrip():
    """BFQ_CM_PROFILE=fast (round-4 verdict #5): the speed/ratio knob.  fast
    archives round-trip, carry flags bit1, and may be larger than max; an
    invalid profile raises."""
    comp = {65: 84, 84: 65, 67: 71, 71: 67}
    rng = np.random.default_rng(3)
    genome = rng.choice(np.frombuffer(b"ACGT", np.uint8), size=30_000)
    reads = []
    for _ in range(2000):
        s = int(rng.integers(0, genome.size - 100))
        frag = genome[s : s + 100]
        if rng.random() < 0.5:
            frag = np.array([comp[b] for b in frag[::-1]], np.uint8)
        reads.append(frag.tobytes())
    data = b"\n".join(reads) + b"\n"
    fast = native.cm_encode(data, threads=1, profile="fast")
    maxi = native.cm_encode(data, threads=1, profile="max")
    assert fast[6] & 2  # flags byte bit1 = fast
    assert not (maxi[6] & 2)
    assert bytes(native.cm_decode(fast)) == data
    assert bytes(native.cm_decode(maxi)) == data
    # the max profile's RC model captures the other strand's repeats
    assert len(maxi) <= len(fast)
    with pytest.raises(ValueError):
        native.cm_encode(data, profile="turbo")


@pytest.mark.skipif(not native.cm_available(), reason="cm codec not built")
def test_cm_encode_rejects_oversize_block():
    # the v3 header stores block_size as u32; larger must be rejected (-5),
    # not truncated into a self-inconsistent container (round-3 advisor)
    with pytest.raises(RuntimeError, match="-5"):
        native.cm_encode(b"hello world" * 100, block_size=(1 << 32) + 5)


@pytest.mark.skipif(not native.cm_available(), reason="cm codec not built")
def test_cm_encode_tiny_block_size():
    # a pathological block_size must not overflow the output capacity via the
    # 4-byte-per-block length table (round-3 advisor): degrade, don't raise
    data = b"ACGT" * 500
    blob = native.cm_encode(data, block_size=1)
    assert bytes(native.cm_decode(blob)) == data


@pytest.mark.skipif(not native.cm_available(), reason="cm codec not built")
def test_cm_decode_fuzz_never_crashes():
    """Corrupt containers must raise (negative rc) or decode to garbage —
    never crash the process (the valgrind-target analog for the decode path,
    reference src_int_mem/Makefile:43-45)."""
    data = _matchy_bytes(120_000, seed=1)
    blob = bytearray(native.cm_encode(data, block_size=50_000))
    rng = np.random.default_rng(2)
    for trial in range(60):
        bad = bytearray(blob)
        for _ in range(rng.integers(1, 8)):
            pos = int(rng.integers(0, len(bad)))
            bad[pos] ^= 1 << int(rng.integers(0, 8))
        try:
            out = native.cm_decode(bytes(bad))
            assert out is None or len(out) >= 0
        except (ValueError, RuntimeError, MemoryError, OverflowError):
            pass
    # truncations at every region boundary
    for cut in (0, 3, 5, 12, 20, 25, len(blob) // 2, len(blob) - 1):
        try:
            native.cm_decode(bytes(blob[:cut]))
        except (ValueError, RuntimeError, MemoryError, OverflowError):
            pass


@pytest.mark.skipif(not native.cm_available(), reason="cm codec not built")
def test_cm_decode_rejects_hostile_v1_tier():
    """A v1 header claiming tier=1 with k>64 indexed out of bounds before the
    round-3 bounds fix; it must now be rejected."""
    import struct

    hdr = b"BQZC" + bytes([1, 255, 1, 0]) + struct.pack("<QI", 100, 4)
    blob = hdr + bytes(range(256)) + b"\x00\x00\x00\x00"
    with pytest.raises(ValueError):
        native.cm_decode(blob)


@pytest.mark.skipif(not native.cm_available(), reason="cm codec not built")
def test_cm_positional_context_roundtrip_and_gain():
    """The v3 positional model (flags bit0) conditions on in-record position
    reset at a chosen byte; quality-like lines must round-trip and compress
    better than without it."""
    rng = np.random.default_rng(5)
    L, N = 101, 12_000
    pos_mean = 38.0 - 18.0 * (np.arange(L) / L) ** 1.5
    q = np.clip(rng.normal(pos_mean[None, :], 4.0, (N, L)), 2, 40).astype(np.int32) + 33
    lines = np.concatenate([q.astype(np.uint8), np.full((N, 1), 10, np.uint8)], axis=1)
    data = lines.tobytes()
    plain = native.cm_encode(data)
    posb = native.cm_encode(data, pos_reset=10)
    assert posb[6] & 1  # flags bit0 (bit2 = canonical tree may also be set)
    assert bytes(native.cm_decode(posb)) == data
    assert len(posb) < len(plain)
    # blocked + positional together
    blk = native.cm_encode(data, block_size=200_000, pos_reset=10)
    assert bytes(native.cm_decode(blk)) == data


@pytest.mark.skipif(not native.cm_available(), reason="cm codec not built")
def test_cm_canonical_tree_roundtrip_and_hostile_depths():
    """v5 canonical skewed coding tree (flags bit2): skewed alphabets carry a
    per-symbol depth table and code frequent symbols in fewer tree steps;
    round-trips must hold and corrupt depth tables must be rejected, not
    walked out of bounds."""
    import struct

    # heavily skewed: 'a' dominates, long tail — canonical tree engages
    rng = np.random.default_rng(9)
    syms = np.frombuffer(b"abcdefghij", np.uint8)
    probs = np.array([0.6, 0.2, 0.1, 0.04, 0.02, 0.02, 0.01, 0.005, 0.004, 0.001])
    data = rng.choice(syms, size=400_000, p=probs / probs.sum()).tobytes()
    blob = native.cm_encode(data, threads=1)
    assert blob[6] & 4, "canonical tree should engage on a skewed alphabet"
    assert bytes(native.cm_decode(blob)) == data

    # uniform alphabet: the encoder must NOT engage the skewed tree
    datau = rng.choice(syms[:8], size=100_000).tobytes()
    blobu = native.cm_encode(datau, threads=1)
    assert not (blobu[6] & 4)
    assert bytes(native.cm_decode(blobu)) == datau

    # hostile depth tables: zero depth, kraft violation, truncated
    k = blob[5] + 1
    for mutate in (lambda d: 0, lambda d: 31, lambda d: d + 1):
        bad = bytearray(blob)
        bad[24 + k] = mutate(bad[24 + k])  # first depth byte
        try:
            out = native.cm_decode(bytes(bad))
            assert out is None or len(out) >= 0  # garbage ok, crash not
        except (ValueError, RuntimeError, MemoryError, OverflowError):
            pass
