"""EBWT-domain codec for DNA line streams ("BQZE" containers).

The reference compresses the smoothed DNA stream with PPMd/BSC
(BFQzip.py:253-275) — both exploit the stream's repeat structure through
generic means (PPM contexts, a block-sorting transform).  This framework
already OWNS a block-sorting transform: the stage-1 EBWT builder
(ops/suffix.py).  So the DNA codec applies the EBWT of the read collection —
turning every repeated substring across reads into runs — and entropy-codes
the transformed string with the adaptive run/order-2 context model
(native/cm_codec.cpp).  Decoding inverts the EBWT by the lock-step LF walk
(ops/invert.py), recovering the reads in their original order because the
per-read terminators sort by read index (ops/suffix.py docstring).

Container "BQZE" v1:
  magic[4] 'BQZE', u8 version, u8 flags, u16 pad
  u32 n_reads, u32 max_len, u64 n (EBWT length), u64 raw_len
  entropy blob of the EBWT string (ASCII A,C,G,T,N,#) — BQZC or BQZR

Eligible streams are newline-terminated lines of A,C,G,T,N (exactly what
step 4 emits); encode_dna_stream returns None otherwise so callers fall back
to the generic byte coders.
"""

from __future__ import annotations

import struct
from typing import Optional

import numpy as np

from bfqzip_tpu import alphabet
from bfqzip_tpu.ops import rans

MAGIC = b"BQZE"

_ELIGIBLE = np.zeros(256, bool)
for _c in b"ACGTN":
    _ELIGIBLE[_c] = True


def encode_dna_stream(data: bytes) -> Optional[bytes]:
    """EBWT + entropy-code a '\\n'-joined DNA line stream; None if ineligible."""
    if len(data) == 0 or data[-1:] != b"\n":
        return None
    buf = np.frombuffer(data, np.uint8)
    nl = np.flatnonzero(buf == ord("\n"))
    starts = np.concatenate(([0], nl[:-1] + 1))
    lengths = (nl - starts).astype(np.int64)
    if lengths.size == 0 or (lengths == 0).any():
        return None
    body = np.delete(buf, nl)
    if not _ELIGIBLE[body].all():
        return None

    n_reads = int(lengths.size)
    width = int(lengths.max())
    offs = np.arange(width, dtype=np.int64)
    idx = np.minimum(starts[:, None] + offs[None, :], buf.size - 1)
    mask = offs[None, :] < lengths[:, None]
    seq_ascii = np.where(mask, buf[idx], 0).astype(np.uint8)
    seqs = np.zeros_like(seq_ascii)
    seqs[mask] = alphabet.encode(seq_ascii[mask])

    import jax.numpy as jnp

    from bfqzip_tpu.io.fastq import ReadBatch, pad_batch
    from bfqzip_tpu.ops.suffix import build_ebwt

    batch = pad_batch(
        ReadBatch(seqs=seqs, quals=np.zeros_like(seqs), lengths=lengths.astype(np.int32))
    )
    dev = build_ebwt(
        jnp.asarray(batch.seqs), jnp.asarray(batch.quals), jnp.asarray(batch.lengths)
    )
    n = int(dev.n)
    bwt_ascii = alphabet.decode(np.asarray(dev.bwt)[:n])
    blob = rans.encode_blob_best(bwt_ascii.tobytes())
    header = MAGIC + struct.pack("<BBxxIIQQ", 1, 0, n_reads, width, n, len(data))
    return header + blob


def decode_dna_stream(blob: bytes) -> bytes:
    if blob[:4] != MAGIC:
        raise ValueError("not a bfqzip EBWT container")
    ver, _flags, n_reads, width, n, raw_len = struct.unpack_from("<BBxxIIQQ", blob, 4)
    if ver != 1:
        raise ValueError(f"unsupported BQZE version {ver}")
    bwt_ascii = np.asarray(rans.decode_blob(blob[32:]))
    assert bwt_ascii.size == n

    import jax.numpy as jnp

    from bfqzip_tpu.ops.invert import invert
    from bfqzip_tpu.ops.rank import lf_array

    bwt = alphabet.encode(bwt_ascii)
    n_pad = -(-n // 1024) * 1024
    bwt_p = jnp.asarray(np.pad(bwt, (0, n_pad - n), constant_values=alphabet.SIGMA))
    valid = jnp.arange(n_pad, dtype=jnp.int32) < n
    lf = lf_array(bwt_p, valid)
    inv = invert(bwt_p, bwt_p, jnp.zeros_like(bwt_p), lf, n_reads, width)
    seqs = np.asarray(inv.seqs)
    lengths = np.asarray(inv.lengths).astype(np.int64)

    out = np.full((n_reads, width + 1), ord("\n"), np.uint8)
    offs = np.arange(width, dtype=np.int64)
    mask = offs[None, :] < lengths[:, None]
    dec = alphabet.decode(seqs[:, :width])
    out[:, :width] = np.where(mask, dec, 0)
    # compact: keep per-row the first `length` chars + one newline
    keep = np.concatenate([mask, np.ones((n_reads, 1), bool)], axis=1)
    data = out[keep].tobytes()
    assert len(data) == raw_len, (len(data), raw_len)
    return data
