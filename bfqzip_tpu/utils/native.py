"""ctypes bindings for the native C++ runtime (native/libbfqnative.so).

The native library accelerates the host-side IO and entropy-coding paths
(FASTQ parse/format, rANS encode/decode); every entry point has a pure
numpy/JAX fallback, so the package works without the shared library.
Build with `make native` (or `make -C native`).
"""

from __future__ import annotations

import ctypes
import os
import time
from typing import List, Optional, Tuple

import numpy as np

_LIB = None
_SEARCHED = False


def _autobuild(native_dir: str) -> None:
    """Build the shared library in-place on first import if the toolchain is
    available (fresh checkouts: make -C native).  Failures are silent — every
    entry point has a numpy fallback."""
    import subprocess

    try:
        subprocess.run(
            ["make", "-C", native_dir],
            check=True,
            capture_output=True,
            timeout=120,
        )
    except Exception:
        pass


def _find_lib():
    global _LIB, _SEARCHED
    if _SEARCHED:
        return _LIB
    _SEARCHED = True
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    native_dir = os.path.join(here, "native")
    candidates = (
        os.path.join(native_dir, "libbfqnative.so"),
        os.path.join(os.path.dirname(__file__), "libbfqnative.so"),
    )
    if not any(os.path.exists(c) for c in candidates) and os.path.exists(
        os.path.join(native_dir, "Makefile")
    ):
        _autobuild(native_dir)
    for cand in candidates:
        if os.path.exists(cand):
            # A corrupt/stale .so (failed link, ABI mismatch) must degrade to
            # the numpy path, not crash the import.
            try:
                lib = ctypes.CDLL(cand)
                # Every size/length parameter is int64 on the C side;
                # without argtypes, ctypes passes python ints as 32-bit —
                # a >2GB FASTQ once truncated to a NEGATIVE size and parsed
                # as 0 reads.  Declare all signatures explicitly.
                vp, i64, i32 = ctypes.c_void_p, ctypes.c_int64, ctypes.c_int
                lib.fastq_scan.restype = i32
                lib.fastq_scan.argtypes = [vp, i64, vp, vp]
                lib.fastq_fill.restype = i32
                lib.fastq_fill.argtypes = [vp, i64, vp, i64, vp, vp, vp, vp, vp]
                lib.fastq_format.restype = i64
                lib.fastq_format.argtypes = [vp, vp, vp, i64, i64, vp, vp, vp, vp, vp]
                lib.rans_encode.restype = i64
                lib.rans_encode.argtypes = [vp, i64, i32, i32, vp, i64]
                lib.rans_decode.restype = i64
                lib.rans_decode.argtypes = [vp, i64, vp, i64]
                if hasattr(lib, "cm_encode"):
                    lib.cm_encode.restype = i64
                    lib.cm_encode.argtypes = [vp, i64, vp, i64]
                if hasattr(lib, "cm_encode_blocked"):
                    lib.cm_encode_blocked.restype = i64
                    lib.cm_encode_blocked.argtypes = [vp, i64, vp, i64, i64, i32, i32]
                if hasattr(lib, "cm_decode"):
                    lib.cm_decode.restype = i64
                    lib.cm_decode.argtypes = [vp, i64, vp, i64]
                if hasattr(lib, "ext_merge"):
                    lib.ext_merge.restype = i64
                    lib.ext_merge.argtypes = [vp, vp, i64, vp, vp, i32,
                                              vp, vp, vp, vp, vp]
                if hasattr(lib, "ext_merge_mt"):
                    lib.ext_merge_mt.restype = i64
                    lib.ext_merge_mt.argtypes = [vp, vp, i64, vp, vp, i32,
                                                 vp, vp, vp, vp, vp, i32]
                if hasattr(lib, "ext_merge_mt2"):
                    lib.ext_merge_mt2.restype = i64
                    lib.ext_merge_mt2.argtypes = [vp, vp, i64, vp, vp, vp, i32,
                                                  vp, vp, vp, vp, vp, i32]
                if hasattr(lib, "ext_merge_mt3"):
                    lib.ext_merge_mt3.restype = i64
                    lib.ext_merge_mt3.argtypes = [vp, vp, i64, vp, vp, vp, i32,
                                                  vp, vp, vp, vp, vp, i32]
                if hasattr(lib, "ext_merge_mt2p"):
                    lib.ext_merge_mt2p.restype = i64
                    lib.ext_merge_mt2p.argtypes = [vp, vp, i64, vp, vp, vp, i32,
                                                   vp, vp, vp, vp, vp, i32, vp]
                if hasattr(lib, "ext_merge_mt3p"):
                    lib.ext_merge_mt3p.restype = i64
                    lib.ext_merge_mt3p.argtypes = [vp, vp, i64, vp, vp, vp, i32,
                                                   vp, vp, vp, vp, vp, i32, vp]
            except (OSError, AttributeError):
                continue
            _LIB = lib
            break
    return _LIB


def available() -> bool:
    return _find_lib() is not None


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.c_void_p)


def fastq_parse(data: bytes, code_map: np.ndarray):
    """Parse FASTQ bytes -> (seqs, quals, lengths, header_off, header_len).
    Returns None if the native library is unavailable."""
    lib = _find_lib()
    if lib is None:
        return None
    buf = np.frombuffer(data, np.uint8)
    n_reads = ctypes.c_int64()
    max_len = ctypes.c_int64()
    rc = lib.fastq_scan(_ptr(buf), len(data), ctypes.byref(n_reads), ctypes.byref(max_len))
    if rc != 0:
        raise ValueError(f"malformed FASTQ (native scan rc={rc})")
    n, w = n_reads.value, max_len.value
    seqs = np.zeros((n, w), np.uint8)
    quals = np.zeros((n, w), np.uint8)
    lengths = np.zeros(n, np.int32)
    hoff = np.zeros(n, np.int64)
    hlen = np.zeros(n, np.int64)
    rc = lib.fastq_fill(_ptr(buf), len(data), _ptr(code_map), w,
                        _ptr(seqs), _ptr(quals), _ptr(lengths), _ptr(hoff), _ptr(hlen))
    if rc != 0:
        raise ValueError(f"invalid FASTQ content (native fill rc={rc})")
    return seqs, quals, lengths, hoff, hlen


def fastq_format(seqs, quals, lengths, decode_map, headers_blob=None, hoff=None, hlen=None) -> Optional[bytes]:
    lib = _find_lib()
    if lib is None:
        return None
    n, w = seqs.shape
    lengths64 = lengths.astype(np.int64)
    if headers_blob is not None:
        hsize = int(hlen.sum())
    else:
        hsize = n  # bare '@'
    total = int(hsize + n * 3 + 2 * lengths64.sum() + 3 * n)
    out = np.zeros(total + 16, np.uint8)
    hb = np.frombuffer(headers_blob, np.uint8) if headers_blob is not None else None
    written = lib.fastq_format(
        _ptr(np.ascontiguousarray(seqs)), _ptr(np.ascontiguousarray(quals)),
        _ptr(np.ascontiguousarray(lengths.astype(np.int32))),
        n, w, _ptr(decode_map),
        _ptr(hb) if hb is not None else None,
        _ptr(hoff.astype(np.int64)) if hoff is not None else None,
        _ptr(hlen.astype(np.int64)) if hlen is not None else None,
        _ptr(out),
    )
    if written < 0:
        raise RuntimeError(f"native fastq_format rc={written}")
    return out[:written].tobytes()


def rans_encode(data: bytes, spec_order: int, lanes: int) -> Optional[bytes]:
    lib = _find_lib()
    if lib is None:
        return None
    buf = np.frombuffer(data, np.uint8)
    cap = len(data) * 2 + (1 << 20)
    out = np.zeros(cap, np.uint8)
    size = lib.rans_encode(_ptr(buf), len(data), spec_order, lanes, _ptr(out), cap)
    if size < 0:
        raise RuntimeError(f"native rans_encode rc={size}")
    return out[:size].tobytes()


def cm_available() -> bool:
    lib = _find_lib()
    return lib is not None and hasattr(lib, "cm_encode")


def cm_encode(
    data: bytes, block_size: int = 0, threads: int = 0, pos_reset: int = -1,
    profile: Optional[str] = None,
) -> Optional[bytes]:
    """Adaptive context-model coder (native/cm_codec.cpp, magic BQZC).

    Emits the blocked v3 container (independent per-block models, encoded and
    decoded on a thread pool — the bsc -T analog) when the library provides
    it; block_size<=0 picks the 16M-symbol default, threads<=0 auto-detects
    (BFQ_CM_THREADS overrides).  pos_reset >= 0 enables the positional
    context model with that byte restarting the in-record position counter
    (pass ord('\\n') for line-structured streams like .fq.qs).  profile
    ('fast' | 'max', default from BFQ_CM_PROFILE, else 'max') selects the
    speed/ratio point — the bsc-vs-PPMd axis (reference BFQzip.py:253-275):
    'fast' drops the RC/order-4/order-6 models for faster decode at a ratio
    cost; 'max' keeps everything with per-block benefit gating.  Falls back
    to the single-stream v2 entry point with an older library."""
    lib = _find_lib()
    if lib is None or not hasattr(lib, "cm_encode"):
        return None
    if profile is not None:
        if profile not in ("fast", "max"):
            raise ValueError(f"profile must be 'fast' or 'max', got {profile!r}")
        old = os.environ.get("BFQ_CM_PROFILE")
        os.environ["BFQ_CM_PROFILE"] = profile
        try:
            return cm_encode(data, block_size, threads, pos_reset)
        finally:
            if old is None:
                os.environ.pop("BFQ_CM_PROFILE", None)
            else:
                os.environ["BFQ_CM_PROFILE"] = old
    buf = np.frombuffer(data, np.uint8)
    cap = len(data) + len(data) // 2 + (1 << 16)
    # the v3 container carries a 4-byte length per block: size the capacity
    # from the actual block count so a tiny explicit block_size cannot make
    # the table alone overflow cap (native rc=-2)
    eff_bsize = block_size if block_size > 0 else 16 * 1024 * 1024
    cap += 4 * (max(len(data) + eff_bsize - 1, 1) // eff_bsize) + 64
    out = np.zeros(cap, np.uint8)
    if hasattr(lib, "cm_encode_blocked"):
        size = lib.cm_encode_blocked(
            _ptr(buf), len(data), _ptr(out), cap,
            ctypes.c_int64(block_size), ctypes.c_int(threads),
            ctypes.c_int(pos_reset),
        )
    else:
        size = lib.cm_encode(_ptr(buf), len(data), _ptr(out), cap)
    if size < 0:
        raise RuntimeError(f"native cm_encode rc={size}")
    return out[:size].tobytes()


def cm_decode(blob: bytes) -> Optional[np.ndarray]:
    lib = _find_lib()
    if lib is None or not hasattr(lib, "cm_decode"):
        return None
    buf = np.frombuffer(blob, np.uint8)
    n = lib.cm_decode(_ptr(buf), len(blob), None, 0)
    if n < 0:
        raise ValueError(f"native cm_decode rc={n}")
    out = np.zeros(int(n), np.uint8)
    rc = lib.cm_decode(_ptr(buf), len(blob), _ptr(out), int(n))
    if rc < 0:
        raise ValueError(f"native cm_decode rc={rc}")
    return out


def ext_merge_available() -> bool:
    lib = _find_lib()
    return lib is not None and hasattr(lib, "ext_merge")


def ext_merge(text: np.ndarray, qtext: np.ndarray, sa_chunks, threads: int = 0,
              lcp_chunks=None, out=None):
    """K-way merge of per-chunk sorted suffix orders (native/extmerge.cpp).

    text/qtext: [n_pad] u8 padded layout (0 = terminator/pad); sa_chunks: list
    of i32 arrays of GLOBAL suffix positions, each sorted by suffix — or a
    tuple (sa_all, offs) of one preconcatenated i32 array plus int64 chunk
    offsets (the spill path avoids the concat copy).  Returns
    (bwt, qs, lcp_u8, pre, sa) in merged order.  The output is partitioned by
    splitter suffixes and merged on `threads` host threads (0 = auto;
    BFQ_EXT_THREADS overrides).  lcp_chunks (optional, aligned u8 255-capped
    intra-chunk LCPs from the device sorts, list or one array) switches the
    merge to the LCP loser tree — comparisons become integer compares, text
    is only walked on exact ties.  out (optional): 5 preallocated arrays
    (bwt, qs, lcp, pre, sa) — np.memmap for the bounded-RSS path.
    """
    lib = _find_lib()
    if lib is None or not hasattr(lib, "ext_merge"):
        raise RuntimeError("native ext_merge unavailable (make -C native)")
    text = np.ascontiguousarray(text, np.uint8)
    qtext = np.ascontiguousarray(qtext, np.uint8)
    if isinstance(sa_chunks, tuple):
        sa_all, offs = sa_chunks
        # int64 suffix positions select the 64-bit merge (required beyond
        # 2^31 total positions, ~21M 101bp reads)
        sa_dtype = np.int64 if sa_all.dtype == np.int64 else np.int32
        sa_all = np.ascontiguousarray(sa_all, sa_dtype)
        offs = np.ascontiguousarray(offs, np.int64)
        n_chunks = offs.size - 1
    else:
        sa_dtype = (np.int64
                    if any(np.asarray(c).dtype == np.int64 for c in sa_chunks)
                    else np.int32)
        sa_all = np.ascontiguousarray(np.concatenate(sa_chunks), sa_dtype)
        offs = np.zeros(len(sa_chunks) + 1, np.int64)
        np.cumsum([len(c) for c in sa_chunks], out=offs[1:])
        n_chunks = len(sa_chunks)
    wide = sa_dtype == np.int64
    if wide and not hasattr(lib, "ext_merge_mt3"):
        raise RuntimeError("int64 suffix merge needs ext_merge_mt3 (rebuild native)")
    total = int(offs[-1])
    if out is not None:
        bwt, qs, lcp, pre, sa = out
        if any(a.size != total for a in out):
            raise ValueError("out arrays must have the merged total size")
        if sa.dtype != sa_dtype:
            raise ValueError(f"out sa dtype {sa.dtype} != input {sa_dtype}")
    else:
        bwt = np.empty(total, np.uint8)
        qs = np.empty(total, np.uint8)
        lcp = np.empty(total, np.uint8)
        pre = np.empty(total, np.uint8)
        sa = np.empty(total, sa_dtype)
    if wide or (lcp_chunks is not None and hasattr(lib, "ext_merge_mt2")):
        if lcp_chunks is None:
            lcp_all = None
        elif isinstance(lcp_chunks, np.ndarray):
            lcp_all = np.ascontiguousarray(lcp_chunks, np.uint8)
        else:
            lcp_all = np.ascontiguousarray(np.concatenate(lcp_chunks), np.uint8)
        if lcp_all is not None and lcp_all.size != total:
            raise ValueError("lcp_chunks must align with sa_chunks")
        fn = lib.ext_merge_mt3 if wide else lib.ext_merge_mt2
        rc = fn(
            _ptr(text), _ptr(qtext), ctypes.c_int64(text.size),
            _ptr(sa_all), _ptr(lcp_all) if lcp_all is not None else None,
            _ptr(offs), ctypes.c_int32(n_chunks),
            _ptr(bwt), _ptr(qs), _ptr(lcp), _ptr(pre), _ptr(sa),
            ctypes.c_int32(threads),
        )
    elif hasattr(lib, "ext_merge_mt"):
        rc = lib.ext_merge_mt(
            _ptr(text), _ptr(qtext), ctypes.c_int64(text.size),
            _ptr(sa_all), _ptr(offs), ctypes.c_int32(n_chunks),
            _ptr(bwt), _ptr(qs), _ptr(lcp), _ptr(pre), _ptr(sa),
            ctypes.c_int32(threads),
        )
    else:
        rc = lib.ext_merge(
            _ptr(text), _ptr(qtext), ctypes.c_int64(text.size),
            _ptr(sa_all), _ptr(offs), ctypes.c_int32(n_chunks),
            _ptr(bwt), _ptr(qs), _ptr(lcp), _ptr(pre), _ptr(sa),
        )
    if rc != total:
        raise RuntimeError(f"native ext_merge rc={rc} (expected {total})")
    return bwt, qs, lcp, pre, sa


def ext_merge_async_available() -> bool:
    lib = _find_lib()
    return lib is not None and hasattr(lib, "ext_merge_mt2p")


class ExtMergeHandle:
    """A running k-way merge whose merged PREFIX can be consumed live.

    merged_prefix() returns P such that every output position < P is final
    (BWT/QS/LCP/pre/SA all written, boundary LCPs fixed — the native workers
    only publish a range's completion after fixing its successor's first
    LCP).  wait_until(pos) blocks until P >= pos; join() waits for the merge
    and raises on a native error.
    """

    def __init__(self, thread, prog: np.ndarray, total: int, result: dict):
        self._thread = thread
        self._prog = prog
        self._total = total
        self._result = result

    def merged_prefix(self) -> int:
        t_used = int(self._prog[0])
        if t_used == 0:
            return 0
        p = 0
        for t in range(t_used):
            start, end, cur = self._prog[1 + 3 * t : 4 + 3 * t]
            if cur < end:
                return int(max(p, min(cur, end)))
            p = int(end)
        return p

    def wait_until(self, pos: int, poll_s: float = 0.01) -> None:
        pos = min(pos, self._total)
        while self.merged_prefix() < pos:
            if not self._thread.is_alive():
                self.join()  # raises on error; else the final prefix is set
                return
            time.sleep(poll_s)

    def join(self) -> int:
        self._thread.join()
        if "error" in self._result:
            raise self._result["error"]
        return self._result["rc"]


def ext_merge_async(text: np.ndarray, qtext: np.ndarray, sa_chunks,
                    threads: int = 0, lcp_chunks=None, out=None) -> ExtMergeHandle:
    """Start ext_merge on a background thread (the ctypes call releases the
    GIL) and return a live-progress handle, so downstream stages can consume
    the merged prefix while the merge runs.  Same arguments as ext_merge;
    requires the progress-capable native entry points."""
    lib = _find_lib()
    if lib is None or not hasattr(lib, "ext_merge_mt2p"):
        raise RuntimeError("native ext_merge progress API unavailable (make -C native)")
    if threads <= 0:
        env = os.environ.get("BFQ_EXT_THREADS")
        threads = int(env) if env and int(env) > 0 else (os.cpu_count() or 2)

    text = np.ascontiguousarray(text, np.uint8)
    qtext = np.ascontiguousarray(qtext, np.uint8)
    if isinstance(sa_chunks, tuple):
        sa_all, offs = sa_chunks
        sa_dtype = np.int64 if sa_all.dtype == np.int64 else np.int32
        sa_all = np.ascontiguousarray(sa_all, sa_dtype)
        offs = np.ascontiguousarray(offs, np.int64)
        n_chunks = offs.size - 1
    else:
        sa_dtype = (np.int64
                    if any(np.asarray(c).dtype == np.int64 for c in sa_chunks)
                    else np.int32)
        sa_all = np.ascontiguousarray(np.concatenate(sa_chunks), sa_dtype)
        offs = np.zeros(len(sa_chunks) + 1, np.int64)
        np.cumsum([len(c) for c in sa_chunks], out=offs[1:])
        n_chunks = len(sa_chunks)
    wide = sa_dtype == np.int64
    if wide and not hasattr(lib, "ext_merge_mt3p"):
        raise RuntimeError("int64 suffix merge needs ext_merge_mt3p (rebuild native)")
    total = int(offs[-1])
    if out is not None:
        bwt, qs, lcp, pre, sa = out
        if any(a.size != total for a in out):
            raise ValueError("out arrays must have the merged total size")
        if sa.dtype != sa_dtype:
            raise ValueError(f"out sa dtype {sa.dtype} != input {sa_dtype}")
    else:
        bwt = np.empty(total, np.uint8)
        qs = np.empty(total, np.uint8)
        lcp = np.empty(total, np.uint8)
        pre = np.empty(total, np.uint8)
        sa = np.empty(total, sa_dtype)
    if lcp_chunks is None:
        lcp_all = None
    elif isinstance(lcp_chunks, np.ndarray):
        lcp_all = np.ascontiguousarray(lcp_chunks, np.uint8)
    else:
        lcp_all = np.ascontiguousarray(np.concatenate(lcp_chunks), np.uint8)
    if lcp_all is not None and lcp_all.size != total:
        raise ValueError("lcp_chunks must align with sa_chunks")

    prog = np.zeros(1 + 3 * threads, np.int64)
    fn = lib.ext_merge_mt3p if wide else lib.ext_merge_mt2p
    result: dict = {}

    def run():
        try:
            rc = fn(
                _ptr(text), _ptr(qtext), ctypes.c_int64(text.size),
                _ptr(sa_all), _ptr(lcp_all) if lcp_all is not None else None,
                _ptr(offs), ctypes.c_int32(n_chunks),
                _ptr(bwt), _ptr(qs), _ptr(lcp), _ptr(pre), _ptr(sa),
                ctypes.c_int32(threads), _ptr(prog),
            )
            if rc != total:
                result["error"] = RuntimeError(
                    f"native ext_merge rc={rc} (expected {total})")
            result["rc"] = rc
        except BaseException as e:  # surface to join(); never die silently
            result["error"] = e

    import threading

    thread = threading.Thread(target=run, daemon=True, name="ext_merge")
    thread.start()
    handle = ExtMergeHandle(thread, prog, total, result)
    handle.outputs = (bwt, qs, lcp, pre, sa)
    return handle


def rans_decode(blob: bytes) -> Optional[np.ndarray]:
    lib = _find_lib()
    if lib is None:
        return None
    buf = np.frombuffer(blob, np.uint8)
    n = lib.rans_decode(_ptr(buf), len(blob), None, 0)
    if n < 0:
        raise ValueError(f"native rans_decode rc={n}")
    out = np.zeros(int(n), np.uint8)
    rc = lib.rans_decode(_ptr(buf), len(blob), _ptr(out), int(n))
    if rc < 0:
        raise ValueError(f"native rans_decode rc={rc}")
    return out
