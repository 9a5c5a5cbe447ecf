"""Generate golden test data by running the reference's own smoothing core.

Compiles the reference `bfq_int` (src_int_mem/bfq_int.cpp with its vendored
headers — the only reference components that build without the missing
gsufsort/eGap submodules) into a scratch directory, feeds it EBWT artifacts
produced by the trusted numpy builder (bfqzip_tpu.ref_golden.build_ebwt), and
records the reconstructed FASTQ bytes for every smoothing configuration.

Run from the repo root:  python tests/make_golden.py
Outputs go to tests/golden/ and are committed; CI never needs the compiler.
"""

from __future__ import annotations

import hashlib
import json
import os
import subprocess
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bfqzip_tpu import alphabet, ref_golden  # noqa: E402
from bfqzip_tpu.io.fastq import ReadBatch, format_fastq, parse_fastq, read_fastq  # noqa: E402

REFERENCE = "/root/reference"
GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")


def build_oracle(workdir: str) -> dict:
    src = os.path.join(workdir, "src")
    os.makedirs(src, exist_ok=True)
    subprocess.run(["cp", "-r", f"{REFERENCE}/external", workdir], check=True)
    subprocess.run(["cp", f"{REFERENCE}/src_int_mem/bfq_int.cpp", src], check=True)
    subprocess.run(
        ["g++", "-c", "-o", f"{workdir}/rankbv.o", f"{workdir}/external/rankbv/rankbv.cpp", "-O3", "-std=c++11"],
        check=True,
    )
    subprocess.run(
        ["gcc", "-c", "-o", f"{workdir}/malloc_count.o", f"{workdir}/external/malloc_count/malloc_count.c", "-O3"],
        check=True,
    )
    bins = {}
    for m in (0, 1, 2, 3):
        for b in (0, 1):
            out = f"{workdir}/bfq_int_m{m}_b{b}"
            subprocess.run(
                ["g++", f"{src}/bfq_int.cpp", "-o", out, f"{workdir}/rankbv.o", f"{workdir}/malloc_count.o",
                 "-O3", "-m64", "-std=c++11", f"-DM={m}", f"-DB={b}", "-lm", "-ldl"],
                check=True,
            )
            bins[(m, b)] = out
    return bins


def synthetic_batch(seed: int, n_reads: int, min_len: int, max_len: int, n_frac: float) -> ReadBatch:
    """Random reads with varying lengths, occasional Ns, realistic-ish qualities."""
    rng = np.random.default_rng(seed)
    lengths = rng.integers(min_len, max_len + 1, size=n_reads).astype(np.int32)
    width = int(lengths.max())
    bases = np.array([alphabet.A, alphabet.C, alphabet.G, alphabet.T], dtype=np.uint8)
    seqs = bases[rng.integers(0, 4, size=(n_reads, width))]
    # plant shared motifs so clusters actually form
    motif = bases[rng.integers(0, 4, size=30)]
    for i in range(0, n_reads, 3):
        L = int(lengths[i])
        if L > 35:
            p = int(rng.integers(0, L - 31))
            seqs[i, p : p + 30] = motif
    nmask = rng.random((n_reads, width)) < n_frac
    seqs[nmask] = alphabet.N
    quals = (33 + rng.integers(2, 42, size=(n_reads, width))).astype(np.uint8)
    mask = np.arange(width)[None, :] < lengths[:, None]
    seqs = np.where(mask, seqs, 0).astype(np.uint8)
    quals = np.where(mask, quals, 0).astype(np.uint8)
    headers = [b"@synth.%d" % i for i in range(n_reads)]
    return ReadBatch(seqs=seqs, quals=quals, lengths=lengths, headers=headers)


def run_oracle(binpath: str, ebwt, workdir: str, headers: bytes | None) -> bytes:
    bwt_p = os.path.join(workdir, "in.bwt")
    qs_p = os.path.join(workdir, "in.bwt.qs")
    out_p = os.path.join(workdir, "out.fq")
    with open(bwt_p, "wb") as f:
        f.write(alphabet.decode(ebwt.bwt).tobytes())
    with open(qs_p, "wb") as f:
        f.write(ebwt.qs.tobytes())
    cmd = [binpath, "-e", bwt_p, "-q", qs_p, "-o", out_p, "-m", "5"]
    if headers is not None:
        h_p = os.path.join(workdir, "in.h")
        with open(h_p, "wb") as f:
            f.write(headers)
        cmd += ["-H", h_p]
    subprocess.run(cmd, check=True, capture_output=True)
    with open(out_p, "rb") as f:
        return f.read()


def main():
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    manifest = {}
    with tempfile.TemporaryDirectory() as workdir:
        bins = build_oracle(workdir)

        datasets = {
            "example": read_fastq(f"{REFERENCE}/example/reads.fastq"),
            "example_r1": read_fastq(f"{REFERENCE}/example/reads_1.fastq"),
            "synth_var": synthetic_batch(seed=7, n_reads=300, min_len=40, max_len=150, n_frac=0.01),
            # beyond the reference ext-mem 255bp cap (parameters.h:66-74) and
            # beyond the flat-path window (suffix.py MAX_FLAT_WORDS): exercises
            # the prefix-doubling builder end to end
            "synth_long": synthetic_batch(seed=11, n_reads=120, min_len=400, max_len=600, n_frac=0.005),
        }
        # store inputs so tests do not depend on /root/reference
        for name, batch in datasets.items():
            inp = format_fastq(batch)
            with open(os.path.join(GOLDEN_DIR, f"{name}.in.fastq"), "wb") as f:
                f.write(inp)

        for name, batch in datasets.items():
            ebwt = ref_golden.build_ebwt(batch)
            header_blob = b"\n".join(batch.headers) + b"\n"
            for (m, b), binpath in bins.items():
                for with_h in (False, True):
                    if (m, b, with_h) not in {
                        (0, 0, False), (1, 0, False), (2, 0, False), (3, 0, False),
                        (2, 1, False), (2, 0, True),
                    }:
                        continue
                    tag = f"{name}.m{m}b{b}" + ("h" if with_h else "")
                    out = run_oracle(binpath, ebwt, workdir, header_blob if with_h else None)
                    path = os.path.join(GOLDEN_DIR, f"{tag}.fq")
                    with open(path, "wb") as f:
                        f.write(out)
                    manifest[tag] = {
                        "dataset": name,
                        "mode": m,
                        "binning": b,
                        "headers": with_h,
                        "sha256": hashlib.sha256(out).hexdigest(),
                    }

    with open(os.path.join(GOLDEN_DIR, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2, sort_keys=True)
    print(f"wrote {len(manifest)} golden outputs to {GOLDEN_DIR}")


if __name__ == "__main__":
    main()
