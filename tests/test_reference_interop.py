"""Interoperability with the reference implementation's own binary.

The pipeline's stage-1 artifacts use the reference's on-disk formats
(.bwt ASCII alphabet, .bwt.qs permuted qualities), so the reference's
compiled smoothing core must accept them and produce the same FASTQ as our
engine.  Skipped when the reference sources or a compiler are unavailable.
"""

import os
import shutil
import subprocess

import pytest

from bfqzip_tpu.config import PipelineConfig
from bfqzip_tpu.pipeline import run_pipeline

from conftest import golden_path

REFERENCE = "/root/reference"


@pytest.fixture(scope="session")
def oracle(tmp_path_factory):
    if not os.path.isdir(REFERENCE) or shutil.which("g++") is None:
        pytest.skip("reference sources or compiler unavailable")
    work = tmp_path_factory.mktemp("oracle")
    src = work / "src"
    src.mkdir()
    shutil.copytree(f"{REFERENCE}/external", work / "external")
    shutil.copy(f"{REFERENCE}/src_int_mem/bfq_int.cpp", src)
    subprocess.run(
        ["g++", "-c", "-o", str(work / "rankbv.o"), str(work / "external/rankbv/rankbv.cpp"),
         "-O3", "-std=c++11"], check=True)
    subprocess.run(
        ["gcc", "-c", "-o", str(work / "malloc_count.o"),
         str(work / "external/malloc_count/malloc_count.c"), "-O3"], check=True)
    exe = work / "bfq_int"
    subprocess.run(
        ["g++", str(src / "bfq_int.cpp"), "-o", str(exe), str(work / "rankbv.o"),
         str(work / "malloc_count.o"), "-O3", "-m64", "-std=c++11", "-DM=2", "-DB=0",
         "-lm", "-ldl"], check=True)
    return str(exe)


def test_reference_binary_consumes_our_artifacts(oracle, tmp_path):
    shutil.copyfile(golden_path("example.in.fastq"), tmp_path / "reads.fastq")
    base = str(tmp_path / "out")
    run_pipeline([str(tmp_path / "reads.fastq")], PipelineConfig(mode=1), out_base=base)

    ref_out = str(tmp_path / "ref.fq")
    subprocess.run(
        [oracle, "-e", base + ".bwt", "-q", base + ".bwt.qs", "-o", ref_out, "-m", "5"],
        check=True, capture_output=True)
    ours = open(base + ".fq", "rb").read()
    theirs = open(ref_out, "rb").read()
    assert ours == theirs


@pytest.fixture(scope="session")
def oracle_ext(tmp_path_factory):
    """The reference's EXTERNAL-memory core (bfq_ext + BCR decode), linked
    against a malloc_count stub (the real interposer corrupts the heap under
    this glibc/OpenMP combination — stats hooks only, not functional)."""
    if not os.path.isdir(REFERENCE) or shutil.which("g++") is None:
        pytest.skip("reference sources or compiler unavailable")
    work = tmp_path_factory.mktemp("oracle_ext")
    src = work / "src"
    src.mkdir()
    shutil.copytree(f"{REFERENCE}/external", work / "external")
    for f in ("bfq_ext.cpp", "decode.cpp", "decode.hpp", "parameters.h"):
        shutil.copy(f"{REFERENCE}/src_ext_mem/{f}", src)
    (work / "mc_stub.c").write_text(
        "#include <stddef.h>\n"
        "size_t malloc_count_current(void){return 0;}\n"
        "size_t malloc_count_peak(void){return 0;}\n"
        "size_t malloc_count_peak_curr(void){return 0;}\n"
        "void malloc_count_reset_peak(void){}\n"
    )
    subprocess.run(
        ["g++", "-c", "-o", str(work / "rankbv.o"), str(work / "external/rankbv/rankbv.cpp"),
         "-O3", "-std=c++11"], check=True)
    subprocess.run(["gcc", "-c", "-O2", "-o", str(work / "mc_stub.o"), str(work / "mc_stub.c")],
                   check=True)
    subprocess.run(
        ["g++", "-c", str(src / "bfq_ext.cpp"), str(src / "decode.cpp"),
         "-O3", "-std=c++11", "-DM=2", "-DB=0", "-DOMP=1", "-fopenmp",
         "-I" + str(work / "external")], check=True, cwd=src)
    exe = work / "bfq_ext"
    subprocess.run(
        ["g++", "-fopenmp", "-o", str(exe), str(src / "bfq_ext.o"), str(src / "decode.o"),
         str(work / "rankbv.o"), str(work / "mc_stub.o"), "-lm", "-ldl"], check=True)
    return str(exe)


def test_reference_ext_binary_consumes_our_artifacts(oracle_ext, tmp_path):
    """The reference's external-memory engine (bfq_ext.cpp + decode.cpp BCR
    inversion) consumes this repo's .bwt/.bwt.qs/.lcp artifacts and emits a
    byte-identical FASTQ — closing the loop on SURVEY component #4."""
    import numpy as np

    shutil.copyfile(golden_path("example.in.fastq"), tmp_path / "reads.fastq")
    base = str(tmp_path / "out")
    run_pipeline([str(tmp_path / "reads.fastq")], PipelineConfig(mode=1), out_base=base)
    # 1-byte LCP (the eGap --lbytes 1 file bfq_ext expects, BFQzip_ext.py:29-32)
    lcp = np.fromfile(base + ".lcp", "<u2")
    np.minimum(lcp, 255).astype(np.uint8).tofile(base + ".1.lcp")

    ref_out = str(tmp_path / "ref.fq")
    subprocess.run(
        [oracle_ext, "-e", base + ".bwt", "-q", base + ".bwt.qs", "-a", base + ".1.lcp",
         "-o", ref_out, "-l", "250", "-m", "5"],
        check=True, capture_output=True, cwd=tmp_path)
    ours = open(base + ".fq", "rb").read()
    theirs = open(ref_out + ".fq", "rb").read()  # bfq_ext appends .fq
    assert ours == theirs
