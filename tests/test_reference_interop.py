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
