"""Variant-preservation proxy: the in-repo stand-in for the reference's
GATK + rtg vcfeval acceptance test (variant_calling/pipeline_SNPsCall.sh:28-50,
README.md:86-100).  Reads are simulated from a diploid genome with planted
heterozygous SNPs; a naive pileup caller over the known alignments must find
them equally well before and after smoothing."""

import numpy as np
import pytest

from bfqzip_tpu.utils.variant_proxy import (
    call_snps,
    evaluate,
    pileup_counts,
    run_proxy,
    simulate_diploid,
)


def test_pileup_caller_finds_planted_snps():
    """Sanity: on ORIGINAL reads the caller recovers essentially all SNPs."""
    sim = simulate_diploid(20_000, 101, 60_000, 25, seed=1)
    counts = pileup_counts(sim.batch, sim.starts, sim.strands, 60_000)
    res = evaluate(call_snps(counts, sim.genome), sim.snp_pos, sim.snp_alt)
    # ~34x coverage, balanced haplotypes: every het SNP has ~17x alt support
    assert res["recall"] >= 0.95, res
    assert res["precision"] >= 0.95, res


def test_smoothing_preserves_variant_evidence():
    """The paper's central claim (reference README.md:2-4): noise reduction +
    QS smoothing preserve variant-calling accuracy.  Smoothed recall and
    precision must not degrade, and no planted SNP may lose its evidence."""
    res = run_proxy(n_reads=20_000, read_len=101, genome_len=60_000, n_snps=25, seed=0)
    o, s = res["original"], res["smoothed"]
    assert res["bases_modified"] > 0, "smoother did no work - test under-powered"
    assert s["recall"] >= o["recall"], (o, s)
    assert s["precision"] >= o["precision"], (o, s)
    # per-SNP alt support: the 2-frequent-symbol rule (bfq_int.cpp:524-620)
    # must never smooth away a heterozygous allele
    drop = res["alt_support_orig"] - res["alt_support_smooth"]
    frac = drop / np.maximum(res["alt_support_orig"], 1)
    assert frac.max(initial=0.0) <= 0.1, (
        f"alt-allele support dropped >10% at {int(frac.argmax())}"
    )


def test_smoothing_removes_noise():
    """Base correction should reduce non-ref noise at NON-SNP positions."""
    sim = simulate_diploid(20_000, 101, 60_000, 25, seed=2)
    from bfqzip_tpu.engine import smooth_fastq

    counts_o = pileup_counts(sim.batch, sim.starts, sim.strands, 60_000)
    smoothed, _ = smooth_fastq(sim.batch)
    counts_s = pileup_counts(smoothed, sim.starts, sim.strands, 60_000)

    glen = 60_000
    ref = sim.genome.astype(np.int64)
    idx = np.arange(glen)
    noise_o = counts_o.sum(1) - counts_o[idx, ref]
    noise_s = counts_s.sum(1) - counts_s[idx, ref]
    mask = np.ones(glen, bool)
    mask[sim.snp_pos] = False
    assert noise_s[mask].sum() < noise_o[mask].sum(), (
        noise_o[mask].sum(),
        noise_s[mask].sum(),
    )
