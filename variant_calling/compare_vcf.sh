#!/bin/bash
# Compare the VCF called from the ORIGINAL FASTQ against the one called from
# the SMOOTHED FASTQ with rtg vcfeval (the reference's acceptance criterion,
# reference README.md:96-100).
set -euo pipefail

RTG=${RTG:-rtg}
SDF=${SDF:?set SDF to the rtg-format reference (rtg format -o SDF ref.fa)}
REGIONS=${REGIONS:-}

baseline_vcf=$1   # from the original FASTQ
calls_vcf=$2      # from the smoothed FASTQ
out=${3:-vcfeval_out}

args=(vcfeval -b "$baseline_vcf" -c "$calls_vcf" -t "$SDF" -o "$out")
if [ -n "$REGIONS" ]; then
    args+=(--evaluation-regions "$REGIONS")
fi
"$RTG" "${args[@]}"
