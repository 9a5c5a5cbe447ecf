from bfqzip_tpu.io.fastq import ReadBatch, read_fastq, write_fastq  # noqa: F401
