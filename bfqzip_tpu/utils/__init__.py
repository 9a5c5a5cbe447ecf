from bfqzip_tpu.utils.checkfastq import check_fastq  # noqa: F401
from bfqzip_tpu.utils.logging import StepLogger  # noqa: F401
