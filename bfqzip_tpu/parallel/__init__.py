from bfqzip_tpu.parallel.mesh import make_mesh  # noqa: F401
from bfqzip_tpu.parallel.block import make_block_step, block_smooth_fastq  # noqa: F401
from bfqzip_tpu.parallel.sharded_sort import sharded_sort  # noqa: F401
from bfqzip_tpu.parallel.global_pipeline import smooth_fastq_sharded  # noqa: F401
