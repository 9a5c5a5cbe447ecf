from bfqzip_tpu.ops.suffix import build_ebwt  # noqa: F401
from bfqzip_tpu.ops.rank import lf_array  # noqa: F401
from bfqzip_tpu.ops.smooth import smooth  # noqa: F401
from bfqzip_tpu.ops.invert import invert  # noqa: F401
