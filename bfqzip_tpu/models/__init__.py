from bfqzip_tpu.models.context import Order0Spec, Order1Spec, Order2Spec, spec_by_id  # noqa: F401
from bfqzip_tpu.models.strategies import newqs_name  # noqa: F401
