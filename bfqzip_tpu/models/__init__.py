from bfqzip_tpu.models.context import Order0Spec, Order1Spec, Order2Spec, spec_by_id  # noqa: F401
