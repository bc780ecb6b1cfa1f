from lt_tpu.models import backbone, losses, v2v  # noqa: F401
