from lt_tpu.models import backbone, losses, triangulation, v2v  # noqa: F401
