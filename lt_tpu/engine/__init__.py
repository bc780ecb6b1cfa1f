from lt_tpu.engine import checkpoint, factory, steps  # noqa: F401
