from lt_tpu.data import batch, human36m, synthetic  # noqa: F401
