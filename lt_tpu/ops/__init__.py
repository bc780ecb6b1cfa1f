from lt_tpu.ops import geometry, heatmaps, volumetric  # noqa: F401
