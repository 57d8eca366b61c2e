from diff_sal_tpu.ops.resize import bilinear_resize, nearest_upsample  # noqa: F401
