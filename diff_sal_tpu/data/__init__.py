from diff_sal_tpu.data.transforms import (  # noqa: F401
    data_transform,
    inverse_data_transform,
)
