from diff_sal_tpu.diffusion.schedule import (  # noqa: F401
    DiffusionSchedule,
    get_beta_schedule,
    make_schedule,
)
