from skellysim_tpu.kernels.reference import (  # noqa: F401
    stokeslet_apply,
    stresslet_apply,
    rotlet_apply,
    oseen_tensor,
    stresslet_times_normal,
    stresslet_times_normal_times_density,
)
