from skellysim_tpu.utils import float_config  # noqa: F401
