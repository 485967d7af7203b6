from skellysim_tpu.system.system import System  # noqa: F401
