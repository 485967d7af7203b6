from skellysim_tpu.periphery.shell import Shell, ShellState  # noqa: F401
