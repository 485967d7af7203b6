"""Global float configuration.

The solve path needs f64: the reference converges GMRES to 1e-10
(src/core/params.cpp:14) and validates fiber drag to 1e-6 relative
(tests/combined/test_fiber_const_force.py:77). TPUs have no f64 MXU, so the
f64 path is XLA-emulated and used for correctness-critical solves, while the
Pallas pairwise kernels provide the f32 speed-of-light path.
"""

import jax

jax.config.update("jax_enable_x64", True)

# TPU MXU matmuls on f32 inputs default to bfloat16 passes, which destroys
# the conditioning of the dense fiber/body operators (observed: garbage
# solves with converged GMRES). Force true-f32 matmul accumulation; kernels
# that can tolerate lower precision opt in locally.
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: the jitted timestep is one large XLA
# program whose compile runs minutes on remote-compile (tunneled) TPU
# backends; caching makes that a one-time cost per program shape. Verified
# to round-trip executables on the axon backend. Opt out by setting
# SKELLYSIM_TPU_NO_CACHE; relocate with SKELLYSIM_TPU_CACHE_DIR.
import os as _os

# CPU-forced runs (tests, the multi-chip dryrun) skip the cache: XLA:CPU
# AOT results encode detected machine features and reloading them across
# environments risks SIGILL; accelerator executables don't have that issue
# and are the ones with multi-minute compiles.
if not (_os.environ.get("SKELLYSIM_TPU_NO_CACHE")
        or _os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu"):
    _cache = _os.environ.get(
        "SKELLYSIM_TPU_CACHE_DIR",
        _os.path.join(_os.path.expanduser("~"), ".cache", "skellysim_tpu",
                      "xla"))
    try:
        _os.makedirs(_cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", _cache)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except OSError:  # unwritable home: run uncached
        pass
