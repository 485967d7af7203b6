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
