"""skellysim_tpu — a TPU-native framework for cellular-scale Stokes-flow hydrodynamics.

Capabilities modeled on flatironinstitute/SkellySim (reference: /root/reference):
flexible filaments (slender-body theory), rigid bodies with fiber attachment
sites, a confining periphery (2nd-kind boundary integral surface), all coupled
each timestep through one global matrix-free GMRES solve over long-range Stokes
kernels (stokeslet / stresslet / rotlet).

The design is TPU-first, not a port:
  * state lives in statically-shaped JAX pytrees; per-fiber work is vmapped
    batched dense linear algebra instead of ragged per-object loops
  * pairwise hydrodynamic kernels are Pallas tiled TPU kernels (f32 hot path)
    with pure-XLA reference implementations (f64) used for the tight-tolerance
    solve path and as the parity oracle
  * the global linear solve is a JAX-native right-preconditioned GMRES run
    under jit; distribution is jax.sharding + shard_map with ICI collectives
    (all_gather / psum / ppermute ring schedules) instead of MPI

Precision policy: `jax.config.update("jax_enable_x64", True)` is required for
the solve path (GMRES tolerances down to 1e-10, matching the reference's
defaults, src/core/params.cpp:14). The Pallas kernels run in f32 on the MXU
and are benchmarked separately.
"""

__version__ = "0.1.0"
TRAJECTORY_VERSION = 1  # wire-compatible with reference trajectory format v1

from skellysim_tpu.utils import float_config  # noqa: F401  (enables x64 on import)
