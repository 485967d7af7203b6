"""External flow sources: point forces/torques and background flows.

Reference behavior: src/core/point_source.cpp:16-54 (stokeslet + rotlet point
sources with optional time-to-live) and src/core/background_source.cpp:14-22
(uniform + linear-shear background, v_j = uniform_j + r[comp_j] * scale_j).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from skellysim_tpu.kernels.reference import rotlet_apply, stokeslet_apply


@struct.dataclass
class PointSources:
    position: jax.Array      # (P, 3)
    force: jax.Array         # (P, 3)
    torque: jax.Array        # (P, 3)
    time_to_live: jax.Array  # (P,), 0 = immortal

    @staticmethod
    def from_tables(tables, dtype=jnp.float64) -> "PointSources":
        import numpy as np

        P = len(tables)
        pos = np.zeros((P, 3))
        frc = np.zeros((P, 3))
        trq = np.zeros((P, 3))
        ttl = np.zeros(P)
        for i, t in enumerate(tables):
            pos[i] = t.get("position", [0, 0, 0])
            frc[i] = t.get("force", [0, 0, 0])
            trq[i] = t.get("torque", [0, 0, 0])
            ttl[i] = t.get("time_to_live", 0.0)
        return PointSources(jnp.asarray(pos, dtype), jnp.asarray(frc, dtype),
                            jnp.asarray(trq, dtype), jnp.asarray(ttl, dtype))

    def flow(self, r_trg: jax.Array, eta, time) -> jax.Array:
        if self.position.shape[0] == 0:
            return jnp.zeros_like(r_trg)
        alive = jnp.logical_or(self.time_to_live == 0.0, time < self.time_to_live)
        f = jnp.where(alive[:, None], self.force, 0.0)
        g = jnp.where(alive[:, None], self.torque, 0.0)
        u = stokeslet_apply(self.position, f, r_trg, eta)
        u = u + rotlet_apply(self.position, g, r_trg, eta)
        return u


@struct.dataclass
class BackgroundFlow:
    components: jax.Array    # (3,) int — which coordinate feeds each velocity comp
    scale_factor: jax.Array  # (3,)
    uniform: jax.Array       # (3,)

    @staticmethod
    def from_table(table, dtype=jnp.float64) -> "BackgroundFlow":
        return BackgroundFlow(
            components=jnp.asarray(table.get("components", [0, 1, 2]), jnp.int32),
            scale_factor=jnp.asarray(table.get("scale_factor", [0.0, 0.0, 0.0]), dtype),
            uniform=jnp.asarray(table.get("uniform", [0.0, 0.0, 0.0]), dtype),
        )

    @staticmethod
    def inactive(dtype=jnp.float64) -> "BackgroundFlow":
        return BackgroundFlow.from_table({})

    @property
    def is_active(self) -> bool:
        import numpy as np

        return bool(np.any(np.asarray(self.scale_factor)) or np.any(np.asarray(self.uniform)))

    def flow(self, r_trg: jax.Array, eta) -> jax.Array:
        del eta
        sheared = r_trg[:, self.components] * self.scale_factor[None, :]
        return self.uniform[None, :] + sheared
