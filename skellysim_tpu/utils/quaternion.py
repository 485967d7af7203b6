"""Quaternion utilities (w, x, y, z convention), jit-safe."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quat_multiply(a: jax.Array, b: jax.Array) -> jax.Array:
    aw, ax, ay, az = a
    bw, bx, by, bz = b
    return jnp.stack([
        aw * bw - ax * bx - ay * by - az * bz,
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
    ])


def quat_rotate(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate vector v by unit quaternion q."""
    w, x, y, z = q
    u = jnp.stack([x, y, z])
    return (v * (w * w - jnp.dot(u, u))
            + 2.0 * u * jnp.dot(u, v)
            + 2.0 * w * jnp.cross(u, v))


def quat_from_rotvec(phi: jax.Array) -> jax.Array:
    """Unit quaternion for a rotation vector (angle = |phi|), safe at 0."""
    angle = jnp.linalg.norm(phi)
    safe = jnp.where(angle > 0.0, angle, 1.0)
    half = 0.5 * angle
    s = jnp.sin(half) / safe
    axis_part = jnp.where(angle > 0.0, s * phi, jnp.zeros_like(phi))
    return jnp.concatenate([jnp.cos(half)[None], axis_part])


def quat_to_matrix(q: jax.Array) -> jax.Array:
    w, x, y, z = q
    return jnp.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
        [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
        [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
    ])
