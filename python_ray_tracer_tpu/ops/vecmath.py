"""Small vector helpers over packed (..., 3) arrays.

The reference's ``NumpyVector3D`` (``base.py:28-79``) is a
struct-of-arrays wrapper whose x/y/z may each be full ndarrays.  On TPU we
pack the component axis last — (N, 3) — which XLA lays out efficiently and
which turns the ray·center contractions in the intersection sweep into
(N, 3) x (3, S) matmuls.

Floating-point contracts kept from the reference:

* ``dot`` expands to ``x*x + y*y + z*z`` in that association order
  (``base.py:34-35``) — ``jnp.sum`` over the last axis may associate
  differently, so we index components explicitly.
* ``normalize`` multiplies by a guarded reciprocal magnitude rather than
  dividing (``base.py:61-64``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def dot(a: jax.Array, b: jax.Array) -> jax.Array:
    """Component-order-exact dot product over the trailing axis of size 3."""
    return a[..., 0] * b[..., 0] + a[..., 1] * b[..., 1] + a[..., 2] * b[..., 2]


def norm2(a: jax.Array) -> jax.Array:
    """Squared magnitude — the reference's ``__abs__`` (``base.py:37-38``)."""
    return dot(a, a)


def normalize(a: jax.Array) -> jax.Array:
    """Unit vector with the reference's zero guard (``base.py:61-64``)."""
    mag = jnp.sqrt(dot(a, a))
    inv = 1.0 / jnp.where(mag == 0, jnp.ones_like(mag), mag)
    return a * inv[..., None]


def reflect(direction: jax.Array, normal: jax.Array) -> jax.Array:
    """Mirror direction, normalized — ref ``shader.py:151``."""
    return normalize(direction - normal * (2.0 * dot(direction, normal))[..., None])
