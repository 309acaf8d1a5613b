"""Channel-column vector helpers for full-frame shading math.

Every vector here is a plain Python list of flat (P,) jnp arrays —
[x, y, z] or [r, g, b, a]. WHY: XLA assigns TPU layouts per-array with
the LAST dim on the 128-lane axis, so a (P, 3) tensor runs elementwise
ops at 3/128 lane efficiency whenever the computation mixes shapes and
the flattener can't kick in (measured ~0.26 ms PER (P,4)-shaped op at
1080p — ~30x the (P,) cost). The shade pass is hundreds of such ops, so
it does all vector math on (P,) channel columns and only stacks at the
final output. Same discipline as the vertex stage (ops/vertex.py v3).
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-6


def splat(v, n=3):
    """Broadcast a python/scalar constant to an n-channel list."""
    return [v] * n


def add(a, b):
    return [x + y for x, y in zip(a, b)]


def sub(a, b):
    return [x - y for x, y in zip(a, b)]


def mul(a, b):
    """Hadamard product of two channel lists."""
    return [x * y for x, y in zip(a, b)]


def scale(a, s):
    """Channel list times a (P,) or scalar."""
    return [x * s for x in a]


def madd(a, b, s):
    """a + b*s."""
    return [x + y * s for x, y in zip(a, b)]


def lerp(a, b, t):
    """a*(1-t) + b*t per channel; t (P,) or scalar."""
    return [x + (y - x) * t for x, y in zip(a, b)]


def where(c, a, b):
    """Per-channel select; c is (P,) bool."""
    return [jnp.where(c, x, y) for x, y in zip(a, b)]


def dot3(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def cross3(a, b):
    return [a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0]]


def norm3(a, eps=_EPS):
    m = jnp.maximum(jnp.sqrt(dot3(a, a)), eps)
    inv = 1.0 / m
    return [x * inv for x in a]


def length3(a):
    return jnp.sqrt(dot3(a, a))


def stack(a):
    """Channel list → (P, n) array (final outputs only)."""
    return jnp.stack(a, axis=-1)


def unstack(arr, n=None):
    """(P, n) array → channel list of (P,)."""
    n = arr.shape[-1] if n is None else n
    return [arr[:, i] for i in range(n)]
