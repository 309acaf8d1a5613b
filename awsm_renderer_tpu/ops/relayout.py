"""Physical relayout helpers.

XLA on TPU canonicalizes `jnp.transpose` into a layout BITCAST — no data
moves — and then pays a full-array relayout copy for every row later
sliced out of the "transposed" result (profiled: ~1.4 ms per channel
at 1080p, x52 channels ≈ 73 ms in the shade pass). Pallas kernel I/O is
required to be in the standard {row-major, (8,128)-tiled} layout, so a
trivial Pallas transpose forces ONE physical pass after which every row
slice is a contiguous (P,) array with the canonical rank-1 layout.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_BLK = 2048


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


@functools.partial(jax.jit, static_argnames=("interpret",))
def channel_rows(x: jnp.ndarray, interpret: bool | None = None) -> jnp.ndarray:
    """(P, C) block → (C, P) f32, physically transposed.

    Use on gathered row-blocks (texels, env taps) before per-channel row
    extraction. The f32 convert rides the same pass."""
    if interpret is None:
        interpret = _interpret_default()
    P, C = x.shape
    if interpret:
        # plain XLA path for CPU tests — layout pathology is TPU-specific
        return x.T.astype(jnp.float32)
    blk = _BLK
    while P % blk:      # avoid a 200+ MB jnp.pad copy when a divisor fits
        blk //= 2
        if blk < 8:
            blk = _BLK
            break
    pad = (-P) % blk
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
    Pp = P + pad

    def kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:].astype(jnp.float32).T

    out = pl.pallas_call(
        kernel,
        grid=(Pp // blk,),
        in_specs=[pl.BlockSpec((blk, C), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((C, blk), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((C, Pp), jnp.float32),
        interpret=interpret,
    )(x)
    return out[:, :P]
