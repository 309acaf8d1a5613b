"""Physical relayout helpers.

XLA on TPU canonicalizes transposes into layout BITCASTS and assigns
degenerate-dimension layouts (f32[1,P]{T(1,128)}, f32[P,1]{T(1,128)})
to row/column slices of 2-D tables — every such array runs elementwise
work at 1/8 vector utilization and inserts multi-ms relayout copies
(profiled repeatedly in the 1080p shade). Pallas kernel I/O is required
to be in the standard {row-major, (8,128)-tiled} layout, so these
helpers move data through one trivial Pallas pass whose MULTIPLE
rank-1 outputs are each born with the canonical (P,) layout — no
slicing ever happens on the XLA side.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_BLK = 2048


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


def _pick_blk(P: int) -> int:
    blk = _BLK
    while P % blk:      # avoid a 200+ MB jnp.pad copy when a divisor fits
        blk //= 2
        if blk < 128:
            return _BLK
    return blk


def _padded(x, blk, axis):
    P = x.shape[axis]
    pad = (-P) % blk
    if pad:
        widths = [(0, 0)] * x.ndim
        widths[axis] = (0, pad)
        x = jnp.pad(x, widths)
    return x, P + pad


@functools.partial(jax.jit, static_argnames=("interpret",))
def split_channels(x: jnp.ndarray, interpret: bool | None = None):
    """Row-major block (P, C) → tuple of C separate (P,) f32 arrays.

    Use on gathered row-blocks (texels, env taps): one physical pass
    transposes each tile in-kernel and writes every channel as its own
    rank-1 output."""
    if interpret is None:
        interpret = _interpret_default()
    P, C = x.shape
    dt = jnp.float32 if x.dtype == jnp.bfloat16 else x.dtype
    if interpret:
        return tuple(x[:, c].astype(dt) for c in range(C))
    blk = _pick_blk(P)
    x, Pp = _padded(x, blk, 0)

    def kernel(x_ref, *o_refs):
        t = x_ref[:].astype(dt).T                   # (C, blk)
        for k, o in enumerate(o_refs):
            o[:] = t[k]

    outs = pl.pallas_call(
        kernel,
        grid=(Pp // blk,),
        in_specs=[pl.BlockSpec((blk, C), lambda i: (i, 0))],
        out_specs=tuple(pl.BlockSpec((blk,), lambda i: (i,))
                        for _ in range(C)),
        out_shape=tuple(jax.ShapeDtypeStruct((Pp,), dt)
                        for _ in range(C)),
        interpret=interpret,
    )(x)
    if Pp != P:
        outs = tuple(o[:P] for o in outs)
    return outs


@functools.partial(jax.jit, static_argnames=("interpret",))
def split_rows(x: jnp.ndarray, interpret: bool | None = None):
    """Channel-major table (C, P) → tuple of C separate (P,) f32 arrays.

    Use on one-hot matmul results (material/descriptor/transform
    tables): the rows are already contiguous; the pass just materializes
    each as an independent rank-1 array so no XLA-side row slice (and
    its T(1,128) layout) ever exists."""
    if interpret is None:
        interpret = _interpret_default()
    C, P = x.shape
    dt = jnp.float32 if x.dtype == jnp.bfloat16 else x.dtype
    if interpret:
        return tuple(x[c].astype(dt) for c in range(C))
    blk = _pick_blk(P)
    x, Pp = _padded(x, blk, 1)

    def kernel(x_ref, *o_refs):
        blk_v = x_ref[:].astype(dt)                 # (C, blk)
        for k, o in enumerate(o_refs):
            o[:] = blk_v[k]

    outs = pl.pallas_call(
        kernel,
        grid=(Pp // blk,),
        in_specs=[pl.BlockSpec((C, blk), lambda i: (0, i))],
        out_specs=tuple(pl.BlockSpec((blk,), lambda i: (i,))
                        for _ in range(C)),
        out_shape=tuple(jax.ShapeDtypeStruct((Pp,), dt)
                        for _ in range(C)),
        interpret=interpret,
    )(x)
    if Pp != P:
        outs = tuple(o[:P] for o in outs)
    return outs


def onehot_split_rows(rows: jnp.ndarray, table: jnp.ndarray,
                      interpret: bool | None = None):
    """table[rows] fetched channel-major AND split, in ONE Pallas pass:
    rows (P,) i32, table (cap, C) f32 → tuple of C (P,) f32 arrays.

    Fuses split_rows(onehot_gather_t(rows, table)): the two-step form
    materializes the (C, P) matmul result through HBM twice (~2.9 ms at
    1080p for the 53-column material fetch — pure write+read bandwidth).
    Here each block builds the transposed one-hot and multiplies the
    tiny resident table in-kernel (the tap-planner pattern,
    texsample._tap_plan_fused). Exact for in-range rows (one-hot matmul
    sums a single product); out-of-range rows yield zeros, matching
    onehot_gather_t."""
    if interpret is None:
        interpret = _interpret_default()
    cap, C = table.shape
    P = rows.shape[0]
    tabT = table.T.astype(jnp.float32)               # (C, cap)
    if interpret:
        valid = (rows >= 0) & (rows < cap)
        safe = jnp.clip(rows, 0, cap - 1)
        g = jnp.where(valid[:, None], table.astype(jnp.float32)[safe], 0.0)
        return tuple(g[:, c] for c in range(C))
    blk = _pick_blk(P)
    rows_p, Pp = _padded(rows, blk, 0)

    def kernel(tab_ref, r_ref, *o_refs):
        rr = r_ref[:]
        oh = (rr[None, :]
              == jax.lax.broadcasted_iota(jnp.int32, (cap, blk), 0)
              ).astype(jnp.float32)
        R = jnp.dot(tab_ref[:], oh,
                    preferred_element_type=jnp.float32)      # (C, blk)
        for k, o in enumerate(o_refs):
            o[:] = R[k]

    outs = pl.pallas_call(
        kernel,
        grid=(Pp // blk,),
        in_specs=[pl.BlockSpec((C, cap), lambda i: (0, 0)),
                  pl.BlockSpec((blk,), lambda i: (i,))],
        out_specs=tuple(pl.BlockSpec((blk,), lambda i: (i,))
                        for _ in range(C)),
        out_shape=tuple(jax.ShapeDtypeStruct((Pp,), jnp.float32)
                        for _ in range(C)),
        interpret=interpret,
    )(tabT, rows_p)
    if Pp != P:
        outs = tuple(o[:P] for o in outs)
    return outs


@functools.partial(jax.jit, static_argnames=("interpret",))
def channel_rows(x: jnp.ndarray, interpret: bool | None = None) -> jnp.ndarray:
    """(P, C) block → (C, P) f32, physically transposed (legacy form —
    prefer split_channels, whose outputs never need row slicing)."""
    if interpret is None:
        interpret = _interpret_default()
    P, C = x.shape
    if interpret:
        return x.T.astype(jnp.float32)
    blk = _pick_blk(P)
    x, Pp = _padded(x, blk, 0)

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
