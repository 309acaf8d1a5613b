"""Ground-truth microbench: winner-row gather structures on the real TPU.

The fast/slow gather split (1.9 vs 15 ns/row, profiled in-frame) tracks
whether XLA's memory-space assignment promotes the TABLE operand into
alternate memory (S(1)/VMEM). bf16 [T, 64] tables tile as T(8,128)(2,1),
padding the minor dim to 128 lanes — each "32 MB" table occupies 64 MB,
so two of them bust the budget and one gather runs from HBM. Variants:

  a) one bf16 [T,64] table, one 2M gather           (baseline fast case)
  b) two bf16 [T,64] tables, two gathers            (the in-frame regression)
  c) two gathers SERIALIZED by a data dependency    (live ranges disjoint)
  d) one u32 [T,64] table (b0<<16|b1 packed), one gather + in-jit unpack
  e) one bf16 [T,128] table (b0|b1 on columns), one gather, split cols
  f) one bf16 [2T,64] table (rows concat), one 4M gather
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def timed(fn, *a):
    def run(n):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = fn(*a)
        _ = float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        return time.perf_counter() - t0

    run(1)
    t1 = min(run(1), run(1))
    n = 16
    tn = run(n)
    if tn <= t1:
        t1 = min(t1, run(1))
        tn = run(n)
    return max((tn - t1) / (n - 1), 1e-6)


def main():
    T, C, P = 262144, 64, 2073600
    rng = np.random.default_rng(0)
    tab_f32 = jnp.asarray(rng.standard_normal((T, C)).astype(np.float32))
    b0 = jax.lax.reduce_precision(tab_f32, 8, 7).astype(jnp.bfloat16)
    b1 = (tab_f32 - b0.astype(jnp.float32)).astype(jnp.bfloat16)
    i = jnp.asarray(rng.integers(0, T, P).astype(np.int32))
    u32 = ((jax.lax.bitcast_convert_type(b0, jnp.uint16).astype(jnp.uint32)
            << 16)
           | jax.lax.bitcast_convert_type(b1, jnp.uint16).astype(jnp.uint32))
    wide = jnp.concatenate([b0, b1], axis=1)          # (T, 128)
    tall = jnp.concatenate([b0, b1], axis=0)          # (2T, 64)
    i2 = jnp.concatenate([i, i + T])
    b0, b1, i, u32, wide, tall, i2 = jax.block_until_ready(
        (b0, b1, i, u32, wide, tall, i2))

    @jax.jit
    def va(b0, i):
        g = b0[i]
        return g.astype(jnp.float32).sum()

    @jax.jit
    def vb(b0, b1, i):
        s = b0[i].astype(jnp.float32) + b1[i].astype(jnp.float32)
        return s.sum()

    @jax.jit
    def vc(b0, b1, i):
        g0 = b0[i].astype(jnp.float32)
        # scalar data dep forces gather-1 after gather-0 (disjoint table
        # live ranges -> MSA can reuse one alternate-memory slot)
        i1 = i + (g0[0, 0] * 0).astype(jnp.int32)
        g1 = b1[i1].astype(jnp.float32)
        return (g0 + g1).sum()

    @jax.jit
    def vd(u32, i):
        g = u32[i]
        hi = jax.lax.bitcast_convert_type(
            (g & jnp.uint32(0xFFFF0000)), jnp.float32)
        lo = jax.lax.bitcast_convert_type((g << 16), jnp.float32)
        return (hi + lo).sum()

    @jax.jit
    def ve(wide, i):
        g = wide[i].astype(jnp.float32)
        return (g[:, :C] + g[:, C:]).sum()

    @jax.jit
    def vf(tall, i2):
        g = tall[i2].astype(jnp.float32)
        return g.sum()

    for name, fn, args in (
        ("a one-table one-gather ", va, (b0, i)),
        ("b two-tables two-gather", vb, (b0, b1, i)),
        ("c serialized two-gather", vc, (b0, b1, i)),
        ("d u32-packed one-gather", vd, (u32, i)),
        ("e wide-cols  one-gather", ve, (wide, i)),
        ("f tall-rows  one-gather", vf, (tall, i2)),
    ):
        dt = timed(fn, *args)
        print(f"{name}: {dt*1000:7.2f} ms")


if __name__ == "__main__":
    main()
