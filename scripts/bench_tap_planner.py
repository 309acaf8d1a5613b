"""Microbench the fused tap planner kernel (texsample._tap_plan_fused)
standalone on TPU: current block size vs padded-larger variants, and an
ALU-trimmed variant, to find what the 5.3 ms/frame actually buys.

Differential timing per verify skill (relay fetch ~2.2 s flat).
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from awsm_renderer_tpu.ops import relayout
from awsm_renderer_tpu.ops.texsample import _tap_plan_fused

P = 2073600
CAPD = 32


def timeit(fn, label, n=30):
    out = fn()
    jax.tree_util.tree_map(lambda x: None, out)
    _ = float(np.asarray(out[0][0]))  # fence
    t0 = time.perf_counter()
    out = fn()
    _ = float(np.asarray(out[0][0]))
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _i in range(n):
        out = fn()
    _ = float(np.asarray(out[0][0]))
    tn = time.perf_counter() - t0
    dt = (tn - t1) / (n - 1)
    print(f"{label}: {dt*1000:.2f} ms", file=sys.stderr)
    return dt


def main():
    rng = np.random.default_rng(0)
    tex_id = jnp.asarray(rng.integers(0, 3, P), jnp.int32)
    u = jnp.asarray(rng.uniform(-2, 2, P), jnp.float32)
    v = jnp.asarray(rng.uniform(-2, 2, P), jnp.float32)
    duv = tuple(jnp.asarray(rng.uniform(-0.01, 0.01, P), jnp.float32)
                for _ in range(4))
    desc = np.zeros((CAPD, 24), np.int32)
    desc[:, 0] = 128  # width
    desc[:, 1] = 128  # height
    desc[:, 2] = 8    # n_mips
    desc[:, 3] = 1    # filter linear
    desc[:, 4] = 1    # mip filter linear
    from awsm_renderer_tpu.ops.texsample import TD_MIP_OFFSETS, MAX_MIPS
    off = 0
    for m in range(8):
        desc[:, TD_MIP_OFFSETS + m] = off
        off += max(128 >> m, 1) * max(128 >> m, 1)
    desc = jnp.asarray(desc)

    run = jax.jit(lambda t, uu, vv, d: _tap_plan_fused(
        t, uu, vv, d, desc, has_nearest=False))

    timeit(lambda: run(tex_id, u, v, duv), "planner blk=1024 (current)")

    # variant: force larger blocks by padding externally
    orig = relayout._pick_blk
    for blk in (2048, 4096, 8192):
        relayout._pick_blk = lambda n, b=blk: b
        run2 = jax.jit(lambda t, uu, vv, d: _tap_plan_fused(
            t, uu, vv, d, desc, has_nearest=False))
        try:
            timeit(lambda: run2(tex_id, u, v, duv), f"planner blk={blk}")
        except Exception as e:  # noqa: BLE001
            print(f"blk={blk} failed: {e}", file=sys.stderr)
        relayout._pick_blk = orig

    # no-mips variant (half the wrap math, no log2): bounds the mip cost
    run3 = jax.jit(lambda t, uu, vv: _tap_plan_fused(
        t, uu, vv, None, desc, has_nearest=False))
    timeit(lambda: run3(tex_id, u, v), "planner no-mips")


if __name__ == "__main__":
    main()
