"""r4 experiment: can the opaque deferred shade compact FINER than 8x128
tiles? (VERDICT r3 next-round item #1a.)

Three candidate decompositions, measured on the real chip:

A. status quo — 8x128 covered-tile compaction (r3: 1344 tiles = 1.38M
   compact pixels vs 0.72M truly covered).
B. strip compaction — same take/scatter machinery at (th, 128) units for
   th in {1, 2, 4}: coverage granularity 128-512 px instead of 1024. The
   take/scatter stay row-granular (512-B+ rows, ~2 ns/row => sub-ms) and
   the covered-first argsort runs over <=16k keys (trivial). Win = the
   strip-vs-tile coverage gap times the ~14 ms/1.38Mpx shade+gather bill.
C. pixel-exact compaction — ONE stable multi-operand lax.sort over the
   per-pixel miss flag carrying (tid, depth, idx), shade the first Ncap,
   then expand by gathering a packed (Ncap, 4) f32 color table at
   pos[p] = cumsum(covered)-1 and Pallas-splitting the AoS result back
   to channel planes.

This script measures (1) the true coverage of the stress scene's MSAA
tid plane at every granularity, and (2) the isolated device cost of each
extra primitive C needs (sort-with-operands, wide-row gather-back,
splitter) at production sizes, so the end-to-end decision is arithmetic
on measured numbers. Results recorded in BASELINE.md / ARCHITECTURE.md.
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def coverage_report():
    """Render the bench stress scene once; reduce the MSAA rep-sample tid
    plane to per-granularity covered-unit COUNTS on device (an 8 MB tid
    readback through the relay blows the time budget; scalars don't)."""
    import jax.numpy as jnp

    from bench import build_stress_scene

    r, tris = build_stress_scene(1920, 1080)
    r.render_device()
    tid = r._last_tri_id  # (1080, 1920) device
    H, W = 1088, 1920
    tid = jnp.pad(tid, ((0, H - tid.shape[0]), (0, W - tid.shape[1])),
                  constant_values=-1)
    counts = {}
    counts["px"] = jnp.sum(tid >= 0)
    for th in (1, 2, 4, 8):
        t = tid.reshape(H // th, th, W // 128, 128)
        counts[f"({th},128)"] = jnp.sum(jnp.any(t >= 0, axis=(1, 3)))
    t = tid.reshape(H // 32, 32, W // 32, 32)
    counts["(32,32)"] = jnp.sum(jnp.any(t >= 0, axis=(1, 3)))
    vals = {k: int(np.asarray(v)) for k, v in counts.items()}
    print(f"pixel coverage: {vals['px']/(H*W):.3f} ({vals['px']} px)")
    for th in (1, 2, 4, 8):
        n_units = (H // th) * (W // 128)
        c = vals[f"({th},128)"]
        px = c * th * 128
        print(f"({th},128) units: {n_units} units, covered {c/n_units:.3f} "
              f"-> {px} px ({px/(H*W):.3f} of frame)")
    print(f"(32,32) tiles: covered {vals['(32,32)']/((H//32)*(W//32)):.3f}")


def _timeit(fn, fence, n=20, label=""):
    fn()
    fence()
    t0 = time.perf_counter()
    fn()
    fence()
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(n):
        fn()
    fence()
    tn = time.perf_counter() - t0
    dt = (tn - t1) / (n - 1) * 1000
    print(f"  {label}: {dt:.2f} ms")
    return dt


def primitive_costs():
    """Isolated costs of candidate-C's primitives at production sizes."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    P = 1344 * 1024          # compact-tile space (r3 production size)
    Ncap = 768 * 1024        # pixel cap (covered 0.72M -> bucket 0.75M)
    cov = rng.random(P) < 0.53
    tid = np.where(cov, rng.integers(0, 500000, P), -1).astype(np.int32)
    depth = rng.random(P).astype(np.float32)

    tid_d = jnp.asarray(tid)
    dep_d = jnp.asarray(depth)

    @jax.jit
    def sort3(t, d):
        miss = (t < 0).astype(jnp.int32)
        idx = jnp.arange(t.shape[0], dtype=jnp.int32)
        mk, tc, dc, ic = jax.lax.sort((miss, t, d, idx), num_keys=1,
                                      is_stable=True)
        return tc[:Ncap], dc[:Ncap], ic[:Ncap]

    out = [None]

    def fence():
        for o in jax.tree_util.tree_leaves(out[0]):
            np.asarray(o[:1] if hasattr(o, "shape") and o.ndim else o)

    def run_sort():
        out[0] = sort3(tid_d, dep_d)

    _timeit(run_sort, fence, label=f"stable 4-operand sort P={P}")

    @jax.jit
    def argsort1(t):
        return jnp.argsort(t < 0)[:Ncap]

    def run_argsort():
        out[0] = argsort1(tid_d)

    _timeit(run_argsort, fence, label=f"argsort P={P}")

    # expansion: gather a packed (Ncap, 4) f32 table at pos[p], then
    # Pallas-split to 4 channel planes
    colors = jnp.asarray(rng.random((Ncap, 4)).astype(np.float32))

    from awsm_renderer_tpu.ops.relayout import split_channels

    @jax.jit
    def expand(cov_i32, table):
        pos = jnp.cumsum(cov_i32) - 1
        g = table[jnp.clip(pos, 0, Ncap - 1)]        # (P, 4) one gather
        ch = split_channels(g)
        return [jnp.where(cov_i32 > 0, ch[c], 0.0) for c in range(4)]

    cov_d = jnp.asarray(cov.astype(np.int32))

    def run_expand():
        out[0] = expand(cov_d, colors)

    _timeit(run_expand, fence, label=f"cumsum+gather(Px16B)+split P={P}")

    # strip-granular take/scatter (candidate B) at th=1: 16320-row units
    n_units = P // 128
    Cst = int(n_units * 0.55)
    plane = jnp.asarray(rng.random((n_units, 128)).astype(np.float32))
    uidx = jnp.asarray(
        rng.permutation(n_units)[:Cst].astype(np.int32))

    @jax.jit
    def take_scatter(p, i):
        c = jnp.take(p, i, axis=0)
        full = jnp.zeros_like(p)
        return full.at[i].set(c * 2.0)

    def run_ts():
        out[0] = take_scatter(plane, uidx)

    _timeit(run_ts, fence,
            label=f"(1,128)-unit take+scatter {Cst}/{n_units} rows")


if __name__ == "__main__":
    if "--cov" in sys.argv:
        coverage_report()
    else:
        primitive_costs()
