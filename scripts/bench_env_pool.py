"""Image-environment stress frame: env taps via the texel pool vs the
legacy separate env table.

The config-5 headline bench uses a solid env; DamagedHelmet-class scenes
use image IBL, where the env taps historically gathered from their OWN
concatenated table — a second large table competing with the texel pool
for XLA's alternate-memory promotion budget (ARCHITECTURE.md gather
economics: an unpromoted gather runs ~8x slower). renderer._flush now
appends the env rows to the texel pool (bf16) and shade gathers both
from the one table. This script measures both routes at 1080p.

Usage: python scripts/bench_env_pool.py [pool|legacy|both]
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def build(route: str):
    from bench import build_stress_scene

    r, tris = build_stress_scene(1920, 1080)
    # image environment: equirect -> cubemap -> prefiltered IBL + skybox
    rng = np.random.default_rng(3)
    eq = (rng.uniform(0.0, 1.0, (64, 128, 3)).astype(np.float32) ** 2) * 4.0
    r.environment.set_environment_from_equirect(eq, size=128)
    ds = r._flush()
    if route == "legacy":
        ds.pop("env_pool_base", None)
        ds["texels"] = ds["texels"][: r.textures.texels_packed.shape[0]]
    return r, tris


def measure(route: str):
    r, tris = build(route)
    out = r.render_device()
    _ = float(np.asarray(out[0, 0, 0]))   # compile + fence

    def loop(n):
        t0 = time.perf_counter()
        o = None
        for _ in range(n):
            o = r.render_device()
        _ = float(np.asarray(o[0, 0, 0]))
        return time.perf_counter() - t0

    t1 = min(loop(1), loop(1))
    n = 30
    tn = loop(n)
    if tn <= t1:
        t1 = min(t1, loop(1))
        tn = loop(n)
    dt = (tn - t1) / (n - 1)
    print(f"{route}: {dt*1000:.2f} ms/frame ({tris} tris, image env)")
    return dt


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("pool", "both"):
        measure("pool")
    if which in ("legacy", "both"):
        measure("legacy")
