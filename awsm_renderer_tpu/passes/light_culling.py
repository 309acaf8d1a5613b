"""Light culling — tiled light lists (IMPLEMENTED; the reference never
finished this pass).

The reference's light-culling pass is an explicit STUB: bind groups and
pipelines exist but `render()` is `// TODO!` and both WGSL files are empty
(crates/renderer/src/render_passes/light_culling/render_pass.rs:30-34);
docs/ROADMAP.md:24-33 sketches tiled light lists. r4 implements the
sketch TPU-natively — see ops/shade.py `_punctual_lights_tiled`:

- units are the shading layout's native 128-pixel lane groups (free
  reshape of every (P,) plane, in band space AND compacted space)
- per unit: world AABB of its pixels' positions (reduces), overlap
  matrix vs every light's bounding sphere, top_k → per-unit list of
  MAX_LIGHTS_PER_TILE light rows (the ops/raster.py build_bins pattern)
- the shading loop then runs the list length with per-unit (n_units, 1)
  light params broadcasting against (n_units, 128) pixels — O(px × K)
  instead of O(px × light capacity)

The renderer engages it automatically when `lights.count > 8`
(renderer.py static_kwargs light_tiles). Exact vs the dense loop
whenever ≤ MAX_LIGHTS_PER_TILE lights genuinely reach any one unit
(tests/test_hooks_lightcull.py::TestTiledLights); beyond that the
lowest-priority lights drop per unit — the standard tiled-deferred
contract the ROADMAP sketch implies.

`cull_lights` below is the standalone pass-level interface (lists +
counts per screen tile) kept for hook consumers; the production shading
path builds its lists in shading-layout unit space instead (no extra
pass, no HBM round-trip for the lists).
"""

from __future__ import annotations

import jax.numpy as jnp

MAX_LIGHTS_PER_TILE = 16


def cull_lights(lights, n_lights, depth_plane, *, width: int, height: int,
                tile_h: int = 8, tile_w: int = 128):
    """Standalone tile-list interface: every tile lists the first
    MAX_LIGHTS_PER_TILE live lights (screen-tile granularity, no world
    bounds available at this interface — the production culling runs
    inside shading where world positions exist, _punctual_lights_tiled).

    Returns (light_lists (n_tiles, MAX_LIGHTS_PER_TILE) i32,
             counts (n_tiles,) i32)."""
    n_tiles = (height // tile_h) * (width // tile_w)
    cap = min(MAX_LIGHTS_PER_TILE, lights.shape[0])
    lists = jnp.broadcast_to(
        jnp.arange(cap, dtype=jnp.int32)[None, :], (n_tiles, cap))
    counts = jnp.broadcast_to(
        jnp.minimum(n_lights, cap).astype(jnp.int32), (n_tiles,))
    return lists, counts
