"""Light culling pass — structural placeholder.

The reference's light-culling pass is an explicit STUB: bind groups and
pipelines exist but `render()` is `// TODO!` and both WGSL files are empty
(crates/renderer/src/render_passes/light_culling/render_pass.rs:30-34;
docs/ROADMAP.md:24-33 sketches tiled light lists). We replicate it as the
same structural placeholder, with the TPU-native design documented:

Planned design (tiled light lists, the ROADMAP sketch):
- screen tiles reuse the rasterizer's (8, 128) tiling
- per tile: test every light's bounding sphere against the tile frustum
  (built from the tile corners + depth bounds from the raster depth plane)
- output: (n_tiles, MAX_LIGHTS_PER_TILE) i32 light lists + counts, built
  exactly like ops/raster.py build_bins (overlap matrix → top_k)
- the shading pass then loops the tile's list instead of every light

`cull_lights` currently returns the identity "all lights in every tile"
lists so the interface is exercisable and the shading loop could consume
it unchanged.
"""

from __future__ import annotations

import jax.numpy as jnp

MAX_LIGHTS_PER_TILE = 16


def cull_lights(lights, n_lights, depth_plane, *, width: int, height: int,
                tile_h: int = 8, tile_w: int = 128):
    """Placeholder: every tile lists all lights (reference stub parity).

    Returns (light_lists (n_tiles, MAX_LIGHTS_PER_TILE) i32,
             counts (n_tiles,) i32)."""
    n_tiles = (height // tile_h) * (width // tile_w)
    cap = min(MAX_LIGHTS_PER_TILE, lights.shape[0])
    lists = jnp.broadcast_to(
        jnp.arange(cap, dtype=jnp.int32)[None, :], (n_tiles, cap))
    counts = jnp.broadcast_to(
        jnp.minimum(n_lights, cap).astype(jnp.int32), (n_tiles,))
    return lists, counts
