"""Light culling — tiled light lists (IMPLEMENTED; the reference never
finished this pass).

The reference's light-culling pass is an explicit STUB: bind groups and
pipelines exist but `render()` is `// TODO!` and both WGSL files are empty
(crates/renderer/src/render_passes/light_culling/render_pass.rs:30-34);
docs/ROADMAP.md:24-33 sketches tiled light lists. This module implements
the sketch TPU-natively, shared by two consumers:

- the production shading path (ops/shade.py `_punctual_lights_tiled`)
  builds its lists in shading-layout unit space — 128-pixel lane groups,
  valid in band space AND in the tile-compacted space — with unit AABBs
  reduced from the exact interpolated world positions (no extra pass, no
  HBM round-trip for the lists). The renderer engages it automatically
  when `lights.count > 8` (override with RendererConfig.light_tiles).
- `cull_lights` below is the standalone pass-level interface for hook
  consumers: it reconstructs per-tile world AABBs from the DEPTH PLANE
  (inverse view-projection at pixel centers — the same positions shading
  interpolates, evaluated from the G-buffer instead) and runs the same
  geometric test + priority via `light_lists_from_bounds`, so standalone
  lists match the in-shade lists on matching unit granularity
  (tests/test_hooks_lightcull.py::TestStandaloneCull).

Per-unit list construction (`light_lists_from_bounds`):
- overlap matrix (n_units, L): sphere-vs-AABB squared-distance test per
  light; directional / infinite-range lights always overlap; spot cones
  conservatively treated as point spheres (exact — lights outside the
  cone contribute 0 via the angular window, lights.wgsl)
- priority = estimated contribution: intensity for directional lights,
  intensity / (1 + d²(center, unit AABB)) for positional ones — so when
  more than MAX_LIGHTS_PER_TILE lights reach one unit, the *faintest*
  (by this estimate) drop, not the latest-inserted (r4 used insertion
  order, which could drop a bright late light in favor of dim early
  ones)
- top_k → per-unit list of MAX_LIGHTS_PER_TILE light rows. Exact vs the
  dense loop whenever ≤ MAX_LIGHTS_PER_TILE lights genuinely reach any
  one unit: every overlapping light has a strictly positive score, so
  none can be displaced while slots remain.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

MAX_LIGHTS_PER_TILE = 16

_EPS = 1e-6


def light_lists_from_bounds(mn, mx, lights, n_lights, K: int):
    """Per-unit light lists from unit world AABBs.

    mn, mx: 3-lists of (n_units,) f32 — unit AABB bounds per axis (an
    empty unit may use mn=+BIG / mx=-BIG; only always-on lights then
    overlap it). lights: (L, 16) packed rows (core/lights.py layout).
    Returns (lidx (n_units, K) i32 light rows, valid (n_units, K) bool).
    """
    from ..core.lights import (
        L_INTENSITY, L_KIND, L_POSITION, L_RANGE,
    )

    L = lights.shape[0]
    n_units = mn[0].shape[0]
    kind = lights[:, L_KIND]                          # (L,)
    lrange = lights[:, L_RANGE]
    always = (kind == 0.0) | (lrange <= 0.0)
    # squared distance from each light center to each unit AABB
    d2 = jnp.zeros((n_units, L), jnp.float32)
    for a in range(3):
        c = lights[None, :, L_POSITION + a]           # (1, L)
        dd = jnp.maximum(mn[a][:, None] - c, 0.0) + jnp.maximum(
            c - mx[a][:, None], 0.0)
        d2 = d2 + dd * dd
    li = jnp.arange(L, dtype=jnp.int32)
    live = li[None, :] < n_lights
    overlap = (always[None, :] | (d2 <= (lrange * lrange)[None, :])) & live
    # estimated contribution: directional = intensity; positional =
    # intensity attenuated by distance to the unit's box. Floored to a
    # positive epsilon so a zero-intensity overlapping light still beats
    # the empty slot (keeps the ≤K exactness property).
    intensity = lights[None, :, L_INTENSITY]
    contrib = jnp.where(kind[None, :] == 0.0, intensity,
                        intensity / (1.0 + d2))
    score = jnp.where(overlap, jnp.maximum(contrib, jnp.float32(1e-20)),
                      jnp.float32(0.0))
    vals, lidx = jax.lax.top_k(score, K)              # (n_units, K)
    return lidx, vals > 0


def cull_lights(lights, n_lights, depth_plane, camera, *, width: int,
                height: int, tile_h: int = 8, tile_w: int = 128):
    """Standalone tiled light culling over the depth plane.

    Reconstructs per-tile world AABBs by unprojecting every covered pixel
    (depth < 1) through the camera's inverse view-projection, then runs
    the shared geometric test + contribution priority. Tiles are raster
    order: tile index = ty * (width // tile_w) + tx. With tile_h=1,
    tile_w=128 the units coincide with the in-shade band-space lane
    groups, making the lists directly comparable to
    `_punctual_lights_tiled` (asserted in tests/test_hooks_lightcull.py).

    Args:
      lights: (L, 16) packed light rows; n_lights: live count (traced ok)
      depth_plane: (height*width,) or (height, width) NDC depth in [0,1]
      camera: device camera dict (needs "inv_view_proj")
    Returns (light_lists (n_tiles, K) i32, counts (n_tiles,) i32) with
    K = min(MAX_LIGHTS_PER_TILE, L); unused list slots hold the last
    valid index top_k produced and are excluded by `counts`.
    """
    H, W = height, width
    th, tw = tile_h, tile_w
    assert H % th == 0 and W % tw == 0, (H, W, th, tw)
    d = depth_plane.reshape(H, W)
    xs = (jnp.arange(W, dtype=jnp.float32) + 0.5) / W * 2.0 - 1.0
    ys = 1.0 - (jnp.arange(H, dtype=jnp.float32) + 0.5) / H * 2.0
    nx = jnp.broadcast_to(xs[None, :], (H, W))
    ny = jnp.broadcast_to(ys[:, None], (H, W))
    ivp = camera["inv_view_proj"]
    wp = [nx * ivp[j, 0] + ny * ivp[j, 1] + d * ivp[j, 2] + ivp[j, 3]
          for j in range(4)]
    iw = 1.0 / jnp.where(jnp.abs(wp[3]) > _EPS, wp[3], _EPS)
    pos = [wp[a] * iw for a in range(3)]
    covered = d < 1.0

    def tiles(p):
        return (p.reshape(H // th, th, W // tw, tw)
                .transpose(0, 2, 1, 3).reshape(-1, th * tw))

    cov_t = tiles(covered)
    big = jnp.float32(3e38)
    mn = [jnp.min(jnp.where(cov_t, tiles(p), big), axis=1) for p in pos]
    mx = [jnp.max(jnp.where(cov_t, tiles(p), -big), axis=1) for p in pos]

    K = min(MAX_LIGHTS_PER_TILE, lights.shape[0])
    lidx, valid = light_lists_from_bounds(mn, mx, lights, n_lights, K)
    return lidx, jnp.sum(valid.astype(jnp.int32), axis=1)
