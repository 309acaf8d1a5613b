"""Public "extra pass" helpers: draw user-generated geometry mid-frame.

The reference exposes four public hook-pass builders so apps can record
their own draws inside the frame — world geometry extension, world/HUD
transparent, and display overlay (crates/renderer/src/render.rs:387-546);
the editor's grid is built on exactly that surface
(crates/editor/src/grid/render.rs). The TPU analog: RenderHooks callbacks
run inside the jitted frame and receive the HDR/display image, so an
"extra pass" is a traceable function that rasterizes extra triangles over
it. This module provides that function.

Scale note: hook geometry is editor-scale (gizmos, grids, debug lines —
tens to hundreds of triangles), so this uses a lax.scan over triangles
with full-screen edge tests rather than the binned production kernel:
O(T · pixels) vector work with zero setup cost, simpler for users, and
numerically the same edge/fill rules (top-left, perspective-correct
barycentrics) as the main rasterizer.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def project_triangles(camera: dict, tris_world: jnp.ndarray):
    """World-space (T, 3, 3) triangle corners → clip-space (T, 3, 4)
    through the frame's camera dict (ds["camera"])."""
    vp = camera["view_proj"]
    p = jnp.concatenate([tris_world,
                         jnp.ones((*tris_world.shape[:2], 1), jnp.float32)],
                        axis=-1)                       # (T, 3, 4)
    return jnp.einsum("ij,tcj->tci", vp, p)


def extra_geometry_pass(
    img: jnp.ndarray,            # (H, W, 4) HDR or display image
    depth,                       # (H, W) f32 depth plane, or None
    camera: dict,                # ds["camera"] (view_proj is used)
    tris_world: jnp.ndarray,     # (T, 3, 3) world-space corners
    colors: jnp.ndarray,         # (T, 3, 4) per-corner RGBA or (T, 4) flat
    *,
    depth_test: bool = True,
    depth_write: bool = False,
    two_sided: bool = True,
):
    """Rasterize user triangles over `img` with alpha blending; returns
    (img, depth). Call from any RenderHooks callback:

      before_transparent(hdr, depth, ds):  world-space, depth-tested
      last_pass(ldr, ds):                  display overlay (depth=None)

    Triangles with any corner at w <= 0 are dropped (no clipping — hook
    geometry that crosses the near plane should be pre-split by the
    caller, like the reference's hook passes which run on its already-
    clipped pipeline)."""
    H, W = img.shape[:2]
    if colors.ndim == 2:
        colors = jnp.broadcast_to(colors[:, None, :], (*tris_world.shape[:2], 4))
    clip = project_triangles(camera, tris_world)       # (T, 3, 4)

    px = jnp.arange(W, dtype=jnp.float32)[None, :] + 0.5
    py = jnp.arange(H, dtype=jnp.float32)[:, None] + 0.5
    if depth is None:
        depth0 = jnp.ones((H, W), jnp.float32)
    else:
        depth0 = depth

    def body(carry, tri):
        rgba, dep = carry
        c, col = tri                                   # (3,4), (3,4)
        w = c[:, 3]
        iw = 1.0 / jnp.where(jnp.abs(w) > 1e-20, w, 1e-20)
        sx = (c[:, 0] * iw * 0.5 + 0.5) * W
        sy = (0.5 - c[:, 1] * iw * 0.5) * H
        z = c[:, 2] * iw
        area2 = ((sx[1] - sx[0]) * (sy[2] - sy[0])
                 - (sx[2] - sx[0]) * (sy[1] - sy[0]))
        front = area2 < 0.0
        # CW-front in y-down screen coords (same convention as
        # ops/vertex.py finish_setup); flip to positive orientation
        o1 = jnp.where(front, 2, 1)
        o2 = jnp.where(front, 1, 2)
        ix = jnp.stack([0 * o1, o1, o2])
        sxo = sx[ix]
        syo = sy[ix]
        zo = z[ix]
        iwo = iw[ix]
        colo = col[ix]
        valid = ((w > 0.0).all()
                 & (front | two_sided)
                 & (jnp.abs(area2) > 1e-12))

        # edge i opposite corner i, interior positive
        def edge(a, b):
            A = syo[a] - syo[b]
            B = sxo[b] - sxo[a]
            C = sxo[a] * syo[b] - sxo[b] * syo[a]
            # top-left fill rule: edges pointing left (A > 0) or exactly
            # horizontal-top (A == 0, B < 0) own their boundary pixels
            topleft = (A > 0) | ((A == 0) & (B < 0))
            e = A * px + B * py + C
            return jnp.where(topleft, e >= 0.0, e > 0.0), e

        m0, e0 = edge(1, 2)
        m1, e1 = edge(2, 0)
        m2, e2 = edge(0, 1)
        inv_sum = 1.0 / jnp.maximum(e0 + e1 + e2, 1e-30)
        l0 = e0 * inv_sum
        l1 = e1 * inv_sum
        l2 = e2 * inv_sum
        covered = m0 & m1 & m2 & valid

        zpix = l0 * zo[0] + l1 * zo[1] + l2 * zo[2]
        covered = covered & (zpix >= 0.0) & (zpix <= 1.0)
        if depth_test:
            covered = covered & (zpix <= dep)

        # perspective-correct attribute interpolation
        pw = l0 * iwo[0] + l1 * iwo[1] + l2 * iwo[2]
        inv_pw = 1.0 / jnp.maximum(pw, 1e-30)
        rgba_t = [
            (l0 * iwo[0] * colo[0, ch] + l1 * iwo[1] * colo[1, ch]
             + l2 * iwo[2] * colo[2, ch]) * inv_pw
            for ch in range(4)
        ]
        a = jnp.where(covered, rgba_t[3], 0.0)
        out = [jnp.where(covered, rgba_t[ch] * a + rgba[..., ch] * (1 - a),
                         rgba[..., ch]) for ch in range(3)]
        out.append(jnp.where(covered, jnp.maximum(rgba[..., 3], a),
                             rgba[..., 3]))
        rgba = jnp.stack(out, axis=-1)
        if depth_write:
            dep = jnp.where(covered, zpix, dep)
        return (rgba, dep), None

    (img, depth_out), _ = jax.lax.scan(
        body, (img, depth0), (clip, colors))
    return img, (None if depth is None and not depth_write else depth_out)
