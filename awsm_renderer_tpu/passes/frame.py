"""Frame pipeline: vertex → raster → deferred shade → (effects) → display.

TPU-native analog of the reference's render loop (crates/renderer/src/
render.rs:53-383): the whole frame is ONE jitted function over the device
scene; XLA plays the role of the command encoder (pass scheduling, fusion,
buffer reuse). Pass toggles and capacities are static args = the
reference's pipeline-variant cache keys.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from ..config import RendererConfig, ToneMapping
from ..ops.raster import TILE_H, TILE_W, pad_setup, rasterize
from ..ops.shade import shade_deferred
from ..ops.tonemap import display_pass
from ..ops.vertex import vertex_stage


def _pad_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(
    jax.jit,
    static_argnames=(
        "width", "height", "supersample", "tonemap", "use_mips",
        "has_morphs", "skin_sets", "debug_normals", "interpret",
    ),
)
def render_frame(
    ds,                 # DeviceScene dict (all jnp arrays)
    opaque_mask,        # (Mcap,) bool — visible opaque meshes this frame
    *,
    width: int,         # output width (pre-supersample)
    height: int,
    supersample: bool,
    tonemap: ToneMapping,
    use_mips: bool,
    has_morphs: bool,
    skin_sets: int,
    debug_normals: bool = False,
    interpret: bool | None = None,
):
    """Returns (display_rgba (H,W,4) f32 in [0,1], tri_id (H,W) i32, depth)."""
    scale = 2 if supersample else 1
    rw = _pad_to(width * scale, TILE_W)
    rh = _pad_to(height * scale, TILE_H)

    setup, corner_n, corner_t, _corner_w = vertex_stage(
        ds["v_pos"], ds["v_norm"], ds["v_tang"], ds["v_morph_base"],
        ds["v_joints"], ds["v_weights"], ds["morph_deltas"],
        ds["tri_v"], ds["tri_mesh"], ds["mesh_info"], ds["morph_weights"],
        ds["world"], ds["normal_mat"], ds["joint_matrices"],
        ds["camera"]["view_proj"], opaque_mask,
        width=rw, height=rh, has_morphs=has_morphs, skin_sets=skin_sets,
    )
    setup = pad_setup(setup)
    vis = rasterize(setup, width=rw, height=rh, interpret=interpret)
    hdr = shade_deferred(
        vis, setup, corner_n, corner_t, ds,
        width=rw, height=rh, use_mips=use_mips, debug_normals=debug_normals,
    )

    # crop padding, then supersample-resolve in linear HDR (the reference's
    # MSAA resolve happens on Rgba16float targets pre-display)
    hdr = hdr[: height * scale, : width * scale]
    tri_id = vis["tri_id"][: height * scale, : width * scale]
    depth = vis["depth"][: height * scale, : width * scale]
    if supersample:
        hdr = hdr.reshape(height, 2, width, 2, 4).mean(axis=(1, 3))
        tri_id = tri_id[::2, ::2]
        depth = depth.reshape(height, 2, width, 2).min(axis=(1, 3))

    ldr = display_pass(hdr, tonemap)
    return ldr, tri_id, depth
