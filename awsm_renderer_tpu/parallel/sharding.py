"""Multi-chip rendering: framebuffer tiles sharded over an ICI mesh.

The reference is a single-GPU browser program with no distributed layer
(SURVEY §2.6/§5.8); its natural TPU-native scaling axis is screen space —
the same axis its 8x8-workgroup compute passes tile. Here the framebuffer
is sharded by rows over a 1-D `jax.sharding.Mesh`, the (small) scene
arrays are replicated, and every device rasterizes + shades only its band:

  - geometry "broadcast" = replicated device scene (the per-frame dirty
    uploads are tiny relative to ICI bandwidth)
  - raster/shade band-locality: triangle setup is translated into band
    coordinates per shard; chunk-bbox culling then skips everything
    outside the band, so compute scales ~1/N per device
  - the final image is already row-sharded — display/composite is local;
    a host gather (or all_gather for device-side consumers) finishes it

This is the TPU analog of sequence/context parallelism for a renderer:
the "big dimension" is pixels.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import ToneMapping
from ..ops.raster import TILE_H, TILE_W, pad_setup, rasterize
from ..ops.shade import shade_deferred
from ..ops.tonemap import display_pass
from ..ops.vertex import (
    S_BB_MAXY, S_BB_MINY, S_E0B, S_E0C, S_E1B, S_E1C, S_E2B, S_E2C,
    S_ZB, S_ZC, vertex_stage,
)


def _shift_setup_rows(setup: jnp.ndarray, y0) -> jnp.ndarray:
    """Translate triangle screen-y into band-local coordinates.

    v4 plane-equation rows: E(px, py_local) must equal the global-space
    value, so each edge constant gains B*y0 (and the z-plane ZB*y0);
    bboxes translate."""
    y0 = jnp.float32(y0)
    s = setup
    for rb, rc in ((S_E0B, S_E0C), (S_E1B, S_E1C), (S_E2B, S_E2C),
                   (S_ZB, S_ZC)):
        s = s.at[rc].add(s[rb] * y0)
    s = s.at[S_BB_MINY].add(-y0)
    s = s.at[S_BB_MAXY].add(-y0)
    return s


def render_frame_sharded(
    mesh: Mesh,
    ds,
    opaque_mask,
    *,
    width: int,
    height: int,
    tonemap: ToneMapping = ToneMapping.KHRONOS_PBR_NEUTRAL,
    use_mips: bool = True,
    has_morphs: bool = False,
    skin_sets: int = 0,
    interpret: bool | None = None,
):
    """Render with the framebuffer row-sharded over `mesh` (1-D, axis 'rows').

    width must be a TILE_W multiple; height a (TILE_H * n_devices) multiple.
    Returns (display (H,W,4), tri_id (H,W)) sharded over rows.
    """
    (axis,) = mesh.axis_names
    n = mesh.shape[axis]
    assert width % TILE_W == 0
    assert height % (TILE_H * n) == 0, (height, n)
    band_h = height // n

    replicated = NamedSharding(mesh, P())

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P()),
        out_specs=(P(axis), P(axis)),
        check_rep=False,
    )
    def _render(ds_rep, mask_rep):
        idx = jax.lax.axis_index(axis)
        y0 = idx * band_h

        rows, _key = vertex_stage(
            ds_rep["c_pos"], ds_rep["c_norm"], ds_rep["c_tang"],
            ds_rep["c_uv0"], ds_rep["c_uv1"], ds_rep["c_color"],
            ds_rep["c_joints"], ds_rep["c_weights"], ds_rep["c_morph_base"],
            ds_rep["morph_deltas"], ds_rep["tri_mesh"], ds_rep["mesh_info"],
            ds_rep["morph_weights"], ds_rep["world"], ds_rep["normal_mat"],
            ds_rep["joint_matrices"], ds_rep["camera"]["view_proj"], mask_rep,
            width=width, height=height, has_morphs=has_morphs,
            skin_sets=skin_sets,
        )
        # band-local Morton order differs from the global key: re-sort on
        # the (NSETUP, T) block after shifting y into band coordinates
        setup = pad_setup(_shift_setup_rows(rows.T, y0))
        from ..passes.frame import _sort_triangles

        sorted_setup, _ = _sort_triangles(setup)
        vis = rasterize(sorted_setup, width=width, height=band_h,
                        interpret=interpret)
        hdr = shade_deferred(
            vis, ds_rep,
            width=width, height=band_h, height_full=height,
            row_offset=y0, use_mips=use_mips,
        )
        ldr = display_pass(hdr, tonemap)
        T_pool = ds_rep["tri_mesh"].shape[0]
        tid = jnp.where(vis["tri_id"] >= 0, vis["tri_id"] % T_pool, -1)
        return ldr, tid

    ds_rep = jax.device_put(ds, replicated)
    mask_rep = jax.device_put(opaque_mask, replicated)
    return jax.jit(_render)(ds_rep, mask_rep)
