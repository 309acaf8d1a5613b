"""Measure v5-MSAA binning work vs triangle order (CPU, no TPU needed).

The MSAA raster kernel's cost scales with (group, tile) entry visits and
per-entry quadrant merges; both depend on how spatially tight each
16-triangle group's bbox is. Triangle order inside a resource is
source-index order today. This script compares:
  a) current order
  b) object-space 3D-Morton order per resource (scene-static, applied once
     at insert_resource — zero per-frame cost)

Metrics: small-pair entries, big groups, total quadrant merges
(sum over entries of popcount of the union subgroup quadrant mask),
and total merged lanes (proxy for merge ALU).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.pop("PALLAS_AXON_POOL_IPS", None)

import numpy as np


def morton3(x, y, z):
    def spread(v):
        v = v.astype(np.uint64) & 0x3FF
        v = (v | (v << 16)) & 0x030000FF
        v = (v | (v << 8)) & 0x0300F00F
        v = (v | (v << 4)) & 0x030C30C3
        v = (v | (v << 2)) & 0x09249249
        return v
    return spread(x) | (spread(y) << 1) | (spread(z) << 2)


def morton_perm(centroids: np.ndarray) -> np.ndarray:
    lo = centroids.min(axis=0)
    hi = centroids.max(axis=0)
    ext = np.maximum(hi - lo, 1e-12)
    q = np.clip(((centroids - lo) / ext * 1023.0), 0, 1023).astype(np.uint32)
    key = morton3(q[:, 0], q[:, 1], q[:, 2])
    return np.argsort(key, kind="stable")


def bvh_perm(centroids: np.ndarray, leaf: int = 16) -> np.ndarray:
    """Recursive longest-axis median split down to `leaf`-sized clusters;
    returns the concatenated leaf order (balanced BVH leaf ordering)."""
    n = centroids.shape[0]
    out = np.empty(n, np.int64)
    pos = 0
    stack = [np.arange(n, dtype=np.int64)]
    while stack:
        ids = stack.pop()
        if ids.size <= leaf:
            out[pos:pos + ids.size] = ids
            pos += ids.size
            continue
        c = centroids[ids]
        ax = int(np.argmax(c.max(axis=0) - c.min(axis=0)))
        half = ids.size // 2
        part = np.argpartition(c[:, ax], half)
        stack.append(ids[part[half:]])
        stack.append(ids[part[:half]])
    return out


def reorder_resources(enable: str):
    """Monkeypatch Meshes.insert_resource to reorder triangles."""
    if not enable:
        return
    from awsm_renderer_tpu.core import meshes as MM
    orig = MM.Meshes.insert_resource

    def patched(self, geo, *a, **kw):
        idx = np.asarray(geo.indices, np.int64).reshape(-1, 3)
        pos = np.asarray(geo.positions, np.float32).reshape(-1, 3)
        cent = pos[idx].mean(axis=1)
        perm = bvh_perm(cent) if enable == "bvh" else morton_perm(cent)
        import dataclasses
        geo2 = dataclasses.replace(geo, indices=idx[perm].reshape(-1))
        return orig(self, geo2, *a, **kw)

    MM.Meshes.insert_resource = patched


def measure(label: str):
    import jax
    import jax.numpy as jnp

    from bench import build_stress_scene
    from awsm_renderer_tpu.ops.raster import BT_H, BT_W, build_bins16, K_SLOTS
    from awsm_renderer_tpu.passes.frame import (
        _pad_to, _run_vertex, prep_setup_rows)
    from awsm_renderer_tpu.ops.raster import TILE_H, TILE_W

    W, H = 1920, 1080
    r, tris = build_stress_scene(W, H)
    masks = r._mesh_masks()
    ds = r._flush()
    mask = r._device_mask("opaque", masks["opaque"])

    rw1 = _pad_to(W, TILE_W)
    rh1 = _pad_to(H, TILE_H)
    rw2, rh2 = _pad_to(2 * W, TILE_W), 2 * rh1

    rows, key = _run_vertex(
        ds, mask, rw=rw2, rh_full=rh2, row_offset=0, shift_rows=False,
        has_morphs=False, skin_sets=0, needs_clip=bool(masks["needs_clip"]))
    srows = prep_setup_rows(rows, key)

    W64 = -(-rw2 // (2 * BT_W)) * (2 * BT_W)
    H64 = -(-rh2 // (2 * BT_H)) * (2 * BT_H)
    entries, offs, counts, zmin_g, bigp, bigid, nbig = build_bins16(
        jnp.asarray(srows), width=W64, height=H64, vis_cap=65536,
        stash_cap=4096, tile_h=2 * BT_H, tile_w=2 * BT_W, pack_submask=True)
    counts = np.asarray(counts)
    offs = np.asarray(offs)
    entries = np.asarray(entries)
    nbig = int(np.asarray(nbig)[0])

    # gather live entries per tile
    live = []
    for t in range(counts.size):
        live.append(entries[offs[t]:offs[t] + counts[t]])
    live = np.concatenate(live) if live else np.zeros(0, np.int32)
    masks8 = live & 0xFF
    union = (masks8 | (masks8 >> 4)) & 0xF
    quad_merges = int(np.bitwise_count(union.astype(np.uint8)).sum()) \
        if hasattr(np, "bitwise_count") else int(
            sum(bin(int(u)).count("1") for u in union))
    print(f"[{label}] entries={live.size}  big_groups={nbig}  "
          f"quad_merges={quad_merges}  "
          f"merge_lanes={quad_merges * 16 * 256}")
    return live.size, quad_merges


if __name__ == "__main__":
    enable = sys.argv[1] if len(sys.argv) > 1 else ""
    if enable == "baseline":
        enable = ""
    reorder_resources(enable)
    measure(enable or "baseline")
