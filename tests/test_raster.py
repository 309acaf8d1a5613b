"""Pallas rasterizer tests vs an independent numpy reference rasterizer.

Runs in interpret mode on CPU (conftest forces JAX_PLATFORMS=cpu).
"""

import numpy as np
import jax.numpy as jnp

from awsm_renderer_tpu.ops.raster import CHUNK, pad_setup, rasterize
from awsm_renderer_tpu.ops.vertex import (
    NSETUP, S_BB_MAXX, S_BB_MAXY, S_BB_MINX, S_BB_MINY,
    S_E0A, S_E0B, S_E0C, S_E1A, S_E1B, S_E1C, S_E2A, S_E2B, S_E2C,
    S_IW0, S_IW1, S_IW2, S_ORIG_ID, S_UV0, S_ZA, S_ZB, S_ZC,
)

W, H = 128, 32


def make_setup(tris, valid=None):
    """tris: list of dicts with xy (3,2), z (3,), iw (3,). Builds v4
    plane-equation rows the same way finish_setup does (exact-negation-
    symmetric edge coefficients, affine z-plane)."""
    T = len(tris)
    s = np.zeros((NSETUP, T), np.float32)
    for t, tri in enumerate(tris):
        xy = np.asarray(tri["xy"], np.float32)
        z = np.asarray(tri.get("z", [0.5, 0.5, 0.5]), np.float32)
        iw = np.asarray(tri.get("iw", [1, 1, 1]), np.float32)
        # enforce positive orientation (vertex stage guarantees this)
        area2 = (xy[1, 0] - xy[0, 0]) * (xy[2, 1] - xy[0, 1]) - (
            xy[2, 0] - xy[0, 0]
        ) * (xy[1, 1] - xy[0, 1])
        assert area2 > 0, "test triangles must be positively oriented"
        sx, sy = xy[:, 0], xy[:, 1]
        ea = [sy[1] - sy[2], sy[2] - sy[0], sy[0] - sy[1]]
        eb = [sx[2] - sx[1], sx[0] - sx[2], sx[1] - sx[0]]
        ec = [sx[1] * sy[2] - sx[2] * sy[1],
              sx[2] * sy[0] - sx[0] * sy[2],
              sx[0] * sy[1] - sx[1] * sy[0]]
        if valid is not None and not valid[t]:
            ec[0] = np.float32(-3.0e38)
        for i, (ra, rb, rc) in enumerate(((S_E0A, S_E0B, S_E0C),
                                          (S_E1A, S_E1B, S_E1C),
                                          (S_E2A, S_E2B, S_E2C))):
            s[ra, t], s[rb, t], s[rc, t] = ea[i], eb[i], ec[i]
        inv_area = 1.0 / area2
        s[S_ZA, t] = (z[0] * ea[0] + z[1] * ea[1] + z[2] * ea[2]) * inv_area
        s[S_ZB, t] = (z[0] * eb[0] + z[1] * eb[1] + z[2] * eb[2]) * inv_area
        s[S_ZC, t] = (z[0] * ec[0] + z[1] * ec[1] + z[2] * ec[2]) * inv_area
        s[S_IW0, t], s[S_IW1, t], s[S_IW2, t] = iw
        s[S_BB_MINX, t], s[S_BB_MINY, t] = xy[:, 0].min(), xy[:, 1].min()
        s[S_BB_MAXX, t], s[S_BB_MAXY, t] = xy[:, 0].max(), xy[:, 1].max()
        if valid is not None and not valid[t]:
            s[S_BB_MINX, t] = s[S_BB_MINY, t] = 3.0e38
            s[S_BB_MAXX, t] = s[S_BB_MAXY, t] = -3.0e38
        # uv0 per-corner = identity barycentric probes: the interpolated
        # uv0_u/uv0_v planes then equal bary_u/bary_v of the raster corners
        s[S_UV0 + 1, t] = 1.0   # u at corner 1
        s[S_UV0 + 5, t] = 1.0   # v at corner 2
    # the kernel emits ids from the S_ORIG_ID row (vertex stage fills it)
    s[S_ORIG_ID, :] = np.arange(T, dtype=np.float32)
    return pad_setup(jnp.asarray(s))


def numpy_raster(tris, w=W, h=H):
    """Independent reference: same top-left rule, LESS depth, clear=1.0."""
    depth = np.full((h, w), 1.0, np.float32)
    tid = np.full((h, w), -1, np.int32)
    bu = np.zeros((h, w), np.float32)
    bv = np.zeros((h, w), np.float32)
    ys, xs = np.mgrid[0:h, 0:w]
    px, py = xs + 0.5, ys + 0.5
    for t, tri in enumerate(tris):
        xy = np.asarray(tri["xy"], np.float64)
        z = np.asarray(tri.get("z", [0.5, 0.5, 0.5]), np.float64)
        iw = np.asarray(tri.get("iw", [1, 1, 1]), np.float64)

        def edge(a, b):
            return (b[0] - a[0]) * (py - a[1]) - (b[1] - a[1]) * (px - a[0])

        def topleft(a, b):
            return (a[1] == b[1] and b[0] > a[0]) or (b[1] < a[1])

        e0, e1, e2 = edge(xy[1], xy[2]), edge(xy[2], xy[0]), edge(xy[0], xy[1])
        in0 = (e0 >= 0) if topleft(xy[1], xy[2]) else (e0 > 0)
        in1 = (e1 >= 0) if topleft(xy[2], xy[0]) else (e1 > 0)
        in2 = (e2 >= 0) if topleft(xy[0], xy[1]) else (e2 > 0)
        area2 = e0 + e1 + e2
        b0, b1 = e0 / area2, e1 / area2
        b2 = 1 - b0 - b1
        zpix = b0 * z[0] + b1 * z[1] + b2 * z[2]
        cover = in0 & in1 & in2 & (zpix >= 0) & (zpix <= 1)
        win = cover & (zpix < depth)
        denom = b0 * iw[0] + b1 * iw[1] + b2 * iw[2]
        pu = b1 * iw[1] / denom
        pv = b2 * iw[2] / denom
        depth = np.where(win, zpix, depth).astype(np.float32)
        tid = np.where(win, t, tid)
        bu = np.where(win, pu, bu).astype(np.float32)
        bv = np.where(win, pv, bv).astype(np.float32)
    return {"tri_id": tid, "depth": depth, "bary_u": bu, "bary_v": bv}


def run(tris, w=W, h=H):
    out = rasterize(make_setup(tris), width=w, height=h)
    got = {k: np.asarray(v) for k, v in out.items()}
    got["bary_u"] = got.pop("uv0_u")
    got["bary_v"] = got.pop("uv0_v")
    return got


def test_single_triangle_matches_reference():
    tris = [{"xy": [[10.0, 3.0], [90.0, 28.0], [20.0, 25.0]], "z": [0.2, 0.4, 0.6]}]
    got = run(tris)
    ref = numpy_raster(tris)
    np.testing.assert_array_equal(got["tri_id"], ref["tri_id"])
    np.testing.assert_allclose(got["depth"], ref["depth"], atol=1e-5)
    np.testing.assert_allclose(got["bary_u"], ref["bary_u"], atol=1e-5)
    np.testing.assert_allclose(got["bary_v"], ref["bary_v"], atol=1e-5)
    assert (got["tri_id"] == 0).sum() > 100  # sanity: actually covered pixels


def test_abutting_triangles_no_gaps_no_overlap():
    # quad split along a diagonal: every interior pixel covered exactly once
    a, b, c, d = [8.0, 4.0], [120.0, 4.0], [120.0, 28.0], [8.0, 28.0]
    tris = [{"xy": [a, b, c]}, {"xy": [a, c, d]}]
    got = run(tris)
    ref = numpy_raster(tris)
    np.testing.assert_array_equal(got["tri_id"], ref["tri_id"])
    # interior of the quad: all pixels covered by exactly one triangle
    inside = (
        (np.arange(W)[None, :] + 0.5 > a[0]) & (np.arange(W)[None, :] + 0.5 < b[0])
        & (np.arange(H)[:, None] + 0.5 > a[1]) & (np.arange(H)[:, None] + 0.5 < c[1])
    )
    assert np.all(got["tri_id"][inside] >= 0)


def test_depth_less_closer_wins():
    tris = [
        {"xy": [[10, 2], [110, 2], [60, 30]], "z": [0.8, 0.8, 0.8]},
        {"xy": [[10, 2], [110, 2], [60, 30]], "z": [0.3, 0.3, 0.3]},
    ]
    got = run(tris)
    covered = got["tri_id"] >= 0
    assert np.all(got["tri_id"][covered] == 1)
    np.testing.assert_allclose(got["depth"][covered], 0.3, atol=1e-6)


def test_depth_equal_first_wins():
    tris = [
        {"xy": [[10, 2], [110, 2], [60, 30]], "z": [0.5, 0.5, 0.5]},
        {"xy": [[10, 2], [110, 2], [60, 30]], "z": [0.5, 0.5, 0.5]},
    ]
    got = run(tris)
    covered = got["tri_id"] >= 0
    assert np.all(got["tri_id"][covered] == 0)


def test_perspective_correct_barycentrics():
    # unequal 1/w: perspective correction shifts barycentrics
    tris = [{
        "xy": [[0.0, 0.0], [128.0, 0.0], [0.0, 32.0]],
        "z": [0.1, 0.1, 0.1],
        "iw": [1.0, 0.25, 1.0],
    }]
    got = run(tris)
    ref = numpy_raster(tris)
    np.testing.assert_allclose(got["bary_u"], ref["bary_u"], atol=1e-5)
    np.testing.assert_allclose(got["bary_v"], ref["bary_v"], atol=1e-5)
    # at a pixel midway along the top edge, screen bary ~0.5 but persp bary
    # = 0.5*0.25 / (0.5*1 + 0.5*0.25) = 0.2
    y, x = 0, 64
    assert got["tri_id"][y, x] == 0
    np.testing.assert_allclose(got["bary_u"][y, x], (0.50390625 * 0.25) /
                               (0.49609375 + 0.50390625 * 0.25), atol=1e-3)


def test_invalid_triangles_skipped():
    tris = [{"xy": [[10, 2], [110, 2], [60, 30]]}]
    s = make_setup(tris, valid=[False])
    out = rasterize(s, width=W, height=H)
    assert np.all(np.asarray(out["tri_id"]) == -1)
    np.testing.assert_allclose(np.asarray(out["depth"]), 1.0)


def test_many_random_triangles_match_reference():
    rng = np.random.default_rng(7)
    tris = []
    for _ in range(200):  # > 1 chunk after padding
        xy = rng.uniform([0, 0], [W, H], size=(3, 2)).astype(np.float32)
        area2 = (xy[1, 0] - xy[0, 0]) * (xy[2, 1] - xy[0, 1]) - (
            xy[2, 0] - xy[0, 0]
        ) * (xy[1, 1] - xy[0, 1])
        if abs(area2) < 1.0:
            continue
        if area2 < 0:
            xy = xy[[0, 2, 1]]
        z = rng.uniform(0.05, 0.95, size=3).astype(np.float32)
        tris.append({"xy": xy, "z": z})
    got = run(tris)
    ref = numpy_raster(tris)
    same = got["tri_id"] == ref["tri_id"]
    # tolerate rare f32-vs-f64 depth-tie disagreements on edge pixels
    assert same.mean() > 0.999
    np.testing.assert_allclose(
        got["depth"][same], ref["depth"][same], atol=1e-4
    )


def test_multi_chunk_global_ids():
    # triangle index beyond the first chunk must come back correctly
    tris = [{"xy": [[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]]} for _ in range(CHUNK)]
    tris.append({"xy": [[10, 2], [110, 2], [60, 30]], "z": [0.3, 0.3, 0.3]})
    got = run(tris)
    covered = got["tri_id"] > 0
    assert np.all(got["tri_id"][covered] == CHUNK)


def test_binned_matches_dense():
    # binned path (interpret) must produce identical planes to the dense path
    rng = np.random.default_rng(11)
    tris = []
    for _ in range(40):
        xy = rng.uniform([0, 0], [W, H], size=(3, 2)).astype(np.float32)
        area2 = (xy[1, 0] - xy[0, 0]) * (xy[2, 1] - xy[0, 1]) - (
            xy[2, 0] - xy[0, 0]) * (xy[1, 1] - xy[0, 1])
        if abs(area2) < 1.0:
            continue
        if area2 < 0:
            xy = xy[[0, 2, 1]]
        tris.append({"xy": xy, "z": rng.uniform(0.1, 0.9, 3).astype(np.float32)})
    s = make_setup(tris)
    from awsm_renderer_tpu.ops.raster import rasterize_binned
    dense = rasterize(s, width=W, height=H, binned=False)
    binned = rasterize_binned(s, width=W, height=H, max_bins=8, interpret=True)
    for k in dense:
        np.testing.assert_allclose(np.asarray(binned[k]), np.asarray(dense[k]),
                                   atol=1e-6, err_msg=k)


def test_binned_peel_matches_dense():
    import jax.numpy as jnp
    from awsm_renderer_tpu.ops.raster import rasterize_binned, _rasterize_peel_dense
    tris = [
        {"xy": [[10, 2], [110, 2], [60, 30]], "z": [0.3, 0.3, 0.3]},
        {"xy": [[10, 2], [110, 2], [60, 30]], "z": [0.6, 0.6, 0.6]},
    ]
    s = make_setup(tris)
    zlo = jnp.full((H, W), -1.0, jnp.float32)
    zhi = jnp.full((H, W), 1.0, jnp.float32)
    dense = _rasterize_peel_dense(s, zlo, zhi, width=W, height=H, interpret=True)
    binned = rasterize_binned(s, zlo, zhi, width=W, height=H, max_bins=4, interpret=True)
    for k in dense:
        np.testing.assert_allclose(np.asarray(binned[k]), np.asarray(dense[k]),
                                   atol=1e-6, err_msg=k)


def test_slim_resolve_matches_fat_planes():
    """slim raster + shade.resolve_gbuffer == fat-plane raster output.

    The production frame uses the fat G-buffer (a second 2M-row gather in
    one XLA computation costs ~25-45ms on TPU), but the slim path stays
    available for sparse-coverage workloads; keep it correct."""
    import jax.numpy as jnp
    from awsm_renderer_tpu.ops.shade import resolve_gbuffer

    rng = np.random.default_rng(7)
    tris = []
    for _ in range(12):
        base = rng.uniform([5, 3], [100, 24]).astype(np.float32)
        a = base
        b = base + rng.uniform([4, -3], [24, 3]).astype(np.float32)
        c = base + rng.uniform([-3, 4], [3, 20]).astype(np.float32)
        area2 = (b[0]-a[0])*(c[1]-a[1]) - (c[0]-a[0])*(b[1]-a[1])
        if area2 < 0:
            b, c = c, b
        tris.append({"xy": [a, b, c],
                     "z": rng.uniform(0.1, 0.9, 3).astype(np.float32),
                     "iw": rng.uniform(0.5, 2.0, 3).astype(np.float32)})
    s = make_setup(tris)
    fat = rasterize(s, width=W, height=H, binned=False)
    slim = rasterize(s, width=W, height=H, binned=False, slim=True)
    np.testing.assert_array_equal(np.asarray(slim["tri_id"]),
                                  np.asarray(fat["tri_id"]))
    np.testing.assert_allclose(np.asarray(slim["depth"]),
                               np.asarray(fat["depth"]), atol=1e-6)
    P = W * H
    planes = {k: jnp.asarray(np.asarray(v).reshape(P)) for k, v in slim.items()}
    resolved = resolve_gbuffer(planes, jnp.asarray(s).T, width=W, height_full=H)
    covered = np.asarray(fat["tri_id"]).reshape(P) >= 0
    for key in ("mat_row", "uv0_u", "uv0_v", "normal_x", "tangent_w",
                "du0_dx", "dv0_dy"):
        np.testing.assert_allclose(
            np.asarray(resolved[key])[covered],
            np.asarray(fat[key]).reshape(P)[covered],
            atol=1e-4, err_msg=key)


def test_v5_matches_dense_with_big_groups():
    """v5 group-binned kernel (interpret) vs dense, including a screen-
    filling triangle that exercises the big-group fallback list."""
    from awsm_renderer_tpu.ops.raster import rasterize16

    rng = np.random.default_rng(11)
    tris = []
    for _ in range(60):
        xy = rng.uniform([0, 0], [W, H], size=(3, 2)).astype(np.float32)
        area2 = (xy[1, 0] - xy[0, 0]) * (xy[2, 1] - xy[0, 1]) - (
            xy[2, 0] - xy[0, 0]) * (xy[1, 1] - xy[0, 1])
        if abs(area2) < 1.0:
            continue
        if area2 < 0:
            xy = xy[[0, 2, 1]]
        tris.append({"xy": xy, "z": rng.uniform(0.1, 0.9, 3).astype(np.float32)})
    tris.append({"xy": [[-10.0, -5.0], [300.0, -5.0], [-10.0, 60.0]],
                 "z": [0.95, 0.95, 0.95]})
    s = make_setup(tris)
    dense = rasterize(s, width=W, height=H, binned=False)
    v5 = rasterize16(s.T, width=W, height=H, interpret=True)
    for k in dense:
        np.testing.assert_allclose(np.asarray(v5[k]), np.asarray(dense[k]),
                                   atol=1e-4, err_msg=k)


def test_v5_peel_matches_dense():
    from awsm_renderer_tpu.ops.raster import rasterize16, _rasterize_peel_dense

    tris = [
        {"xy": [[10, 2], [110, 2], [60, 30]], "z": [0.3, 0.3, 0.3]},
        {"xy": [[10, 2], [110, 2], [60, 30]], "z": [0.6, 0.6, 0.6]},
    ]
    s = make_setup(tris)
    zlo = jnp.full((H, W), -1.0, jnp.float32)
    zhi = jnp.full((H, W), 1.0, jnp.float32)
    dense = _rasterize_peel_dense(s, zlo, zhi, width=W, height=H, interpret=True)
    v5 = rasterize16(s.T, zlo, zhi, width=W, height=H, interpret=True)
    for k in dense:
        np.testing.assert_allclose(np.asarray(v5[k]), np.asarray(dense[k]),
                                   atol=1e-4, err_msg=k)


def test_shared_edge_watertight_no_pinholes():
    """Two triangles sharing a diagonal edge must jointly cover every
    interior pixel — regression for the FMA-asymmetric edge-C pinholes
    (ops/vertex.py finish_setup: canonical-anchor C). The old
    xa*yb - xb*ya form left ~10 holes along a box-face diagonal at
    128x64 because XLA's fma broke exact negation symmetry."""
    import numpy as np

    from awsm_renderer_tpu import (
        AwsmRendererTpu, PostProcessing, RendererConfig, ToneMapping,
        UnlitMaterial,
    )
    from awsm_renderer_tpu.geometry import box
    from awsm_renderer_tpu.utils import math3d as m3

    F = np.float32
    r = AwsmRendererTpu(RendererConfig(
        width=128, height=64,
        post_processing=PostProcessing(tonemapping=ToneMapping.NONE)))
    mat = r.materials.insert(UnlitMaterial(
        base_color_factor=np.array([1, 1, 1, 1], F)))
    r.add_mesh(box(0.8), mat)
    r.camera.update(m3.look_at([0, 0, 3], [0, 0, 0], [0, 1, 0]),
                    m3.perspective(np.pi / 3, 2.0, 0.1, 100.0))
    # render through the renderer (the common jit specialization other
    # tests already compile) — a direct render_frame call with one-off
    # static args compiled a fresh full-frame module just for this test
    r.render()
    tid = np.asarray(r._last_tri_id)
    ys, xs = np.where(tid >= 0)
    # interior of the face silhouette (1 px margin off the boundary)
    sub = tid[ys.min() + 1 : ys.max(), xs.min() + 1 : xs.max()]
    holes = np.argwhere(sub < 0)
    assert holes.shape[0] == 0, f"pinholes at {holes + [ys.min()+1, xs.min()+1]}"
