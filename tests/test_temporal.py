"""Temporal reuse (TAA) tests: reprojection kernel, validity, renderer
convergence.

The reference ships the scaffolding for this path disabled
(crates/renderer/src/camera.rs:13 APPLY_JITTER=false, get_halton_jitter
:257, frame_count uniform); the TPU build turns it on
(ops/temporal.py, passes/frame.py render_frame_temporal). These tests
pin the kernel's reuse semantics and the end-to-end convergence claim:
a STATIC converged temporal frame matches the non-temporal frame.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from awsm_renderer_tpu import (
    AntiAliasing, AwsmRendererTpu, PbrMaterial, PostProcessing,
    RendererConfig, ToneMapping, UnlitMaterial,
)
from awsm_renderer_tpu.geometry import box
from awsm_renderer_tpu.ops.temporal import (
    pack_history, reproject_history, reset_history, temporal_offsets,
)
from awsm_renderer_tpu.utils import math3d as m3

W, H = 128, 32


def _mk_history(rng, tids):
    Hh, Ww = tids.shape
    r = rng.random((Hh, Ww)).astype(np.float32)
    g = rng.random((Hh, Ww)).astype(np.float32)
    b = rng.random((Hh, Ww)).astype(np.float32)
    depth = rng.random((Hh, Ww)).astype(np.float32) * 0.5 + 0.25
    hist = pack_history(jnp.asarray(r), jnp.asarray(g), jnp.asarray(b),
                        jnp.asarray(tids), jnp.asarray(depth), Hh, Ww)
    return hist, (r, g, b, depth)


def test_reproject_identity_zero_offsets():
    rng = np.random.default_rng(7)
    tids = rng.integers(0, 50, (H, W)).astype(np.int32)
    hist, (r, g, b, depth) = _mk_history(rng, tids)
    zeros = jnp.zeros((H, W), jnp.float32)
    rr, gg, bb, valid, blend = reproject_history(
        hist, zeros, zeros, jnp.asarray(depth), jnp.asarray(tids),
        width=W, height=H, interpret=True)
    valid = np.asarray(valid).reshape(H, W)
    assert valid.all()
    np.testing.assert_allclose(np.asarray(rr).reshape(H, W), r)
    np.testing.assert_allclose(np.asarray(bb).reshape(H, W), b)
    assert np.asarray(blend).all()


def test_reproject_integer_shift():
    """Constant (+1, +1) offsets fetch the history from the shifted
    location. The ±RESID residual fan absorbs the shift exactly in every
    unit whose window was not clamped against an image border; clamped
    border units may conservatively invalidate (they reshade — a cost,
    never a correctness loss), so the assertion covers the unclamped
    region."""
    rng = np.random.default_rng(3)
    tids = rng.integers(0, 50, (H, W)).astype(np.int32)
    hist, (r, g, b, depth) = _mk_history(rng, tids)
    dy, dx = 1, 1
    offx = jnp.full((H, W), float(dx), jnp.float32)
    offy = jnp.full((H, W), float(dy), jnp.float32)
    # expected z / current ids must match the SHIFTED history entries
    ys = np.clip(np.arange(H)[:, None] + dy, 0, H - 1)
    xs = np.clip(np.arange(W)[None, :] + dx, 0, W - 1)
    exp_z = depth[ys, xs]
    cur = tids[ys, xs]
    rr, _gg, _bb, valid, _blend = reproject_history(
        hist, offx, offy, jnp.asarray(exp_z), jnp.asarray(cur),
        width=W, height=H, interpret=True)
    valid = np.asarray(valid).reshape(H, W)
    rr = np.asarray(rr).reshape(H, W)
    # unclamped region: all but the last (8-row, 128-col) unit band in
    # the shift direction, and the last pixel row/col (source off-screen)
    interior = np.zeros((H, W), bool)
    interior[:H - 8, :W - 1] = True
    assert valid[interior].all()
    np.testing.assert_allclose(rr[interior], r[ys, xs][interior])
    # sources off the bottom edge are invalid
    assert not valid[H - 1, W // 2]


def test_reproject_id_mismatch_invalid_but_blendable():
    rng = np.random.default_rng(11)
    tids = rng.integers(0, 50, (H, W)).astype(np.int32)
    hist, (_r, _g, _b, depth) = _mk_history(rng, tids)
    zeros = jnp.zeros((H, W), jnp.float32)
    wrong = tids + 1
    _rr, _gg, _bb, valid, blend = reproject_history(
        hist, zeros, zeros, jnp.asarray(depth), jnp.asarray(wrong),
        width=W, height=H, interpret=True)
    assert not np.asarray(valid).any()
    assert np.asarray(blend).all()          # still accumulable under clamp


def test_reproject_reset_history_all_invalid():
    hist = reset_history(H, W)
    zeros = jnp.zeros((H, W), jnp.float32)
    tids = jnp.zeros((H, W), jnp.int32)
    _rr, _gg, _bb, valid, blend = reproject_history(
        hist, zeros, zeros, zeros, tids, width=W, height=H, interpret=True)
    assert not np.asarray(valid).any()
    assert not np.asarray(blend).any()      # -2 sentinel is never live


def test_temporal_offsets_static_camera_zero():
    view = m3.look_at([0, 0.5, 3], [0, 0, 0], [0, 1, 0])
    proj = m3.perspective(np.pi / 3, W / H, 0.1, 100.0)
    vp = (proj @ view).astype(np.float32)
    cam = {
        "inv_view_proj_nj": jnp.asarray(
            np.linalg.inv(vp.astype(np.float64)).astype(np.float32)),
        "prev_view_proj": jnp.asarray(vp),
    }
    depth = jnp.full((H, W), 0.5, jnp.float32)
    off_x, off_y, exp_z = temporal_offsets(cam, depth, width=W, height=H)
    assert np.abs(np.asarray(off_x)).max() < 1e-2
    assert np.abs(np.asarray(off_y)).max() < 1e-2
    np.testing.assert_allclose(np.asarray(exp_z), 0.5, atol=1e-4)


# ---- renderer end-to-end --------------------------------------------------


def _make(temporal, **kw):
    cfg = RendererConfig(
        width=W, height=H,
        anti_aliasing=AntiAliasing(temporal=temporal),
        post_processing=PostProcessing(tonemapping=ToneMapping.NONE), **kw)
    r = AwsmRendererTpu(cfg)
    view = m3.look_at([0, 0.5, 3], [0, 0, 0], [0, 1, 0])
    proj = m3.perspective(np.pi / 3, W / H, 0.1, 100.0)
    r.camera.update(view, proj)
    return r


def test_temporal_static_converges_to_plain():
    """T2-style parity: a static converged temporal frame equals the
    non-temporal frame away from silhouettes (where jitter accumulation
    legitimately antialiases — interior pixels must agree tightly)."""
    rt = _make(True)
    mat = rt.materials.insert(PbrMaterial())
    rt.add_mesh(box(), mat)
    for _ in range(8):
        img = rt.render()
    rp = _make(False)
    rp.add_mesh(box(), rp.materials.insert(PbrMaterial()))
    ref = rp.render()
    err = np.abs(img[..., :3] - ref[..., :3])
    assert np.isfinite(img).all()
    assert err.mean() < 2e-3
    assert np.percentile(err, 95) < 1e-2    # interior is pinned
    assert err.max() < 0.6                  # edges differ only by AA


def test_temporal_camera_motion_stays_correct():
    """Orbiting the camera must keep the temporal frame close to a fresh
    non-temporal render of the SAME view (reprojection + invalid-unit
    reshading, not stale smear)."""
    rt = _make(True)
    mat = rt.materials.insert(UnlitMaterial(
        base_color_factor=np.array([1, 0, 0, 1], np.float32)))
    rt.add_mesh(box(), mat)
    rt.render()
    proj = m3.perspective(np.pi / 3, W / H, 0.1, 100.0)
    for i in range(1, 5):
        ang = 0.03 * i
        eye = [3 * np.sin(ang), 0.5, 3 * np.cos(ang)]
        rt.camera.update(m3.look_at(eye, [0, 0, 0], [0, 1, 0]), proj)
        img = rt.render()
    rp = _make(False)
    rp.add_mesh(box(), rp.materials.insert(UnlitMaterial(
        base_color_factor=np.array([1, 0, 0, 1], np.float32))))
    rp.camera.update(m3.look_at(eye, [0, 0, 0], [0, 1, 0]), proj)
    ref = rp.render()
    err = np.abs(img[..., :3] - ref[..., :3])
    assert np.isfinite(img).all()
    # unlit flat color: interior is exactly the material color, so even
    # reused pixels agree; only silhouette pixels may differ
    assert err.mean() < 5e-3
    assert (err.max(axis=-1) > 0.25).mean() < 0.03


def test_temporal_content_change_resets_history():
    """Mutating scene content invalidates the history: the next frame
    shows the new material everywhere immediately (full-cap reset), not
    a stale mix."""
    rt = _make(True)
    mat = rt.materials.insert(UnlitMaterial(
        base_color_factor=np.array([1, 0, 0, 1], np.float32)))
    rt.add_mesh(box(), mat)
    for _ in range(3):
        rt.render()
    rt.materials.update(mat, UnlitMaterial(
        base_color_factor=np.array([0, 1, 0, 1], np.float32)))
    img = rt.render()
    c = img[H // 2, W // 2]
    np.testing.assert_allclose(c[:3], [0, 1, 0], atol=1e-5)
    # no red residue anywhere
    assert (img[..., 0] > 0.5).sum() == 0 or img[..., 1].max() > 0.9


def test_temporal_pick_still_works():
    rt = _make(True)
    mat = rt.materials.insert(UnlitMaterial())
    key = rt.add_mesh(box(), mat)
    rt.render()
    assert rt.pick(W // 2, H // 2) == key
    assert rt.pick(2, 2) is None
