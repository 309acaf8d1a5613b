"""Behavioral probes for the r4 catalog additions (VERDICT r3 item 3).

Each test asserts the FEATURE (analytic transforms, sampler states,
weight vectors), not just a golden image — the golden suite
(test_gltf_golden.py) covers the pixels.

Reference analogs (crates/frontend/src/models/collections.rs):
Fox (Animation set), RecursiveSkeletons, OrientationTest,
TextureSettingsTest, MorphStressTest.
"""

import numpy as np
import pytest

from awsm_renderer_tpu import (
    AwsmRendererTpu, PostProcessing, RendererConfig, ToneMapping,
)
from awsm_renderer_tpu.gltf.loader import load_gltf
from awsm_renderer_tpu.gltf.populate import populate_gltf
from awsm_renderer_tpu.gltf.samples import SAMPLES
from awsm_renderer_tpu.utils import math3d as m3

F = np.float32
W, H = 128, 64


def _load(name, tmp_path, eye=None, center=None):
    glb_bytes, (cam_eye, cam_center) = SAMPLES[name]()
    p = tmp_path / f"{name}.glb"
    p.write_bytes(glb_bytes)
    r = AwsmRendererTpu(RendererConfig(
        width=W, height=H,
        post_processing=PostProcessing(tonemapping=ToneMapping.NONE)))
    data = load_gltf(str(p))
    lookups = populate_gltf(r, data)
    view = m3.look_at(eye or cam_eye, center or cam_center, (0, 1, 0))
    proj = m3.perspective(np.pi / 3, W / H, 0.05, 100.0)
    r.camera.update(view, proj)
    return r, lookups


class TestFox:
    """Three clips on ONE skeleton + runtime switching + crossfade."""

    def _tip_x(self, r, lookups):
        # node 3 = bone2 (tip joint); world translation x measures bend
        tk = lookups.node_transforms[3]
        return float(r.transforms.world[r.transforms.row_of(tk)]
                     .reshape(4, 4)[0, 3])

    def test_three_clips_and_switching(self, tmp_path):
        r, lookups = _load("glb-fox", tmp_path)
        players = [r.animations.get(k) for k in lookups.animation_players]
        assert [p.clip.name for p in players] == ["Survey", "Walk", "Run"]
        # play ONLY one clip at a time; bend magnitude must rank
        # Survey < Walk < Run at the t=1 peak
        tips = {}
        for want in range(3):
            for i, p in enumerate(players):
                p.playing = i == want
                p.time = 0.0
                p.weight = 1.0
            r.update_all(1.0)            # advance to the peak keyframe
            tips[players[want].clip.name] = abs(self._tip_x(r, lookups))
        assert tips["Survey"] < tips["Walk"] < tips["Run"]
        img = r.render()
        assert np.isfinite(img).all()

    def test_crossfade_blends_between_clips(self, tmp_path):
        r, lookups = _load("glb-fox", tmp_path)
        keys = lookups.animation_players
        players = [r.animations.get(k) for k in keys]
        for i, p in enumerate(players):
            p.playing = i == 0          # start on Survey
        # advance both notions of time to the bend peak, then fade
        r.update_all(1.0)
        x_survey = self._tip_x(r, lookups)
        # full fade Survey -> Run, but FREEZE clip time at the peak so
        # the compared poses differ only by clip identity
        for p in players:
            p.speed = 0.0
        r.animations.crossfade(keys[0], keys[2], duration=1.0)
        run = players[2]
        run.time = 1.0
        r.update_all(0.5)               # halfway through the fade
        x_half = self._tip_x(r, lookups)
        r.update_all(0.6)               # fade complete
        x_run = self._tip_x(r, lookups)
        assert not players[0].playing    # source stopped at fade end
        lo, hi = sorted([abs(x_survey), abs(x_run)])
        assert lo < abs(x_half) < hi     # midpoint strictly between
        assert abs(x_run) > abs(x_survey) * 2

    def test_crossfade_back_to_earlier_clip(self, tmp_path):
        """Regression (r4 review): fading INTO an earlier-inserted clip
        must end on the DESTINATION pose — the stopped source used to
        stay in the active set at weight 1 and win the full-weight
        last-writer tie-break, snapping back to its frozen pose."""
        r, lookups = _load("glb-fox", tmp_path)
        keys = lookups.animation_players
        players = [r.animations.get(k) for k in keys]
        for i, p in enumerate(players):
            p.playing = i == 2           # start on Run (inserted LAST)
        r.update_all(1.0)                # Run at its bend peak
        for p in players:
            p.speed = 0.0                # freeze clip time
        x_run = self._tip_x(r, lookups)
        r.animations.crossfade(keys[2], keys[0], duration=0.5)  # -> Survey
        players[0].time = 1.0            # Survey at its (smaller) peak
        r.update_all(0.6)                # fade complete
        r.update_all(0.1)                # one more frame: must HOLD Survey
        x_end = self._tip_x(r, lookups)
        assert not players[2].playing
        assert abs(x_end) < abs(x_run) * 0.5, (
            f"ended on the faded-out Run pose: {x_end} vs run {x_run}")


class TestRecursiveSkeletons:
    def test_deep_chain_propagates_to_tip(self, tmp_path):
        r, lookups = _load("glb-recursive-skeletons", tmp_path)
        depth = 12
        # joints are nodes 1..12; tip node 12 sits at y=11 in bind pose
        tip_tk = lookups.node_transforms[depth]
        row = r.transforms.row_of(tip_tk)
        w = r.transforms.world[row].reshape(4, 4)
        np.testing.assert_allclose(w[:3, 3], [0, depth - 1, 0], atol=1e-5)
        # rotate the ROOT joint 90° about z: the tip must sweep to
        # x = -(depth-1) — an 11-link lever through the whole chain
        root_tk = lookups.node_transforms[1]
        r.transforms.set_rotation(root_tk, np.array(
            [0, 0, np.sin(np.pi / 4), np.cos(np.pi / 4)], F))
        r.transforms.update_world()
        w = r.transforms.world[r.transforms.row_of(tip_tk)].reshape(4, 4)
        np.testing.assert_allclose(w[:3, 3], [-(depth - 1), 0, 0],
                                   atol=1e-4)
        # and the skinned strip renders with the bent pose
        r.skins.update_transforms(r.transforms,
                                  set(lookups.node_transforms.values()))
        r.meshes.update_world(r.transforms)
        img = r.render()
        assert np.isfinite(img).all()


class TestOrientation:
    def test_composed_trs_through_hierarchy(self, tmp_path):
        r, lookups = _load("glb-orientation", tmp_path)
        # child world origin = T(1,0,0) + Ry(90)·S(2)·(0,1,0) = (1,2,0)
        tk = lookups.node_transforms[1]
        w = r.transforms.world[r.transforms.row_of(tk)].reshape(4, 4)
        np.testing.assert_allclose(w[:3, 3], [1, 2, 0], atol=1e-5)
        # net linear part = Ry(90)·S(2) · Rz(45)·S(0.5): column norms = 1
        lin = w[:3, :3]
        np.testing.assert_allclose(np.linalg.norm(lin, axis=0),
                                   [1, 1, 1], atol=1e-5)
        # Ry(90) maps +x -> -z; composed with Rz(45): world x-axis of the
        # child box = Ry90 @ Rz45 @ (1,0,0) = (cos45·(0,0,-1) + sin45·(0,1,0))
        np.testing.assert_allclose(
            lin @ np.array([1, 0, 0], F),
            [0, np.sin(np.pi / 4), -np.cos(np.pi / 4)], atol=1e-5)
        # reference box at origin stays identity
        tk2 = lookups.node_transforms[2]
        w2 = r.transforms.world[r.transforms.row_of(tk2)].reshape(4, 4)
        np.testing.assert_allclose(w2, np.eye(4), atol=1e-6)


class TestTextureSettings:
    def test_sampler_grid_loads_and_differs(self, tmp_path):
        r, lookups = _load("glb-texture-settings", tmp_path)
        from awsm_renderer_tpu.core.textures import (
            WRAP_CLAMP, WRAP_MIRROR, WRAP_REPEAT,
        )

        # six descriptors with the expected wrap × filter grid
        desc = r.textures.descriptors
        assert desc.shape[0] >= 6
        wraps = desc[:6, 3]          # wrap_s column
        filt = desc[:6, 5]           # filter_linear column
        assert list(wraps) == [WRAP_REPEAT, WRAP_CLAMP, WRAP_MIRROR] * 2
        assert list(filt[:3]) == [1, 1, 1] and list(filt[3:6]) == [0, 0, 0]
        img = r.render()
        assert np.isfinite(img).all()
        # out-of-range UV behavior must differ between wrap modes: the
        # repeat quad keeps tiling (high contrast across its face) while
        # the clamp quad smears edge texels. Compare quad interiors.
        def quad_region(col, row, w=28, h=20):
            x0 = int((col + 0.12) / 3 * W)
            y0 = int((row + 0.15) / 2 * H)
            return img[y0 : y0 + h, x0 : x0 + w, :3]

        repeat_lin = quad_region(0, 0)
        clamp_lin = quad_region(1, 0)
        mirror_lin = quad_region(2, 0)
        assert np.abs(repeat_lin - clamp_lin).mean() > 0.02
        assert np.abs(mirror_lin - clamp_lin).mean() > 0.02

    def test_wrap_column_indices_match_store(self, tmp_path):
        """Guard the descriptor-column assumptions of the test above."""
        from awsm_renderer_tpu.core.textures import Sampler, Textures

        tx = Textures()
        img = np.zeros((8, 8, 4), np.uint8)
        tx.add_image(img, sampler=Sampler(wrap_s=2, wrap_t=1,
                                          filter_linear=False))
        d = tx.descriptors[0]
        assert d[3] == 2 and d[4] == 1 and d[5] == 0


class TestMorphStress:
    def test_eight_targets_animate_together(self, tmp_path):
        r, lookups = _load("glb-morph-stress", tmp_path)
        mk = lookups.node_meshes[0][0]
        row = r.meshes.row_of(mk)
        assert r.meshes.mesh_info[row, 3] >= 8          # target count
        np.testing.assert_allclose(r.meshes.morph_weights[row][:8], 0.0)
        img0 = r.render()
        r.update_all(1.0)                               # peak keyframe
        expect = np.linspace(0.1, 1.0, 8).astype(F)
        np.testing.assert_allclose(r.meshes.morph_weights[row][:8],
                                   expect, atol=1e-5)
        img1 = r.render()
        assert np.isfinite(img1).all()
        assert np.abs(img1 - img0).max() > 0.05         # visibly morphs


class TestNonIndexed:
    def test_non_indexed_primitive_loads_with_vertex_colors(self, tmp_path):
        r, lookups = _load("glb-non-indexed", tmp_path)
        mk = lookups.node_meshes[0][0]
        assert r.meshes.get(mk).t_count == 2      # V/3 implicit triangles
        img = r.render()
        assert np.isfinite(img).all()
        H2, W2 = img.shape[0] // 2, img.shape[1] // 2
        # vertex colors tint the quad horizontally: left edge blends
        # red+yellow (r dominant), right edge green+blue (r weakest)
        left = img[H2, int(W2 * 0.75), :3]
        right = img[H2, int(W2 * 1.25), :3]
        assert left[0] > left[2] + 0.05, f"left should lean red: {left}"
        assert right[0] + 0.05 < max(right[1], right[2]), (
            f"right should lean green/blue: {right}")


class TestNpotTexture:
    """BoxTexturedNonPowerOfTwo-class (r5): NPOT maps take the cv2/numpy
    mip fallback (non-integer area ratios disqualify the native
    integer-ratio packer) and still sample correctly."""

    def test_npot_descriptor_and_mips(self, tmp_path):
        from awsm_renderer_tpu.core.textures import (
            TD_HEIGHT, TD_N_MIPS, TD_WIDTH, calculate_mip_levels,
        )

        r, _ = _load("glb-npot-texture", tmp_path)
        live = r.textures.descriptors[
            r.textures.descriptors[:, TD_WIDTH] > 0]
        assert live.shape[0] == 1
        d = live[0]
        assert (d[TD_WIDTH], d[TD_HEIGHT]) == (100, 75)
        assert d[TD_N_MIPS] == calculate_mip_levels(100, 75)

    def test_npot_renders_checker(self, tmp_path):
        r, _ = _load("glb-npot-texture", tmp_path)
        img = r.render()
        # both checker colors visible (red- and blue-dominant regions)
        rgb = img[..., :3]
        assert ((rgb[..., 0] > rgb[..., 2] + 0.2).sum() > 50)
        assert ((rgb[..., 2] > rgb[..., 0] + 0.2).sum() > 50)


class TestTwoSkins:
    """BrainStem-class (r5): two independent skeletons, each skinning its
    own mesh, driven by opposite-direction channels of ONE animation —
    multi-skin joint-row offsets + per-skin routing."""

    def test_skins_bend_opposite_ways(self, tmp_path):
        r, lookups = _load("glb-two-skins", tmp_path)
        r.update_all(0.99)          # near the full ±45° bend
        # the bend channels rotate the TIP joints, so the proof lives in
        # the JOINT MATRICES: skin A's tip joint carries +45° about z,
        # skin B's tip -45° — opposite sin terms at each skin's OWN
        # joint rows (the buddy pool block-rounds bases: 0 and 16 here,
        # not dense — resolve through joint_rows())
        jm = np.asarray(r.skins.joint_matrices).reshape(-1, 4, 4)
        rows_a = r.skins.joint_rows(1)
        rows_b = r.skins.joint_rows(2)
        assert rows_a[0] != rows_b[0]
        sin_a = float(jm[rows_a[1]][1, 0])
        sin_b = float(jm[rows_b[1]][1, 0])
        assert sin_a > 0.5 and sin_b < -0.5, (sin_a, sin_b)
        img = r.render()
        assert np.isfinite(img).all()
        # both strips visible (left and right halves covered)
        cov = (np.abs(img[..., :3] - img[2, 2, :3]).max(axis=-1) > 0.05)
        assert cov[:, : W // 2].any() and cov[:, W // 2:].any()

    def test_two_skins_store_rows_distinct(self, tmp_path):
        r, _ = _load("glb-two-skins", tmp_path)
        # two skins -> two joint-row ranges in the joint matrix store
        assert r.skins.joint_matrices.shape[0] >= 4
