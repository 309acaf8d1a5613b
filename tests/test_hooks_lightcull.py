"""RenderHooks + light-culling placeholder tests."""

import jax.numpy as jnp
import numpy as np

from awsm_renderer_tpu import (
    AwsmRendererTpu, PostProcessing, RendererConfig, ToneMapping, UnlitMaterial,
)
from awsm_renderer_tpu.geometry import box
from awsm_renderer_tpu.passes.frame import RenderHooks
from awsm_renderer_tpu.passes.light_culling import MAX_LIGHTS_PER_TILE, cull_lights
from awsm_renderer_tpu.utils import math3d as m3

W, H = 128, 32
F = np.float32


def test_hooks_fire_in_order():
    r = AwsmRendererTpu(RendererConfig(
        width=W, height=H, post_processing=PostProcessing(tonemapping=ToneMapping.NONE)))
    view = m3.look_at([0, 0, 3], [0, 0, 0], [0, 1, 0])
    r.camera.update(view, m3.perspective(np.pi / 3, W / H, 0.1, 100.0))
    mat = r.materials.insert(UnlitMaterial(base_color_factor=np.array([1, 0, 0, 1], F)))
    r.add_mesh(box(), mat)

    hooks = RenderHooks(
        # add green to the shaded HDR before display
        before_transparent=lambda hdr, depth, ds: hdr + jnp.array([0, 0.7, 0, 0], jnp.float32),
        # stamp the top-left display pixel white
        last_pass=lambda ldr, ds: ldr.at[0, 0].set(1.0),
    )
    img = r.render(hooks=hooks)
    c = img[H // 2, W // 2]
    assert c[1] > 0.5 and c[0] > 0.5  # red box + green tint
    np.testing.assert_allclose(img[0, 0], 1.0)
    # without hooks: no green
    img2 = r.render()
    assert img2[H // 2, W // 2, 1] < 0.1


class TestStandaloneCull:
    """Standalone `cull_lights` computes REAL per-tile lists from the
    depth plane (r4 shipped a broadcast stub here; the geometric test
    lived only inside shading). Shares `light_lists_from_bounds` with
    the in-shade path, so the sphere-vs-AABB test and the contribution
    priority are the production ones by construction."""

    def _camera(self):
        view = m3.look_at([0, 0, 5], [0, 0, 0], [0, 1, 0])
        proj = m3.perspective(np.pi / 3, W / H, 0.1, 100.0)
        vp = (proj @ view).astype(np.float32)
        return {"inv_view_proj": jnp.asarray(np.linalg.inv(vp))}

    def _depth_for_point(self, cam, p):
        """NDC depth plane putting every pixel on the z = p[2] plane."""
        # project the plane point to get its ndc z
        view = m3.look_at([0, 0, 5], [0, 0, 0], [0, 1, 0])
        proj = m3.perspective(np.pi / 3, W / H, 0.1, 100.0)
        clip = (proj @ view) @ np.array([p[0], p[1], p[2], 1.0], np.float32)
        z = clip[2] / clip[3]
        return jnp.full((H, W), np.float32(z))

    def test_geometric_lists(self):
        from awsm_renderer_tpu.core.lights import Light

        cam = self._camera()
        depth = self._depth_for_point(cam, [0.0, 0.0, 0.0])  # z=0 plane
        rows = np.stack([
            Light.directional([0, -1, 0], intensity=1.0).pack(),
            # near light: reaches the z=0 plane (range 3 > distance 1)
            Light.point([0.0, 0.0, 1.0], intensity=5.0, range=3.0).pack(),
            # far light: range 1 cannot reach any reconstructed pixel
            Light.point([50.0, 50.0, 50.0], intensity=5.0, range=1.0).pack(),
        ]).astype(np.float32)
        lists, counts = cull_lights(
            jnp.asarray(rows), jnp.int32(3), depth, cam, width=W, height=H)
        lists, counts = np.asarray(lists), np.asarray(counts)
        n_tiles = (H // 8) * (W // 128)
        assert lists.shape == (n_tiles, 3)
        # every tile: directional (always) + near light; never the far one
        assert (counts == 2).all(), counts
        for t in range(n_tiles):
            kept = set(lists[t, :counts[t]])
            assert kept == {0, 1}, (t, kept)

    def test_overflow_drops_faintest(self):
        """More overlapping lights than K = MAX_LIGHTS_PER_TILE: the
        kept set is the K largest estimated contributions, not the K
        earliest insertions (r4 advisor finding)."""
        from awsm_renderer_tpu.core.lights import Light

        cam = self._camera()
        depth = self._depth_for_point(cam, [0.0, 0.0, 0.0])
        n = MAX_LIGHTS_PER_TILE + 4
        # same position/range; intensities INCREASE with insertion index,
        # so insertion-order priority would keep exactly the wrong set
        rows = np.stack([
            Light.point([0.0, 0.0, 1.0], intensity=1.0 + i, range=5.0).pack()
            for i in range(n)
        ]).astype(np.float32)
        lists, counts = cull_lights(
            jnp.asarray(rows), jnp.int32(n), depth, cam, width=W, height=H)
        lists, counts = np.asarray(lists), np.asarray(counts)
        K = MAX_LIGHTS_PER_TILE
        assert (counts == K).all()
        expect = set(range(n - K, n))      # brightest K
        for t in range(lists.shape[0]):
            assert set(lists[t, :K]) == expect


class TestExtraPass:
    """Gizmo-style user pass written OUTSIDE the package against the
    public hook surface (reference render.rs:387-546 hook-pass builders +
    editor grid/render.rs): RenderHooks + passes.extra.extra_geometry_pass."""

    def _renderer(self):
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
        return r

    def test_world_pass_depth_tested(self):
        import jax.numpy as jnp
        import numpy as np

        from awsm_renderer_tpu.passes.extra import extra_geometry_pass
        from awsm_renderer_tpu.passes.frame import RenderHooks

        F = np.float32
        # one green triangle LEFT of the box (visible sky there) and one
        # BEHIND the box (must be occluded by the depth test)
        vis_tri = np.array([[[-1.6, -0.5, 0.0], [-0.9, -0.5, 0.0],
                             [-1.25, 0.5, 0.0]]], F)
        hid_tri = np.array([[[-0.3, -0.3, -2.0], [0.3, -0.3, -2.0],
                             [0.0, 0.3, -2.0]]], F)
        tris = jnp.asarray(np.concatenate([vis_tri, hid_tri]))
        cols = jnp.asarray(np.array([[0, 1, 0, 1], [1, 0, 1, 1]], F))

        def before_transparent(hdr, depth, ds):
            out, _ = extra_geometry_pass(
                hdr, depth, ds["camera"], tris, cols, depth_test=True)
            return out

        r = self._renderer()
        base = r.render()
        img = r.render(hooks=RenderHooks(before_transparent=before_transparent))
        # left triangle visible: strong green where the base frame had sky
        ys, xs = np.where((img[..., 1] > 0.8) & (img[..., 0] < 0.2))
        assert len(ys) > 20, "world gizmo triangle did not render"
        assert xs.max() < 64, "triangle should be on the left half"
        # hidden triangle fully occluded: no magenta anywhere
        assert not ((img[..., 0] > 0.8) & (img[..., 2] > 0.8)
                    & (img[..., 1] < 0.2)).any(), "depth test failed"
        # the box itself is untouched
        np.testing.assert_allclose(img[32, 64], base[32, 64], atol=1e-5)

    def test_display_overlay_pass(self):
        import jax.numpy as jnp
        import numpy as np

        from awsm_renderer_tpu.passes.extra import extra_geometry_pass
        from awsm_renderer_tpu.passes.frame import RenderHooks

        F = np.float32
        # overlay ignores depth: a triangle at the box's depth still draws
        tris = jnp.asarray(np.array([[[-0.2, -0.2, 0.0], [0.2, -0.2, 0.0],
                                      [0.0, 0.2, 0.0]]], F))
        cols = jnp.asarray(np.array([[1, 0, 0, 0.5]], F))

        def last_pass(ldr, ds):
            out, _ = extra_geometry_pass(
                ldr, None, ds["camera"], tris, cols, depth_test=False)
            return out

        r = self._renderer()
        img = r.render(hooks=RenderHooks(last_pass=last_pass))
        c = img[32, 64]
        # 50% red blended over the white box face
        assert c[0] > 0.7 and c[1] < 0.8 and c[1] > 0.3, c


def test_host_and_first_pass_hooks():
    """The 3 remaining reference hook points (render.rs:28-46):
    pre_render (host, before flush), first_pass (in-jit, before
    vertex/raster), post_render (host, after dispatch)."""
    import jax.numpy as jnp
    import numpy as np

    from awsm_renderer_tpu import (
        AwsmRendererTpu, PostProcessing, RendererConfig, ToneMapping,
        UnlitMaterial,
    )
    from awsm_renderer_tpu.geometry import box
    from awsm_renderer_tpu.passes.frame import RenderHooks
    from awsm_renderer_tpu.utils import math3d as m3

    F = np.float32
    r = AwsmRendererTpu(RendererConfig(
        width=128, height=32,
        post_processing=PostProcessing(tonemapping=ToneMapping.NONE)))
    mat = r.materials.insert(UnlitMaterial(
        base_color_factor=np.array([0, 0, 1, 1], F)))
    r.add_mesh(box(), mat)
    r.camera.update(m3.look_at([0, 0, 3], [0, 0, 0], [0, 1, 0]),
                    m3.perspective(np.pi / 3, 4.0, 0.1, 100.0))

    calls = {"pre": 0, "post": 0}

    def pre_render(renderer):
        calls["pre"] += 1
        # mutate scene state before the flush: recolor the material red
        renderer.materials.update(mat, UnlitMaterial(
            base_color_factor=np.array([1, 0, 0, 1], F)))

    def first_pass(ds):
        # advanced geometry setup: scale every world matrix to half size
        ds = dict(ds)
        scale = jnp.diag(jnp.array([0.5, 0.5, 0.5, 1.0], jnp.float32))
        w = ds["world"]                      # (cap, 16) row-major mat4s
        m = w.reshape(-1, 4, 4) @ scale
        ds["world"] = m.reshape(-1, 16)
        return ds

    def post_render(renderer):
        calls["post"] += 1

    img = r.render(hooks=RenderHooks(
        pre_render=pre_render, first_pass=first_pass,
        post_render=post_render))
    assert calls == {"pre": 1, "post": 1}
    c = img[16, 64, :3]
    assert c[0] > 0.8 and c[2] < 0.2, c       # pre_render recolored to red
    # first_pass halved the box: covered width shrinks vs the plain frame
    img2 = r.render()
    cov_hook = (img[..., 0] > 0.5).sum()
    cov_plain = (img2[..., 0] > 0.5).sum()
    assert 0 < cov_hook < cov_plain * 0.5, (cov_hook, cov_plain)


class TestTiledLights:
    """Real tiled light lists (r4) — the pass the reference stubbed
    (light_culling/render_pass.rs:30-34). Per-128-px units shade only
    the lights whose bounding sphere reaches their pixel AABB."""

    def _scene(self, n_lights, ranged=True):
        from awsm_renderer_tpu import (
            AwsmRendererTpu, Light, PbrMaterial, RendererConfig, Transform,
        )
        from awsm_renderer_tpu.config import ToneMapping
        from awsm_renderer_tpu import PostProcessing

        W, H = 128, 64
        r = AwsmRendererTpu(RendererConfig(
            width=W, height=H,
            post_processing=PostProcessing(tonemapping=ToneMapping.NONE)))
        mat = r.materials.insert(PbrMaterial(
            base_color_factor=np.array([0.8, 0.7, 0.6, 1.0], np.float32),
            roughness_factor=0.5))
        for gx in (-1.0, 0.0, 1.0):
            r.add_mesh(box(0.8), mat, Transform(
                translation=np.array([gx * 1.2, 0, 0], np.float32)))
        r.lights.insert(Light.directional([-0.3, -1, -0.4], intensity=1.5))
        rng = np.random.default_rng(3)
        for i in range(n_lights - 1):
            a = 2 * np.pi * i / max(n_lights - 1, 1)
            r.lights.insert(Light.point(
                [np.cos(a) * 2.0, 0.6, np.sin(a) * 2.0 + 1.0],
                color=tuple(rng.uniform(0.3, 1.0, 3)),
                intensity=3.0, range=(2.5 if ranged else 0.0)))
        view = m3.look_at([0, 0.6, 3.0], [0, 0, 0], [0, 1, 0])
        r.camera.update(view, m3.perspective(np.pi / 3, W / H, 0.1, 50.0))
        return r

    def test_tiled_equals_dense_when_lists_cover(self):
        """With <= MAX_LIGHTS_PER_TILE lights total, every reaching
        light is listed, so the tiled path must be EXACT vs the dense
        capacity loop (excluded lights contribute 0 via the range
        window, lights.wgsl)."""
        n = min(MAX_LIGHTS_PER_TILE, 12)
        r = self._scene(n)
        assert r.lights.count == n
        img_tiled = r.render()          # count > 8 engages tiling
        # dense-vs-tiled on the SAME flushed scene via render_frame
        r2 = self._scene(n)
        from awsm_renderer_tpu.passes.frame import render_frame
        from awsm_renderer_tpu.config import ToneMapping as TM
        import jax.numpy as jnp

        ds = r2._flush()
        masks = r2._mesh_masks()
        op_rows = r2._bucket_mat_rows(masks["opaque"])
        common = dict(
            width=128, height=64, supersample=False, msaa=False,
            tonemap=TM.NONE, use_mips=True, has_morphs=False, skin_sets=0,
            solid_env=True, slot_mask=r2._slot_mask(op_rows),
            ext=r2._ext_mask(op_rows),
            needs_clip=bool(masks["needs_clip"]))
        ldr_d, _, _ = render_frame(
            ds, jnp.asarray(masks["opaque"]), None, None,
            light_tiles=False, **common)
        ldr_t, _, _ = render_frame(
            ds, jnp.asarray(masks["opaque"]), None, None,
            light_tiles=True, **common)
        np.testing.assert_allclose(np.asarray(ldr_t), np.asarray(ldr_d),
                                   atol=1e-6)
        # and the renderer-level image used the tiled path (count > 8)
        np.testing.assert_allclose(
            img_tiled[..., :3],
            np.asarray(ldr_d)[:img_tiled.shape[0], :img_tiled.shape[1], :3],
            atol=1e-5)

    def test_out_of_reach_lights_drop_from_lists(self):
        """A ranged light far outside every unit's AABB contributes
        nothing AND its exclusion does not perturb in-range shading."""
        from awsm_renderer_tpu import Light

        r = self._scene(12)
        base = r.render()
        # add far lights (beyond range of anything visible)
        for i in range(4):
            r.lights.insert(Light.point(
                [100.0 + i, 50.0, 100.0], intensity=50.0, range=3.0))
        img = r.render()
        np.testing.assert_allclose(img, base, atol=1e-6)
