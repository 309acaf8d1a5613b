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


def test_light_culling_stub_interface():
    lights = jnp.zeros((8, 16), jnp.float32)
    depth = jnp.ones((H, W), jnp.float32)
    lists, counts = cull_lights(lights, jnp.int32(3), depth, width=W, height=H)
    n_tiles = (H // 8) * (W // 128)
    assert lists.shape == (n_tiles, min(MAX_LIGHTS_PER_TILE, 8))
    assert int(counts[0]) == 3


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
