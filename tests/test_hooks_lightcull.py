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
