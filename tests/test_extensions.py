"""Material-extension shading effects: iridescence, anisotropy, gating."""

import numpy as np

from awsm_renderer_tpu import (
    AwsmRendererTpu, Light, PbrMaterial,
    PostProcessing, RendererConfig, ToneMapping,
)
from awsm_renderer_tpu.geometry import uv_sphere
from awsm_renderer_tpu.utils import math3d as m3

W, H = 128, 32
F = np.float32


def _scene(mat_kwargs):
    r = AwsmRendererTpu(RendererConfig(
        width=W, height=H, post_processing=PostProcessing(tonemapping=ToneMapping.NONE)))
    r.environment.prefiltered *= 0.3
    r.environment.irradiance *= 0.3
    r.environment.gpu_dirty = True
    mat = r.materials.insert(PbrMaterial(
        base_color_factor=np.array([0.35, 0.35, 0.35, 1], F),
        metallic_factor=1.0, roughness_factor=0.2, **mat_kwargs))
    r.add_mesh(uv_sphere(0.7), mat)
    r.lights.insert(Light.directional([0, -0.3, -1], intensity=0.8))
    r.camera.update(m3.look_at([0, 0, 3], [0, 0, 0], [0, 1, 0]),
                    m3.perspective(np.pi / 3, W / H, 0.1, 100.0))
    return r


def test_iridescence_changes_color():
    base = _scene({})
    irid = _scene({"iridescence_factor": 1.0, "iridescence_ior": 1.8,
                   "iridescence_thickness_max": 800.0})
    a = base.render()[H // 2, W // 2, :3]
    b = irid.render()[H // 2, W // 2, :3]
    assert not np.allclose(a, b, atol=0.01), (a, b)
    # thin-film interference is spectral: channels shift unequally
    d = np.abs(a.astype(float) - b.astype(float))
    assert d.max() - d.min() > 0.005


def _gradient_env(r):
    # anisotropy bends the reflection vector; it only shows against a
    # non-constant environment
    faces = np.zeros((6, 16, 16, 4), F)
    grad = np.linspace(0, 1, 16, dtype=F)[None, :, None]
    faces[..., 0] = grad
    faces[..., 2] = 1.0 - grad
    faces[..., 3] = 1.0
    r.environment.set_ibl_from_cubemap(faces)
    r.environment.gpu_dirty = True


def test_anisotropy_changes_highlight():
    base = _scene({})
    _gradient_env(base)
    aniso = _scene({"anisotropy_strength": 0.9})
    _gradient_env(aniso)
    a = base.render()
    b = aniso.render()
    assert not np.allclose(a, b, atol=0.01)


def test_ext_mask_detection():
    r = _scene({"clearcoat_factor": 0.5, "transmission_factor": 0.0})
    ext = r._ext_mask()
    assert ext[0] is True      # clearcoat
    assert ext[2] is False     # iridescence
    assert ext[4] is False     # transmission
    assert ext[5] is False     # volume (thickness)
    r2 = _scene({})
    assert r2._ext_mask() == (False, False, False, False, False, False)
    r3 = _scene({"transmission_factor": 1.0, "thickness": 0.5})
    ext3 = r3._ext_mask()
    assert ext3[4] is True and ext3[5] is True
