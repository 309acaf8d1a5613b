"""Golden-image regression tests.

The reference's de-facto integration suite is visual inspection of the
glTF sample catalog (SURVEY §4); here the same idea is automated: tiny
renders of the procedural probe scenes are compared against checked-in
golden PNGs. Regenerate after INTENTIONAL visual changes with:

    AWSM_UPDATE_GOLDENS=1 python -m pytest tests/test_golden.py

Tolerances allow minor cross-backend float drift while catching real
regressions (wrong colors, missing geometry, broken passes).
"""

import os

import numpy as np
import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")
UPDATE = os.environ.get("AWSM_UPDATE_GOLDENS") == "1"

W, H = 128, 64


def _render_scene(name):
    from awsm_renderer_tpu import AwsmRendererTpu, RendererConfig
    from awsm_renderer_tpu.utils import math3d as m3
    from demo.scenes import SCENES

    r = AwsmRendererTpu(RendererConfig(width=W, height=H))
    info = SCENES[name](r) or {}
    eye, center = info.get("camera", ((2.5, 1.8, 3.5), (0, 0, 0)))
    view = m3.look_at(eye, center, (0, 1, 0))
    proj = m3.perspective(np.pi / 3, W / H, 0.05, 500.0)
    r.update_all(0.35, view, proj)  # advance animations off t=0
    return r.render_u8()


def _check(name, img):
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    path = os.path.join(GOLDEN_DIR, f"{name}.png")
    from PIL import Image

    if UPDATE or not os.path.exists(path):
        Image.fromarray(img).save(path)
        if not UPDATE:
            pytest.skip(f"golden created: {path}")
        return
    golden = np.asarray(Image.open(path)).astype(np.int16)
    got = img.astype(np.int16)
    assert golden.shape == got.shape
    diff = np.abs(golden - got)
    frac_off = (diff > 4).mean()
    assert frac_off < 0.005, (
        f"{name}: {frac_off:.2%} of channel values differ by >4/255 "
        f"(max diff {diff.max()})")


@pytest.mark.parametrize("scene", [
    "triangle", "box", "box-textured", "metal-rough-spheres",
    "morph-cube", "rigged-simple", "alpha-blend", "instanced",
    "env-ibl",
])
def test_golden_scene(scene):
    _check(scene, _render_scene(scene))
