"""Real-asset parity goldens: binary .glb files through the FULL path.

The reference's integration spine is the Khronos glTF sample catalog
(crates/frontend/src/models/collections.rs:32-123) rendered and eyeballed.
Here the same idea, automated and self-contained: every entry of the
generated sample-model catalog (awsm_renderer_tpu/gltf/samples.py — real
binary GLBs probing one loader/populate feature each) goes
load_gltf → populate_gltf → render at 256×128 and is compared against a
checked-in golden.

Regenerate after INTENTIONAL visual changes:
    AWSM_UPDATE_GOLDENS=1 python -m pytest tests/test_gltf_golden.py
"""

import os

import numpy as np
import pytest

from awsm_renderer_tpu import (
    AwsmRendererTpu, PostProcessing, RendererConfig, ToneMapping,
)
from awsm_renderer_tpu.gltf.loader import load_gltf
from awsm_renderer_tpu.gltf.populate import populate_gltf
from awsm_renderer_tpu.gltf.samples import SAMPLES as FIXTURES
from awsm_renderer_tpu.gltf.samples import glb_mirrored_tangent
from awsm_renderer_tpu.utils import math3d as m3

F = np.float32
GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")
UPDATE = os.environ.get("AWSM_UPDATE_GOLDENS") == "1"
W, H = 256, 128

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


@pytest.mark.parametrize("name", sorted(FIXTURES))
def test_glb_golden(name, tmp_path):
    glb_bytes, (eye, center) = FIXTURES[name]()
    p = tmp_path / f"{name}.glb"
    p.write_bytes(glb_bytes)

    r = AwsmRendererTpu(RendererConfig(
        width=W, height=H,
        post_processing=PostProcessing(tonemapping=ToneMapping.KHRONOS_PBR_NEUTRAL)))
    data = load_gltf(str(p))
    populate_gltf(r, data)
    view = m3.look_at(eye, center, (0, 1, 0))
    proj = m3.perspective(np.pi / 3, W / H, 0.05, 100.0)
    r.update_all(0.35, view, proj)   # advance autoplayed animations off t=0
    img = r.render_u8()

    # the scene must actually cover a meaningful part of the frame —
    # a blank golden must never pass silently
    sky = np.array([0.1, 0.1, 0.12])  # default clear, pre-tonemap
    fg = (np.abs(img[..., :3].astype(np.float32) / 255
                 - sky) > 0.08).any(axis=-1)
    assert fg.mean() > 0.05, f"{name}: scene covers {fg.mean():.1%} of frame"
    _check(name, img)


def test_mirrored_tangent_handedness():
    """The mirrored quad's generated tangents must flip handedness (w
    sign) relative to the unmirrored one — the property mikktspace
    guarantees and Lengyel averaging breaks at the seam."""
    glb_bytes, _ = glb_mirrored_tangent()
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "m.glb")
        with open(p, "wb") as f:
            f.write(glb_bytes)
        data = load_gltf(p)
    from awsm_renderer_tpu.gltf.accessors import read_accessor
    from awsm_renderer_tpu.gltf.tangents import generate_tangents

    g = data.gltf
    attrs = g["meshes"][0]["primitives"][0]["attributes"]
    pos = read_accessor(g, data.buffers, attrs["POSITION"]).astype(F)
    nrm = read_accessor(g, data.buffers, attrs["NORMAL"]).astype(F)
    uv = read_accessor(g, data.buffers, attrs["TEXCOORD_0"]).astype(F)
    idx = read_accessor(g, data.buffers,
                        g["meshes"][0]["primitives"][0]["indices"])
    tang = generate_tangents(pos, nrm, uv, idx.astype(np.uint32))
    left_w = tang[:4, 3]
    right_w = tang[4:, 3]
    assert np.all(left_w == left_w[0])
    assert np.all(right_w == right_w[0])
    assert left_w[0] == -right_w[0], (left_w[0], right_w[0])

