"""Demo CLI integration: a full .glb (textured + animated + hierarchy)
through the public command-line surface (the frontend-analog harness)."""

import base64
import json
import os
import struct
import sys

import numpy as np
import pytest

F = np.float32


def _build_full_glb(path: str) -> None:
    """Textured, animated two-node scene packed as a binary .glb."""
    from PIL import Image
    import io

    pos = np.array([[-0.5, -0.5, 0], [0.5, -0.5, 0], [0.5, 0.5, 0], [-0.5, 0.5, 0]], F)
    nrm = np.array([[0, 0, 1]] * 4, F)
    uv = np.array([[0, 1], [1, 1], [1, 0], [0, 0]], F)
    idx = np.array([0, 1, 2, 0, 2, 3], np.uint16)
    anim_t = np.array([0, 1, 2], F)
    anim_v = np.array([[0, 0, 0], [0, 0.5, 0], [0, 0, 0]], F)

    blob = (pos.tobytes() + nrm.tobytes() + uv.tobytes() + idx.tobytes()
            + anim_t.tobytes() + anim_v.tobytes())
    # checkerboard PNG
    img = np.zeros((8, 8, 3), np.uint8)
    img[::2, ::2] = 255
    img[1::2, 1::2] = 255
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    png = buf.getvalue()
    img_off = len(blob)
    blob += png

    g = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [
            {"children": [1]},
            {"mesh": 0, "translation": [0, 0, 0]},
        ],
        "meshes": [{"primitives": [{
            "attributes": {"POSITION": 0, "NORMAL": 1, "TEXCOORD_0": 2},
            "indices": 3, "material": 0,
        }]}],
        "materials": [{
            "pbrMetallicRoughness": {
                "baseColorTexture": {"index": 0}, "roughnessFactor": 0.8},
        }],
        "textures": [{"source": 0, "sampler": 0}],
        "samplers": [{"magFilter": 9729, "minFilter": 9987,
                      "wrapS": 10497, "wrapT": 10497}],
        "images": [{"bufferView": 6, "mimeType": "image/png"}],
        "animations": [{
            "channels": [{"sampler": 0, "target": {"node": 1, "path": "translation"}}],
            "samplers": [{"input": 4, "output": 5}],
        }],
        "buffers": [{"byteLength": len(blob)}],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": 48},
            {"buffer": 0, "byteOffset": 48, "byteLength": 48},
            {"buffer": 0, "byteOffset": 96, "byteLength": 32},
            {"buffer": 0, "byteOffset": 128, "byteLength": 12},
            {"buffer": 0, "byteOffset": 140, "byteLength": 12},
            {"buffer": 0, "byteOffset": 152, "byteLength": 36},
            {"buffer": 0, "byteOffset": img_off, "byteLength": len(png)},
        ],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 4, "type": "VEC3",
             "min": [-0.5, -0.5, 0], "max": [0.5, 0.5, 0]},
            {"bufferView": 1, "componentType": 5126, "count": 4, "type": "VEC3"},
            {"bufferView": 2, "componentType": 5126, "count": 4, "type": "VEC2"},
            {"bufferView": 3, "componentType": 5123, "count": 6, "type": "SCALAR"},
            {"bufferView": 4, "componentType": 5126, "count": 3, "type": "SCALAR"},
            {"bufferView": 5, "componentType": 5126, "count": 3, "type": "VEC3"},
        ],
    }
    jbytes = json.dumps(g).encode()
    jbytes += b" " * ((-len(jbytes)) % 4)
    bpad = blob + b"\x00" * ((-len(blob)) % 4)
    glb = struct.pack("<4sII", b"glTF", 2, 12 + 8 + len(jbytes) + 8 + len(bpad))
    glb += struct.pack("<II", len(jbytes), 0x4E4F534A) + jbytes
    glb += struct.pack("<II", len(bpad), 0x004E4942) + bpad
    with open(path, "wb") as f:
        f.write(glb)


def test_demo_cli_gltf_end_to_end(tmp_path):
    glb = str(tmp_path / "scene.glb")
    _build_full_glb(glb)
    out_dir = str(tmp_path / "frames")

    from demo.app import main

    rc = main(["--gltf", glb, "--width", "128", "--height", "64",
               "--frames", "2", "--out", out_dir, "--tonemap", "none"])
    assert rc == 0
    from PIL import Image

    f0 = np.asarray(Image.open(os.path.join(out_dir, "frame_0000.png")))
    f1 = np.asarray(Image.open(os.path.join(out_dir, "frame_0001.png")))
    assert f0.shape == (64, 128, 4)
    # the textured quad is visible (checker bright + dark pixels)
    assert f0.max() > 150
    # animation moved the node between frames
    assert not np.array_equal(f0, f1)


def test_demo_cli_scene_catalog(tmp_path):
    from demo.app import main

    out_dir = str(tmp_path / "frames")
    rc = main(["--scene", "alpha-blend", "--width", "128", "--height", "32",
               "--frames", "1", "--out", out_dir])
    assert rc == 0
    assert os.path.exists(os.path.join(out_dir, "frame_0000.png"))


def test_demo_cli_glb_sample_catalog(tmp_path):
    """A generated GLB catalog entry (gltf/samples.py — the reference
    frontend's model-catalog analog) loads through the real loader path
    and renders non-blank with the catalog's tuned camera."""
    from demo.app import main

    out_dir = str(tmp_path / "frames")
    rc = main(["--scene", "glb-strip-fan", "--width", "128", "--height", "64",
               "--frames", "1", "--out", out_dir])
    assert rc == 0
    from PIL import Image

    f0 = np.asarray(Image.open(os.path.join(out_dir, "frame_0000.png")))
    assert f0.shape == (64, 128, 4)
    sky = f0[2, 2, :3].astype(int)
    center = f0[32, 64, :3].astype(int)
    assert np.abs(center - sky).max() > 20   # geometry on screen
