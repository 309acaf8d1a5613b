"""glTF pipeline tests: parsing, accessors, triangulation, populate, render."""

import base64
import json
import struct

import numpy as np
import pytest

from awsm_renderer_tpu import AwsmRendererTpu, PostProcessing, RendererConfig, ToneMapping
from awsm_renderer_tpu.gltf.accessors import read_accessor, triangulate
from awsm_renderer_tpu.gltf.loader import load_gltf
from awsm_renderer_tpu.gltf.populate import populate_gltf
from awsm_renderer_tpu.gltf.tangents import flat_normals, generate_tangents
from awsm_renderer_tpu.utils import math3d as m3

F = np.float32


def _buf_uri(data: bytes) -> str:
    return "data:application/octet-stream;base64," + base64.b64encode(data).decode()


def _tri_gltf_dict(material=None, extra=None):
    """Single triangle with positions/normals/uv + u16 indices."""
    pos = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], F)
    nrm = np.array([[0, 0, 1]] * 3, F)
    uv = np.array([[0, 1], [1, 1], [0, 0]], F)
    idx = np.array([0, 1, 2], np.uint16)
    blob = pos.tobytes() + nrm.tobytes() + uv.tobytes() + idx.tobytes()
    g = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [{"mesh": 0, "translation": [0, 0, 0]}],
        "meshes": [{"primitives": [{
            "attributes": {"POSITION": 0, "NORMAL": 1, "TEXCOORD_0": 2},
            "indices": 3,
        }]}],
        "buffers": [{"uri": _buf_uri(blob), "byteLength": len(blob)}],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": 36},
            {"buffer": 0, "byteOffset": 36, "byteLength": 36},
            {"buffer": 0, "byteOffset": 72, "byteLength": 24},
            {"buffer": 0, "byteOffset": 96, "byteLength": 6},
        ],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 3, "type": "VEC3",
             "min": [0, 0, 0], "max": [1, 1, 0]},
            {"bufferView": 1, "componentType": 5126, "count": 3, "type": "VEC3"},
            {"bufferView": 2, "componentType": 5126, "count": 3, "type": "VEC2"},
            {"bufferView": 3, "componentType": 5123, "count": 3, "type": "SCALAR"},
        ],
    }
    if material is not None:
        g["materials"] = [material]
        g["meshes"][0]["primitives"][0]["material"] = 0
    if extra:
        g.update(extra)
    return g


def _write(tmp_path, g, name="test.gltf"):
    p = tmp_path / name
    p.write_text(json.dumps(g))
    return str(p)


def _renderer(w=128, h=32):
    r = AwsmRendererTpu(RendererConfig(
        width=w, height=h, post_processing=PostProcessing(tonemapping=ToneMapping.NONE)))
    view = m3.look_at([0.3, 0.3, 2.0], [0.3, 0.3, 0], [0, 1, 0])
    proj = m3.perspective(np.pi / 3, w / h, 0.1, 100.0)
    r.camera.update(view, proj)
    return r


class TestAccessors:
    def test_float_vec3(self, tmp_path):
        g = _tri_gltf_dict()
        data = load_gltf(_write(tmp_path, g))
        pos = read_accessor(data.gltf, data.buffers, 0)
        np.testing.assert_allclose(pos, [[0, 0, 0], [1, 0, 0], [0, 1, 0]])

    def test_u16_indices(self, tmp_path):
        data = load_gltf(_write(tmp_path, _tri_gltf_dict()))
        idx = read_accessor(data.gltf, data.buffers, 3)
        assert idx.dtype == np.uint16
        np.testing.assert_array_equal(idx.reshape(-1), [0, 1, 2])

    def test_normalized_u8(self, tmp_path):
        blob = np.array([0, 127, 255], np.uint8).tobytes() + b"\x00"
        g = {
            "asset": {"version": "2.0"},
            "buffers": [{"uri": _buf_uri(blob), "byteLength": len(blob)}],
            "bufferViews": [{"buffer": 0, "byteOffset": 0, "byteLength": 3}],
            "accessors": [{"bufferView": 0, "componentType": 5121, "count": 3,
                           "type": "SCALAR", "normalized": True}],
        }
        out = read_accessor(g, [blob], 0)
        np.testing.assert_allclose(out.reshape(-1), [0, 127 / 255, 1.0])

    def test_sparse_accessor(self):
        # base zeros, sparse overrides index 1 (SimpleSparseAccessor pattern)
        values = np.array([[5, 6, 7]], F).tobytes()
        idx = np.array([1], np.uint16).tobytes()
        blob = idx + values
        g = {
            "asset": {"version": "2.0"},
            "buffers": [{"byteLength": len(blob)}],
            "bufferViews": [
                {"buffer": 0, "byteOffset": 0, "byteLength": 2},
                {"buffer": 0, "byteOffset": 2, "byteLength": 12},
            ],
            "accessors": [{
                "componentType": 5126, "count": 3, "type": "VEC3",
                "sparse": {
                    "count": 1,
                    "indices": {"bufferView": 0, "componentType": 5123},
                    "values": {"bufferView": 1},
                },
            }],
        }
        out = read_accessor(g, [blob], 0)
        np.testing.assert_allclose(out, [[0, 0, 0], [5, 6, 7], [0, 0, 0]])

    def test_interleaved_stride(self):
        # pos+uv interleaved, stride 20
        inter = np.zeros((3, 5), F)
        inter[:, :3] = [[0, 0, 0], [1, 0, 0], [0, 1, 0]]
        inter[:, 3:] = [[0, 0], [1, 0], [0, 1]]
        blob = inter.tobytes()
        g = {
            "asset": {"version": "2.0"},
            "buffers": [{"byteLength": len(blob)}],
            "bufferViews": [{"buffer": 0, "byteLength": len(blob), "byteStride": 20}],
            "accessors": [
                {"bufferView": 0, "componentType": 5126, "count": 3, "type": "VEC3"},
                {"bufferView": 0, "byteOffset": 12, "componentType": 5126, "count": 3,
                 "type": "VEC2"},
            ],
        }
        np.testing.assert_allclose(read_accessor(g, [blob], 0),
                                   [[0, 0, 0], [1, 0, 0], [0, 1, 0]])
        np.testing.assert_allclose(read_accessor(g, [blob], 1), [[0, 0], [1, 0], [0, 1]])


class TestTriangulate:
    def test_strip(self):
        tris = triangulate(np.array([0, 1, 2, 3]), 5, 4)
        np.testing.assert_array_equal(tris, [[0, 1, 2], [1, 3, 2]])

    def test_fan(self):
        tris = triangulate(np.array([0, 1, 2, 3]), 6, 4)
        np.testing.assert_array_equal(tris, [[0, 1, 2], [0, 2, 3]])

    def test_implicit_range(self):
        tris = triangulate(None, 4, 6)
        np.testing.assert_array_equal(tris, [[0, 1, 2], [3, 4, 5]])


class TestTangents:
    def test_flat_normals(self):
        pos = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], F)
        idx = np.array([[0, 1, 2]], np.int32)
        p2, i2, n2 = flat_normals(pos, idx)
        np.testing.assert_allclose(n2, [[0, 0, 1]] * 3)

    def test_generate_tangents_planar(self):
        pos = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]], F)
        nrm = np.array([[0, 0, 1]] * 4, F)
        uv = np.array([[0, 0], [1, 0], [0, 1], [1, 1]], F)
        idx = np.array([[0, 1, 2], [2, 1, 3]], np.int32)
        tan = generate_tangents(pos, nrm, uv, idx)
        # u increases along +x -> tangent +x
        np.testing.assert_allclose(tan[:, :3], [[1, 0, 0]] * 4, atol=1e-5)
        np.testing.assert_allclose(np.abs(tan[:, 3]), 1.0)


class TestLoaderPopulate:
    def test_gltf_render_end_to_end(self, tmp_path):
        mat = {"pbrMetallicRoughness": {"baseColorFactor": [1, 0, 0, 1]},
               "extensions": {"KHR_materials_unlit": {}}}
        data = load_gltf(_write(tmp_path, _tri_gltf_dict(material=mat)))
        r = _renderer()
        lookups = populate_gltf(r, data)
        assert len(lookups.node_transforms) == 1
        img = r.render()
        c = img[16, 64]
        np.testing.assert_allclose(c[:3], [1, 0, 0], atol=1e-5)

    def test_glb_roundtrip(self, tmp_path):
        g = _tri_gltf_dict()
        # move buffer into GLB BIN chunk
        uri = g["buffers"][0].pop("uri")
        blob = base64.b64decode(uri.split(",", 1)[1])
        jbytes = json.dumps(g).encode()
        jbytes += b" " * ((-len(jbytes)) % 4)
        bpad = blob + b"\x00" * ((-len(blob)) % 4)
        glb = struct.pack("<4sII", b"glTF", 2, 12 + 8 + len(jbytes) + 8 + len(bpad))
        glb += struct.pack("<II", len(jbytes), 0x4E4F534A) + jbytes
        glb += struct.pack("<II", len(bpad), 0x004E4942) + bpad
        p = tmp_path / "test.glb"
        p.write_bytes(glb)
        data = load_gltf(str(p))
        pos = read_accessor(data.gltf, data.buffers, 0)
        np.testing.assert_allclose(pos, [[0, 0, 0], [1, 0, 0], [0, 1, 0]])

    def test_material_extensions_mapped(self, tmp_path):
        mat = {
            "pbrMetallicRoughness": {"baseColorFactor": [1, 1, 1, 1],
                                     "metallicFactor": 0.5},
            "extensions": {
                "KHR_materials_clearcoat": {"clearcoatFactor": 0.7},
                "KHR_materials_sheen": {"sheenColorFactor": [0.2, 0.3, 0.4]},
                "KHR_materials_transmission": {"transmissionFactor": 0.9},
                "KHR_materials_ior": {"ior": 1.33},
                "KHR_materials_emissive_strength": {"emissiveStrength": 4.0},
            },
        }
        data = load_gltf(_write(tmp_path, _tri_gltf_dict(material=mat)))
        r = _renderer()
        lookups = populate_gltf(r, data)
        m = r.materials.get(lookups.material_keys[0])
        assert m.clearcoat_factor == 0.7
        assert m.transmission_factor == 0.9
        assert m.ior == 1.33
        assert m.emissive_strength == 4.0
        np.testing.assert_allclose(m.sheen_color, [0.2, 0.3, 0.4])
        # transmission routes through the transparent pass
        assert r.materials.is_transparency_pass(lookups.material_keys[0])

    def test_animation_populate_and_update(self, tmp_path):
        times = np.array([0, 1], F)
        vals = np.array([[0, 0, 0], [2, 0, 0]], F)
        blob2 = times.tobytes() + vals.tobytes()
        extra = {
            "animations": [{
                "channels": [{"sampler": 0, "target": {"node": 0, "path": "translation"}}],
                "samplers": [{"input": 4, "output": 5, "interpolation": "LINEAR"}],
            }],
        }
        g = _tri_gltf_dict(extra=extra)
        g["buffers"].append({"uri": _buf_uri(blob2), "byteLength": len(blob2)})
        g["bufferViews"] += [
            {"buffer": 1, "byteOffset": 0, "byteLength": 8},
            {"buffer": 1, "byteOffset": 8, "byteLength": 24},
        ]
        g["accessors"] += [
            {"bufferView": 4, "componentType": 5126, "count": 2, "type": "SCALAR"},
            {"bufferView": 5, "componentType": 5126, "count": 2, "type": "VEC3"},
        ]
        data = load_gltf(_write(tmp_path, g))
        r = _renderer()
        lookups = populate_gltf(r, data)
        assert len(lookups.animation_players) == 1
        r.update_all(0.5)
        tk = lookups.node_transforms[0]
        np.testing.assert_allclose(r.transforms.world_of(tk)[:3, 3], [1, 0, 0])

    def test_skinned_primitive(self, tmp_path):
        # triangle skinned to 2 joints (weights all on joint 1 which moves +y)
        joints = np.array([[0, 1, 0, 0]] * 3, np.uint8)
        weights = np.array([[0, 1, 0, 0]] * 3, F)
        ibm = np.stack([np.eye(4, dtype=F)] * 2)  # column-major == identity
        blob2 = joints.tobytes() + weights.tobytes() + ibm.transpose(0, 2, 1).tobytes()
        g = _tri_gltf_dict(extra={
            "skins": [{"joints": [1, 2], "inverseBindMatrices": 6}],
        })
        g["nodes"] = [
            {"mesh": 0, "skin": 0},
            {"translation": [0, 0, 0]},
            {"translation": [0, 1, 0]},
        ]
        g["scenes"] = [{"nodes": [0, 1, 2]}]
        g["buffers"].append({"uri": _buf_uri(blob2), "byteLength": len(blob2)})
        g["bufferViews"] += [
            {"buffer": 1, "byteOffset": 0, "byteLength": 12},
            {"buffer": 1, "byteOffset": 12, "byteLength": 48},
            {"buffer": 1, "byteOffset": 60, "byteLength": 128},
        ]
        g["accessors"] += [
            {"bufferView": 4, "componentType": 5121, "count": 3, "type": "VEC4"},
            {"bufferView": 5, "componentType": 5126, "count": 3, "type": "VEC4"},
            {"bufferView": 6, "componentType": 5126, "count": 2, "type": "MAT4"},
        ]
        g["meshes"][0]["primitives"][0]["attributes"]["JOINTS_0"] = 4
        g["meshes"][0]["primitives"][0]["attributes"]["WEIGHTS_0"] = 5
        data = load_gltf(_write(tmp_path, g))
        r = _renderer()
        lookups = populate_gltf(r, data)
        mk = lookups.node_meshes[0][0]
        row = r.meshes.row_of(mk)
        from awsm_renderer_tpu.core.meshes import MI_SKIN_SETS
        assert r.meshes.mesh_info[row, MI_SKIN_SETS] == 1
        # joint matrix of joint 2 (index 1 in skin) carries +y translation
        skin_key = r.meshes.get(mk).skin_key
        rows = r.skins.joint_rows(skin_key)
        np.testing.assert_allclose(r.skins.joint_matrices[rows[1]][:3, 3], [0, 1, 0])

    def test_morph_targets_populate(self, tmp_path):
        deltas = np.array([[0, 0, 1]] * 3, F)
        blob2 = deltas.tobytes()
        g = _tri_gltf_dict()
        g["meshes"][0]["primitives"][0]["targets"] = [{"POSITION": 4}]
        g["meshes"][0]["weights"] = [0.5]
        g["buffers"].append({"uri": _buf_uri(blob2), "byteLength": len(blob2)})
        g["bufferViews"].append({"buffer": 1, "byteOffset": 0, "byteLength": 36})
        g["accessors"].append(
            {"bufferView": 4, "componentType": 5126, "count": 3, "type": "VEC3"})
        data = load_gltf(_write(tmp_path, g))
        r = _renderer()
        lookups = populate_gltf(r, data)
        mk = lookups.node_meshes[0][0]
        np.testing.assert_allclose(r.meshes.morph_weights[r.meshes.row_of(mk), 0], 0.5)


def test_khr_texture_transform_import(tmp_path):
    import io
    from PIL import Image

    img = np.zeros((4, 4, 3), np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    png_b64 = base64.b64encode(buf.getvalue()).decode()
    mat = {
        "pbrMetallicRoughness": {"baseColorTexture": {
            "index": 0,
            "extensions": {"KHR_texture_transform": {
                "offset": [0.25, 0.5], "scale": [2.0, 2.0]}},
        }},
    }
    g = _tri_gltf_dict(material=mat, extra={
        "textures": [{"source": 0}],
        "images": [{"uri": "data:image/png;base64," + png_b64}],
    })
    data = load_gltf(_write(tmp_path, g))
    r = _renderer()
    lookups = populate_gltf(r, data)
    m = r.materials.get(lookups.material_keys[0])
    from awsm_renderer_tpu.core.materials import TS_BASE_COLOR

    ref = m.textures[TS_BASE_COLOR]
    assert ref.transform_id >= 0
    row = ref.transform_id
    np.testing.assert_allclose(r.textures.tex_transforms[row, :6],
                               [2, 0, 0, 2, 0.25, 0.5])


def test_populate_dedups_primitive_resources(tmp_path):
    """N nodes referencing one glTF mesh share ONE converted MeshResource
    (reference MeshResource refcounting, meshes.rs:303) — the sponza-lite
    scene has ~60 nodes over 4 primitives."""
    from awsm_renderer_tpu import AwsmRendererTpu, RendererConfig
    from awsm_renderer_tpu.gltf.loader import load_gltf
    from awsm_renderer_tpu.gltf.populate import populate_gltf
    from awsm_renderer_tpu.gltf.samples import SAMPLES

    glb, _cam = SAMPLES["glb-sponza-lite"]()
    p = tmp_path / "s.glb"
    p.write_bytes(glb)
    r = AwsmRendererTpu(RendererConfig(width=64, height=32))
    lk = populate_gltf(r, load_gltf(str(p)))
    n_meshes = sum(len(v) for v in lk.node_meshes.values())
    assert n_meshes >= 55, n_meshes
    assert len(r.meshes._resources) == 4, len(r.meshes._resources)
    assert r.lights.count == 4          # KHR_lights_punctual: 1 dir + 3 point


def test_gltf_camera_exposed(tmp_path):
    """glTF camera nodes surface through GltfKeyLookups.cameras
    (reference: frontend consumes authored cameras)."""
    from awsm_renderer_tpu import AwsmRendererTpu, RendererConfig
    from awsm_renderer_tpu.gltf.loader import load_gltf
    from awsm_renderer_tpu.gltf.populate import populate_gltf
    from awsm_renderer_tpu.gltf.samples import SAMPLES

    glb, _ = SAMPLES["glb-cameras"]()
    p = tmp_path / "c.glb"
    p.write_bytes(glb)
    r = AwsmRendererTpu(RendererConfig(width=64, height=32))
    lk = populate_gltf(r, load_gltf(str(p)))
    assert len(lk.cameras) == 1
    cam = next(iter(lk.cameras.values()))
    assert cam["type"] == "perspective"
    assert abs(cam["params"]["yfov"] - 0.9) < 1e-6
    assert cam["world"].shape == (4, 4)
    # the camera node's transform is in the scene graph for placement
    node_idx = next(iter(lk.cameras))
    assert node_idx in lk.node_transforms


def test_unlit_extension_ignores_lighting(tmp_path):
    """KHR_materials_unlit: the unlit quad shows the exact texture while
    the lit PBR twin is visibly shaded by the oblique directional light."""
    import numpy as np

    from awsm_renderer_tpu import AwsmRendererTpu, RendererConfig
    from awsm_renderer_tpu.gltf.loader import load_gltf
    from awsm_renderer_tpu.gltf.populate import populate_gltf
    from awsm_renderer_tpu.gltf.samples import SAMPLES
    from awsm_renderer_tpu.utils import math3d as m3

    glb, (eye, center) = SAMPLES["glb-unlit"]()
    p = tmp_path / "u.glb"
    p.write_bytes(glb)
    r = AwsmRendererTpu(RendererConfig(width=256, height=128))
    populate_gltf(r, load_gltf(str(p)))
    r.update_all(0.0, m3.look_at(eye, center, (0, 1, 0)),
                 m3.perspective(np.pi / 3, 2.0, 0.1, 100.0))
    img = r.render()
    unlit = img[40:90, 40:110].mean(axis=(0, 1))
    lit = img[40:90, 150:220].mean(axis=(0, 1))
    assert unlit[0] - lit[0] > 0.03, (unlit, lit)   # lit one is darkened


def test_box_animated_moves_over_time(tmp_path):
    """All three glTF interpolation modes drive one node (BoxAnimated-
    class): the render changes between t=0 and t=0.6 (STEP scale jump +
    LINEAR rotation + CUBICSPLINE translation)."""
    import numpy as np

    from awsm_renderer_tpu import AwsmRendererTpu, RendererConfig
    from awsm_renderer_tpu.gltf.loader import load_gltf
    from awsm_renderer_tpu.gltf.populate import populate_gltf
    from awsm_renderer_tpu.gltf.samples import SAMPLES
    from awsm_renderer_tpu.utils import math3d as m3

    glb, (eye, center) = SAMPLES["glb-box-animated"]()
    p = tmp_path / "a.glb"
    p.write_bytes(glb)
    r = AwsmRendererTpu(RendererConfig(width=128, height=64))
    populate_gltf(r, load_gltf(str(p)))
    view = m3.look_at(eye, center, (0, 1, 0))
    proj = m3.perspective(np.pi / 3, 2.0, 0.1, 100.0)
    r.update_all(0.0, view, proj)
    img0 = r.render()
    r.update_all(0.6, view, proj)     # crosses the STEP key at t=0.5
    img1 = r.render()
    changed = (np.abs(img1 - img0) > 0.05).mean()
    assert changed > 0.01, changed


def test_helmet_loader_time_budget(tmp_path):
    """Real-scale asset probe (r4): glb-helmet is 51,200 triangles with
    five 1024x1024 maps — DamagedHelmet-plus scale. The FULL load path
    (GLB parse -> PNG decode x5 -> ensure_tangents at 51k tris ->
    triangle explosion -> pool insert + texture mip chains) must stay
    interactive-class. Budget is generous (shared CI boxes); the
    measured number prints for the record."""
    import time

    from awsm_renderer_tpu import AwsmRendererTpu, RendererConfig
    from awsm_renderer_tpu.gltf.loader import load_gltf
    from awsm_renderer_tpu.gltf.populate import populate_gltf
    from awsm_renderer_tpu.gltf.samples import SAMPLES

    glb_bytes, _cam = SAMPLES["glb-helmet"]()
    p = tmp_path / "helmet.glb"
    p.write_bytes(glb_bytes)
    r = AwsmRendererTpu(RendererConfig(width=64, height=32))
    t0 = time.perf_counter()
    data = load_gltf(str(p))
    lookups = populate_gltf(r, data)
    dt = time.perf_counter() - t0
    tris = int(np.sum(r.meshes.tri_mesh >= 0))
    assert tris >= 50_000, tris
    print(f"helmet load+populate: {dt:.2f}s for {tris} tris")
    # r5: native mip-chain packing + u8->RGBA LUT (native/awsm_host.cpp
    # pack_texture_mips) took this from ~64 s to ~4 s on the 1-core CI
    # host. The assert catches a regression to the numpy packer's order
    # of magnitude; the headroom is for the 1-core host running
    # CONCURRENT jobs (a 12 s budget tripped at 3x dilation under a
    # parallel compile — the printed number above is the real record)
    assert dt < 30.0, f"loader blew the budget: {dt:.1f}s"
