"""Auxiliary subsystems: snapshot save/restore, profiling, exporter,
reports, native runtime."""

import logging

import numpy as np
import pytest

from awsm_renderer_tpu import (
    AwsmRendererTpu, Light, PbrMaterial, PostProcessing, RendererConfig,
    ToneMapping, Transform, UnlitMaterial,
)
from awsm_renderer_tpu.core.snapshot import load_scene, save_scene
from awsm_renderer_tpu.geometry import box, checker_texture
from awsm_renderer_tpu.utils import native
from awsm_renderer_tpu.utils.exporter import (
    export_depth, export_image, geometry_report, texture_report,
)
from awsm_renderer_tpu.utils.profiling import (
    RenderTimings, debug_n, debug_once,
)
from awsm_renderer_tpu.utils import math3d as m3

F = np.float32
W, H = 128, 32


def _scene():
    r = AwsmRendererTpu(RendererConfig(
        width=W, height=H, post_processing=PostProcessing(tonemapping=ToneMapping.NONE)))
    tex = r.textures.add_image(checker_texture(16, 4), srgb=False)
    mat = r.materials.insert(UnlitMaterial(base_color_factor=np.array([1, 0, 0, 1], F)))
    r.add_mesh(box(), mat)
    r.lights.insert(Light.directional([0, -1, 0]))
    view = m3.look_at([0, 0, 3], [0, 0, 0], [0, 1, 0])
    r.camera.update(view, m3.perspective(np.pi / 3, W / H, 0.1, 100.0))
    return r


class TestSnapshot:
    def test_roundtrip_renders_identically(self, tmp_path):
        r = _scene()
        img1 = r.render()
        save_scene(r, str(tmp_path / "scene.awsm"))
        r2 = load_scene(str(tmp_path / "scene.awsm"))
        img2 = r2.render()
        np.testing.assert_array_equal(img1, img2)

    def test_bad_file_rejected(self, tmp_path):
        p = tmp_path / "bad.awsm"
        import pickle

        p.write_bytes(pickle.dumps({"magic": "nope"}))
        with pytest.raises(ValueError):
            load_scene(str(p))

    def test_restored_scene_still_editable(self, tmp_path):
        r = _scene()
        save_scene(r, str(tmp_path / "s.awsm"))
        r2 = load_scene(str(tmp_path / "s.awsm"))
        m2 = r2.materials.insert(UnlitMaterial(base_color_factor=np.array([0, 1, 0, 1], F)))
        r2.add_mesh(box(0.3), m2, transform=Transform(
            translation=np.array([0, 0, 1.0], F)))
        img = r2.render()
        assert img[H // 2, W // 2, 1] > 0.9  # new green box in front


class TestProfiling:
    def test_spans_recorded(self):
        t = RenderTimings(enabled=True)
        with t.span("raster"):
            pass
        with t.span("shade"):
            pass
        frame = t.end_frame()
        assert set(frame) == {"raster", "shade"}
        assert t.summary().keys() == frame.keys()

    def test_disabled_is_noop(self):
        t = RenderTimings(enabled=False)
        with t.span("x"):
            pass
        assert t.end_frame() == {}

    def test_debug_once(self, caplog):
        with caplog.at_level(logging.WARNING, logger="awsm_renderer_tpu"):
            debug_once("k1-test", "hello")
            debug_once("k1-test", "hello")
        assert sum("hello" in r.message for r in caplog.records) == 1

    def test_debug_n(self, caplog):
        with caplog.at_level(logging.WARNING, logger="awsm_renderer_tpu"):
            for _ in range(5):
                debug_n("k2-test", "msg", 3)
        assert sum("msg" in r.message for r in caplog.records) == 3


class TestExporter:
    def test_export_png(self, tmp_path):
        img = np.random.default_rng(0).random((16, 16, 4)).astype(F)
        p = tmp_path / "out.png"
        export_image(img, str(p))
        from PIL import Image

        back = np.asarray(Image.open(p))
        assert back.shape == (16, 16, 4)

    def test_export_depth(self, tmp_path):
        d = np.linspace(0.1, 1.0, 64).reshape(8, 8).astype(F)
        export_depth(d, str(tmp_path / "d.png"))
        assert (tmp_path / "d.png").exists()

    def test_texture_report(self):
        r = _scene()
        rep = texture_report(r.textures)
        assert rep["used_texels"] > 0
        assert 0 < rep["occupancy"] <= 1
        assert rep["textures"][0]["width"] == 16

    def test_geometry_report(self):
        r = _scene()
        rep = geometry_report(r.meshes)
        assert rep["meshes"] == 1
        assert rep["corners"]["used"] >= 36  # 12 tris exploded


class TestNative:
    def test_native_available(self):
        # the toolchain is baked into this image; the lib must build
        assert native.HAVE_NATIVE

    def test_world_propagate_matches_fallback(self):
        rng = np.random.default_rng(3)
        n = 50
        parent = np.full(n, -1, np.int32)
        for i in range(1, n):
            parent[i] = rng.integers(0, i)
        order = np.arange(n, dtype=np.int32)
        trs = np.concatenate([
            rng.normal(0, 1, (n, 3)), rng.normal(0, 1, (n, 4)),
            rng.uniform(0.5, 2, (n, 3))], axis=1).astype(F)
        trs[:, 3:7] /= np.linalg.norm(trs[:, 3:7], axis=1, keepdims=True)
        local = native.compose_trs(trs).reshape(n, 16)
        dirty = np.ones(n, np.uint8)

        w1 = np.zeros((n, 16), F)
        n1 = np.zeros((n, 9), F)
        native.world_propagate(order, parent, local, w1, n1, dirty)

        # pure-numpy recompute
        w2 = np.zeros((n, 4, 4))
        for i in order:
            l = local[i].reshape(4, 4)
            w2[i] = (w2[parent[i]] @ l) if parent[i] >= 0 else l
        np.testing.assert_allclose(w1.reshape(n, 4, 4), w2, rtol=1e-4, atol=1e-4)

    def test_transform_aabbs_matches_corners(self):
        rng = np.random.default_rng(4)
        world = np.zeros((3, 16), F)
        from awsm_renderer_tpu.core.bounds import Aabb

        mats = []
        for i in range(3):
            q = rng.normal(0, 1, 4).astype(F)
            q /= np.linalg.norm(q)
            m = m3.trs_to_mat4(rng.normal(0, 5, 3), q, rng.uniform(0.5, 2, 3))
            world[i] = m.reshape(16)
            mats.append(m)
        mins = rng.uniform(-2, 0, (3, 3)).astype(F)
        maxs = mins + rng.uniform(0.1, 3, (3, 3)).astype(F)
        omin, omax = native.transform_aabbs(
            np.arange(3, dtype=np.int32), world, mins, maxs)
        for i in range(3):
            ref = Aabb(mins[i], maxs[i]).transform(mats[i])
            np.testing.assert_allclose(omin[i], ref.min, atol=1e-4)
            np.testing.assert_allclose(omax[i], ref.max, atol=1e-4)


def test_load_hdr_image_ldr_png_is_linearized(tmp_path):
    """An 8-bit PNG must come back /255-normalized and sRGB-decoded
    (round-1 bug: cv2 branch returned 0-255 un-linearized floats)."""
    import numpy as np
    from PIL import Image

    from awsm_renderer_tpu.core.environment import load_hdr_image
    from awsm_renderer_tpu.core.textures import srgb_to_linear

    arr = np.zeros((4, 8, 3), np.uint8)
    arr[..., 0] = 255   # pure red
    arr[..., 1] = 128
    p = tmp_path / "env.png"
    Image.fromarray(arr).save(p)
    img = load_hdr_image(str(p))
    assert img.shape == (4, 8, 3)
    assert img.max() <= 1.0 + 1e-6, "LDR file must be normalized to [0,1]"
    expect = srgb_to_linear(np.array([1.0, 128 / 255.0, 0.0], np.float32))
    np.testing.assert_allclose(img[0, 0], expect, atol=2e-3)


class TestTypedErrors:
    """Per-subsystem error hierarchy (reference error.rs:26-84 AwsmError):
    every renderer failure is an AwsmError subclass, catchable at the
    subsystem or root level."""

    def test_mesh_key(self):
        import pytest

        from awsm_renderer_tpu import AwsmRendererTpu, RendererConfig
        from awsm_renderer_tpu.errors import AwsmError, MeshError

        r = AwsmRendererTpu(RendererConfig(width=32, height=32))
        with pytest.raises(MeshError):
            r.meshes.get(999)
        with pytest.raises(AwsmError):
            r.meshes.get(999)

    def test_material_key(self):
        import pytest

        from awsm_renderer_tpu import AwsmRendererTpu, RendererConfig
        from awsm_renderer_tpu.errors import MaterialError

        r = AwsmRendererTpu(RendererConfig(width=32, height=32))
        with pytest.raises(MaterialError):
            r.materials.get(42)

    def test_allocator_is_awsm_error(self):
        import pytest

        from awsm_renderer_tpu.errors import AllocatorError, AwsmError
        from awsm_renderer_tpu.utils.allocator import SlotAllocator

        a = SlotAllocator(4)
        with pytest.raises(AllocatorError):
            a.row_of(123)
        assert issubclass(AllocatorError, AwsmError)

    def test_glb_errors(self, tmp_path):
        import pytest

        from awsm_renderer_tpu.errors import GltfError
        from awsm_renderer_tpu.gltf.loader import load_gltf

        bad = tmp_path / "bad.glb"
        bad.write_bytes(b"glTF" + b"\x03\x00\x00\x00" + b"\x00" * 8)
        with pytest.raises(GltfError):
            load_gltf(str(bad))

    def test_instanced_constraint(self):
        import numpy as np
        import pytest

        from awsm_renderer_tpu import AwsmRendererTpu, PbrMaterial, RendererConfig
        from awsm_renderer_tpu.errors import InstanceError
        from awsm_renderer_tpu.geometry import box

        r = AwsmRendererTpu(RendererConfig(width=32, height=32))
        geo = box(1.0)
        geo.morph_positions = np.zeros((2, geo.vertex_count, 3), np.float32)
        res = r.meshes.insert_resource(geo)
        mat = r.materials.insert(PbrMaterial())
        with pytest.raises(InstanceError):
            r.meshes.insert_instanced(res, [(0, 0)], r.materials.row_of(mat), mat)

    def test_light_key(self):
        import pytest

        from awsm_renderer_tpu import AwsmRendererTpu, Light, RendererConfig
        from awsm_renderer_tpu.errors import AwsmError, LightError

        r = AwsmRendererTpu(RendererConfig(width=32, height=32))
        k = r.lights.insert(Light.directional([0, -1, 0]))
        r.lights.remove(k)
        with pytest.raises(LightError):
            r.lights.get(k)
        with pytest.raises(LightError):
            r.lights.update(k, Light.directional([0, -1, 0]))
        with pytest.raises(AwsmError):
            r.lights.remove(k)

    def test_texture_key_and_bad_image(self):
        import numpy as np
        import pytest

        from awsm_renderer_tpu import AwsmRendererTpu, RendererConfig
        from awsm_renderer_tpu.errors import TextureError

        r = AwsmRendererTpu(RendererConfig(width=32, height=32))
        with pytest.raises(TextureError):
            r.textures.row_of(777)
        with pytest.raises(TextureError):
            r.textures.remove(777)
        with pytest.raises(TextureError):
            r.textures.transform_row_of(777)
        with pytest.raises(TextureError):
            r.textures.add_image(np.zeros((4, 4, 2), np.float32))  # 2 channels
        with pytest.raises(TextureError):
            r.textures.add_image(np.zeros((0, 0), np.float32))     # empty

    def test_animation_key_and_empty_sampler(self):
        import numpy as np
        import pytest

        from awsm_renderer_tpu.core.animation import (
            AnimationSampler, Animations,
        )
        from awsm_renderer_tpu.errors import AnimationError

        a = Animations()
        with pytest.raises(AnimationError):
            a.get(99)
        with pytest.raises(AnimationError):
            a.remove(99)
        s = AnimationSampler(np.zeros(0), np.zeros((0, 3)))
        with pytest.raises(AnimationError):
            s.sample(0.5)

    def test_camera_bad_matrices(self):
        import numpy as np
        import pytest

        from awsm_renderer_tpu.core.camera import CameraState
        from awsm_renderer_tpu.errors import CameraError

        c = CameraState()
        with pytest.raises(CameraError):
            c.update(np.eye(3), np.eye(4))           # wrong shape
        with pytest.raises(CameraError):
            bad = np.eye(4, dtype=np.float32)
            bad[0, 0] = np.nan
            c.update(bad, np.eye(4))                 # non-finite
        with pytest.raises(CameraError):
            c.update(np.zeros((4, 4)), np.eye(4))    # singular view

    def test_populate_dangling_refs(self):
        """Malformed documents fail with GltfError, not KeyError/IndexError
        (reference error.rs breadth across the gltf populate path)."""
        import pytest

        from awsm_renderer_tpu import AwsmRendererTpu, RendererConfig
        from awsm_renderer_tpu.errors import GltfError
        from awsm_renderer_tpu.gltf.loader import GltfData
        from awsm_renderer_tpu.gltf.populate import populate_gltf

        def doc(**over):
            g = {
                "asset": {"version": "2.0"},
                "scene": 0,
                "scenes": [{"nodes": [0]}],
                "nodes": [{"mesh": 0}],
                "meshes": [{"primitives": [
                    {"attributes": {"POSITION": 0}, "material": 0}]}],
                "materials": [{"pbrMetallicRoughness": {
                    "baseColorTexture": {"index": 5}}}],
                "accessors": [{"componentType": 5126, "count": 3,
                               "type": "VEC3", "bufferView": 0,
                               "min": [0, 0, 0], "max": [1, 1, 1]}],
                "bufferViews": [{"buffer": 0, "byteLength": 36}],
                "buffers": [{"byteLength": 36}],
            }
            g.update(over)
            return g

        buffers = [b"\x00" * 36]

        r = AwsmRendererTpu(RendererConfig(width=32, height=32))
        # dangling texture index
        with pytest.raises(GltfError):
            populate_gltf(r, GltfData(gltf=doc(), buffers=buffers, images=[]))
        # bad scene index
        with pytest.raises(GltfError):
            populate_gltf(
                r, GltfData(gltf=doc(scene=3), buffers=buffers, images=[]))
        # missing POSITION
        g = doc()
        g["materials"] = [{}]
        g["meshes"] = [{"primitives": [{"attributes": {}, "material": 0}]}]
        with pytest.raises(GltfError):
            populate_gltf(r, GltfData(gltf=g, buffers=buffers, images=[]))
        # unknown alphaMode
        g = doc()
        g["materials"] = [{"alphaMode": "WAT"}]
        with pytest.raises(GltfError):
            populate_gltf(r, GltfData(gltf=g, buffers=buffers, images=[]))

    def test_morph_targets_beyond_initial_bucket_render(self):
        """12 morph targets (> the initial 8-wide bucket): activating ONLY
        target #11 must displace geometry — arbitrary-N parity with the
        reference's morph.wgsl unroll-then-loop."""
        import numpy as np

        from awsm_renderer_tpu import (
            AwsmRendererTpu, RendererConfig, UnlitMaterial,
        )
        from awsm_renderer_tpu.geometry import box
        from awsm_renderer_tpu.utils import math3d as m3

        F = np.float32
        r = AwsmRendererTpu(RendererConfig(width=64, height=32))
        geo = box(1.0)
        # target i pushes the box +2z*(i==11): only the last one matters
        deltas = np.zeros((12, geo.vertex_count, 3), F)
        deltas[11, :, 0] = 100.0          # off-screen when active
        geo.morph_positions = deltas
        mat = r.materials.insert(UnlitMaterial(
            base_color_factor=np.array([1, 0, 0, 1], F)))
        k = r.add_mesh(geo, mat)
        r.camera.update(m3.look_at([0.5, 0.5, 4], [0.5, 0.5, 0.5], [0, 1, 0]),
                        m3.perspective(np.pi / 3, 2.0, 0.1, 50.0))
        visible = r.render()
        assert visible[..., 0].max() > 0.5              # red box on screen
        r.meshes.update_morph_weights(k, [0.0] * 11 + [1.0])
        gone = r.render()
        assert gone[..., 0].max() < 0.5                 # pushed off-screen

    def test_skin_sets_beyond_initial_bucket_render(self):
        """3 joint-influence sets (> the initial 2-set bucket): all weight
        rides influence #8 (the first joint of SET 3) — moving that joint
        must move the mesh. Arbitrary-set parity with skins.rs."""
        import numpy as np

        from awsm_renderer_tpu import (
            AwsmRendererTpu, RendererConfig, Transform, UnlitMaterial,
        )
        from awsm_renderer_tpu.geometry import box
        from awsm_renderer_tpu.utils import math3d as m3

        F = np.float32
        r = AwsmRendererTpu(RendererConfig(width=64, height=32))
        geo = box(1.0)
        V = geo.vertex_count
        geo.joints = np.tile(np.arange(12, dtype=np.int32), (V, 1))
        w = np.zeros((V, 12), F)
        w[:, 8] = 1.0                       # set-3 joint only
        geo.weights = w
        joint_tks = [r.transforms.insert(Transform()) for _ in range(12)]
        ibm = np.tile(np.eye(4, dtype=F)[None], (12, 1, 1))
        sk = r.skins.insert(joint_tks, ibm)
        mat = r.materials.insert(UnlitMaterial(
            base_color_factor=np.array([1, 0, 0, 1], F)))
        r.add_mesh(geo, mat, skin_key=sk)
        r.camera.update(m3.look_at([0.5, 0.5, 4], [0.5, 0.5, 0.5], [0, 1, 0]),
                        m3.perspective(np.pi / 3, 2.0, 0.1, 50.0))
        visible = r.render()
        assert visible[..., 0].max() > 0.5              # red box on screen
        r.transforms.set_local(
            joint_tks[8], Transform(translation=np.array([100, 0, 0], F)))
        r.update_all(0.0)
        gone = r.render()
        assert gone[..., 0].max() < 0.5                 # rode joint 8 away


class TestFailureRecovery:
    """Per-renderable skip-and-warn (SURVEY §5.3; reference render.rs
    warns and continues when one renderable cannot be drawn)."""

    def _scene(self):
        import numpy as np

        from awsm_renderer_tpu import (
            AwsmRendererTpu, PbrMaterial, RendererConfig, Transform,
        )
        from awsm_renderer_tpu.geometry import box
        from awsm_renderer_tpu.utils import math3d as m3

        F = np.float32
        r = AwsmRendererTpu(RendererConfig(width=64, height=32))
        mat = r.materials.insert(PbrMaterial(
            base_color_factor=np.array([0.8, 0.2, 0.2, 1], F)))
        keys = []
        for x in (-1.0, 1.0):
            tk = r.transforms.insert(Transform(
                translation=np.array([x, 0, 0], F)))
            r.transforms.update_world()
            keys.append(r.meshes.insert_geometry(
                box(0.8), r.transforms.row_of(tk), r.materials.row_of(mat),
                tk, mat))
        r.meshes.update_world(r.transforms)
        view = m3.look_at([0, 1, 4], [0, 0, 0], [0, 1, 0])
        r.camera.update(view, m3.perspective(np.pi / 3, 2.0, 0.1, 100.0))
        return r, keys

    def test_nan_bounds_skipped_with_warning(self):
        import numpy as np
        import pytest

        from awsm_renderer_tpu import Transform

        r, keys = self._scene()
        img0 = r.render()
        # corrupt one mesh through the SUPPORTED path: a NaN transform
        # propagates to NaN world bounds via update_world (direct field
        # writes bypass the stores' mutation counters, which the
        # renderer's per-frame prep memo keys on)
        bad = r.meshes.get(keys[0])
        r.transforms.set_local(bad.transform_key, Transform(
            translation=np.array([np.nan, 0, 0], np.float32)))
        r.update_all(0.0)
        with pytest.warns(RuntimeWarning, match="skipping mesh"):
            img1 = r.render()
        assert np.isfinite(img1).all()
        # other mesh still renders
        assert (np.abs(img1 - img0) > 0.01).any()
        assert (img1[..., 0] > 0.2).sum() > 10

    def test_recovers_after_fix(self):
        import numpy as np
        import pytest

        from awsm_renderer_tpu import Transform

        r, keys = self._scene()
        img0 = r.render()
        bad = r.meshes.get(keys[0])
        r.transforms.set_local(bad.transform_key, Transform(
            translation=np.array([np.nan, 0, 0], np.float32)))
        r.update_all(0.0)
        with pytest.warns(RuntimeWarning):
            r.render()
        r.transforms.set_local(bad.transform_key, Transform(
            translation=np.array([-1.0, 0, 0], np.float32)))
        r.update_all(0.0)
        img2 = r.render()
        np.testing.assert_array_equal(img2, img0)
