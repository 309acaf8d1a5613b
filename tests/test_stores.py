"""Scene store tests: materials, lights, textures, meshes, skins, animation."""

import numpy as np
import pytest

from awsm_renderer_tpu.core import materials as mat
from awsm_renderer_tpu.core.animation import (
    AnimationChannel, AnimationClip, AnimationPlayer, AnimationSampler,
    Animations, Interpolation, LoopStyle, TargetPath,
)
from awsm_renderer_tpu.core.lights import Light, LightKind, Lights, LIGHT_F32
from awsm_renderer_tpu.core.meshes import (
    MeshGeometry, Meshes, MESH_FLAG_TRANSPARENT, MI_MATERIAL_ROW, MI_TRANSFORM_ROW,
)
from awsm_renderer_tpu.core.skins import Skins
from awsm_renderer_tpu.core.textures import (
    MipmapKind, Sampler, Textures, TD_N_MIPS, TD_MIP_OFFSETS, TD_WIDTH,
    calculate_mip_levels, generate_mip_chain, linear_to_srgb, srgb_to_linear,
)
from awsm_renderer_tpu.core.transforms import Transform, Transforms


class TestMaterials:
    def test_pbr_pack_roundtrip(self):
        m = mat.Materials()
        p = mat.PbrMaterial(
            base_color_factor=np.array([1, 0.5, 0.25, 1], np.float32),
            metallic_factor=0.7, roughness_factor=0.3,
            alpha_mode=mat.AlphaMode.MASK, alpha_cutoff=0.4,
        )
        k = m.insert(p)
        row = m.row_of(k)
        np.testing.assert_allclose(m.float_data[row, mat.MF_BASE_COLOR:mat.MF_BASE_COLOR+4],
                                   [1, 0.5, 0.25, 1])
        assert m.float_data[row, mat.MF_METALLIC] == np.float32(0.7)
        assert m.flags[row, mat.MI_ALPHA_MODE] == 1
        assert m.flags[row, mat.MI_KIND] == mat.KIND_PBR

    def test_unlit(self):
        m = mat.Materials()
        k = m.insert(mat.UnlitMaterial())
        assert m.flags[m.row_of(k), mat.MI_KIND] == mat.KIND_UNLIT

    def test_transparency_routing(self):
        m = mat.Materials()
        k1 = m.insert(mat.PbrMaterial(alpha_mode=mat.AlphaMode.BLEND))
        k2 = m.insert(mat.PbrMaterial(transmission_factor=0.5))
        k3 = m.insert(mat.PbrMaterial())
        assert m.is_transparency_pass(k1)
        assert m.is_transparency_pass(k2)
        assert not m.is_transparency_pass(k3)

    def test_texture_slots(self):
        m = mat.Materials()
        p = mat.PbrMaterial(textures={mat.TS_BASE_COLOR: mat.TextureRef(5, uv_set=1)})
        k = m.insert(p)
        row = m.row_of(k)
        assert tuple(m.tex_slots[row, mat.TS_BASE_COLOR]) == (5, 1, -1)
        assert tuple(m.tex_slots[row, mat.TS_NORMAL]) == (-1, -1, -1)

    def test_growth(self):
        m = mat.Materials(initial_capacity=2)
        keys = [m.insert(mat.PbrMaterial(metallic_factor=i * 0.1)) for i in range(5)]
        for i, k in enumerate(keys):
            assert m.float_data[m.row_of(k), mat.MF_METALLIC] == np.float32(i * 0.1)


class TestLights:
    def test_pack(self):
        ls = Lights()
        ls.insert(Light.directional([0, -1, 0], color=(1, 0.9, 0.8), intensity=3.0))
        ls.insert(Light.point([1, 2, 3], intensity=5.0, range=10.0))
        packed = ls.packed(capacity=4)
        assert packed.shape == (4, LIGHT_F32)
        assert packed[0, 0] == LightKind.DIRECTIONAL.value
        assert packed[1, 0] == LightKind.POINT.value
        np.testing.assert_allclose(packed[1, 5:8], [1, 2, 3])
        assert ls.count == 2

    def test_spot_cone(self):
        ls = Lights()
        ls.insert(Light.spot([0, 5, 0], [0, -1, 0], outer_cone_angle=np.pi / 3))
        p = ls.packed(4)
        np.testing.assert_allclose(p[0, 13], np.cos(np.pi / 3), rtol=1e-6)


class TestTextures:
    def test_srgb_roundtrip(self):
        x = np.linspace(0, 1, 64).astype(np.float32)
        np.testing.assert_allclose(linear_to_srgb(srgb_to_linear(x)), x, atol=1e-5)

    def test_mip_levels(self):
        assert calculate_mip_levels(256, 256) == 9
        assert calculate_mip_levels(1, 1) == 1
        assert calculate_mip_levels(512, 128) == 10

    def test_mip_chain_color(self):
        img = np.ones((8, 8, 4), np.float32) * 0.5
        chain = generate_mip_chain(img, MipmapKind.COLOR)
        assert len(chain) == 4
        assert chain[-1].shape == (1, 1, 4)
        np.testing.assert_allclose(chain[-1][0, 0], [0.5] * 4)

    def test_mip_chain_normal_renormalized(self):
        # two opposing tilted normals average to a shorter vector; must renormalize
        img = np.zeros((2, 2, 4), np.float32)
        n1 = np.array([0.707, 0, 0.707])
        n2 = np.array([-0.707, 0, 0.707])
        img[0, 0, :3] = (n1 + 1) / 2
        img[0, 1, :3] = (n2 + 1) / 2
        img[1, 0, :3] = (n1 + 1) / 2
        img[1, 1, :3] = (n2 + 1) / 2
        chain = generate_mip_chain(img, MipmapKind.NORMAL)
        n = chain[1][0, 0, :3] * 2 - 1
        np.testing.assert_allclose(np.linalg.norm(n), 1.0, atol=1e-5)

    def test_add_image_descriptor(self):
        t = Textures()
        img = (np.random.default_rng(0).random((16, 32, 4)) * 255).astype(np.uint8)
        key = t.add_image(img, srgb=False)
        row = t.row_of(key)
        d = t.descriptors[row]
        assert d[TD_WIDTH] == 32
        assert d[TD_N_MIPS] == 6
        # level 0 texels match
        off = d[TD_MIP_OFFSETS]
        np.testing.assert_allclose(
            t.texels_packed[off : off + 16 * 32, :4].reshape(16, 32, 4)
            .astype(np.float32),
            img.astype(np.float32) / 255.0, atol=4e-3,  # bf16 storage
        )

    def test_srgb_applied(self):
        t = Textures()
        img = np.full((4, 4, 3), 128, np.uint8)
        key = t.add_image(img, srgb=True)
        off = t.descriptors[t.row_of(key), TD_MIP_OFFSETS]
        expected = srgb_to_linear(np.float32(128 / 255))
        np.testing.assert_allclose(np.float32(t.texels_packed[off, 0]),
                                   expected, atol=4e-3)  # bf16 storage
        assert t.texels_packed[off, 3] == 1.0  # alpha untouched

    def test_remove_reuses_space(self):
        t = Textures()
        k1 = t.add_image(np.zeros((32, 32, 4), np.uint8), srgb=False)
        used = t._texel_alloc.used
        t.remove(k1)
        assert t._texel_alloc.used == 0
        k2 = t.add_image(np.zeros((32, 32, 4), np.uint8), srgb=False)
        assert t._texel_alloc.used == used

    def test_texture_transform(self):
        t = Textures()
        key = t.add_texture_transform(offset=(0.5, 0.25), rotation=0.0, scale=(2, 2))
        row = t.transform_row_of(key)
        np.testing.assert_allclose(t.tex_transforms[row, :6], [2, 0, 0, 2, 0.5, 0.25])


def _tri_geometry():
    return MeshGeometry(
        positions=np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32),
        indices=np.array([[0, 1, 2]], np.int32),
        normals=np.array([[0, 0, 1]] * 3, np.float32),
        uv0=np.array([[0, 0], [1, 0], [0, 1]], np.float32),
    )


class TestMeshes:
    def test_insert_and_pools(self):
        m = Meshes()
        k = m.insert_geometry(_tri_geometry(), transform_row=3, material_row=7,
                              transform_key=1, material_key=1)
        row = m.row_of(k)
        assert m.mesh_info[row, MI_TRANSFORM_ROW] == 3
        assert m.mesh_info[row, MI_MATERIAL_ROW] == 7
        mesh = m.get(k)
        # corner-major: corner 1 of triangle t_base holds vertex 1
        np.testing.assert_allclose(m.c_pos[3 * mesh.t_base + 1], [1, 0, 0])
        assert m.tri_mesh[mesh.t_base] == row

    def test_resource_sharing_instances(self):
        m = Meshes()
        rk = m.insert_resource(_tri_geometry())
        k1 = m.insert(rk, 0, 0, 1, 1)
        k2 = m.insert(rk, 1, 0, 2, 1)
        m1, m2 = m.get(k1), m.get(k2)
        # identical corner data, distinct triangle rows with own mesh row
        np.testing.assert_array_equal(
            m.c_pos[3 * m1.t_base : 3 * m1.t_base + 3],
            m.c_pos[3 * m2.t_base : 3 * m2.t_base + 3])
        assert m.tri_mesh[m1.t_base] != m.tri_mesh[m2.t_base]

    def test_remove_frees_resource(self):
        m = Meshes()
        rk = m.insert_resource(_tri_geometry())
        k1 = m.insert(rk, 0, 0, 1, 1)
        k2 = m.insert(rk, 0, 0, 2, 1)
        used_t = m._t_alloc.used
        m.remove(k1)
        assert m._t_alloc.used < used_t     # instance freed
        assert rk in m._resources           # still referenced by k2
        m.remove(k2)
        assert m._t_alloc.used == 0
        assert rk not in m._resources

    def test_morph_pool(self):
        geo = _tri_geometry()
        geo.morph_positions = np.array([[[0, 0, 1]] * 3, [[1, 0, 0]] * 3], np.float32)
        m = Meshes()
        k = m.insert_geometry(geo, 0, 0, 1, 1, initial_morph_weights=[0.5, 0.25])
        row = m.row_of(k)
        np.testing.assert_allclose(m.morph_weights[row, :2], [0.5, 0.25])
        mesh = m.get(k)
        base = m.c_morph_base[3 * mesh.t_base]   # corner 0 -> vertex 0
        assert base >= 0
        np.testing.assert_allclose(m.morph_deltas[base, 0:3], [0, 0, 1])
        # target 1 at base + stride (V=3)
        np.testing.assert_allclose(m.morph_deltas[base + 3, 0:3], [1, 0, 0])

    def test_morph_bucket_widens_past_initial_bound(self):
        # 12 targets > the initial 8-wide bucket: the weights table must
        # widen (pow2) and keep EVERY target addressable — the reference
        # (morph.wgsl) handles arbitrary N, truncation is not parity
        geo = _tri_geometry()
        geo.morph_positions = np.array(
            [[[0, 0, float(i + 1)]] * 3 for i in range(12)], np.float32)
        m = Meshes()
        w0 = [0.0] * 12
        w0[11] = 1.0                     # only the LAST target active
        k = m.insert_geometry(geo, 0, 0, 1, 1, initial_morph_weights=w0)
        assert m.morph_weights.shape[1] == 16
        row = m.row_of(k)
        np.testing.assert_allclose(m.morph_weights[row, 11], 1.0)
        from awsm_renderer_tpu.core.meshes import MI_N_MORPH_TARGETS
        assert m.mesh_info[row, MI_N_MORPH_TARGETS] == 12
        mesh = m.get(k)
        base = m.c_morph_base[3 * mesh.t_base]
        # target 11's delta is intact in the pool (stride = V = 3)
        np.testing.assert_allclose(m.morph_deltas[base + 11 * 3, 0:3],
                                   [0, 0, 12.0])
        # a later width-16 update keeps earlier meshes' rows zero-padded
        m.update_morph_weights(k, [0.0] * 11 + [0.5])
        np.testing.assert_allclose(m.morph_weights[row, 11], 0.5)

    def test_skin_bucket_widens_past_initial_sets(self):
        # 3 influence sets (12 joints/vertex) > the initial 2-set bucket:
        # the corner joint/weight pools must widen (pow2 sets) and keep
        # every influence — reference skins.rs handles arbitrary sets
        geo = _tri_geometry()
        V = geo.vertex_count
        geo.joints = np.tile(np.arange(12, dtype=np.int32), (V, 1))
        geo.weights = np.full((V, 12), 1.0 / 12.0, np.float32)
        m = Meshes()
        assert m.c_joints.shape[1] == 8            # initial 2-set bucket
        k = m.insert_geometry(geo, 0, 0, 1, 1)
        assert m.c_joints.shape[1] == 16           # widened to 4 sets
        from awsm_renderer_tpu.core.meshes import MI_SKIN_SETS
        row = m.row_of(k)
        assert m.mesh_info[row, MI_SKIN_SETS] == 3
        mesh = m.get(k)
        c0 = 3 * mesh.t_base
        np.testing.assert_array_equal(m.c_joints[c0, :12], np.arange(12))
        np.testing.assert_allclose(m.c_weights[c0, :12], 1.0 / 12.0)
        np.testing.assert_allclose(m.c_weights[c0, 12:], 0.0)
        # a later unskinned mesh still inserts fine at the wide bucket
        k2 = m.insert_geometry(_tri_geometry(), 0, 0, 2, 1)
        c2 = 3 * m.get(k2).t_base
        np.testing.assert_allclose(m.c_weights[c2], 0.0)

    def test_world_aabb_culling_inputs(self):
        t = Transforms()
        tk = t.insert(Transform(translation=np.array([5, 0, 0], np.float32)))
        t.update_world()
        m = Meshes()
        k = m.insert_geometry(_tri_geometry(), t.row_of(tk), 0, tk, 1)
        m.update_world(t)
        mins, maxs, keys = m.world_bounds()
        np.testing.assert_allclose(mins[0], [5, 0, 0])
        np.testing.assert_allclose(maxs[0], [6, 1, 0])

    def test_transparent_flag(self):
        m = Meshes()
        k = m.insert_geometry(_tri_geometry(), 0, 0, 1, 1, transparent=True)
        from awsm_renderer_tpu.core.meshes import MI_FLAGS
        assert m.mesh_info[m.row_of(k), MI_FLAGS] & MESH_FLAG_TRANSPARENT


class TestSkins:
    def test_joint_matrices(self):
        t = Transforms()
        j0 = t.insert(Transform(translation=np.array([0, 1, 0], np.float32)))
        j1 = t.insert(Transform(translation=np.array([0, 2, 0], np.float32)), parent=j0)
        t.update_world()
        s = Skins()
        ibm = np.stack([np.eye(4, dtype=np.float32)] * 2)
        ibm[1, 1, 3] = -3.0  # inverse bind: undo the accumulated +3 in y
        key = s.insert([j0, j1], ibm)
        s.update_transforms(t)
        rows = s.joint_rows(key)
        np.testing.assert_allclose(s.joint_matrices[rows[0]][:3, 3], [0, 1, 0])
        np.testing.assert_allclose(s.joint_matrices[rows[1]][:3, 3], [0, 0, 0], atol=1e-6)

    def test_insert_over_posed_skeleton_flushes_pending(self):
        # a skin inserted AFTER its joints were posed must pick up the
        # current pose at the next flush — not stay bind-pose identity
        # until some joint happens to move again
        t = Transforms()
        j = t.insert(Transform(translation=np.array([5, 0, 0], np.float32)))
        t.update_world()
        s = Skins()
        key = s.insert([j], np.eye(4, dtype=np.float32)[None])
        rows = s.joint_rows(key)
        # not yet flushed: identity
        np.testing.assert_allclose(s.joint_matrices[rows[0]][:3, 3], [0, 0, 0])
        s.flush_pending(t)   # what renderer._flush does each frame
        np.testing.assert_allclose(s.joint_matrices[rows[0]][:3, 3], [5, 0, 0])
        # update_transforms with an unrelated changed-set must not skip
        # a pending skin either
        key2 = s.insert([j], np.eye(4, dtype=np.float32)[None])
        s.update_transforms(t, set())
        rows2 = s.joint_rows(key2)
        np.testing.assert_allclose(s.joint_matrices[rows2[0]][:3, 3], [5, 0, 0])


class TestAnimation:
    def test_linear_vec3(self):
        s = AnimationSampler(times=[0, 1], values=[[0, 0, 0], [2, 0, 0]])
        np.testing.assert_allclose(s.sample(0.5), [1, 0, 0])

    def test_step(self):
        s = AnimationSampler(times=[0, 1], values=[[0.0], [2.0]], interpolation=Interpolation.STEP)
        np.testing.assert_allclose(s.sample(0.99), [0.0])

    def test_slerp_rotation(self):
        from awsm_renderer_tpu.utils import math3d as m3
        q0 = m3.quat_identity()
        q1 = m3.quat_from_axis_angle([0, 0, 1], np.pi / 2)
        s = AnimationSampler(times=[0, 1], values=[q0, q1])
        q = s.sample(0.5, is_rotation=True)
        expected = m3.quat_from_axis_angle([0, 0, 1], np.pi / 4)
        np.testing.assert_allclose(np.abs(np.dot(q, expected)), 1.0, atol=1e-5)

    def test_cubic_spline(self):
        # constant value with zero tangents stays constant
        vals = np.zeros((2, 3, 1), np.float32)
        vals[:, 1, 0] = 5.0
        s = AnimationSampler(times=[0, 1], values=vals, interpolation=Interpolation.CUBIC_SPLINE)
        np.testing.assert_allclose(s.sample(0.3), [5.0])

    def test_player_loop(self):
        clip = AnimationClip([AnimationChannel(
            AnimationSampler(times=[0, 2], values=[[0, 0, 0], [1, 0, 0]]),
            TargetPath.TRANSLATION, transform_key=1)])
        p = AnimationPlayer(clip, loop_style=LoopStyle.LOOP)
        p.advance(1.5)
        p.advance(1.0)
        assert abs(p.time - 0.5) < 1e-6

    def test_player_once_stops(self):
        clip = AnimationClip([AnimationChannel(
            AnimationSampler(times=[0, 1], values=[[0.0], [1.0]]),
            TargetPath.TRANSLATION, transform_key=1)])
        p = AnimationPlayer(clip, loop_style=LoopStyle.ONCE)
        p.advance(5.0)
        assert p.time == 1.0 and not p.playing

    def test_ping_pong(self):
        clip = AnimationClip([AnimationChannel(
            AnimationSampler(times=[0, 1], values=[[0.0], [1.0]]),
            TargetPath.TRANSLATION, transform_key=1)])
        p = AnimationPlayer(clip, loop_style=LoopStyle.PING_PONG)
        p.advance(1.5)
        assert abs(p.time - 0.5) < 1e-6 and p.direction == -1

    def test_apply_to_transforms_and_morphs(self):
        t = Transforms()
        tk = t.insert()
        m = Meshes()
        geo = _tri_geometry()
        geo.morph_positions = np.array([[[0, 0, 1]] * 3], np.float32)
        mk = m.insert_geometry(geo, t.row_of(tk), 0, tk, 1)
        anims = Animations()
        clip = AnimationClip([
            AnimationChannel(AnimationSampler(times=[0, 1], values=[[0, 0, 0], [4, 0, 0]]),
                             TargetPath.TRANSLATION, transform_key=tk),
            AnimationChannel(AnimationSampler(times=[0, 1], values=[[0.0], [1.0]]),
                             TargetPath.WEIGHTS, mesh_key=mk),
        ])
        anims.insert(AnimationPlayer(clip))
        anims.update(0.5, t, m)
        t.update_world()
        np.testing.assert_allclose(t.world_of(tk)[:3, 3], [2, 0, 0])
        np.testing.assert_allclose(m.morph_weights[m.row_of(mk), 0], 0.5)


def test_add_instanced_mesh():
    from awsm_renderer_tpu import AwsmRendererTpu, RendererConfig, UnlitMaterial
    from awsm_renderer_tpu.geometry import box

    r = AwsmRendererTpu(RendererConfig(width=128, height=32))
    mat = r.materials.insert(UnlitMaterial())
    keys = r.add_instanced_mesh(box(0.3), mat, [
        Transform(translation=np.array([i, 0, 0], np.float32)) for i in range(5)])
    assert len(keys) == 5
    # one shared resource, five triangle ranges
    res_keys = {r.meshes.get(k).resource_key for k in keys}
    assert len(res_keys) == 1
    assert r.meshes._resources[res_keys.pop()].refcount == 5


class TestBatchedSampling:
    def test_batch_matches_single_taps(self):
        """sample_texture_batch == per-tap sample_texture for a mix of
        sizes, wrap modes, filters, and mip levels."""
        import jax.numpy as jnp
        from awsm_renderer_tpu.core.textures import Sampler, Textures, WRAP_CLAMP, WRAP_MIRROR
        from awsm_renderer_tpu.ops.texsample import sample_texture, sample_texture_batch

        rng = np.random.default_rng(3)
        t = Textures()
        keys = [
            t.add_image((rng.random((32, 64, 4)) * 255).astype(np.uint8), srgb=False),
            t.add_image((rng.random((16, 16, 4)) * 255).astype(np.uint8), srgb=False,
                        sampler=Sampler(wrap_s=WRAP_CLAMP, wrap_t=WRAP_MIRROR)),
            t.add_image((rng.random((8, 8, 4)) * 255).astype(np.uint8), srgb=False,
                        sampler=Sampler(filter_linear=False, mip_filter_linear=False)),
        ]
        texq = jnp.asarray(t.texels_packed)
        desc = jnp.asarray(t.descriptors)
        P = 257
        uv = jnp.asarray(rng.uniform(-1.5, 2.5, (P, 2)).astype(np.float32))
        duv = (jnp.asarray(rng.uniform(-0.1, 0.1, (P, 2)).astype(np.float32)),
               jnp.asarray(rng.uniform(-0.1, 0.1, (P, 2)).astype(np.float32)))
        ids = [jnp.full((P,), t.row_of(k), jnp.int32) for k in keys]
        ids[2] = ids[2].at[::7].set(-1)  # unbound slots -> white
        taps = [(ids[0], uv, duv), (ids[1], uv * 3.0, None), (ids[2], uv, duv)]
        outs = sample_texture_batch(texq, desc, taps, has_nearest=True)
        from awsm_renderer_tpu.ops.texsample import mip_level_from_grads
        lvl0 = mip_level_from_grads(desc, ids[0], *duv)
        singles = [
            sample_texture(texq, desc, ids[0], uv, lvl0),
            sample_texture(texq, desc, ids[1], uv * 3.0, None),
            sample_texture(texq, desc, ids[2], uv,
                           mip_level_from_grads(desc, ids[2], *duv)),
        ]
        for got, want in zip(outs, singles):
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       atol=1e-5)


class TestAnisotropy:
    """Sampler.max_anisotropy honored in LOD selection (reference
    textures.rs:186-220 SamplerCacheKey.max_anisotropy + filter gating)."""

    def test_mip_level_formula(self):
        import jax.numpy as jnp

        from awsm_renderer_tpu.core.textures import DESC_I32, TD_HEIGHT, TD_MAX_ANISO, TD_WIDTH
        from awsm_renderer_tpu.ops.texsample import _mip_level

        def lod(aniso):
            desc = [jnp.zeros(1, jnp.int32)] * DESC_I32
            desc[TD_WIDTH] = jnp.array([64], jnp.int32)
            desc[TD_HEIGHT] = jnp.array([64], jnp.int32)
            desc[TD_MAX_ANISO] = jnp.array([aniso], jnp.int32)
            duv = (jnp.array([1.0]), jnp.array([0.0]),     # dudx, dvdx
                   jnp.array([0.0]), jnp.array([1 / 64.0]))  # dudy, dvdy
            return float(_mip_level(desc, duv)[0])

        # rho_max = 64 texels, rho_min = 1 texel
        assert abs(lod(1) - 6.0) < 1e-4       # isotropic: log2(64)
        assert abs(lod(8) - 3.0) < 1e-4       # log2(64/8)
        assert abs(lod(16) - 2.0) < 1e-4      # log2(64/16)
        assert abs(lod(128) - 0.0) < 1e-4     # clamped at rho_min
        assert abs(lod(0) - 6.0) < 1e-4       # unset descriptor = isotropic

    def test_filter_gating(self):
        from awsm_renderer_tpu.core.textures import Sampler

        assert Sampler(max_anisotropy=8).effective_anisotropy == 8
        assert Sampler(max_anisotropy=8,
                       filter_linear=False).effective_anisotropy == 1
        assert Sampler(max_anisotropy=8,
                       mip_filter_linear=False).effective_anisotropy == 1
        assert Sampler().effective_anisotropy == 1

    def test_aniso_sampling_sharper(self):
        """An oblique footprint (8 texels wide, 1 tall) over a 1-px checker:
        isotropic sampling lands on a gray mip, anisotropic (N=8) keeps the
        base mip's contrast."""
        import jax.numpy as jnp
        import numpy as np

        from awsm_renderer_tpu.core.textures import Sampler, Textures
        from awsm_renderer_tpu.ops.texsample import sample_texture_batch_c

        checker = np.zeros((16, 16, 3), np.float32)
        checker[::2, ::2] = 1.0
        checker[1::2, 1::2] = 1.0

        def render(aniso):
            t = Textures()
            key = t.add_image(checker, srgb=False,
                              sampler=Sampler(max_anisotropy=aniso))
            row = t.row_of(key)
            P = 128
            u = jnp.linspace(0.0, 1.0, P)
            # texel-row-centered v: 0.25 would land exactly BETWEEN two
            # opposite-phase checker rows (bilinear = flat 0.5 at any LOD)
            v = jnp.full((P,), 4.5 / 16.0)
            tid = jnp.full((P,), row, jnp.int32)
            z = jnp.zeros((P,))
            duv = (jnp.full((P,), 8 / 16.0), z,   # dudx: 8-texel footprint
                   z, jnp.full((P,), 1 / 16.0))   # dvdy: 1 texel
            outs = sample_texture_batch_c(
                jnp.asarray(t.texels_packed.astype(np.float32)),
                jnp.asarray(t.descriptors),
                [(tid, (u, v), duv)], has_nearest=False)
            return np.stack([np.asarray(c) for c in outs[0]], -1)

        iso = render(1)
        an = render(8)
        # base checker row alternates 0/1; mip3 of a checker is flat 0.5
        assert an[:, 0].std() > iso[:, 0].std() + 0.05
        assert iso[:, 0].std() < 0.1
