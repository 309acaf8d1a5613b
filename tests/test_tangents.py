"""MikkTSpace tangent generation (native/awsm_host.cpp) vs the Lengyel
fallback. Reference: gltf/buffers/tangents.rs:101-347 (bevy_mikktspace +
per-vertex collapse with majority handedness vote)."""

import numpy as np
import pytest

from awsm_renderer_tpu.utils.native import HAVE_NATIVE, mikktspace_tangents

F = np.float32

needs_native = pytest.mark.skipif(not HAVE_NATIVE, reason="libawsm_host.so unavailable")


def _mirror_quads():
    """Two quads sharing an edge at x=1; the right quad's U axis is
    mirrored (NormalTangentMirrorTest-style probe)."""
    pos = np.array([
        [0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0],   # quad A
        [2, 0, 0], [2, 1, 0],                          # quad B extra verts
    ], F)
    uv = np.array([
        [0, 0], [1, 0], [0, 1], [1, 1],
        [0, 0], [0, 1],                                # mirrored: u falls with +x
    ], F)
    nrm = np.tile(np.array([[0, 0, 1]], F), (6, 1))
    idx = np.array([
        [0, 1, 2], [1, 3, 2],      # A
        [1, 4, 3], [4, 5, 3],      # B (consistent +z winding)
    ], np.int32)
    return pos, nrm, uv, idx


@needs_native
def test_mirrored_uv_handedness_per_side():
    pos, nrm, uv, idx = _mirror_quads()
    t = mikktspace_tangents(pos, nrm, uv, idx)
    assert t.shape == (6, 4)
    # non-mirrored interior: tangent +x, w=+1
    np.testing.assert_allclose(t[0, :3], [1, 0, 0], atol=1e-5)
    np.testing.assert_allclose(t[2, :3], [1, 0, 0], atol=1e-5)
    assert t[0, 3] == 1.0 and t[2, 3] == 1.0
    # mirrored interior: tangent -x, w=-1 (Lengyel-style summed bitangent
    # sign agrees here; the seam below is where the approaches diverge)
    np.testing.assert_allclose(t[4, :3], [-1, 0, 0], atol=1e-5)
    np.testing.assert_allclose(t[5, :3], [-1, 0, 0], atol=1e-5)
    assert t[4, 3] == -1.0 and t[5, 3] == -1.0
    # seam vertices: opposing-orientation groups never mix; the reference
    # collapse then majority-votes per corner count — v1 touches two
    # positive-orientation corners and one negative (w=+1), v3 the inverse
    # (w=-1). Plain index-based Lengyel accumulation would instead blend the
    # opposing bitangents before deciding.
    np.testing.assert_allclose(t[1], [1, 0, 0, 1], atol=1e-5)
    np.testing.assert_allclose(t[3], [-1, 0, 0, -1], atol=1e-5)


@needs_native
def test_welding_smooths_exploded_meshes():
    """Corners welded by exact (pos, normal, uv): an exploded mesh gets the
    same smoothed tangents as its indexed form — plain Lengyel on exploded
    indices cannot smooth (each corner only sees its own face)."""
    # two triangles sharing an edge, second face's UVs rotated 90° (same
    # orientation, different per-face tangent direction)
    pos = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]], F)
    nrm = np.tile(np.array([[0, 0, 1]], F), (4, 1))
    uv = np.array([[0, 0], [1, 0], [0, 1], [1, 1]], F)
    idx = np.array([[0, 1, 2], [1, 3, 2]], np.int32)
    t_indexed = mikktspace_tangents(pos, nrm, uv, idx)

    # exploded: 6 corner records, same data
    flat = idx.reshape(-1)
    t_exploded = mikktspace_tangents(
        pos[flat], nrm[flat], uv[flat],
        np.arange(6, dtype=np.int32).reshape(2, 3))
    # welding makes exploded == indexed at matching corners
    for corner, v in enumerate(flat):
        np.testing.assert_allclose(t_exploded[corner], t_indexed[v], atol=1e-5)


@needs_native
def test_angle_weighted_accumulation():
    """A long thin triangle contributes by corner angle, not equally —
    at the apex vertex the wide face dominates (mikktspace angle weights)."""
    # fan of two faces at vertex 0: one wide (90° at v0), one sliver (~6°)
    pos = np.array([
        [0, 0, 0], [1, 0, 0], [0, 1, 0],          # wide: angle at v0 = 90°
        [1.0, 0.105, 0],                           # sliver apex target
    ], F)
    nrm = np.tile(np.array([[0, 0, 1]], F), (4, 1))
    # wide face maps u along +x; sliver maps u along +y (orthogonal tangent)
    uv = np.array([[0, 0], [1, 0], [0.2, 1], [0, 1]], F)
    idx = np.array([[0, 1, 2], [0, 3, 1]], np.int32)
    t = mikktspace_tangents(pos, nrm, uv, idx)
    # both faces share v0/v1 welds; the wide face's ~90° corner at v0
    # outweighs the sliver's ~6° — tangent at v0 stays close to the wide
    # face's direction
    wide_only = mikktspace_tangents(pos[:3], nrm[:3], uv[:3],
                                    np.array([[0, 1, 2]], np.int32))
    cos = float(np.dot(t[0, :3], wide_only[0, :3]))
    assert cos > 0.9, f"apex tangent should follow the wide face, cos={cos}"


def test_fallback_matches_shape_and_finiteness():
    """generate_tangents works (native or fallback) on a closed mesh."""
    from awsm_renderer_tpu.geometry import uv_sphere
    from awsm_renderer_tpu.gltf.tangents import generate_tangents

    g = uv_sphere(0.5, rings=6, sectors=8)
    t = generate_tangents(g.positions, g.normals, g.uv0, g.indices)
    assert t.shape == (g.positions.shape[0], 4)
    assert np.isfinite(t).all()
    assert set(np.unique(t[:, 3])) <= {-1.0, 1.0}
