"""Multi-device row-sharded rendering vs single-device reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from awsm_renderer_tpu import (
    AwsmRendererTpu, PostProcessing, RendererConfig, ToneMapping, UnlitMaterial,
)
from awsm_renderer_tpu.config import ToneMapping as TM
from awsm_renderer_tpu.geometry import box
from awsm_renderer_tpu.parallel.sharding import render_frame_sharded
from awsm_renderer_tpu.passes.frame import render_frame
from awsm_renderer_tpu.utils import math3d as m3

W, H = 128, 64  # 64 rows = 8 devices x 1 tile-row


@pytest.fixture(scope="module")
def scene():
    r = AwsmRendererTpu(RendererConfig(
        width=W, height=H, post_processing=PostProcessing(tonemapping=ToneMapping.NONE)))
    mat = r.materials.insert(UnlitMaterial(base_color_factor=np.array([1, 0, 0, 1], np.float32)))
    r.add_mesh(box(), mat)
    view = m3.look_at([0, 0.5, 2.5], [0, 0, 0], [0, 1, 0])
    proj = m3.perspective(np.pi / 3, W / H, 0.1, 100.0)
    r.camera.update(view, proj)
    ds = r._flush()
    mask = jnp.asarray(r._mesh_masks()["opaque"])
    return ds, mask


def test_sharded_matches_single_device(scene):
    ds, mask = scene
    n = min(8, len(jax.devices()))
    mesh = Mesh(np.array(jax.devices()[:n]), axis_names=("rows",))

    ldr_s, tid_s = render_frame_sharded(
        mesh, ds, mask, width=W, height=H, tonemap=TM.NONE)
    ldr_1, tid_1, _ = render_frame(
        ds, mask, width=W, height=H, supersample=False, tonemap=TM.NONE,
        use_mips=True, has_morphs=False, skin_sets=0)

    np.testing.assert_array_equal(np.asarray(tid_s), np.asarray(tid_1))
    np.testing.assert_allclose(np.asarray(ldr_s), np.asarray(ldr_1), atol=2e-5)
    assert (np.asarray(tid_s) >= 0).sum() > 50  # mesh actually visible


def test_sharded_bands_cover_distinct_rows(scene):
    ds, mask = scene
    n = min(8, len(jax.devices()))
    mesh = Mesh(np.array(jax.devices()[:n]), axis_names=("rows",))
    ldr, tid = render_frame_sharded(mesh, ds, mask, width=W, height=H, tonemap=TM.NONE)
    # output is sharded by rows across devices
    shards = ldr.addressable_shards
    assert len(shards) == n
    rows = sorted(s.index[0].start or 0 for s in shards)
    assert rows == [i * (H // n) for i in range(n)]
