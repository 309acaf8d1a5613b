"""Device capability check.

Mirrors reference behavior: renderer-core/src/compatibility.rs
(CompatibilityRequirements vs device limits — the renderer asks for 9
storage buffers/stage, lib.rs:110-113). The TPU analog checks that the
scene's capacity-padded device arrays fit the chip's HBM with headroom.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass
class CompatibilityReport:
    device_kind: str
    hbm_bytes: int
    scene_bytes: int
    framebuffer_bytes: int
    ok: bool
    detail: str = ""


def check_compatibility(renderer) -> CompatibilityReport:
    import jax
    import numpy as np

    dev = jax.devices()[0]
    stats = {}
    try:
        stats = dev.memory_stats() or {}
    except Exception:
        pass
    hbm = stats.get("bytes_limit", 16 * 1024**3)

    m = renderer.meshes
    scene = 0
    for name in ("c_pos", "c_norm", "c_tang", "c_uv0", "c_uv1", "c_color",
                 "c_joints", "c_weights", "c_morph_base", "morph_deltas",
                 "tri_mesh", "mesh_info", "morph_weights"):
        scene += getattr(m, name).nbytes
    scene += renderer.textures.texels_packed.nbytes
    # environment maps upload quad-packed (16 f32/texel; ops/cubemap.py)
    e = renderer.environment
    scene += 4 * (e.skybox.nbytes + e.irradiance.nbytes + e.prefiltered.nbytes)
    scene += renderer.transforms.world.nbytes + renderer.transforms.normal.nbytes

    cfg = renderer.config
    n_planes = 22
    fb = cfg.render_width * cfg.render_height * 4 * (n_planes + 8)

    ok = scene + fb < hbm * 0.8
    return CompatibilityReport(
        device_kind=dev.device_kind if hasattr(dev, "device_kind") else str(dev),
        hbm_bytes=int(hbm), scene_bytes=int(scene), framebuffer_bytes=int(fb),
        ok=ok,
        detail="" if ok else "scene + framebuffers exceed 80% of device memory",
    )
