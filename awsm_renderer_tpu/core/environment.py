"""Environment: skybox cubemap + image-based lighting (IBL).

Mirrors reference behavior: crates/renderer/src/environment.rs (skybox
cubemap, per-face update) and lights/ibl.rs (prefiltered specular env +
irradiance cubemaps + BRDF LUT). Defaults are solid-color cubemaps exactly
like the reference builder (`Environment::new(Skybox colors)`,
`Lights::new(Ibl colors)` — lib.rs:297-312).

TPU representation: cubemaps are (6, S, S, 4) f32 arrays. The prefiltered
specular chain is stored as (N_SPEC_MIPS, 6, S, S, 4) with every roughness
level kept at full S resolution — memory is trivial at S=64 and uniform
indexing keeps the shading gather path branch-free.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

F = np.float32

SKYBOX_SIZE = 64
SPEC_SIZE = 64
N_SPEC_MIPS = 5
IRRADIANCE_SIZE = 16


def solid_cubemap(color, size: int) -> np.ndarray:
    c = np.asarray(color, dtype=F)
    if c.shape[0] == 3:
        c = np.concatenate([c, [1.0]]).astype(F)
    return np.broadcast_to(c, (6, size, size, 4)).copy()


class Environment:
    def __init__(self, skybox_color=(0.1, 0.1, 0.12), ibl_color=(1.0, 1.0, 1.0),
                 ibl_intensity: float = 1.0):
        self.skybox = solid_cubemap(skybox_color, SKYBOX_SIZE)
        # prefiltered specular: solid color at every roughness level
        self.prefiltered = np.broadcast_to(
            solid_cubemap(np.asarray(ibl_color, F) * ibl_intensity, SPEC_SIZE),
            (N_SPEC_MIPS, 6, SPEC_SIZE, SPEC_SIZE, 4),
        ).copy()
        self.irradiance = solid_cubemap(np.asarray(ibl_color, F) * ibl_intensity, IRRADIANCE_SIZE)
        self.ibl_intensity = ibl_intensity
        self.gpu_dirty = True

    def set_skybox_cubemap(self, faces: np.ndarray) -> None:
        """faces: (6, S, S, 3|4) linear float. Reference: environment.rs
        update_skybox_all_faces."""
        faces = np.asarray(faces, dtype=F)
        if faces.shape[-1] == 3:
            faces = np.concatenate([faces, np.ones((*faces.shape[:-1], 1), F)], axis=-1)
        self.skybox = faces
        self.gpu_dirty = True

    def set_ibl_from_cubemap(self, env_faces: np.ndarray) -> None:
        """Build prefiltered + irradiance maps from an environment cubemap.

        Host-side cosine/GGX-ish prefiltering via progressive blurring —
        the reference loads these pre-baked from KTX2 (lights/ibl.rs); we
        synthesize them. Uses simple repeated box filtering per mip as a
        GGX approximation (adequate for parity-level IBL).
        """
        import cv2

        env_faces = np.asarray(env_faces, dtype=F)
        if env_faces.shape[-1] == 3:
            env_faces = np.concatenate(
                [env_faces, np.ones((*env_faces.shape[:-1], 1), F)], axis=-1
            )
        S = SPEC_SIZE
        base = np.stack([
            cv2.resize(f, (S, S), interpolation=cv2.INTER_AREA) for f in env_faces
        ])
        mips = [base]
        cur = base
        for _ in range(1, N_SPEC_MIPS):
            blurred = np.stack([cv2.GaussianBlur(f, (0, 0), sigmaX=2.0) for f in cur])
            cur = blurred
            mips.append(cur)
        self.prefiltered = np.stack(mips)
        irr = np.stack([
            cv2.resize(
                cv2.GaussianBlur(f, (0, 0), sigmaX=8.0), (IRRADIANCE_SIZE, IRRADIANCE_SIZE),
                interpolation=cv2.INTER_AREA,
            )
            for f in mips[-1]
        ])
        self.irradiance = irr
        self.gpu_dirty = True
