"""Camera state.

Mirrors reference behavior: crates/renderer/src/camera.rs (512-byte uniform
with view/proj/view-proj + inverses, camera position, frame count, frustum
corner rays, viewport, DoF params; epsilon-based camera_moved detection).
Here the uniform is a small pytree of f32 arrays assembled at flush.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np

F = np.float32
_EPS = 1e-6


@dataclass
class DofParams:
    """Reference: camera.rs dof fields. `aperture` is the f-stop number
    (dof.wgsl calculate_coc: 'e.g., 2.8, 5.6, 8.0 — lower = shallower')."""

    focus_distance: float = 10.0
    aperture: float = 5.6


class CameraState:
    def __init__(self):
        self.view = np.eye(4, dtype=F)
        self.projection = np.eye(4, dtype=F)
        self.position = np.zeros(3, dtype=F)
        self.frame_count = 0
        self.dof = DofParams()
        self.gpu_dirty = True
        self._moved = True

    def update(self, view: np.ndarray, projection: np.ndarray,
               position: Optional[np.ndarray] = None) -> None:
        """Reference: camera.rs:111 `update` with moved-epsilon check."""
        from ..errors import CameraError

        view = np.asarray(view, dtype=F)
        projection = np.asarray(projection, dtype=F)
        if view.shape != (4, 4) or projection.shape != (4, 4):
            raise CameraError(
                f"view/projection must be 4x4 matrices, got {view.shape} "
                f"and {projection.shape}")
        if not (np.isfinite(view).all() and np.isfinite(projection).all()):
            raise CameraError("view/projection contain non-finite values")
        moved = (
            np.abs(view - self.view).max() > _EPS
            or np.abs(projection - self.projection).max() > _EPS
        )
        self._moved = bool(moved)
        if moved:
            self.view = view
            self.projection = projection
            if position is not None:
                self.position = np.asarray(position, dtype=F)
            else:
                # derive eye position from inverse view
                try:
                    inv = np.linalg.inv(view.astype(np.float64))
                except np.linalg.LinAlgError:
                    raise CameraError("view matrix is singular") from None
                self.position = inv[:3, 3].astype(F)
            self.gpu_dirty = True

    @property
    def moved(self) -> bool:
        return self._moved

    @property
    def view_projection(self) -> np.ndarray:
        return (self.projection @ self.view).astype(F)

    def next_frame(self) -> None:
        self.frame_count += 1

    def packed(self) -> dict:
        """Device-facing dict of arrays (the '512-byte uniform')."""
        vp = self.view_projection
        inv_vp = np.linalg.inv(vp.astype(np.float64)).astype(F)
        inv_view = np.linalg.inv(self.view.astype(np.float64)).astype(F)
        inv_proj = np.linalg.inv(self.projection.astype(np.float64)).astype(F)
        return {
            "view": self.view,
            "proj": self.projection,
            "view_proj": vp,
            "inv_view": inv_view,
            "inv_proj": inv_proj,
            "inv_view_proj": inv_vp,
            "position": self.position,
            "dof": np.array([self.dof.focus_distance, self.dof.aperture], dtype=F),
        }
