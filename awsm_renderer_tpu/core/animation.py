"""CPU-side animation system: players, clips, samplers.

Mirrors reference behavior: crates/renderer/src/animation/
(animations.rs `Animations`/`update_animations`, player.rs:7-105
`AnimationPlayer` state machine, interpolate.rs:6-117 Linear/Step/
CubicSpline over Vec3/Quat/scalar/weights, data.rs channel targets).
Samplers are vectorized numpy over keyframe tables; per-frame output is
applied to transform keys and mesh morph weights.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Union

import numpy as np

from ..utils import math3d as m3

F = np.float32


class Interpolation(enum.Enum):
    LINEAR = "LINEAR"
    STEP = "STEP"
    CUBIC_SPLINE = "CUBICSPLINE"


class TargetPath(enum.Enum):
    TRANSLATION = "translation"
    ROTATION = "rotation"
    SCALE = "scale"
    WEIGHTS = "weights"


class LoopStyle(enum.Enum):
    """Reference: player.rs loop styles."""

    ONCE = 0
    LOOP = 1
    PING_PONG = 2


@dataclass
class AnimationSampler:
    """Keyframe sampler (reference: interpolate.rs)."""

    times: np.ndarray        # (K,) f32, ascending
    values: np.ndarray       # (K, D) — or (K, 3, D) for cubic spline (in-tangent, value, out-tangent)
    interpolation: Interpolation = Interpolation.LINEAR

    def __post_init__(self):
        self.times = np.asarray(self.times, dtype=F).reshape(-1)
        self.values = np.asarray(self.values, dtype=F)

    @property
    def duration(self) -> float:
        return float(self.times[-1]) if len(self.times) else 0.0

    def sample(self, t: float, is_rotation: bool = False) -> np.ndarray:
        times = self.times
        K = len(times)
        if K == 0:
            raise ValueError("empty sampler")
        if K == 1 or t <= times[0]:
            v = self.values[0]
            return v[1] if self.interpolation == Interpolation.CUBIC_SPLINE else v
        if t >= times[-1]:
            v = self.values[-1]
            return v[1] if self.interpolation == Interpolation.CUBIC_SPLINE else v
        i = int(np.searchsorted(times, t, side="right")) - 1
        i = min(i, K - 2)
        t0, t1 = float(times[i]), float(times[i + 1])
        dt = max(t1 - t0, 1e-9)
        u = (t - t0) / dt

        if self.interpolation == Interpolation.STEP:
            return self.values[i]
        if self.interpolation == Interpolation.CUBIC_SPLINE:
            # values[k] = (in_tangent, value, out_tangent)
            p0 = self.values[i, 1]
            m0 = self.values[i, 2] * dt
            p1 = self.values[i + 1, 1]
            m1 = self.values[i + 1, 0] * dt
            u2, u3 = u * u, u * u * u
            out = (
                (2 * u3 - 3 * u2 + 1) * p0
                + (u3 - 2 * u2 + u) * m0
                + (-2 * u3 + 3 * u2) * p1
                + (u3 - u2) * m1
            )
            if is_rotation:
                out = m3.quat_normalize(out)
            return out.astype(F)
        # LINEAR
        v0, v1 = self.values[i], self.values[i + 1]
        if is_rotation:
            return m3.quat_slerp(v0, v1, u)
        return ((1 - u) * v0 + u * v1).astype(F)


@dataclass
class AnimationChannel:
    sampler: AnimationSampler
    path: TargetPath
    transform_key: Optional[int] = None   # for translation/rotation/scale
    mesh_key: Optional[int] = None        # for weights


@dataclass
class AnimationClip:
    channels: List[AnimationChannel] = field(default_factory=list)
    name: str = ""

    @property
    def duration(self) -> float:
        return max((c.sampler.duration for c in self.channels), default=0.0)


@dataclass
class AnimationPlayer:
    """Playback state machine (reference: player.rs:7-105)."""

    clip: AnimationClip
    speed: float = 1.0
    loop_style: LoopStyle = LoopStyle.LOOP
    playing: bool = True
    time: float = 0.0
    direction: float = 1.0

    def advance(self, dt: float) -> float:
        if not self.playing:
            return self.time
        dur = self.clip.duration
        if dur <= 0:
            return 0.0
        self.time += dt * self.speed * self.direction
        if self.loop_style == LoopStyle.ONCE:
            if self.time >= dur:
                self.time = dur
                self.playing = False
            elif self.time < 0:
                self.time = 0.0
                self.playing = False
        elif self.loop_style == LoopStyle.LOOP:
            self.time %= dur
            if self.time < 0:
                self.time += dur
        else:  # PING_PONG
            if self.time > dur:
                self.time = dur - (self.time - dur)
                self.direction *= -1
            elif self.time < 0:
                self.time = -self.time
                self.direction *= -1
        return self.time


class Animations:
    """Reference: animation/animations.rs:39-120."""

    def __init__(self):
        self._players: Dict[int, AnimationPlayer] = {}
        self._next_key = 1

    def insert(self, player: AnimationPlayer) -> int:
        key = self._next_key
        self._next_key += 1
        self._players[key] = player
        return key

    def get(self, key: int) -> AnimationPlayer:
        return self._players[key]

    def remove(self, key: int) -> None:
        del self._players[key]

    def items(self):
        return self._players.items()

    def update(self, dt: float, transforms, meshes) -> None:
        """Sample all playing clips and apply to targets
        (reference: animations.rs:84 update_animations)."""
        for player in self._players.values():
            if not player.playing and player.time == 0.0:
                continue
            t = player.advance(dt)
            for ch in player.clip.channels:
                if ch.path == TargetPath.WEIGHTS:
                    if ch.mesh_key is not None:
                        from .meshes import MAX_MORPH_TARGETS

                        w = ch.sampler.sample(t)
                        meshes.update_morph_weights(ch.mesh_key, np.atleast_1d(w))
                    continue
                if ch.transform_key is None:
                    continue
                v = ch.sampler.sample(t, is_rotation=(ch.path == TargetPath.ROTATION))
                if ch.path == TargetPath.TRANSLATION:
                    transforms.set_translation(ch.transform_key, v)
                elif ch.path == TargetPath.ROTATION:
                    transforms.set_rotation(ch.transform_key, m3.quat_normalize(v))
                elif ch.path == TargetPath.SCALE:
                    transforms.set_scale(ch.transform_key, v)
