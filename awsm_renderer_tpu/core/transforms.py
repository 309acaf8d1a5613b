"""Scene-graph transform store.

Mirrors reference behavior: crates/renderer/src/transforms.rs
(local TRS + parent/child maps; `update_world()` propagates dirty subtrees;
world matrices and normal matrices land in two storage buffers). Here the
"storage buffers" are capacity-padded numpy mirrors uploaded to device
arrays by the scene flush; keys are SlotAllocator keys (row indices into
those arrays), the analog of `TransformKey`.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Set

import numpy as np

from ..utils.allocator import SlotAllocator
from ..utils import math3d as m3

F = np.float32


@dataclass
class Transform:
    """Local TRS (reference: transforms.rs:458 `Transform` struct)."""

    translation: np.ndarray = field(default_factory=lambda: np.zeros(3, dtype=F))
    rotation: np.ndarray = field(default_factory=m3.quat_identity)  # quat xyzw
    scale: np.ndarray = field(default_factory=lambda: np.ones(3, dtype=F))

    @staticmethod
    def from_matrix(m: np.ndarray) -> "Transform":
        t, r, s = m3.mat4_decompose(np.asarray(m, dtype=F))
        return Transform(t, r, s)

    def to_matrix(self) -> np.ndarray:
        return m3.trs_to_mat4(self.translation, self.rotation, self.scale)


class Transforms:
    def __init__(self, initial_capacity: int = 64):
        self._alloc = SlotAllocator(initial_capacity)
        self._resize(initial_capacity)
        self._local: Dict[int, Transform] = {}
        self._parent: Dict[int, Optional[int]] = {}
        self._children: Dict[int, List[int]] = {}
        self._dirty: Set[int] = set()  # keys whose local changed (roots of dirty subtrees)
        self.gpu_dirty = True  # whole-array upload flag for the scene flush

    def _resize(self, capacity: int) -> None:
        self.world = np.tile(np.eye(4, dtype=F), (capacity, 1, 1))
        self.normal = np.tile(np.eye(3, dtype=F), (capacity, 1, 1))

    # -- public API (mirrors transforms.rs insert/set_local/set_parent) -----

    def insert(self, transform: Optional[Transform] = None, parent: Optional[int] = None) -> int:
        key = self._alloc.insert()
        if self._alloc.take_needs_resize():
            old_world, old_normal = self.world, self.normal
            self._resize(self._alloc.capacity)
            self.world[: old_world.shape[0]] = old_world
            self.normal[: old_normal.shape[0]] = old_normal
        self._local[key] = transform or Transform()
        self._parent[key] = parent
        self._children[key] = []
        if parent is not None:
            self._children[parent].append(key)
        self._dirty.add(key)
        return key

    def remove(self, key: int) -> None:
        for child in list(self._children.get(key, [])):
            self.remove(child)
        parent = self._parent.pop(key, None)
        if parent is not None and parent in self._children:
            self._children[parent].remove(key)
        self._children.pop(key, None)
        self._local.pop(key, None)
        self._dirty.discard(key)
        self._alloc.remove(key)

    def set_local(self, key: int, transform: Transform) -> None:
        self._local[key] = transform
        self._dirty.add(key)

    def get_local(self, key: int) -> Transform:
        return self._local[key]

    def set_translation(self, key: int, t) -> None:
        self._local[key].translation = np.asarray(t, dtype=F)
        self._dirty.add(key)

    def set_rotation(self, key: int, q) -> None:
        self._local[key].rotation = np.asarray(q, dtype=F)
        self._dirty.add(key)

    def set_scale(self, key: int, s) -> None:
        self._local[key].scale = np.asarray(s, dtype=F)
        self._dirty.add(key)

    def set_parent(self, key: int, parent: Optional[int]) -> None:
        old = self._parent.get(key)
        if old is not None and old in self._children:
            self._children[old].remove(key)
        self._parent[key] = parent
        if parent is not None:
            self._children[parent].append(key)
        self._dirty.add(key)

    def row_of(self, key: int) -> int:
        return self._alloc.row_of(key)

    @property
    def capacity(self) -> int:
        return self._alloc.capacity

    def world_of(self, key: int) -> np.ndarray:
        return self.world[self._alloc.row_of(key)]

    # -- per-frame update (mirrors transforms.rs:244 update_world) ----------

    def update_world(self) -> Set[int]:
        """Propagate dirty local transforms down their subtrees.

        Returns the set of keys whose world matrix changed this frame.
        """
        if not self._dirty:
            return set()
        changed: Set[int] = set()

        # collect unique dirty subtree roots (skip keys with a dirty ancestor)
        def has_dirty_ancestor(k: int) -> bool:
            p = self._parent.get(k)
            while p is not None:
                if p in self._dirty:
                    return True
                p = self._parent.get(p)
            return False

        roots = [k for k in self._dirty if not has_dirty_ancestor(k)]
        stack = list(roots)
        while stack:
            k = stack.pop()
            p = self._parent.get(k)
            local = self._local[k].to_matrix()
            if p is not None:
                world = self.world[self._alloc.row_of(p)] @ local
            else:
                world = local
            row = self._alloc.row_of(k)
            self.world[row] = world
            self.normal[row] = m3.normal_matrix(world)
            changed.add(k)
            stack.extend(self._children.get(k, []))
        self._dirty.clear()
        if changed:
            self.gpu_dirty = True
        return changed
