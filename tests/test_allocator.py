"""Allocator tests — ported behaviors from the reference's unit suites:
dynamic_uniform.rs:291+ (slot reuse, growth, dirty ranges) and
dynamic_storage.rs (buddy alloc/free/coalesce/grow/offsets)."""

import pytest

from awsm_renderer_tpu.utils.allocator import (
    AllocatorError,
    BuddyAllocator,
    SlotAllocator,
)


class TestSlotAllocator:
    def test_insert_sequential_rows(self):
        a = SlotAllocator(4)
        keys = [a.insert() for _ in range(4)]
        assert sorted(a.row_of(k) for k in keys) == [0, 1, 2, 3]
        assert a.count == 4

    def test_slot_reuse_after_remove(self):
        a = SlotAllocator(4)
        keys = [a.insert() for _ in range(4)]
        freed_row = a.remove(keys[1])
        k_new = a.insert()
        assert a.row_of(k_new) == freed_row

    def test_growth_doubles_and_signals_resize(self):
        a = SlotAllocator(2)
        a.insert(), a.insert()
        assert not a.take_needs_resize()
        a.insert()
        assert a.capacity == 4
        assert a.take_needs_resize()
        assert not a.take_needs_resize()  # drained

    def test_stale_key_raises(self):
        a = SlotAllocator(2)
        k = a.insert()
        a.remove(k)
        with pytest.raises(AllocatorError):
            a.row_of(k)

    def test_keys_never_reused(self):
        a = SlotAllocator(2)
        k1 = a.insert()
        a.remove(k1)
        k2 = a.insert()
        assert k1 != k2

    def test_dirty_ranges_coalesce(self):
        a = SlotAllocator(8)
        keys = [a.insert() for _ in range(5)]
        a.take_dirty_ranges()  # drain insert dirt
        a.mark_dirty(keys[0])
        a.mark_dirty(keys[1])
        a.mark_dirty(keys[3])
        ranges = a.take_dirty_ranges()
        assert ranges == [(0, 2), (3, 4)]
        assert a.take_dirty_ranges() == []

    def test_dirty_on_insert(self):
        a = SlotAllocator(4)
        a.insert()
        assert a.take_dirty_ranges() == [(0, 1)]


class TestBuddyAllocator:
    def test_round_to_min_block(self):
        b = BuddyAllocator(1024, min_block=256)
        off = b.alloc(1)
        assert b.size_of(off) == 256

    def test_power_of_two_rounding(self):
        b = BuddyAllocator(4096, min_block=256)
        off = b.alloc(300)
        assert b.size_of(off) == 512
        off2 = b.alloc(513)
        assert b.size_of(off2) == 1024

    def test_distinct_offsets(self):
        b = BuddyAllocator(1024, min_block=256)
        offs = [b.alloc(256) for _ in range(4)]
        assert sorted(offs) == [0, 256, 512, 768]

    def test_free_and_coalesce(self):
        b = BuddyAllocator(1024, min_block=256)
        offs = [b.alloc(256) for _ in range(4)]
        for o in offs:
            b.free(o)
        b.check_invariants()
        # after full coalescing, a capacity-sized alloc must succeed at 0
        off = b.alloc(1024)
        assert off == 0
        assert b.capacity == 1024  # no growth needed

    def test_growth_on_exhaustion(self):
        b = BuddyAllocator(512, min_block=256)
        b.alloc(512)
        assert not b.take_needs_resize()
        off = b.alloc(512)
        assert b.capacity == 1024
        assert off == 512
        assert b.take_needs_resize()
        b.check_invariants()

    def test_double_free_raises(self):
        b = BuddyAllocator(512, min_block=256)
        off = b.alloc(256)
        b.free(off)
        with pytest.raises(AllocatorError):
            b.free(off)

    def test_interleaved_alloc_free_invariants(self):
        b = BuddyAllocator(2048, min_block=256)
        import random

        rng = random.Random(42)
        live = []
        for _ in range(200):
            if live and rng.random() < 0.45:
                b.free(live.pop(rng.randrange(len(live))))
            else:
                live.append(b.alloc(rng.randrange(1, 900)))
            b.check_invariants()
        for o in live:
            b.free(o)
        b.check_invariants()

    def test_internal_fragmentation_bound(self):
        # power-of-2 rounding guarantees <= 50% waste (reference doc claim)
        b = BuddyAllocator(8192, min_block=256)
        for size in [257, 300, 511, 513, 1000, 1025]:
            off = b.alloc(size)
            assert b.size_of(off) < 2 * max(size, 256)
