"""Per-line (execution unit) breakdown of an xplane trace: the TensorCore
op stream serializes on its own line, async DMA queues on others — so
per-line sums separate real compute from overlapped copies.

Usage: python scripts/profile_lines.py <xplane.pb> [n_frames]
"""

from __future__ import annotations

import sys
from collections import defaultdict

from tensorflow.tsl.profiler.protobuf import xplane_pb2


def main(pb, n_frames):
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(pb, "rb").read())
    for p in xs.planes:
        if "TPU" not in p.name:
            continue
        ev = {i: m.name for i, m in p.event_metadata.items()}
        print(f"== plane {p.name}")
        for line in p.lines:
            agg = defaultdict(float)
            cnt = defaultdict(int)
            span_lo, span_hi = None, None
            for e in line.events:
                name = ev.get(e.metadata_id, "?")
                agg[name] += e.duration_ps / 1e9
                cnt[name] += 1
                lo = e.offset_ps
                hi = e.offset_ps + e.duration_ps
                span_lo = lo if span_lo is None else min(span_lo, lo)
                span_hi = hi if span_hi is None else max(span_hi, hi)
            total = sum(agg.values())
            if total < 0.5:
                continue
            span = (span_hi - span_lo) / 1e9 if span_lo is not None else 0
            print(f"-- line '{line.name}' ({line.id}): {total/n_frames:.2f} "
                  f"ms/frame busy, span {span/n_frames:.2f} ms/frame, "
                  f"{len(line.events)} events")
            for name, ms in sorted(agg.items(), key=lambda kv: -kv[1])[:25]:
                print(f"   {ms/n_frames:8.2f} ms x{cnt[name]/n_frames:<6.1f}"
                      f" {name[:140]}")


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 4)
