"""Profile the production 1080p stress frame on TPU; dump per-op totals.

Parses the xplane proto directly (the tensorboard converter is broken in
this environment — see .claude/skills/verify/SKILL.md).
"""

from __future__ import annotations

import glob
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax

    from bench import build_stress_scene

    r, tris = build_stress_scene(1920, 1080)
    print(f"# {r.meshes.count} meshes, {tris} tris", file=sys.stderr)

    out = r.render_device()  # warmup/compile
    _ = float(np.asarray(out[0, 0, 0]))

    trace_dir = "/tmp/jax_trace"
    with jax.profiler.trace(trace_dir):
        for _ in range(4):
            out = r.render_device()
        _ = float(np.asarray(out[0, 0, 0]))
    time.sleep(2)

    pbs = sorted(glob.glob(trace_dir + "/**/*.xplane.pb", recursive=True))
    assert pbs, "no xplane written"
    parse(pbs[-1], n_frames=4)


def parse(pb, n_frames):
    from collections import defaultdict

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(pb, "rb").read())
    for p in xs.planes:
        if "TPU" not in p.name:
            continue
        ev = {i: m.name for i, m in p.event_metadata.items()}
        agg = defaultdict(float)
        cnt = defaultdict(int)
        for line in p.lines:
            for e in line.events:
                name = ev.get(e.metadata_id, "?")
                agg[name] += e.duration_ps / 1e9
                cnt[name] += 1
        total = sum(agg.values())
        print(f"== plane {p.name}: {total:.1f} ms total / {n_frames} frames")
        for name, ms in sorted(agg.items(), key=lambda kv: -kv[1])[:45]:
            print(f"  {ms/n_frames:8.2f} ms  x{cnt[name]//n_frames:<4d} {name[:150]}")


if __name__ == "__main__":
    import os
    if len(sys.argv) > 1 and os.path.exists(sys.argv[1]):
        parse(sys.argv[1], n_frames=int(sys.argv[2]) if len(sys.argv) > 2 else 4)
    else:
        main()
