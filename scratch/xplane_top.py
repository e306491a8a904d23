"""Summarize an XPlane trace (jax.profiler.start_trace output): total
device time per op name on the TPU device plane, descending.

Usage:
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
  PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
  python scratch/xplane_top.py /tmp/steptrace [top_n]

(pure-python protobuf parsing of the .xplane.pb; needs no tensorboard
frontend.  The grouping strips the XLA fusion-id suffixes so repeated
instances of the same kernel aggregate.)
"""
import glob
import re
import sys
from collections import defaultdict

from tensorflow.tsl.profiler.protobuf import xplane_pb2

path = sys.argv[1]
top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 60

files = sorted(glob.glob(path + "/**/*.xplane.pb", recursive=True))
assert files, f"no .xplane.pb under {path}"
print(f"parsing {files[-1]}")
xs = xplane_pb2.XSpace()
with open(files[-1], "rb") as f:
    xs.ParseFromString(f.read())

for plane in xs.planes:
    if "TPU" not in plane.name and "Device" not in plane.name:
        continue
    evmeta = {m.id: m.name for m in plane.event_metadata.values()}
    agg = defaultdict(float)
    cnt = defaultdict(int)
    total = 0.0
    for line in plane.lines:
        lname = line.name.lower()
        # keep only compute/step lines, skip host-side bookkeeping lines
        for ev in line.events:
            name = evmeta.get(ev.metadata_id, "?")
            dur = ev.duration_ps / 1e9  # ms
            key = re.sub(r"\.\d+", "", name)
            agg[(lname, key)] += dur
            cnt[(lname, key)] += 1
            total += dur
    if not agg:
        continue
    print(f"\n=== plane: {plane.name} (sum over lines {total:.1f} ms) ===")
    by_line = defaultdict(float)
    for (lname, k), v in agg.items():
        by_line[lname] += v
    for lname, v in sorted(by_line.items(), key=lambda kv: -kv[1]):
        print(f"  line {lname}: {v:.2f} ms")
    print(f"--- top {top_n} ops ---")
    for (lname, k), v in sorted(agg.items(), key=lambda kv: -kv[1])[:top_n]:
        print(f"{v:9.3f} ms x{cnt[(lname,k)]:4d}  [{lname[:18]:18s}] {k[:110]}")
