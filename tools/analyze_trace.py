"""Aggregate a jax.profiler xplane trace into per-op and per-category device
time (the tensorboard profile plugin's converters segfault in this image, so
this parses the XSpace proto directly — tools/xplane.proto, compiled with
protoc).

    python tools/analyze_trace.py <trace_dir_or_xplane.pb> [top_n]

Capture a trace with:
    with jax.profiler.trace("/tmp/jaxtrace"):
        ... run the jitted workload a few times ...
"""

import collections
import glob
import os
import re
import sys

sys.path.insert(0, os.path.dirname(__file__))
import xplane_pb2  # noqa: E402


def load(path: str):
    if os.path.isdir(path):
        files = glob.glob(os.path.join(path, "**", "*.xplane.pb"), recursive=True)
        if not files:
            raise SystemExit(f"no xplane.pb under {path}")
        path = files[0]
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(path, "rb").read())
    return xs


def main():
    xs = load(sys.argv[1] if len(sys.argv) > 1 else "/tmp/jaxtrace")
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    # device planes: TPU planes normally; fall back to host-CPU device
    # planes (virtual-mesh runs) when no TPU plane exists
    names = [p.name for p in xs.planes]
    want = [n for n in names if "TPU" in n]
    if not want:
        want = [n for n in names if "/device:CPU" in n or "Host Threads" in n]
    for plane in xs.planes:
        if plane.name not in want:
            continue
        em = plane.event_metadata
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            total = collections.Counter()
            for ev in line.events:
                total[em[ev.metadata_id].name] += ev.duration_ps
            print(f"== {plane.name} / {line.name}: "
                  f"{sum(total.values()) / 1e9:.2f} ms total")
            cats = collections.Counter()
            for n, d in total.items():
                m = re.match(r"%([a-zA-Z_\.]+)", n)
                key = re.sub(r"\.\d+$", "", m.group(1).rstrip(".")) if m else n[:24]
                cats[key] += d
            print("-- by category:")
            for n, d in cats.most_common(15):
                print(f"  {d / 1e9:8.2f} ms  {n}")
            print("-- top ops:")
            for n, d in total.most_common(top_n):
                print(f"  {d / 1e9:8.2f} ms  {n[:110]}")


if __name__ == "__main__":
    main()
