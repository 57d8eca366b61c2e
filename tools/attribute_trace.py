"""Attribute xplane device time to model components by joining the trace's
op names with the op_name metadata in a dumped optimized-HLO text.

    python tools/attribute_trace.py <xplane.pb> <hlo.txt> [depth]

Groups op_name paths like
  jit(pipeline)/VideoSaliencyModel.encode_visual/visual_net/blocks_3/...
at the given path depth (default 3).
"""

import collections
import re
import sys
import os

sys.path.insert(0, os.path.dirname(__file__))
from analyze_trace import load  # noqa: E402


def trace_ops(xs):
    """[(instruction_name, total_ms)] from the XSpace's TPU XLA Ops line."""
    total = collections.Counter()
    for plane in xs.planes:
        if "TPU" not in plane.name:
            continue
        em = plane.event_metadata
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                total[em[ev.metadata_id].name] += ev.duration_ps
    out = []
    for text, ps in total.items():
        m = re.match(r"%(\S+) =", text)
        out.append((m.group(1) if m else text, ps / 1e9))
    return out


def main():
    xplane, hlo_path = sys.argv[1], sys.argv[2]
    depth = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    # op name -> op_name metadata from the HLO text
    meta = {}
    pat = re.compile(r"%([a-zA-Z0-9_.-]+) = .*?op_name=\"([^\"]+)\"")
    with open(hlo_path) as f:
        for ln in f:
            m = pat.search(ln)
            if m:
                meta[m.group(1)] = m.group(2)

    ops = trace_ops(load(xplane))  # [(name, total_ms)]
    groups = collections.defaultdict(float)
    unattributed = 0.0
    total = 0.0
    for name, ms in ops:
        total += ms
        path = meta.get(name)
        if path is None:
            unattributed += ms
            groups[f"<no-meta> {name.split('.')[0]}"] += ms
            continue
        parts = path.split("/")
        groups["/".join(parts[1:depth])] += ms
    print(f"total {total:.2f} ms  (unattributed {unattributed:.2f})")
    for k, v in sorted(groups.items(), key=lambda kv: -kv[1]):
        if v < total * 0.003:
            continue
        print(f"  {v:9.2f} ms  {k}")


if __name__ == "__main__":
    main()
