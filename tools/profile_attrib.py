"""Attribute xplane device-op time to source lines via the HLO dump.

Joins ``tools/read_xplane.py``-style op totals with the op metadata in a
compiled HLO text dump (``jax.jit(...).lower().compile().as_text()``):
for every device op, finds its ``metadata={... source_file= source_line=}``
and aggregates total ms per source location. The long tail of sub-ms
fusions is invisible in a top-N list but adds up to ~15 ms/frame — this
makes it actionable.

Usage: python tools/profile_attrib.py /tmp/jaxprof /tmp/frame_hlo.txt \
           [topN] [frames]

``frames``: per-frame numbers divide by this (default: the max op
execution count, which overcounts for ops that run several times per
frame — pass the real frame count of the profiled loop).
"""
import collections
import glob
import re
import sys

from tensorflow.tsl.profiler.protobuf import xplane_pb2


def load_op_times(root):
    paths = sorted(glob.glob(f"{root}/plugins/profile/*/*.xplane.pb"))
    if not paths:
        sys.exit(f"no xplane.pb under {root}")
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(paths[-1], "rb").read())
    stats = collections.Counter()
    runs = collections.Counter()
    for plane in xs.planes:
        if "TPU" not in plane.name:
            continue
        ev_meta = plane.event_metadata
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                name = ev_meta[ev.metadata_id].name
                # strip to the HLO instruction name: "%fusion.123 = ..."
                m = re.match(r"%([\w.\-]+)", name)
                op = m.group(1) if m else name
                stats[op] += ev.duration_ps / 1e9
                runs[op] += 1
    return stats, runs


def load_hlo_meta(path):
    meta = {}
    pat = re.compile(
        r"%([\w.\-]+) = .*?metadata=\{[^}]*?"
        r'(?:op_name="([^"]*)")?[^}]*?'
        r'source_file="([^"]*)"[^}]*?source_line=(\d+)')
    for line in open(path):
        m = pat.search(line)
        if m:
            op, op_name, f, ln = m.groups()
            meta.setdefault(op, (f, int(ln), op_name or ""))
    return meta


def main():
    prof = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jaxprof"
    hlo = sys.argv[2] if len(sys.argv) > 2 else "/tmp/frame_hlo.txt"
    topn = int(sys.argv[3]) if len(sys.argv) > 3 else 40
    stats, runs = load_op_times(prof)
    meta = load_hlo_meta(hlo)
    nframes = int(sys.argv[4]) if len(sys.argv) > 4 else \
        (max(runs.values()) if runs else 1)
    by_src = collections.Counter()
    unattributed = 0.0
    for op, ms in stats.items():
        if op in meta:
            f, ln, _ = meta[op]
            short = f.split("/dust_tpu/")[-1] if "/dust_tpu/" in f else f
            by_src[f"{short}:{ln}"] += ms
        else:
            key = re.sub(r"\.\d+$", "", op)
            by_src[f"<{key}>"] += ms
    total = sum(stats.values())
    print(f"total device {total:.1f} ms over ~{nframes} executions "
          f"({total / nframes:.2f} ms/exec)")
    for src, ms in by_src.most_common(topn):
        print(f"  {ms / nframes:7.3f} ms/exec  {src}")


if __name__ == "__main__":
    main()
