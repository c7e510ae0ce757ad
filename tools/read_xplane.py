"""Summarize a jax.profiler xplane.pb: top device ops by total time.

Usage: python tools/read_xplane.py /tmp/jaxprof [N]
Needs the tensorflow tsl xplane proto (baked in this image).
"""
import collections
import glob
import sys

from tensorflow.tsl.profiler.protobuf import xplane_pb2


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jaxprof"
    topn = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    paths = sorted(glob.glob(f"{root}/plugins/profile/*/*.xplane.pb"))
    if not paths:
        sys.exit(f"no xplane.pb under {root}")
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(paths[-1], "rb").read())
    for plane in xs.planes:
        if "TPU" not in plane.name and "/device" not in plane.name.lower():
            continue
        ev_meta = plane.event_metadata
        for line in plane.lines:
            stats = collections.Counter()
            counts = collections.Counter()
            total = 0
            for ev in line.events:
                name = ev_meta[ev.metadata_id].name
                dur = ev.duration_ps / 1e9  # -> ms
                stats[name] += dur
                counts[name] += 1
                total += dur
            if not stats:
                continue
            print(f"== {plane.name} :: line '{line.name}' "
                  f"(total {total:.1f} ms; async lines overlap)")
            for name, ms in stats.most_common(topn):
                print(f"   {ms:9.2f} ms  x{counts[name]:<5d} {name[:100]}")
            print()


if __name__ == "__main__":
    main()
