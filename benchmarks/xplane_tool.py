"""Minimal xplane.pb reader: aggregate TPU op durations from a
jax.profiler trace without tensorboard (the installed
tensorboard_plugin_profile is ABI-incompatible with the baked-in
protobuf/TF; we parse the XSpace proto directly instead).

Usage:
    PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
        python benchmarks/xplane_tool.py /tmp/jaxprof [top_n]
"""

import collections
import glob
import sys


def load_xspace(logdir):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True))
    if not paths:
        raise FileNotFoundError(f"no .xplane.pb under {logdir}")
    xs = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        xs.ParseFromString(f.read())
    return xs


def tpu_op_totals(xs, line_filter=None):
    """Return {line_name: {op_name: (total_ps, count)}} for device planes."""
    out = {}
    for plane in xs.planes:
        if "TPU" not in plane.name:
            continue
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        for line in plane.lines:
            if line_filter and line_filter not in line.name:
                continue
            agg = collections.defaultdict(lambda: [0, 0])
            for ev in line.events:
                name = ev_meta.get(ev.metadata_id, str(ev.metadata_id))
                agg[name][0] += ev.duration_ps
                agg[name][1] += 1
            out[f"{plane.name}/{line.name}"] = {
                k: (v[0], v[1]) for k, v in agg.items()
            }
    return out


def main():
    logdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jaxprof"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    xs = load_xspace(logdir)
    for line_name, ops in tpu_op_totals(xs).items():
        total_ms = sum(v[0] for v in ops.values()) / 1e9
        print(f"\n== {line_name}  (sum {total_ms:.2f} ms, {len(ops)} distinct ops)")
        ranked = sorted(ops.items(), key=lambda kv: -kv[1][0])[:top_n]
        for name, (ps, cnt) in ranked:
            print(f"  {ps/1e9:9.3f} ms  x{cnt:<6} {name[:110]}")


if __name__ == "__main__":
    main()
