#!/usr/bin/env python3
"""Aggregate per-op device time from a jax.profiler xplane trace.

Usage: python tools/parse_xplane.py /tmp/jaxprof [top_n]

Walks the newest .xplane.pb under the trace dir, finds the TPU device
plane(s), and prints the top ops by total self-duration, grouped by the
HLO op name prefix (fusion.NNN etc.) with their source metadata when
present.  This is how the round-3 roofline numbers in BASELINE.md were
measured — the axon relay delivers real device traces.
"""
import collections
import glob
import os
import sys

from tensorflow.tsl.profiler.protobuf import xplane_pb2


def load_space(trace_dir):
    pbs = sorted(glob.glob(os.path.join(
        trace_dir, '**', '*.xplane.pb'), recursive=True),
        key=os.path.getmtime)
    if not pbs:
        raise SystemExit(f'no .xplane.pb under {trace_dir}')
    space = xplane_pb2.XSpace()
    with open(pbs[-1], 'rb') as f:
        space.ParseFromString(f.read())
    return space, pbs[-1]


def device_planes(space):
    return [p for p in space.planes
            if 'TPU' in p.name or 'Device' in p.name or '/device' in p.name]


def aggregate(plane):
    """Returns {event_name: (total_ps, count)} over all lines."""
    meta = {m.id: m.name for m in plane.event_metadata.values()}
    stats_meta = {m.id: m.name for m in plane.stat_metadata.values()}
    agg = collections.Counter()
    cnt = collections.Counter()
    extra = {}
    for line in plane.lines:
        for ev in line.events:
            name = meta.get(ev.metadata_id, str(ev.metadata_id))
            agg[name] += ev.duration_ps
            cnt[name] += 1
            if name not in extra:
                md = plane.event_metadata[ev.metadata_id]
                st = {}
                for s in md.stats:
                    sname = stats_meta.get(s.metadata_id, '')
                    field = s.WhichOneof('value')
                    v = getattr(s, field) if field else ''
                    if field == 'ref_value':
                        v = stats_meta.get(v, v)
                    if sname in ('hlo_op', 'tf_op', 'hlo_category',
                                 'source', 'equation'):
                        st[sname] = str(v)[:120]
                extra[name] = st
    return agg, cnt, extra


def main():
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else '/tmp/jaxprof'
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    space, path = load_space(trace_dir)
    print(f'# {path}')
    for plane in device_planes(space):
        agg, cnt, extra = aggregate(plane)
        total = sum(agg.values())
        if not total:
            continue
        print(f'\n== plane: {plane.name}  total {total/1e12:.4f} s '
              f'({len(agg)} distinct events)')
        for name, ps in agg.most_common(top_n):
            st = extra.get(name, {})
            cat = st.get('hlo_category', '')
            print(f'{ps/1e12:9.4f} s  x{cnt[name]:<5} {cat:18.18} {name[:90]}')


if __name__ == '__main__':
    main()
