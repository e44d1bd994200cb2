"""Profiler-trace helpers: device-time attribution without host syncs.

On this environment's tunneled TPU runtime, wall-clock timing requires a
device->host fetch to synchronize — and the FIRST fetch of a process can
stall for 10-25 minutes (CLAUDE.md). ``jax.profiler.trace`` is the one
measurement channel that does NOT ride the data path: dispatched programs
are timed by the backend profiler and written to a local xplane.pb, so a
program's device-time envelope is measurable even while the data path is
stalled. bench.py uses this for its provisional headline (VERDICT r4
item 1); the r3/r4 evidence suites used the same parse for attribution.

The xplane converter that ships with this TF build is broken against the
installed protobuf; parse the raw xplane.pb instead (requires
PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python — set it before importing
tensorflow, see _xplane_pb2).
"""
import glob
import os
from collections import defaultdict


def _xplane_pb2():
    os.environ.setdefault('PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION', 'python')
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    return xplane_pb2


def _load_xspace(logdir):
    paths = sorted(glob.glob(os.path.join(logdir, '**', '*.xplane.pb'),
                             recursive=True))
    if not paths:
        return None
    xs = _xplane_pb2().XSpace()
    with open(paths[-1], 'rb') as f:
        xs.ParseFromString(f.read())
    return xs


def plane_event_totals(plane):
    """-> {event_name: [total_ms, count]} for one xplane plane."""
    emeta = {mm.id: mm.name for mm in plane.event_metadata.values()}
    tot = defaultdict(lambda: [0.0, 0])
    for line in plane.lines:
        for ev in line.events:
            nm = emeta.get(ev.metadata_id, '?')
            tot[nm][0] += ev.duration_ps / 1e9
            tot[nm][1] += 1
    return tot


def program_envelope_ms(logdir, fn_name):
    """Per-execution device-time envelope of jit fn ``fn_name`` in a trace.

    Returns (per_exec_ms, count) or None if the trace has no matching
    events. Matches the TPU device plane's 'jit_<fn>' module events, or
    the CPU host plane's 'PjitFunction(<fn>)' events (the CPU backend has
    no separate device plane). A plane has MULTIPLE lines (module events
    appear on e.g. both a step line and an XLA-modules line, with
    different span semantics), so aggregate PER LINE and report the line
    with the largest total — that is the full module envelope; total /
    count so runs still in flight at trace stop don't skew the average."""
    xs = _load_xspace(logdir)
    if xs is None:
        return None

    def match(nm, is_tpu):
        if is_tpu:
            t0 = f'jit_{fn_name}'
            return nm == t0 or nm.startswith(t0 + '.')
        return nm == f'PjitFunction({fn_name})'

    best = None
    for plane in xs.planes:
        is_tpu = 'TPU' in plane.name
        if not is_tpu and plane.name != '/host:CPU':
            continue
        emeta = {mm.id: mm.name for mm in plane.event_metadata.values()}
        plane_best = None
        for line in plane.lines:
            spans = [(ev.offset_ps, ev.offset_ps + ev.duration_ps)
                     for ev in line.events
                     if match(emeta.get(ev.metadata_id, '?'), is_tpu)]
            if not spans:
                continue
            # Merge overlapping instances before summing: some lines carry
            # enqueue-to-finish spans, and with >1 execution in flight
            # (e.g. chained train steps) those overlap — summing raw
            # durations double-counts queue wait (the r5 train probe read
            # 192.7 ms/step off such a line while the chained wall said
            # 79.4; runs/train-probe-r5.json). The merged union is the
            # true busy envelope either way.
            spans.sort()
            ms, cur0, cur1 = 0.0, *spans[0]
            for s0, s1 in spans[1:]:
                if s0 > cur1:
                    ms += (cur1 - cur0) / 1e9
                    cur0, cur1 = s0, s1
                else:
                    cur1 = max(cur1, s1)
            ms += (cur1 - cur0) / 1e9
            cnt = len(spans)
            if plane_best is None or ms > plane_best[2]:
                plane_best = (ms / cnt, cnt, ms)
        if plane_best:
            cand = plane_best[:2]
            if is_tpu:                 # prefer the TPU device plane
                return cand
            best = best or cand
    return best


def op_class_breakdown(logdir):
    """Per-class device-time totals {class: ms} for the newest trace's TPU
    plane (the suite19-style attribution): matmul/conv, pallas,
    copy/layout, fusion, other — plus 'program_ms' (the largest jit_*
    envelope) and 'top_ops' (the 30 largest ops)."""
    xs = _load_xspace(logdir)
    if xs is None:
        return None
    out = None
    for plane in xs.planes:
        if 'TPU' not in plane.name:
            continue
        tot = plane_event_totals(plane)

        def klass(nm):
            if 'convolution' in nm or 'dot' in nm:
                return 'matmul/conv'
            if 'custom-call' in nm or 'tpu_custom_call' in nm:
                return 'pallas'
            if 'copy' in nm or 'transpose' in nm:
                return 'copy/layout'
            if 'fusion' in nm:
                return 'fusion'
            return 'other'

        by_class = defaultdict(float)
        prog_ms = 0.0
        for nm, (ms, n) in tot.items():
            if nm.startswith('jit_'):
                prog_ms = max(prog_ms, ms)
                continue
            by_class[klass(nm)] += ms
        top = [(round(ms, 3), n, nm[:140]) for nm, (ms, n)
               in sorted(tot.items(), key=lambda kv: -kv[1][0])[:30]
               if not nm.startswith('jit_')]
        out = {'program_ms': round(prog_ms, 3),
               **{k: round(v, 3) for k, v in by_class.items()},
               'top_ops': top}
    return out
