"""Minimal XPlane (.xplane.pb) trace parser — no tensorflow/tensorboard dep.

Reads the protobuf traces produced by ``jax.profiler.start_trace`` and
aggregates per-op device time, giving op-level visibility on TPU without the
tensorboard profile plugin (not installed in this image). Field numbers
follow tsl/profiler/protobuf/xplane.proto:

  XSpace   { repeated XPlane planes = 1; }
  XPlane   { int64 id=1; string name=2; repeated XLine lines=3;
             map<int64,XEventMetadata> event_metadata=4; }
  XLine    { int64 id=1; string name=2; ...; repeated XEvent events=6; }
  XEvent   { int64 metadata_id=1; int64 offset_ps=2; int64 duration_ps=3; }
  XEventMetadata { int64 id=1; string name=2; }
"""
from __future__ import annotations

import glob
import os
from collections import defaultdict
from typing import Dict, Iterator, List, Tuple


class TraceParseError(ValueError):
    """A corrupt/truncated .xplane.pb (profiler killed mid-flush etc.)."""


def _read_varint(buf: bytes, pos: int) -> Tuple[int, int]:
    result = 0
    shift = 0
    while True:
        if pos >= len(buf):
            raise TraceParseError("truncated trace: varint runs off the end")
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _fields(buf: bytes) -> Iterator[Tuple[int, int, object]]:
    """Yield (field_number, wire_type, value) over a protobuf message."""
    pos = 0
    n = len(buf)
    while pos < n:
        tag, pos = _read_varint(buf, pos)
        field, wt = tag >> 3, tag & 7
        if wt == 0:  # varint
            val, pos = _read_varint(buf, pos)
        elif wt == 2:  # length-delimited
            ln, pos = _read_varint(buf, pos)
            val = buf[pos : pos + ln]
            pos += ln
        elif wt == 5:  # 32-bit
            val = buf[pos : pos + 4]
            pos += 4
        elif wt == 1:  # 64-bit
            val = buf[pos : pos + 8]
            pos += 8
        else:
            raise TraceParseError(
                f"unsupported wire type {wt} (corrupt trace byte?)")
        if wt == 2 and pos > n:
            raise TraceParseError("truncated trace: field overruns buffer")
        yield field, wt, val


def _parse_event(buf: bytes) -> Tuple[int, int]:
    mid = dur = 0
    for f, wt, v in _fields(buf):
        # Only VARINT-typed values are meaningful here; a future layout
        # using these numbers for sub-messages must not hand bytes to the
        # accumulators.
        if f == 1 and wt == 0:
            mid = v
        elif f == 3 and wt == 0:
            dur = v
    return mid, dur


def _parse_line(buf: bytes) -> Tuple[str, List[Tuple[int, int]]]:
    name = ""
    events = []
    for f, wt, v in _fields(buf):
        if f == 2 and wt == 2:
            name = v.decode("utf-8", "replace")
        elif f == 4 and wt == 2:  # repeated XEvent (field 4 on this runtime)
            events.append(_parse_event(v))
    return name, events


def _parse_metadata_entry(buf: bytes) -> Tuple[int, str]:
    key = 0
    name = ""
    for f, wt, v in _fields(buf):
        if f == 1 and wt == 0:
            key = v
        elif f == 2 and wt == 2:  # XEventMetadata
            for f2, wt2, v2 in _fields(v):
                if f2 == 2 and wt2 == 2:
                    name = v2.decode("utf-8", "replace")
    return key, name


def parse_plane(buf: bytes):
    name = ""
    lines = []
    meta: Dict[int, str] = {}
    for f, wt, v in _fields(buf):
        if f == 2 and wt == 2:
            name = v.decode("utf-8", "replace")
        elif f == 3 and wt == 2:
            lines.append(_parse_line(v))
        elif f == 4 and wt == 2:
            k, n = _parse_metadata_entry(v)
            meta[k] = n
    return name, lines, meta


def op_totals(
    path: str, plane_filter: str = "TPU", line_filter: str = ""
) -> Dict[str, Tuple[float, int]]:
    """Aggregate {op_name: (total_ms, count)} over matching planes/lines.

    Pass line_filter="XLA Ops" for the serialized TensorCore timeline
    (excludes the overlapped 'Async XLA Ops' DMA line)."""
    buf = open(path, "rb").read()
    totals: Dict[str, float] = defaultdict(float)
    counts: Dict[str, int] = defaultdict(int)
    for f, wt, v in _fields(buf):
        if f != 1 or wt != 2:
            continue
        pname, lines, meta = parse_plane(v)
        if plane_filter.lower() not in pname.lower():
            continue
        for lname, events in lines:
            if line_filter and lname != line_filter:
                continue
            for mid, dur in events:
                op = meta.get(mid, f"#{mid}")
                totals[op] += dur / 1e9  # ps -> ms
                counts[op] += 1
    return {k: (totals[k], counts[k]) for k in totals}


def latest_trace(logdir: str) -> str:
    paths = sorted(glob.glob(os.path.join(logdir, "plugins/profile/*/*.xplane.pb")))
    if not paths:
        raise FileNotFoundError(f"no .xplane.pb under {logdir}")
    return paths[-1]


def print_top_ops(logdir: str, top: int = 30, iters: int = 1,
                  line_filter: str = "XLA Ops") -> None:
    path = latest_trace(logdir)
    agg = op_totals(path, line_filter=line_filter)
    rows = sorted(agg.items(), key=lambda kv: -kv[1][0])[:top]
    total = sum(v[0] for v in agg.values())
    print(f"{'ms/iter':>9}  {'count':>6}  op  (line '{line_filter}' total "
          f"{total/iters:.1f} ms/iter)")
    for op, (ms, cnt) in rows:
        print(f"{ms/iters:9.2f}  {cnt:6d}  {op[:100]}")
