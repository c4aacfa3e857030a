"""XPlane trace parser tests against a hand-encoded protobuf fixture."""
import struct

import pytest

from tinysplat_tpu.utils.xplane import op_totals, parse_plane


def _varint(v: int) -> bytes:
    out = b""
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _field(num: int, wt: int, payload) -> bytes:
    tag = _varint((num << 3) | wt)
    if wt == 0:
        return tag + _varint(payload)
    return tag + _varint(len(payload)) + payload


def _event(mid: int, dur_ps: int) -> bytes:
    return _field(1, 0, mid) + _field(2, 0, 123) + _field(3, 0, dur_ps)


def _line(name: str, events) -> bytes:
    buf = _field(2, 2, name.encode())
    for ev in events:
        buf += _field(4, 2, ev)
    return buf


def _meta(mid: int, name: str) -> bytes:
    inner = _field(1, 0, mid) + _field(2, 2, name.encode())
    return _field(1, 0, mid) + _field(2, 2, inner)


def _plane(name: str, lines, metas) -> bytes:
    buf = _field(2, 2, name.encode())
    for ln in lines:
        buf += _field(3, 2, ln)
    for m in metas:
        buf += _field(4, 2, m)
    return buf


@pytest.fixture
def trace_file(tmp_path):
    plane = _plane(
        "/device:TPU:0",
        lines=[
            _line("XLA Ops", [_event(1, 2_000_000_000), _event(2, 500_000_000),
                              _event(1, 1_000_000_000)]),
            _line("Async XLA Ops", [_event(3, 9_000_000_000)]),
        ],
        metas=[_meta(1, "%fusion.1"), _meta(2, "%sort.2"), _meta(3, "%copy-start")],
    )
    space = _field(1, 2, plane)
    path = tmp_path / "test.xplane.pb"
    path.write_bytes(space)
    return str(path)


def test_parse_plane_roundtrip(trace_file):
    buf = open(trace_file, "rb").read()
    # XSpace field 1 wraps the plane.
    from tinysplat_tpu.utils.xplane import _fields

    planes = [v for f, wt, v in _fields(buf) if f == 1 and wt == 2]
    name, lines, meta = parse_plane(planes[0])
    assert name == "/device:TPU:0"
    assert {ln for ln, _ in lines} == {"XLA Ops", "Async XLA Ops"}
    assert meta == {1: "%fusion.1", 2: "%sort.2", 3: "%copy-start"}


def test_op_totals_line_filter(trace_file):
    agg = op_totals(trace_file, line_filter="XLA Ops")
    assert agg["%fusion.1"] == (3.0, 2)  # 2ms + 1ms over two events
    assert agg["%sort.2"] == (0.5, 1)
    assert "%copy-start" not in agg  # async line filtered out

    agg_all = op_totals(trace_file)
    assert agg_all["%copy-start"] == (9.0, 1)
