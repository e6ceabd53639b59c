"""Read-only parser for the reference's binary MRPT ``.mm`` archives.

Reference format (mp2p_icp_map/src/metricmap.cpp:48-178 serializeTo/From,
:651-677 save/load_to_file): a gzipped MRPT CSerializable archive holding a
``mp2p_icp::metric_map_t`` (versions 0-5):

    object  := (len|0x80):u8  class_name  version:u8  payload  0x88
    string  := len:u32le bytes
    payload := vector<TLine3D> framing ("std::vector","TLine3D",n,48B each)
               planes:u32 (TPlane 4xf64 + centroid 3xf64 each)
               lines:u32  (48B each)
               layers:u32 { name:string, object }
               v>=1: id:optional<uint64>, label:optional<string>
                     (typed framing: "std::optional", typename, bool, value)
               v2-3: inline georef; v>=4: delegated georef
                     (magic "mp2p_icp::Georeferencing", metricmap.cpp:824-870)
               v>=5: metadata bool + YAML string

Point layers of class mrpt::maps::CSimplePointsMap (serialization v10:
n:u32, x[n]:f32, y[n]:f32, z[n]:f32, TMapGenericParams sub-object, then a
fixed 58-byte insertion/likelihood/render-options blob) are decoded into
PointCloud layers; anything else raises a descriptive error rather than
guessing. This is enough to load the reference's own demo data
(/root/reference/demos/global_001.mm, local_001.mm) for parity testing.

This is an independent re-implementation from the observed byte layout and
the reference's serializeTo sources — no MRPT code is copied.
"""

from __future__ import annotations

import gzip
import struct
from typing import Optional

import numpy as np

_END = 0x88


class _Reader:
    def __init__(self, data: bytes):
        self.d = data
        self.i = 0

    def take(self, n: int) -> bytes:
        if self.i + n > len(self.d):
            raise ValueError(
                f".mm parse error: need {n} bytes at offset {self.i}, "
                f"file has {len(self.d)}"
            )
        out = self.d[self.i : self.i + n]
        self.i += n
        return out

    def u8(self) -> int:
        return self.take(1)[0]

    def u32(self) -> int:
        return struct.unpack("<I", self.take(4))[0]

    def u64(self) -> int:
        return struct.unpack("<Q", self.take(8))[0]

    def f32s(self, n: int) -> np.ndarray:
        return np.frombuffer(self.take(4 * n), dtype="<f4").copy()

    def f64s(self, n: int) -> np.ndarray:
        return np.frombuffer(self.take(8 * n), dtype="<f8").copy()

    def boolean(self) -> bool:
        return self.u8() != 0

    def string(self) -> str:
        n = self.u32()
        if n > 1 << 20:
            raise ValueError(f".mm parse error: absurd string length {n}")
        return self.take(n).decode("latin-1")

    def object_header(self):
        """-> (class_name, version). MRPT writes len(name)|0x80 as one byte
        (two-byte extension for names >127 chars never occurs here)."""
        b = self.u8()
        if not (b & 0x80):
            raise ValueError(
                f".mm parse error: expected object header at {self.i - 1}, "
                f"got byte 0x{b:02x}"
            )
        name = self.take(b & 0x7F).decode("latin-1")
        version = self.u8()
        return name, version

    def expect_end(self, what: str):
        b = self.u8()
        if b != _END:
            raise ValueError(
                f".mm parse error: missing end marker after {what} at "
                f"offset {self.i - 1} (got 0x{b:02x})"
            )

    def typed_optional(self):
        """std::optional<T> framing: container name, type name, bool, value.
        Returns (typename, present)."""
        cont = self.string()
        if cont != "std::optional":
            raise ValueError(
                f".mm parse error: expected std::optional, got '{cont}'"
            )
        tname = self.string()
        return tname, self.boolean()


# fixed options-blob length after the TMapGenericParams sub-object in a
# CSimplePointsMap v10 payload: insertionOptions + likelihoodOptions +
# renderOptions (fixed-size fields for this serialization version) —
# 62 bytes, verified on both reference demo files; the end-marker
# assertion below catches any drift.
_SIMPLEPOINTS_V10_OPTS_LEN = 62


def _parse_simple_points_map(r: _Reader, version: int):
    if version != 10:
        raise ValueError(
            f".mm: CSimplePointsMap serialization v{version} unsupported "
            "(only v10, the current reference format)"
        )
    n = r.u32()
    x = r.f32s(n)
    y = r.f32s(n)
    z = r.f32s(n)
    # TMapGenericParams sub-object
    name, _ = r.object_header()
    if name != "mrpt::maps::TMapGenericParams":
        raise ValueError(
            f".mm: expected TMapGenericParams sub-object, got '{name}'"
        )
    r.take(3)  # three bools
    r.expect_end("TMapGenericParams")
    r.take(_SIMPLEPOINTS_V10_OPTS_LEN)
    r.expect_end("CSimplePointsMap")
    return np.stack([x, y, z], axis=1).astype(np.float32)


def _parse_lines_vector(r: _Reader):
    cont = r.string()
    if cont != "std::vector":
        raise ValueError(f".mm: expected std::vector framing, got '{cont}'")
    tname = r.string()
    if tname != "TLine3D":
        raise ValueError(f".mm: expected TLine3D vector, got '{tname}'")
    n = r.u32()
    return r.f64s(6 * n).reshape(n, 6) if n else np.zeros((0, 6))


def _parse_georeferencing(r: _Reader):
    magic = r.string()
    if magic != "mp2p_icp::Georeferencing":
        raise ValueError(f".mm: bad georef magic '{magic}'")
    ver = r.u8()
    if ver != 0:
        raise ValueError(f".mm: georef serialization v{ver} unsupported")
    if not r.boolean():
        return None
    lat, lon, height = r.f64s(1)[0], r.f64s(1)[0], r.f64s(1)[0]
    # T_enu_to_map: CPose3DPDFGaussian object — not needed for point-layer
    # parity loads; skip structurally is unsafe, so refuse loudly.
    raise ValueError(
        ".mm: georeferenced maps with T_enu_to_map are not supported by "
        "the read-only parser yet (lat/lon/h parsed: "
        f"{lat:.6f}/{lon:.6f}/{height:.1f})"
    )


def load_mrpt_mm(path: str):
    """Load a reference binary ``.mm`` file -> MetricMap with PointCloud
    layers (+ .id/.label when present)."""
    from mp2p_icp_tpu.core.metric_map import MetricMap
    from mp2p_icp_tpu.core.pointcloud import PointCloud

    with open(path, "rb") as f:
        head = f.read(2)
    raw = (
        gzip.open(path, "rb").read()
        if head == b"\x1f\x8b"
        else open(path, "rb").read()
    )
    r = _Reader(raw)
    name, version = r.object_header()
    if name != "mp2p_icp::metric_map_t":
        raise ValueError(f".mm: top-level object is '{name}', not metric_map_t")
    if version > 5:
        raise ValueError(f".mm: metric_map_t v{version} unsupported (max 5)")

    _parse_lines_vector(r)  # serialized 'lines' (legacy duplicate write)
    n_planes = r.u32()
    planes = r.f64s(7 * n_planes).reshape(n_planes, 7) if n_planes else None
    n_lines = r.u32()
    lines = r.f64s(6 * n_lines).reshape(n_lines, 6) if n_lines else None

    mm = MetricMap()
    n_layers = r.u32()
    for _ in range(n_layers):
        lname = r.string()
        cls, cver = r.object_header()
        short = cls.split("::")[-1]
        if short == "CSimplePointsMap":
            xyz = _parse_simple_points_map(r, cver)
            mm.layers[lname] = PointCloud.from_numpy(xyz)
        else:
            raise ValueError(
                f".mm: layer '{lname}' has unsupported class '{cls}' — the "
                "read-only parser handles CSimplePointsMap point layers"
            )

    mm.id = None
    mm.label = None
    if version >= 1:
        tname, present = r.typed_optional()
        if present:
            mm.id = r.u64()
        tname, present = r.typed_optional()
        if present:
            mm.label = r.string()
    if 2 <= version < 4:
        if r.boolean():
            raise ValueError(".mm: inline georef (v2/3) unsupported")
    if version >= 4:
        _parse_georeferencing(r)
    if version >= 5:
        if r.boolean():
            r.string()  # metadata YAML text (kept unparsed)
    r.expect_end("metric_map_t")

    if lines is not None and len(lines):
        mm.lines_raw = lines
    if planes is not None and len(planes):
        mm.planes_raw = planes
    return mm
