"""Minimal binary-FBX mesh loader (Kaydara FBX Binary, 7.0 – 7.7).

The reference ships ``Assets/_Project/Art/Models/stanford-bunny.fbx``
(15,258 control points / 30,338 triangles), imported by Unity's
closed-source FBX pipeline with ``globalScale: 0.005`` and
``useFileScale: 1`` (``stanford-bunny.fbx.meta``).  This module is our
importer: it parses the binary node tree, extracts the first mesh
geometry's ``Vertices`` / ``PolygonVertexIndex`` records,
fan-triangulates polygons, and replicates Unity's import-scale
convention (``global_scale * UnitScaleFactor / 100``, Unity units being
meters and FBX ``UnitScaleFactor`` being centimeters-per-file-unit).

Format notes (public Kaydara/Autodesk binary layout):
  header   = 21-byte magic ``Kaydara FBX Binary  \\x00`` + ``\\x1a\\x00``
             + uint32 version (7100 here)
  node     = {end_offset, num_props, prop_list_len} (u32 each, u64 from
             version 7500) + u8 name_len + name + props + children,
             children terminated by an all-zero null record (13 bytes,
             25 from 7500)
  property = 1-byte type code: Y/C/I/F/D/L scalars, S/R strings/raw,
             f/d/l/i/b arrays ({len, encoding, byte_len} header;
             encoding 1 = zlib deflate)

Everything runs host-side once at scene-build time; only ``zlib`` and
NumPy are used.
"""

from __future__ import annotations

import struct
import zlib
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from .mesh import TriMesh

_MAGIC = b"Kaydara FBX Binary  \x00"

_ARRAY_TYPES = {
    ord("f"): np.dtype("<f4"),
    ord("d"): np.dtype("<f8"),
    ord("l"): np.dtype("<i8"),
    ord("i"): np.dtype("<i4"),
    ord("b"): np.dtype("<u1"),
}
_SCALAR_TYPES = {
    ord("Y"): ("<h", 2),
    ord("C"): ("<B", 1),
    ord("I"): ("<i", 4),
    ord("F"): ("<f", 4),
    ord("D"): ("<d", 8),
    ord("L"): ("<q", 8),
}


class FbxNode:
    """One node record: name, property list, child list."""

    __slots__ = ("name", "props", "children")

    def __init__(self, name: str, props: List[Any], children: List["FbxNode"]):
        self.name = name
        self.props = props
        self.children = children

    def find(self, name: str) -> Optional["FbxNode"]:
        for c in self.children:
            if c.name == name:
                return c
        return None

    def find_all(self, name: str) -> List["FbxNode"]:
        return [c for c in self.children if c.name == name]


def _read_props(data: bytes, off: int, count: int) -> Tuple[List[Any], int]:
    props: List[Any] = []
    for _ in range(count):
        code = data[off]
        off += 1
        if code in _SCALAR_TYPES:
            fmt, size = _SCALAR_TYPES[code]
            props.append(struct.unpack_from(fmt, data, off)[0])
            off += size
        elif code in (ord("S"), ord("R")):
            (n,) = struct.unpack_from("<I", data, off)
            off += 4
            props.append(data[off:off + n])
            off += n
        elif code in _ARRAY_TYPES:
            dtype = _ARRAY_TYPES[code]
            length, encoding, nbytes = struct.unpack_from("<III", data, off)
            off += 12
            raw = data[off:off + nbytes]
            off += nbytes
            if encoding == 1:
                raw = zlib.decompress(raw)
            elif encoding != 0:
                raise ValueError(f"unknown FBX array encoding {encoding}")
            props.append(np.frombuffer(raw, dtype=dtype, count=length))
        else:
            raise ValueError(f"unknown FBX property type {code!r} at {off - 1}")
    return props, off


def _parse_nodes(data: bytes, off: int, limit: int, wide: bool) -> Tuple[List[FbxNode], int]:
    """Parse sibling node records until a null record or ``limit``."""
    header_fmt = "<QQQ" if wide else "<III"
    word = 8 if wide else 4
    null_len = 3 * word + 1
    nodes: List[FbxNode] = []
    while off + null_len <= limit:
        end, n_props, _prop_len = struct.unpack_from(header_fmt, data, off)
        if end == 0:  # null record terminates this sibling list
            off += null_len
            break
        o = off + 3 * word
        name_len = data[o]
        o += 1
        name = data[o:o + name_len].decode("ascii", errors="replace")
        o += name_len
        props, o = _read_props(data, o, n_props)
        children: List[FbxNode] = []
        if o < end:
            children, o = _parse_nodes(data, o, end, wide)
        nodes.append(FbxNode(name, props, children))
        off = end
    return nodes, off


def parse_fbx(data: bytes) -> FbxNode:
    """Parse a binary FBX blob into a root node (children = top-level
    records: FBXHeaderExtension, GlobalSettings, Objects, ...)."""
    if data[:21] != _MAGIC:
        raise ValueError("not a binary FBX file (ASCII FBX is unsupported)")
    (version,) = struct.unpack_from("<I", data, 23)
    wide = version >= 7500
    top, _ = _parse_nodes(data, 27, len(data), wide)
    root = FbxNode("", [version], top)
    return root


def _unit_scale_factor(root: FbxNode) -> float:
    """GlobalSettings/Properties70/P ["UnitScaleFactor", ..., value] —
    centimeters per file unit (FBX default 1.0 = cm)."""
    gs = root.find("GlobalSettings")
    p70 = gs.find("Properties70") if gs else None
    if p70:
        for p in p70.find_all("P"):
            if p.props and p.props[0] == b"UnitScaleFactor":
                return float(p.props[-1])
    return 1.0


def _triangulate(pvi: np.ndarray) -> np.ndarray:
    """FBX PolygonVertexIndex → (T,3) triangle array.  A negative entry
    marks the last index of a polygon and stores ``~index``."""
    pvi = np.asarray(pvi, np.int64)
    decoded = np.where(pvi < 0, ~pvi, pvi)
    ends = np.flatnonzero(pvi < 0)
    if ends.size == 0:
        raise ValueError("PolygonVertexIndex has no polygon terminators")
    starts = np.concatenate([[0], ends[:-1] + 1])
    sizes = ends - starts + 1
    if sizes.min() < 3:
        raise ValueError("degenerate polygon (< 3 vertices) in FBX mesh")
    if sizes.max() == 3:  # all-triangle fast path (the bunny)
        return decoded.reshape(-1, 3).astype(np.int32)
    tris = []
    for s, n in zip(starts, sizes):
        poly = decoded[s:s + n]
        for k in range(1, n - 1):  # fan triangulation, same as the OBJ loader
            tris.append((poly[0], poly[k], poly[k + 1]))
    return np.asarray(tris, np.int32)


def load_fbx(path: str, global_scale: float = 1.0,
             use_file_scale: bool = True) -> TriMesh:
    """Load the first mesh geometry from a binary FBX file.

    ``global_scale`` / ``use_file_scale`` mirror Unity's ModelImporter
    knobs: the applied factor is ``global_scale * UnitScaleFactor / 100``
    when ``use_file_scale`` (Unity meters vs FBX centimeter-based units),
    else ``global_scale`` alone.  The reference's bunny imports at
    ``globalScale: 0.005, useFileScale: 1`` (stanford-bunny.fbx.meta).
    """
    with open(path, "rb") as f:
        root = parse_fbx(f.read())
    objects = root.find("Objects")
    if objects is None:
        raise ValueError(f"no Objects record in {path!r}")
    for geom in objects.find_all("Geometry"):
        v_node = geom.find("Vertices")
        i_node = geom.find("PolygonVertexIndex")
        if v_node is None or i_node is None:
            continue
        verts = np.asarray(v_node.props[0], np.float64).reshape(-1, 3)
        tris = _triangulate(i_node.props[0])
        if tris.max() >= len(verts):
            raise ValueError("FBX polygon index out of range")
        scale = float(global_scale)
        if use_file_scale:
            scale *= _unit_scale_factor(root) / 100.0
        return TriMesh((verts * scale).astype(np.float32), tris)
    raise ValueError(f"no mesh geometry found in {path!r}")
