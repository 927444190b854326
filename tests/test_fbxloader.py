"""Binary-FBX importer (topology/fbxloader.py).

The reference's stanford-bunny.fbx (Assets/_Project/Art/Models/) is loaded
by Unity's closed-source pipeline; we parse the public Kaydara binary
layout ourselves.  Hermetic coverage uses a tiny synthetic encoder below;
the real asset is exercised when the reference checkout is present.
"""

import os
import struct
import zlib

import numpy as np
import pytest

from softbodysimulation_tpu.topology.fbxloader import (
    load_fbx, parse_fbx, _triangulate)

REAL_FBX = "/root/reference/Assets/_Project/Art/Models/stanford-bunny.fbx"


# ---------------------------------------------------------------- encoder

def _enc_props(props, compress):
    out = b""
    for p in props:
        if isinstance(p, bytes):
            out += b"S" + struct.pack("<I", len(p)) + p
        elif isinstance(p, float):
            out += b"D" + struct.pack("<d", p)
        elif isinstance(p, int):
            out += b"I" + struct.pack("<i", p)
        elif isinstance(p, np.ndarray):
            code = {"float64": b"d", "int32": b"i"}[str(p.dtype)]
            raw = p.tobytes()
            if compress:
                blob = zlib.compress(raw)
                out += code + struct.pack("<III", p.size, 1, len(blob)) + blob
            else:
                out += code + struct.pack("<III", p.size, 0, len(raw)) + raw
        else:
            raise TypeError(type(p))
    return out


def _enc_node(name, props, children, base, wide, compress):
    word, fmt = (8, "<QQQ") if wide else (4, "<III")
    null = b"\x00" * (3 * word + 1)
    pblob = _enc_props(props, compress)
    body = name.encode() + pblob
    kids = b""
    if children:
        off = base + 3 * word + 1 + len(body)
        for c in children:
            kids += _enc_node(c[0], c[1], c[2], off + len(kids), wide, compress)
        kids += null
    end = base + 3 * word + 1 + len(body) + len(kids)
    return struct.pack(fmt, end, len(props), len(pblob)) + \
        bytes([len(name)]) + body + kids


def encode_fbx(nodes, version=7100, compress=False):
    """Encode [(name, props, children), ...] as a binary FBX blob."""
    wide = version >= 7500
    word = 8 if wide else 4
    out = b"Kaydara FBX Binary  \x00\x1a\x00" + struct.pack("<I", version)
    for n in nodes:
        out += _enc_node(n[0], n[1], n[2], len(out), wide, compress)
    out += b"\x00" * (3 * word + 1)
    return out


def _quad_doc(unit_scale=None):
    verts = np.array([0, 0, 0, 1, 0, 0, 1, 1, 0, 0, 1, 0], np.float64)
    pvi = np.array([0, 1, 2, ~3], np.int32)  # one quad, last index bit-inverted
    geom = ("Geometry", [1, b"quad\x00\x01Geometry", b"Mesh"],
            [("Vertices", [verts], []),
             ("PolygonVertexIndex", [pvi], [])])
    doc = [("Objects", [], [geom])]
    if unit_scale is not None:
        doc.insert(0, ("GlobalSettings", [], [
            ("Properties70", [], [
                ("P", [b"UnitScaleFactor", b"double", b"Number", b"",
                       float(unit_scale)], [])])]))
    return doc


# ----------------------------------------------------------------- tests

@pytest.mark.parametrize("version", [7100, 7500])
@pytest.mark.parametrize("compress", [False, True])
def test_synthetic_quad_roundtrip(tmp_path, version, compress):
    blob = encode_fbx(_quad_doc(), version=version, compress=compress)
    path = tmp_path / "quad.fbx"
    path.write_bytes(blob)
    m = load_fbx(str(path), use_file_scale=False)
    assert m.n_vertices == 4
    # quad fan-triangulates to (0,1,2),(0,2,3)
    assert m.triangles.tolist() == [[0, 1, 2], [0, 2, 3]]
    np.testing.assert_allclose(m.vertices[2], [1, 1, 0])


def test_unit_scale_factor_applied(tmp_path):
    # UnitScaleFactor=100 (meters) -> file-scale 1.0; globalScale on top
    blob = encode_fbx(_quad_doc(unit_scale=100.0))
    path = tmp_path / "scaled.fbx"
    path.write_bytes(blob)
    m = load_fbx(str(path), global_scale=0.5, use_file_scale=True)
    np.testing.assert_allclose(m.vertices[1], [0.5, 0, 0])
    m2 = load_fbx(str(path), global_scale=1.0, use_file_scale=False)
    np.testing.assert_allclose(m2.vertices[1], [1.0, 0, 0])


def test_triangulate_mixed_polygons():
    # triangle then pentagon, FBX negative-terminator spelling
    pvi = np.array([0, 1, ~2, 3, 4, 5, 6, ~7], np.int64)
    tris = _triangulate(pvi)
    assert tris.tolist() == [[0, 1, 2], [3, 4, 5], [3, 5, 6], [3, 6, 7]]


def test_parse_rejects_ascii():
    with pytest.raises(ValueError, match="binary FBX"):
        parse_fbx(b"; FBX 7.3.0 project file\n...ascii...")


def test_node_tree_structure(tmp_path):
    blob = encode_fbx(_quad_doc(unit_scale=1.0))
    root = parse_fbx(blob)
    assert root.props == [7100]
    names = [c.name for c in root.children]
    assert names == ["GlobalSettings", "Objects"]
    geo = root.find("Objects").find("Geometry")
    assert geo.find("Vertices").props[0].shape == (12,)


@pytest.mark.skipif(not os.path.exists(REAL_FBX),
                    reason="reference FBX asset not present")
def test_real_stanford_bunny_asset():
    m = load_fbx(REAL_FBX, global_scale=0.005)
    assert m.n_vertices == 15258
    assert m.n_triangles == 30338
    assert int(m.triangles.max()) == m.n_vertices - 1
    # Unity import scale: globalScale 0.005 x fileScale 1.0 -> ~2.5 m tall
    ext = m.vertices.max(0) - m.vertices.min(0)
    assert 2.0 < float(ext[1]) < 3.0
    assert np.isfinite(m.vertices).all()


def test_stanford_bunny_scene_fallback(monkeypatch):
    # hermetic: force the icosphere fallback (no 45k-edge windowed build)
    from softbodysimulation_tpu.core import scenes
    monkeypatch.setattr(scenes, "FBX_BUNNY_PATHS", ())
    state, step, info = scenes.stanford_bunny(fallback_subdiv=1)
    state = step(state)
    assert np.isfinite(np.asarray(state.positions)).all()
    assert info["topology"].n_edges > 0
