"""Headless frame export: the render path without a renderer.

Replaces the reference's per-frame mesh update + engine-native normal
recompute + async readback pipeline (``SoftBodySimulator.cs:793-878``) with
an explicit export boundary: positions (and normals, computed on device by
``ops/normals.py``) cross to the host ONLY here.
"""

from __future__ import annotations

import os

import numpy as np

from ..core.state import SimState, Topology
from ..ops.normals import vertex_normals


def frame_arrays(state: SimState, topo: Topology):
    """(positions, normals, triangles) as host arrays — one device_get."""
    normals = vertex_normals(state.positions, topo.triangles)
    return (
        np.asarray(state.positions),
        np.asarray(normals),
        np.asarray(topo.triangles),
    )


def export_obj(path: str, state: SimState, topo: Topology,
               faceted: bool = False) -> None:
    """Write the deformed surface as a Wavefront OBJ with normals.

    faceted=True duplicates vertices per face with flat face normals — the
    analog of the reference's 24-vertex display cube driven by 8 particles
    (``SoftBodyCubeCPU.cs:351-411``), for hard-shaded rendering."""
    pos, nrm, tri = frame_arrays(state, topo)
    directory = os.path.dirname(os.path.abspath(path))
    os.makedirs(directory, exist_ok=True)
    if faceted:
        p1, p2, p3 = pos[tri[:, 0]], pos[tri[:, 1]], pos[tri[:, 2]]
        fn = np.cross(p2 - p1, p3 - p1)
        lens = np.linalg.norm(fn, axis=1, keepdims=True)
        fn = fn / np.maximum(lens, 1e-12)
        with open(path, "w") as f:
            f.write("# softbodysimulation_tpu export (faceted)\n")
            for tri_pts in zip(p1, p2, p3):
                for p in tri_pts:
                    f.write(f"v {p[0]:.6f} {p[1]:.6f} {p[2]:.6f}\n")
            for n in fn:
                f.write(f"vn {n[0]:.6f} {n[1]:.6f} {n[2]:.6f}\n")
            for i in range(len(tri)):
                a = 3 * i + 1
                ni = i + 1
                f.write(f"f {a}//{ni} {a + 1}//{ni} {a + 2}//{ni}\n")
        return
    with open(path, "w") as f:
        f.write("# softbodysimulation_tpu export\n")
        for p in pos:
            f.write(f"v {p[0]:.6f} {p[1]:.6f} {p[2]:.6f}\n")
        for n in nrm:
            f.write(f"vn {n[0]:.6f} {n[1]:.6f} {n[2]:.6f}\n")
        for t in tri:
            a, b, c = t + 1
            f.write(f"f {a}//{a} {b}//{b} {c}//{c}\n")


def export_npz(path: str, state: SimState, topo: Topology) -> None:
    pos, nrm, tri = frame_arrays(state, topo)
    directory = os.path.dirname(os.path.abspath(path))
    os.makedirs(directory, exist_ok=True)
    np.savez(path, positions=pos, normals=nrm, triangles=tri)
