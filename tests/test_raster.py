"""Headless software rasterizer (io/raster.py)."""

import os

import numpy as np

from softbodysimulation_tpu import SolverConfig, state_from_topology
from softbodysimulation_tpu.io import raster
from softbodysimulation_tpu.topology import build, mesh


def test_rasterize_sphere_coverage_and_shading():
    m = mesh.icosphere(2, radius=0.5)
    pos, topo = build.topology_from_mesh(m, compliance=1e-4)
    state = state_from_topology(topo, pos)
    img = raster.rasterize(np.asarray(state.positions),
                           np.asarray(topo.triangles), size=128)
    assert img.shape == (128, 128, 3)
    bg = np.array([17, 20, 24])
    nonbg = (np.abs(img.astype(int) - bg).sum(axis=2) > 10)
    # a sphere filling the frame covers ~ pi/4 of it
    assert 0.5 < nonbg.mean() < 0.95
    # shading varies across the surface (not a flat silhouette)
    blue = img[..., 2][nonbg]
    assert blue.max() - blue.min() > 60


def test_zbuffer_front_face_wins():
    # two overlapping triangles at different depths; nearer (larger z in
    # 'xy' plane = +z towards viewer) must win
    pos = np.array([
        [0, 0, 0], [1, 0, 0], [0.5, 1, 0],        # far triangle (z=0)
        [0, 0.2, 0.5], [1, 0.2, 0.5], [0.5, 0.8, 0.5],  # near triangle
    ], np.float32)
    tris = np.array([[0, 1, 2], [3, 4, 5]], np.int32)
    img = raster.rasterize(pos, tris, size=64,
                           base_color=(200, 0, 0))
    # the near triangle is brighter/darker per its own shade, but both have
    # the same normal here; check the centre pixel belongs to SOME triangle
    c = img[32, 32]
    assert (c != np.array([17, 20, 24])).any()


def test_write_and_read_ppm(tmp_path):
    img = np.zeros((8, 10, 3), np.uint8)
    img[2, 3] = [255, 128, 7]
    path = os.path.join(tmp_path, "t.ppm")
    raster.write_ppm(path, img)
    with open(path, "rb") as f:
        assert f.readline().strip() == b"P6"
        w, h = map(int, f.readline().split())
        assert (w, h) == (10, 8)
        f.readline()
        back = np.frombuffer(f.read(), np.uint8).reshape(8, 10, 3)
    assert np.array_equal(back, img)
