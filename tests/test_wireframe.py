"""Wireframe SVG debug snapshots + the cloth scene."""

import os

import numpy as np

from softbodysimulation_tpu.core.scenes import SCENES
from softbodysimulation_tpu.io import wireframe


def test_cloth_scene_hangs_from_pins():
    state, step, info = SCENES["cloth"](res=8)
    pos0 = np.asarray(state.positions)
    top = np.flatnonzero(pos0[:, 1] > pos0[:, 1].max() - 1e-4)
    for _ in range(60):
        state = step(state)
    p = np.asarray(state.positions)
    assert np.isfinite(p).all()
    assert np.allclose(p[top], pos0[top], atol=1e-6)  # pins hold
    assert p[:, 1].min() > 0.0                        # hangs, doesn't fall


def test_render_svg(tmp_path):
    state, step, info = SCENES["cloth"](res=6)
    state = step(state)
    path = os.path.join(tmp_path, "frame.svg")
    wireframe.render_svg(path, state, info["topology"], ground_height=0.0)
    svg = open(path).read()
    assert svg.startswith("<svg")
    assert svg.count("<circle") == state.positions.shape[0]
    assert svg.count("<line") >= info["topology"].n_edges
    # pinned particles drawn in the pinned color
    assert "#e86a6a" in svg


def test_render_svg_planes(tmp_path):
    state, step, info = SCENES["cpu_cube"]()
    for plane in ("xy", "xz", "zy"):
        path = os.path.join(tmp_path, f"{plane}.svg")
        wireframe.render_svg(path, state, info["topology"], plane=plane)
        assert os.path.getsize(path) > 200
