"""The CpuMesh workload with the real LowResBunny asset (when present):
2,503 particles / ~7.4k edge constraints — the reference's largest
configured workload (SURVEY §6)."""

import os

import numpy as np
import pytest

from softbodysimulation_tpu.core.scenes import BUNNY_PATHS, SCENES
from softbodysimulation_tpu.topology import edges as edges_mod
from softbodysimulation_tpu.topology.objloader import load_obj

bunny_path = next((p for p in BUNNY_PATHS if os.path.exists(p)), None)
needs_bunny = pytest.mark.skipif(bunny_path is None,
                                 reason="bunny OBJ not available")


@needs_bunny
def test_bunny_loads_with_expected_counts():
    m = load_obj(bunny_path)
    assert m.n_vertices == 2503
    assert m.n_triangles == 4968
    e = edges_mod.unique_edges(m.triangles)
    assert 7000 < len(e) < 7600  # ~7.4k edge constraints (SURVEY §6)


@needs_bunny
def test_bunny_scene_simulates():
    state, step, info = SCENES["cpu_mesh"]()
    assert state.positions.shape[0] == 2503
    for _ in range(25):
        state = step(state)
    p = np.asarray(state.positions)
    assert np.isfinite(p).all()
    assert p[:, 1].min() > -1e-3  # above ground
