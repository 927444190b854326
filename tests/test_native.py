"""Native C++ topology builder vs the NumPy reference implementations."""

import numpy as np
import pytest

from softbodysimulation_tpu.topology import coloring, edges, mesh, native

needs_native = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable")


@needs_native
def test_native_unique_edges_matches_numpy():
    m = mesh.icosphere(2)
    got = native.unique_edges(m.triangles)
    want = edges.unique_edges(m.triangles)
    assert np.array_equal(got, want)


@needs_native
def test_native_hinges_matches_numpy():
    for make in (lambda: mesh.icosphere(2), lambda: mesh.grid_plane(1.0, 5)):
        m = make()
        got = native.hinges(m.triangles)
        want = edges.hinges(m.triangles)
        # same hinge set (row order may differ within equal edges)
        assert np.array_equal(
            got[np.lexsort(got.T[::-1])], want[np.lexsort(want.T[::-1])])


@needs_native
def test_native_greedy_color_valid_and_deterministic():
    m = mesh.icosphere(2)
    e = edges.unique_edges(m.triangles)
    c1 = native.greedy_color(e, m.n_vertices)
    c2 = native.greedy_color(e, m.n_vertices)
    assert np.array_equal(c1, c2)
    assert coloring.validate_coloring(e, c1)
    # identical to the Python colorer (same deterministic algorithm)
    assert np.array_equal(c1, coloring.greedy_color(e, m.n_vertices))


@needs_native
def test_native_greedy_color_hinges():
    m = mesh.icosphere(2)
    h = edges.hinges(m.triangles)
    c = native.greedy_color(h, m.n_vertices)
    assert coloring.validate_coloring(h, c)


@needs_native
def test_native_weld():
    m = mesh.cube()
    dup = np.concatenate([m.vertices, m.vertices + 1e-6])
    mapping, n = native.weld_map(dup, eps=1e-4)
    assert n == 8
    assert np.array_equal(mapping[:8], mapping[8:])


@needs_native
def test_native_speedup_on_large_mesh():
    """The reason the native path exists: coloring a big constraint set."""
    import time

    from softbodysimulation_tpu.topology import lattice

    e, _ = lattice.lattice_edges(12, braced=True)  # ~24k edges
    n = 12 ** 3
    t0 = time.perf_counter()
    c_native = native.greedy_color(e, n)
    t_native = time.perf_counter() - t0
    assert coloring.validate_coloring(e, c_native)
    # don't time the python path fully (slow); just assert native is fast
    assert t_native < 0.5
