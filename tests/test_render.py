"""On-device render post-processing: vertex normals, bounds, COM."""

import numpy as np

import jax.numpy as jnp

from softbodysimulation_tpu.ops import normals as nops
from softbodysimulation_tpu.topology import mesh


def numpy_vertex_normals(v, t):
    """Independent NumPy reference implementation."""
    out = np.zeros_like(v)
    for a, b, c in t:
        n = np.cross(v[b] - v[a], v[c] - v[a])
        out[a] += n
        out[b] += n
        out[c] += n
    lens = np.linalg.norm(out, axis=1, keepdims=True)
    lens[lens == 0] = 1
    return out / lens


def test_normals_match_numpy_reference():
    m = mesh.icosphere(2)
    got = np.asarray(nops.vertex_normals(
        jnp.asarray(m.vertices), jnp.asarray(m.triangles)))
    want = numpy_vertex_normals(m.vertices.astype(np.float64),
                                m.triangles)
    assert np.allclose(got, want, atol=1e-4)


def test_sphere_normals_point_outward():
    m = mesh.icosphere(2)
    n = np.asarray(nops.vertex_normals(
        jnp.asarray(m.vertices), jnp.asarray(m.triangles)))
    radial = m.vertices / np.linalg.norm(m.vertices, axis=1, keepdims=True)
    dots = (n * radial).sum(axis=1)
    assert dots.min() > 0.95


def test_cube_normals_unit_length():
    m = mesh.cube()
    n = np.asarray(nops.vertex_normals(
        jnp.asarray(m.vertices), jnp.asarray(m.triangles)))
    assert np.allclose(np.linalg.norm(n, axis=1), 1.0, atol=1e-5)


def test_bounds():
    m = mesh.cube(2.0)
    lo, hi = nops.bounds(jnp.asarray(m.vertices))
    assert np.allclose(np.asarray(lo), -1.0)
    assert np.allclose(np.asarray(hi), 1.0)


def test_center_of_mass_weighted():
    pos = jnp.asarray(np.array([[0, 0, 0], [2, 0, 0]], np.float32))
    w = jnp.asarray(np.array([1.0, 0.5], np.float32))  # masses 1, 2
    com = np.asarray(nops.center_of_mass(pos, w))
    assert np.allclose(com, [4.0 / 3.0, 0, 0], atol=1e-6)
    com_unweighted = np.asarray(nops.center_of_mass(pos))
    assert np.allclose(com_unweighted, [1.0, 0, 0])
