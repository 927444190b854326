"""Topology builders: counts, determinism, coloring validity, welding.

Test strategy per SURVEY.md §4: the reference has no automated tests; these
formalize its implicit invariants (generator counts from
``SoftBodySimulator.cs:214-290``, coloring conflict-freedom that
``ValidateColorGroups`` stubbed out, weld behaviour of
``SoftBodyGPU.cs:369-413``).
"""

import numpy as np
import pytest

from softbodysimulation_tpu.topology import coloring, edges, lattice, mesh


class TestLattice:
    @pytest.mark.parametrize("res", [2, 3, 4, 5])
    def test_edge_counts_match_reference_generators(self, res):
        e, comp = lattice.lattice_edges(res)
        structural = 3 * res * res * (res - 1)   # SoftBodySimulator.cs:214-233
        shear = 3 * (res - 1) ** 3               # :235-269
        bend = (res - 1) ** 3                    # :270-290
        assert len(e) == structural + shear + bend

    def test_flagship_scene_counts(self):
        # res=4 flagship scene: 64 particles, 144+81+27=252 constraints
        e, _ = lattice.lattice_edges(4)
        pts = lattice.lattice_points(4)
        assert pts.shape == (64, 3)
        assert len(e) == 252

    def test_points_centered_and_spaced(self):
        pts = lattice.lattice_points(3, size=(2.0, 2.0, 2.0))
        assert np.allclose(pts.mean(axis=0), 0.0, atol=1e-6)
        assert np.isclose(pts.max(), 1.0)
        assert np.isclose(pts.min(), -1.0)

    def test_no_duplicate_edges(self):
        e, _ = lattice.lattice_edges(4)
        canon = np.sort(e, axis=1)
        assert len(np.unique(canon, axis=0)) == len(e)

    def test_surface_triangles_closed_at_res2(self):
        tris = lattice.lattice_surface_triangles(2)
        assert len(tris) == 12  # cube surface
        v = lattice.lattice_points(2)
        vol = mesh.signed_volume(v, tris)
        assert np.isclose(vol, 1.0, atol=1e-5)

    def test_cube8_edge_counts(self):
        assert len(lattice.cube8_edges(False, False)) == 12
        assert len(lattice.cube8_edges(True, False)) == 24
        assert len(lattice.cube8_edges(True, True)) == 28


class TestEdgesHinges:
    def test_unique_edges_of_cube(self):
        m = mesh.cube()
        e = edges.unique_edges(m.triangles)
        assert len(e) == 18  # 12 cube edges + 6 face diagonals
        assert (e[:, 0] < e[:, 1]).all()

    def test_unique_edges_deterministic_sorted(self):
        m = mesh.icosphere(1)
        e1 = edges.unique_edges(m.triangles)
        e2 = edges.unique_edges(m.triangles[::-1])
        assert np.array_equal(e1, e2)

    def test_euler_formula_icosphere(self):
        m = mesh.icosphere(2)
        e = edges.unique_edges(m.triangles)
        # closed genus-0: V - E + F = 2
        assert m.n_vertices - len(e) + m.n_triangles == 2

    def test_hinges_every_interior_edge(self):
        m = mesh.icosphere(1)
        h = edges.hinges(m.triangles)
        e = edges.unique_edges(m.triangles)
        assert len(h) == len(e)  # closed mesh: every edge interior
        # hinge tips differ from hinge edge
        assert (h[:, 2] != h[:, 0]).all() and (h[:, 2] != h[:, 1]).all()
        assert (h[:, 3] != h[:, 0]).all() and (h[:, 3] != h[:, 1]).all()

    def test_hinges_open_mesh_boundary_excluded(self):
        m = mesh.grid_plane(1.0, 3)
        h = edges.hinges(m.triangles)
        e = edges.unique_edges(m.triangles)
        assert 0 < len(h) < len(e)

    def test_opposite_vertex_pairs(self):
        m = mesh.grid_plane(1.0, 3)
        p = edges.opposite_vertex_pairs(m.triangles)
        assert len(p) == len(edges.hinges(m.triangles))

    def test_weld_merges_duplicates(self):
        m = mesh.cube()
        dup_v = np.concatenate([m.vertices, m.vertices[:4] + 1e-6])
        tri = m.triangles.copy()
        tri[0] = [8, 9, 10]  # retarget one triangle at duplicate verts
        wv, wt, mapping = edges.weld(dup_v, tri, eps=1e-4)
        assert len(wv) == 8
        assert mapping.shape == (12,)
        assert (wt < 8).all()

    def test_weld_identity_when_clean(self):
        m = mesh.icosphere(1)
        wv, wt, mapping = edges.weld(m.vertices, m.triangles, eps=1e-6)
        assert len(wv) == m.n_vertices
        assert np.array_equal(mapping, np.arange(m.n_vertices))

    def test_rest_angle_flat_is_zero(self):
        # coplanar butterfly: with n1 = cross(e0,e1), n2 = cross(e2,e0) and
        # tips on opposite sides, the normals align => angle 0 (reference
        # convention, CPUBendingConstraint.CalculateRestAngle; its butterfly
        # test logs 0 degrees for the flat configuration)
        v = np.array([[0, 0, 0], [1, 0, 0], [0.5, 0.5, 0], [0.5, -0.5, 0]],
                     dtype=np.float32)
        h = np.array([[0, 1, 2, 3]])
        ang = edges.hinge_rest_angles(v, h)
        assert np.isclose(ang[0], 0.0, atol=1e-5)

    def test_rest_angle_right_angle_fold(self):
        # fold tip D up 90 degrees about the hinge: angle pi/2
        v = np.array([[0, 0, 0], [1, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5]],
                     dtype=np.float32)
        h = np.array([[0, 1, 2, 3]])
        ang = edges.hinge_rest_angles(v, h)
        assert np.isclose(ang[0], np.pi / 2, atol=1e-5)


class TestColoring:
    @pytest.mark.parametrize("strategy", ["greedy", "cluster"])
    def test_coloring_valid(self, strategy):
        e, _ = lattice.lattice_edges(4)
        fn = {"greedy": coloring.greedy_color,
              "cluster": coloring.cluster_color}[strategy]
        colors = fn(e, 64)
        assert coloring.validate_coloring(e, colors)

    def test_validator_catches_conflicts(self):
        e = np.array([[0, 1], [1, 2]])
        assert not coloring.validate_coloring(e, np.array([0, 0]))
        assert coloring.validate_coloring(e, np.array([0, 1]))

    def test_hinge_coloring_valid(self):
        m = mesh.icosphere(1)
        h = edges.hinges(m.triangles)
        colors = coloring.greedy_color(h, m.n_vertices)
        assert coloring.validate_coloring(h, colors)

    def test_buckets_partition_all(self):
        e, _ = lattice.lattice_edges(3)
        colors = coloring.greedy_color(e, 27)
        ids, valid, nc = coloring.color_buckets(colors)
        got = sorted(int(i) for row_i, row_v in zip(ids, valid)
                     for i, v in zip(row_i, row_v) if v > 0)
        assert got == list(range(len(e)))


class TestMesh:
    def test_icosphere_radius(self):
        m = mesh.icosphere(2, radius=2.0)
        r = np.linalg.norm(m.vertices, axis=1)
        assert np.allclose(r, 2.0, atol=1e-5)

    def test_icosphere_volume_approaches_sphere(self):
        m = mesh.icosphere(3)
        vol = mesh.signed_volume(m.vertices, m.triangles)
        assert 0.95 * 4 / 3 * np.pi < vol < 4 / 3 * np.pi

    def test_cube_volume_positive(self):
        m = mesh.cube(2.0)
        assert np.isclose(mesh.signed_volume(m.vertices, m.triangles), 8.0,
                          atol=1e-5)

    def test_grid_plane(self):
        m = mesh.grid_plane(1.0, 4)
        assert m.n_vertices == 16
        assert m.n_triangles == 18
