"""Interaction API: poke / drag / pin / animator schedules, and
checkpoint/restart — the functional replacements for
``SoftBodyInteractor``/``SoftBodyAnimator``/``RestartSimulation``."""

import os

import numpy as np

from softbodysimulation_tpu import (
    FloorMode,
    SolveMode,
    SolverConfig,
    restore,
    snapshot,
    state_from_topology,
)
from softbodysimulation_tpu.interact import animator, forces
from softbodysimulation_tpu.io import checkpoint, export
from softbodysimulation_tpu.solvers import general
from softbodysimulation_tpu.topology import build, lattice, mesh

DT = 0.02


def scene():
    pos = lattice.lattice_points(3, center=(0, 1.0, 0))
    edges, comp = lattice.lattice_edges(3)
    tris = lattice.lattice_surface_triangles(3)
    topo = build.build_topology(pos, edges, comp, triangles=tris)
    cfg = SolverConfig(substeps=1, iterations=6, damping=0.02,
                       solve_mode=SolveMode.JACOBI, ground_height=0.0)
    return state_from_topology(topo, pos), topo, cfg


class TestForces:
    def test_add_force_radial_falloff(self):
        state, topo, cfg = scene()
        center = np.asarray(state.positions)[13]  # middle particle
        state = forces.add_force(state, (0.0, 100.0, 0.0), center, radius=0.4)
        f = np.asarray(state.ext_force)
        assert f[13, 1] > 99.0          # full force at zero distance
        far = np.linalg.norm(
            np.asarray(state.positions) - center, axis=1) >= 0.4
        assert np.allclose(f[far], 0.0)  # nothing outside radius

    def test_force_moves_body_next_step(self):
        state, topo, cfg = scene()
        cfg = cfg.replace(gravity=(0.0, 0.0, 0.0),
                          floor_mode=FloorMode.NONE)
        com0 = np.asarray(state.positions).mean(axis=0)
        state = forces.add_force(
            state, (0.0, 50.0, 0.0), com0, radius=3.0)
        step = general.make_step(topo, cfg, DT, n_steps=5)
        state = step(state)
        com1 = np.asarray(state.positions).mean(axis=0)
        assert com1[1] > com0[1] + 1e-4
        # force consumed: ext_force zeroed after the step
        assert np.allclose(np.asarray(state.ext_force), 0.0)

    def test_set_pinned_and_unpin(self):
        state, topo, cfg = scene()
        top = np.asarray(state.positions)[:, 1].max()
        anchor = np.array([0.0, top, 0.0])
        state = forces.set_pinned(state, anchor, radius=0.6, pinned=True)
        w = np.asarray(state.inv_mass)
        assert (w == 0).sum() > 0
        state2 = forces.set_pinned(state, anchor, radius=0.6, pinned=False,
                                   mass=2.0)
        w2 = np.asarray(state2.inv_mass)
        assert (w2 == 0).sum() == 0
        assert np.isclose(w2[w == 0].max(), 0.5)

    def test_pin_indices_hold_hanging_body(self):
        state, topo, cfg = scene()
        cfg = cfg.replace(floor_mode=FloorMode.NONE)
        # pin the top corner row; body must hang, not fall forever
        top_idx = np.argsort(-np.asarray(state.positions)[:, 1])[:9]
        state = forces.pin_indices(state, top_idx, pinned=True)
        step = general.make_step(topo, cfg, DT, n_steps=300)
        state = step(state)
        p = np.asarray(state.positions)
        assert np.isfinite(p).all()
        assert p[:, 1].min() > -2.0  # held by the pins

    def test_squeeze_is_inward(self):
        state, topo, cfg = scene()
        com = np.asarray(state.positions).mean(axis=0)
        state = forces.squeeze_impulse(state, com, intensity=1.0, radius=3.0)
        f = np.asarray(state.ext_force)
        d = np.asarray(state.positions) - com
        inward = (f * d).sum(axis=1)
        nz = np.linalg.norm(f, axis=1) > 1e-6
        assert (inward[nz] < 1e-6).all()


class TestAnimator:
    def test_force_animation_window(self):
        state, topo, cfg = scene()
        anim = animator.ForceAnimation(direction=(0, 1, 0), max_force=10.0,
                                       duration=1.0)
        center = np.zeros(3)
        s_active = anim.apply(state, 0.5, center)
        s_after = anim.apply(state, 2.0, center)
        assert np.abs(np.asarray(s_active.ext_force)).max() > 0
        assert np.abs(np.asarray(s_after.ext_force)).max() == 0

    def test_pulse_oscillates(self):
        state, topo, cfg = scene()
        p = animator.Pulse(frequency=1.0, strength=5.0, radius=10.0)
        f1 = np.asarray(p.apply(state, 0.25, np.zeros(3)).ext_force)[:, 1]
        f2 = np.asarray(p.apply(state, 0.75, np.zeros(3)).ext_force)[:, 1]
        assert f1.max() > 0 and f2.min() < 0

    def test_curve_ease_in_out(self):
        c = animator.Curve.ease_in_out()
        assert float(c(0.0)) == 0.0
        assert abs(float(c(1.0)) - 1.0) < 1e-6
        assert 0.4 < float(c(0.5)) < 0.6


class TestCheckpointRestart:
    def test_snapshot_restore_roundtrip(self):
        state, topo, cfg = scene()
        snap = snapshot(state)
        step = general.make_step(topo, cfg, DT, n_steps=50)
        state = step(state)
        restored = restore(snap)
        assert np.allclose(np.asarray(restored.positions),
                           np.asarray(snap.positions))
        assert np.allclose(np.asarray(restored.lambda_dist), 0.0)

    def test_npz_checkpoint_roundtrip(self, tmp_path):
        state, topo, cfg = scene()
        step = general.make_step(topo, cfg, DT, n_steps=20)
        state = step(state)
        path = os.path.join(tmp_path, "ckpt.npz")
        checkpoint.save(path, state, metadata={"step": 20})
        loaded = checkpoint.load(path)
        for f in ("positions", "velocities", "inv_mass", "lambda_dist"):
            assert np.array_equal(np.asarray(getattr(state, f)),
                                  np.asarray(getattr(loaded, f)))
        assert int(checkpoint.load_metadata(path)["step"]) == 20

    def test_resume_continues_identically(self, tmp_path):
        state, topo, cfg = scene()
        step = general.make_step(topo, cfg, DT, n_steps=10)
        state = step(state)
        path = os.path.join(tmp_path, "ckpt.npz")
        checkpoint.save(path, state)
        a = step(step(state))
        b = step(step(checkpoint.load(path)))
        assert np.array_equal(np.asarray(a.positions),
                              np.asarray(b.positions))


class TestExport:
    def test_export_obj_and_npz(self, tmp_path):
        state, topo, cfg = scene()
        obj_path = os.path.join(tmp_path, "frame.obj")
        export.export_obj(obj_path, state, topo)
        text = open(obj_path).read()
        assert text.count("\nv ") + text.startswith("v ") == topo.n_particles
        assert "vn " in text and "f " in text
        npz_path = os.path.join(tmp_path, "frame.npz")
        export.export_npz(npz_path, state, topo)
        with np.load(npz_path) as d:
            assert d["positions"].shape == (topo.n_particles, 3)
            assert d["normals"].shape == (topo.n_particles, 3)
            n = np.linalg.norm(d["normals"], axis=1)
            assert np.allclose(n, 1.0, atol=1e-4)

    def test_roundtrip_through_objloader(self, tmp_path):
        from softbodysimulation_tpu.topology.objloader import load_obj

        state, topo, cfg = scene()
        path = os.path.join(tmp_path, "rt.obj")
        export.export_obj(path, state, topo)
        m = load_obj(path)
        assert m.n_vertices == topo.n_particles
        assert m.n_triangles == topo.triangles.shape[0]

    def test_export_obj_faceted(self, tmp_path):
        state, topo, cfg = scene()
        path = os.path.join(tmp_path, "flat.obj")
        export.export_obj(path, state, topo, faceted=True)
        text = open(path).read()
        n_tris = topo.triangles.shape[0]
        assert text.count("\nv ") == 3 * n_tris   # per-face vertices
        assert text.count("\nvn ") == n_tris      # one flat normal per face


class TestWind:
    def test_wind_pushes_cloth_sideways(self):
        # bend-free drape (the cloth scene's dihedral stiffness makes it a
        # plate cantilevered at its pinned row — physically wind-rigid)
        m = mesh.grid_plane(1.0, 8)
        verts = m.vertices[:, [0, 2, 1]].copy()
        verts[:, 2] = 0.0
        pos, topo = build.topology_from_mesh(
            mesh.TriMesh(verts, m.triangles), compliance=1e-5)
        pos = pos + np.array([0, 1.2, 0], np.float32)
        cfg = SolverConfig(substeps=4, iterations=2, damping=0.03,
                           solve_mode=SolveMode.JACOBI,
                           ground_height=0.0, friction=0.4)
        state = state_from_topology(topo, pos)
        top = np.flatnonzero(pos[:, 1] > pos[:, 1].max() - 1e-4)
        state = forces.pin_indices(state, top, pinned=True)
        step = general.make_step(topo, cfg, 1 / 60)
        z0 = np.asarray(state.positions)[:, 2].mean()
        # wind along +z: the cloth's free swing direction (out-of-plane);
        # in-plane wind components push against edge stiffness instead
        for _ in range(240):
            state = forces.add_wind(state, topo, (0.0, 0.0, 1.0),
                                    strength=5.0)
            state = step(state)
        p = np.asarray(state.positions)
        assert np.isfinite(p).all()
        assert p[:, 2].mean() > z0 + 0.05  # billows downwind

    def test_wind_respects_facing(self):
        # sheet in the xy-plane: z-wind catches fully, x-wind barely
        state, topo, cfg = scene()  # lattice; use its surface triangles
        s_face = forces.add_wind(state, topo, (0.0, 0.0, 1.0), strength=1.0)
        f = np.asarray(s_face.ext_force)
        assert np.abs(f).max() > 0
        # direction of the applied force is the wind direction
        nz = np.linalg.norm(f, axis=1) > 1e-8
        dirs = f[nz] / np.linalg.norm(f[nz], axis=1, keepdims=True)
        assert np.allclose(np.abs(dirs[:, 2]), 1.0, atol=1e-5)

    def test_gustiness_varies_force(self):
        state, topo, cfg = scene()
        a = np.asarray(forces.add_wind(state, topo, (0, 0, 1), 1.0,
                                       gustiness=0.5, seed=1).ext_force)
        b = np.asarray(forces.add_wind(state, topo, (0, 0, 1), 1.0,
                                       gustiness=0.5, seed=2).ext_force)
        assert not np.allclose(a, b)
