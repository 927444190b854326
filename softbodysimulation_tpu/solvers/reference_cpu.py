"""Frozen sequential Gauss-Seidel XPBD oracle (NumPy, float32).

A straight, unoptimised transcription of the canonical CPU loop the reference
treats as its numerical truth — ``SoftBodyCPU.FixedUpdate``
(``SoftBodyCPU.cs:269-325``), ``CPUDistanceConstraint.Solve``
(``CPUDistanceConstraint.cs:46-117``), ``CPUBendingConstraint.Solve``
(``CPUBendingConstraint.cs:40-166``, with its dead-code control-flow bug
fixed: the normal-sinTheta branch applies corrections too, which is plainly
the intended behaviour), and the ground inequality constraint + positional
friction (``SoftBodyCPU.cs:352-400``).

The device engines are validated against this oracle (10k-step drift metric,
BASELINE.md).  DO NOT OPTIMISE; clarity and stability of semantics are the
point.  Constraints are processed in color-major order so the COLORED device
mode is comparable constraint-for-constraint (within a color no particles are
shared, so intra-color order is irrelevant even in floating point).
"""

from __future__ import annotations

import numpy as np

from ..core.config import DampingMode, FloorMode, LambdaMode, SolverConfig

F = np.float32


class ReferenceSolver:
    """Mutable, host-side oracle. One instance per scene."""

    def __init__(self, positions, edges, rest_lengths, compliance, inv_mass,
                 config: SolverConfig, hinges=None, rest_angles=None,
                 bend_compliance=None, colors=None, bend_colors=None,
                 warm_start: bool = False):
        self.cfg = config
        self.x = np.array(positions, dtype=F)
        self.v = np.zeros_like(self.x)
        self.w = np.array(inv_mass, dtype=F)
        self.f = np.zeros_like(self.x)
        # warm_start=True opts into the WARM_START lambda-mode extension
        # (scalar transcription of general._warm_apply_distance) — an
        # explicit flag so the frozen RESET/DECAY reference semantics stay
        # untouched by default and existing oracle tests are unaffected.
        self.warm_start = bool(warm_start)

        edges = np.asarray(edges, dtype=np.int64).reshape(-1, 2)
        rest = np.asarray(rest_lengths, dtype=F)
        comp = np.broadcast_to(np.asarray(compliance, F), (len(edges),))
        if colors is None:
            order = np.arange(len(edges))
        else:
            order = np.argsort(np.asarray(colors), kind="stable")
        self.edges = edges[order]
        self.rest = rest[order]
        self.comp = np.ascontiguousarray(comp[order])
        self.lam = np.zeros(len(edges), dtype=F)
        # per-particle edge degree (warm-start relaxation scale; matches
        # build_topology's float32 bincount degree)
        self.deg = np.bincount(
            edges.reshape(-1), minlength=len(self.x)).astype(F)

        if hinges is None:
            hinges = np.zeros((0, 4), np.int64)
        hinges = np.asarray(hinges, dtype=np.int64).reshape(-1, 4)
        rest_angles = (np.asarray(rest_angles, F) if rest_angles is not None
                       else np.zeros(len(hinges), F))
        bcomp = np.broadcast_to(
            np.asarray(0.1 if bend_compliance is None else bend_compliance, F),
            (len(hinges),))
        if bend_colors is None:
            border = np.arange(len(hinges))
        else:
            border = np.argsort(np.asarray(bend_colors), kind="stable")
        self.hinges = hinges[border]
        self.rest_angle = rest_angles[border]
        self.bcomp = np.ascontiguousarray(bcomp[border])
        self.blam = np.zeros(len(hinges), dtype=F)

    # ------------------------------------------------------------------ api
    def add_force(self, force, position, radius=1.0):
        """Radial linear-falloff force injection (SoftBodySimulator.cs:925-942)."""
        force = np.asarray(force, F)
        position = np.asarray(position, F)
        d = np.linalg.norm(self.x - position, axis=1)
        fall = np.clip(1.0 - d / F(radius), 0.0, None) * (d < radius)
        self.f += fall[:, None].astype(F) * force

    def set_pinned(self, position, radius=0.5, pinned=True, mass=1.0):
        d = np.linalg.norm(self.x - np.asarray(position, F), axis=1)
        sel = d < radius
        self.w[sel] = F(0.0) if pinned else F(1.0 / mass)

    def step(self, dt: float):
        cfg = self.cfg
        dt_sub = F(dt / cfg.substeps)
        for s in range(cfg.substeps):
            self._substep(dt_sub, first=(s == 0))
        self.f[:] = 0

    # ------------------------------------------------------------ internals
    def _substep(self, dt: F, first: bool):
        cfg = self.cfg
        if cfg.lambda_mode == LambdaMode.WARM_START:
            # WARM_START is a device-engine scheme (pre-applied carried
            # impulses) with no reference-C# ancestor; the frozen oracle
            # refuses it unless the instance explicitly opted in
            # (warm_start=True) — refusing beats silently running DECAY
            # semantics, and the opt-in keeps the frozen RESET/DECAY
            # truth untouched.
            if not self.warm_start:
                raise NotImplementedError(
                    "ReferenceSolver supports RESET/DECAY lambda modes "
                    "only; construct with warm_start=True for the "
                    "engine-matched WARM_START extension")
            self.lam *= F(cfg.lambda_decay)
            self.blam[:] = 0
        elif cfg.lambda_mode == LambdaMode.RESET:
            self.lam[:] = 0
            self.blam[:] = 0
        else:
            self.lam *= F(cfg.lambda_decay)
            self.blam *= F(cfg.lambda_decay)

        # predict (SoftBodyCPU.cs:294-301).  NB the reference adds `gravity`
        # via AddForce, i.e. gravity is a FORCE: v += dt * w * (g + f_ext);
        # gravity_is_acceleration applies it mass-independently instead.
        g = np.asarray(cfg.gravity, F)
        ext = self.f if first else np.zeros_like(self.f)
        if cfg.gravity_is_acceleration:
            self.v += dt * (np.where((self.w > 0)[:, None], g[None, :], 0)
                            .astype(F) + self.w[:, None] * ext)
        else:
            self.v += dt * self.w[:, None] * (g[None, :] + ext)
        if cfg.damping_mode == DampingMode.PER_STEP:
            self.v *= F(1.0 - min(max(cfg.damping, 0.0), 1.0))
        else:
            self.v *= F(1.0 - cfg.damping * dt)
        if cfg.max_velocity > 0:
            np.clip(self.v, -cfg.max_velocity, cfg.max_velocity, out=self.v)
        pred = self.x + dt * self.v

        if cfg.lambda_mode == LambdaMode.WARM_START:
            self._warm_apply(pred)

        # solver iterations (SoftBodyCPU.cs:307-312): distance, bending, collisions
        for _ in range(cfg.iterations):
            self._solve_distance(pred, dt)
            self._solve_bending(pred, dt)
            self._solve_collisions(pred, dt)

        # finalize (SoftBodyCPU.cs:314-324)
        pinned = self.w == 0
        self.v = (pred - self.x) / dt
        self.v[pinned] = 0
        pred[pinned] = self.x[pinned]
        self.x = pred

    def _warm_apply(self, pred):
        """Pre-apply carried distance impulses — the scalar transcription
        of ``general._warm_apply_distance``: SIMULTANEOUS application along
        the entry ``pred``'s edge directions (corrections staged in a delta
        array, applied once), with the per-edge ``1/max(deg_a, deg_b)``
        relaxation times ``warm_start_fraction``, and the carried
        multiplier clamped to ``warm_start_clamp * rest / max(w)`` AFTER
        scaling so the XPBD feedback term matches what was applied."""
        cfg = self.cfg
        lam = self.lam
        delta = np.zeros_like(pred)
        frac = F(cfg.warm_start_fraction)
        for i in range(len(self.edges)):
            a, b = self.edges[i]
            wa, wb = self.w[a], self.w[b]
            scale = F(1.0) / max(self.deg[a], self.deg[b], F(1.0))
            if cfg.warm_start_fraction != 1.0:
                scale = scale * frac
            li = lam[i] * scale
            if cfg.warm_start_clamp > 0:
                wmax = max(wa, wb, F(1e-12))
                lim = F(cfg.warm_start_clamp) * self.rest[i] / wmax
                li = np.clip(li, -lim, lim)
            lam[i] = li
            d = pred[b] - pred[a]
            length = F(np.sqrt(max(np.dot(d, d), F(1e-24))))
            dp = li * (d / length)
            delta[a] -= wa * dp
            delta[b] += wb * dp
        pred += delta

    def _solve_distance(self, pred, dt):
        cfg = self.cfg
        inv_dt2 = F(1.0 / (dt * dt))
        for i in range(len(self.edges)):
            a, b = self.edges[i]
            wa, wb = self.w[a], self.w[b]
            if wa < cfg.static_inv_mass_eps and wb < cfg.static_inv_mass_eps:
                continue
            d = pred[b] - pred[a]
            length = F(np.sqrt(np.dot(d, d)))
            if length < cfg.eps_length:
                continue
            n = d / length
            c = length - self.rest[i]
            alpha = self.comp[i] * inv_dt2
            if cfg.min_alpha_tilde > 0:
                alpha = max(alpha, F(cfg.min_alpha_tilde))
            denom = wa + wb + alpha
            if abs(denom) < cfg.eps_denominator:
                continue
            dl = (-c - alpha * self.lam[i]) / denom
            if cfg.max_dlambda > 0:
                dl = np.clip(dl, -cfg.max_dlambda, cfg.max_dlambda)
            if cfg.max_dlambda_rel > 0:
                m = cfg.max_dlambda_rel * self.rest[i]
                dl = np.clip(dl, -m, m)
            self.lam[i] += dl
            if cfg.lambda_clamp > 0:
                self.lam[i] = np.clip(self.lam[i], -cfg.lambda_clamp, cfg.lambda_clamp)
            pred[a] -= wa * dl * n
            pred[b] += wb * dl * n

    def _solve_bending(self, pred, dt):
        cfg = self.cfg
        if len(self.hinges) == 0:
            return
        inv_dt2 = F(1.0 / (dt * dt))
        for i in range(len(self.hinges)):
            ia, ib, ic, id_ = self.hinges[i]
            wa, wb, wc, wd = self.w[ia], self.w[ib], self.w[ic], self.w[id_]
            if max(wa, wb, wc, wd) < cfg.static_inv_mass_eps:
                continue
            pa, pb, pc, pd = pred[ia], pred[ib], pred[ic], pred[id_]
            e0, e1, e2 = pb - pa, pc - pa, pd - pa
            n1 = np.cross(e0, e1)
            n2 = np.cross(e2, e0)
            l1sq, l2sq = np.dot(n1, n1), np.dot(n2, n2)
            if l1sq < 1e-9 or l2sq < 1e-9:
                continue
            l1, l2 = F(np.sqrt(l1sq)), F(np.sqrt(l2sq))
            n1n, n2n = n1 / l1, n2 / l2
            cos = F(np.clip(np.dot(n1n, n2n), -1.0, 1.0))
            angle = F(np.arccos(cos))
            c = angle - self.rest_angle[i]
            sin = F(np.sin(angle))
            if abs(sin) < cfg.bend_skip_sin_eps:
                continue
            alpha = self.bcomp[i] * inv_dt2
            if abs(sin) < cfg.bend_soften_sin_eps:
                alpha *= F(cfg.bend_soften_factor)
            inv_sin = F(1.0) / sin
            # corrected analytic gradients (see ops/bending.py: the
            # reference's own formulas do not match the gradient of its C)
            a_vec = (n2n - cos * n1n) / l1
            b_vec = (n1n - cos * n2n) / l2
            grad_b = -inv_sin * (np.cross(e1, a_vec) + np.cross(b_vec, e2))
            grad_c = -inv_sin * np.cross(a_vec, e0)
            grad_d = -inv_sin * np.cross(e0, b_vec)
            grad_a = -grad_b - grad_c - grad_d
            s = (wa * np.dot(grad_a, grad_a) + wb * np.dot(grad_b, grad_b)
                 + wc * np.dot(grad_c, grad_c) + wd * np.dot(grad_d, grad_d))
            denom = s + alpha
            if denom < 1e-9:
                continue
            dl = (-c - alpha * self.blam[i]) / denom
            if cfg.max_dlambda > 0:
                dl = np.clip(dl, -cfg.max_dlambda, cfg.max_dlambda)
            self.blam[i] += dl
            pred[ia] += wa * dl * grad_a
            pred[ib] += wb * dl * grad_b
            pred[ic] += wc * dl * grad_c
            pred[id_] += wd * dl * grad_d

    def _solve_collisions(self, pred, dt):
        cfg = self.cfg
        if cfg.floor_mode != FloorMode.XPBD_INEQUALITY:
            return
        inv_dt2 = F(1.0 / (dt * dt))
        gh = F(cfg.ground_height)
        for i in range(len(pred)):
            if self.w[i] < cfg.static_inv_mass_eps:
                continue
            if pred[i][1] >= gh:
                continue
            c = gh - pred[i][1]
            alpha = F(cfg.collision_compliance) * inv_dt2
            denom = self.w[i] + alpha
            if abs(denom) < cfg.eps_denominator:
                continue
            dl = c / denom
            pred[i][1] += self.w[i] * dl
            # positional friction (SoftBodyCPU.cs:392-397)
            vel = (pred[i] - self.x[i]) / dt
            vt = vel.copy()
            vt[1] = 0
            pred[i] -= vt * (dt * F(min(max(cfg.friction, 0.0), 1.0)))
