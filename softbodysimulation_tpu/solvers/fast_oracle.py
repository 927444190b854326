"""Vectorized second oracle: color-blocked NumPy Gauss-Seidel, validated
bit-exact against the frozen scalar oracle.

``solvers/reference_cpu.ReferenceSolver`` (FROZEN) processes constraints in
color-major order, one scalar solve at a time — faithful to
``SoftBodyCPU.cs:269-325`` but ~10 us/constraint, which makes full-bunny
10k-step drift sweeps take ~28 h (ROADMAP round 2 #5).  Within one color no
two constraints share a particle (``topology/coloring.validate_coloring``),
so every constraint in a color reads a disjoint slice of ``pred`` and writes
a disjoint slice: the sequential scalar loop over a color block and a single
vectorized sweep over that block perform the *same float32 operations in the
same per-constraint order*, hence produce bit-identical results.  This class
exploits exactly that — one fancy-indexed NumPy sweep per color — for a
~500x speedup with zero semantic change.

It is NOT the root of trust: ``tests/test_fast_oracle.py`` asserts bitwise
equality with the frozen oracle on every scene family (clamps, bending,
contact, DECAY, forces, pinning), and the frozen oracle stays the thing
device engines are defined against.  This one exists to make long-horizon /
full-scale drift validation tractable.

Bit-exactness notes (why the formulas below look pedantic):
- ``np.dot(u, v)`` on float32 3-vectors dispatches to OpenBLAS sdot, which
  (Zen kernel, verified empirically: 0/200k mismatches) rounds each product
  to float32 but accumulates the sum in double, rounding once at the end.
  ``_dot3`` reproduces exactly that; a plain float32 ``(x*x+y*y)+z*z``
  differs in the last ulp ~20% of the time.
- NumPy 2 weak-scalar promotion keeps ``python_float * float32_array`` in
  float32, matching the scalar path's ``cfg.knob * float32_scalar``.
- Skipped constraints (static pair, degenerate length, tiny denominator)
  must leave ``lam`` and ``pred`` untouched bit-for-bit, so every masked
  update uses ``np.where(active, new, old)`` rather than adding a zero
  (which would flush ``-0.0`` to ``+0.0``).
"""

from __future__ import annotations

import numpy as np

from ..core.config import FloorMode
from ..topology import coloring as _coloring
from .reference_cpu import F, ReferenceSolver


def _dot3(u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """Row-wise 3-vector dot bit-matching ``np.dot`` (BLAS sdot): float32
    products, float64 accumulation, single final rounding."""
    p = u * v
    return ((p[:, 0].astype(np.float64) + p[:, 1]) + p[:, 2]).astype(F)


def _blocks(sorted_colors: np.ndarray):
    """[(lo, hi), ...] contiguous runs of equal color in a sorted array."""
    k = len(sorted_colors)
    if k == 0:
        return []
    change = np.flatnonzero(np.diff(sorted_colors)) + 1
    bounds = np.concatenate([[0], change, [k]])
    return list(zip(bounds[:-1].tolist(), bounds[1:].tolist()))


class FastReferenceSolver(ReferenceSolver):
    """Drop-in ReferenceSolver with vectorized per-color sweeps.

    Same constructor; if ``colors``/``bend_colors`` are omitted they are
    computed with the deterministic greedy colorer (the frozen oracle would
    then run in *input* order instead — pass explicit colors when you need
    bit-comparison against a colors=None frozen instance).
    """

    def __init__(self, positions, edges, rest_lengths, compliance, inv_mass,
                 config, hinges=None, rest_angles=None, bend_compliance=None,
                 colors=None, bend_colors=None, warm_start=False):
        n = len(np.asarray(positions))
        edges_arr = np.asarray(edges, dtype=np.int64).reshape(-1, 2)
        if colors is None and len(edges_arr):
            colors = _coloring.greedy_color(edges_arr, n)
        hinges_arr = (np.asarray(hinges, dtype=np.int64).reshape(-1, 4)
                      if hinges is not None else np.zeros((0, 4), np.int64))
        if bend_colors is None and len(hinges_arr):
            bend_colors = _coloring.greedy_color(hinges_arr, n)
        super().__init__(positions, edges, rest_lengths, compliance, inv_mass,
                         config, hinges=hinges, rest_angles=rest_angles,
                         bend_compliance=bend_compliance, colors=colors,
                         bend_colors=bend_colors, warm_start=warm_start)
        ecolors = (np.sort(np.asarray(colors)) if colors is not None
                   else np.zeros(len(self.edges), np.int32))
        bcolors = (np.sort(np.asarray(bend_colors)) if bend_colors is not None
                   else np.zeros(len(self.hinges), np.int32))
        if len(self.edges) and not _coloring.validate_coloring(
                self.edges, ecolors):
            raise ValueError("edge coloring invalid: same-color constraints "
                             "share a particle (vectorized sweep unsound)")
        if len(self.hinges) and not _coloring.validate_coloring(
                self.hinges, bcolors):
            raise ValueError("hinge coloring invalid")
        self._eblocks = _blocks(ecolors)
        self._hblocks = _blocks(bcolors)

    # ---------------------------------------------------------- vectorized
    def _warm_apply(self, pred):
        """Vectorized WARM_START pre-application, bit-exact to the scalar
        ``ReferenceSolver._warm_apply``: the application is SIMULTANEOUS
        (directions from the entry pred, corrections staged then applied
        once), so the only order-sensitive operation is the per-particle
        accumulation of the staged corrections — reproduced exactly by one
        unbuffered ``np.add.at`` over indices interleaved [a0, b0, a1, b1,
        ...], which applies additions in element order, i.e. the scalar
        loop's edge order with a-before-b within each edge."""
        cfg = self.cfg
        e = self.edges
        if not len(e):
            return
        a, b = e[:, 0], e[:, 1]
        wa, wb = self.w[a], self.w[b]
        scale = F(1.0) / np.maximum(np.maximum(self.deg[a], self.deg[b]),
                                    F(1.0))
        if cfg.warm_start_fraction != 1.0:
            scale = scale * F(cfg.warm_start_fraction)
        li = self.lam * scale
        if cfg.warm_start_clamp > 0:
            wmax = np.maximum(np.maximum(wa, wb), F(1e-12))
            lim = F(cfg.warm_start_clamp) * self.rest / wmax
            li = np.clip(li, -lim, lim)
        self.lam[:] = li
        d = pred[b] - pred[a]
        length = np.sqrt(np.maximum(_dot3(d, d), F(1e-24)))
        dp = li[:, None] * (d / length[:, None])
        idx = np.empty(2 * len(e), np.int64)
        idx[0::2] = a
        idx[1::2] = b
        vals = np.empty((2 * len(e), 3), F)
        vals[0::2] = -wa[:, None] * dp
        vals[1::2] = wb[:, None] * dp
        delta = np.zeros_like(pred)
        np.add.at(delta, idx, vals)
        pred += delta

    def _solve_distance(self, pred, dt):
        cfg = self.cfg
        inv_dt2 = F(1.0 / (dt * dt))
        w = self.w
        for lo, hi in self._eblocks:
            a = self.edges[lo:hi, 0]
            b = self.edges[lo:hi, 1]
            wa = w[a]
            wb = w[b]
            d = pred[b] - pred[a]
            length = np.sqrt(_dot3(d, d))
            active = ~((wa < cfg.static_inv_mass_eps)
                       & (wb < cfg.static_inv_mass_eps))
            active &= length >= cfg.eps_length
            safe_len = np.where(length > 0, length, F(1.0))
            n = d / safe_len[:, None]
            c = length - self.rest[lo:hi]
            alpha = self.comp[lo:hi] * inv_dt2
            if cfg.min_alpha_tilde > 0:
                alpha = np.maximum(alpha, F(cfg.min_alpha_tilde))
            denom = wa + wb + alpha
            active &= np.abs(denom) >= cfg.eps_denominator
            safe_denom = np.where(denom != 0, denom, F(1.0))
            dl = (-c - alpha * self.lam[lo:hi]) / safe_denom
            if cfg.max_dlambda > 0:
                dl = np.clip(dl, -cfg.max_dlambda, cfg.max_dlambda)
            if cfg.max_dlambda_rel > 0:
                m = cfg.max_dlambda_rel * self.rest[lo:hi]
                dl = np.clip(dl, -m, m)
            new_lam = self.lam[lo:hi] + dl
            if cfg.lambda_clamp > 0:
                new_lam = np.clip(new_lam, -cfg.lambda_clamp,
                                  cfg.lambda_clamp)
            self.lam[lo:hi] = np.where(active, new_lam, self.lam[lo:hi])
            # grouping matters for bit-exactness: frozen computes
            # ``wa * dl * n`` left-to-right, i.e. ``(wa*dl) * n``
            mask = active[:, None]
            pred[a] = np.where(mask, pred[a] - (wa * dl)[:, None] * n, pred[a])
            pred[b] = np.where(mask, pred[b] + (wb * dl)[:, None] * n, pred[b])

    def _solve_bending(self, pred, dt):
        cfg = self.cfg
        if len(self.hinges) == 0:
            return
        inv_dt2 = F(1.0 / (dt * dt))
        w = self.w
        for lo, hi in self._hblocks:
            ia = self.hinges[lo:hi, 0]
            ib = self.hinges[lo:hi, 1]
            ic = self.hinges[lo:hi, 2]
            id_ = self.hinges[lo:hi, 3]
            wa, wb, wc, wd = w[ia], w[ib], w[ic], w[id_]
            active = np.maximum(np.maximum(wa, wb), np.maximum(wc, wd)) \
                >= cfg.static_inv_mass_eps
            pa, pb, pc, pd = pred[ia], pred[ib], pred[ic], pred[id_]
            e0, e1, e2 = pb - pa, pc - pa, pd - pa
            n1 = np.cross(e0, e1)
            n2 = np.cross(e2, e0)
            l1sq = _dot3(n1, n1)
            l2sq = _dot3(n2, n2)
            active &= (l1sq >= 1e-9) & (l2sq >= 1e-9)
            l1 = np.sqrt(np.where(l1sq > 0, l1sq, F(1.0)))
            l2 = np.sqrt(np.where(l2sq > 0, l2sq, F(1.0)))
            n1n = n1 / l1[:, None]
            n2n = n2 / l2[:, None]
            cos = np.clip(_dot3(n1n, n2n), -1.0, 1.0)
            angle = np.arccos(cos)
            c = angle - self.rest_angle[lo:hi]
            sin = np.sin(angle)
            active &= np.abs(sin) >= cfg.bend_skip_sin_eps
            alpha = self.bcomp[lo:hi] * inv_dt2
            alpha = np.where(np.abs(sin) < cfg.bend_soften_sin_eps,
                             alpha * F(cfg.bend_soften_factor), alpha)
            inv_sin = F(1.0) / np.where(sin != 0, sin, F(1.0))
            a_vec = (n2n - cos[:, None] * n1n) / l1[:, None]
            b_vec = (n1n - cos[:, None] * n2n) / l2[:, None]
            grad_b = -inv_sin[:, None] * (np.cross(e1, a_vec)
                                          + np.cross(b_vec, e2))
            grad_c = -inv_sin[:, None] * np.cross(a_vec, e0)
            grad_d = -inv_sin[:, None] * np.cross(e0, b_vec)
            grad_a = -grad_b - grad_c - grad_d

            s = (wa * _dot3(grad_a, grad_a) + wb * _dot3(grad_b, grad_b)
                 + wc * _dot3(grad_c, grad_c) + wd * _dot3(grad_d, grad_d))
            denom = s + alpha
            active &= denom >= 1e-9
            safe_denom = np.where(denom != 0, denom, F(1.0))
            dl = (-c - alpha * self.blam[lo:hi]) / safe_denom
            if cfg.max_dlambda > 0:
                dl = np.clip(dl, -cfg.max_dlambda, cfg.max_dlambda)
            self.blam[lo:hi] = np.where(active, self.blam[lo:hi] + dl,
                                        self.blam[lo:hi])
            mask = active[:, None]
            pred[ia] = np.where(mask, pred[ia] + (wa * dl)[:, None] * grad_a,
                                pred[ia])
            pred[ib] = np.where(mask, pred[ib] + (wb * dl)[:, None] * grad_b,
                                pred[ib])
            pred[ic] = np.where(mask, pred[ic] + (wc * dl)[:, None] * grad_c,
                                pred[ic])
            pred[id_] = np.where(mask, pred[id_] + (wd * dl)[:, None] * grad_d,
                                 pred[id_])

    def _solve_collisions(self, pred, dt):
        cfg = self.cfg
        if cfg.floor_mode != FloorMode.XPBD_INEQUALITY:
            return
        inv_dt2 = F(1.0 / (dt * dt))
        gh = F(cfg.ground_height)
        w = self.w
        active = (w >= cfg.static_inv_mass_eps) & (pred[:, 1] < gh)
        c = gh - pred[:, 1]
        alpha = F(cfg.collision_compliance) * inv_dt2
        denom = w + alpha
        active &= np.abs(denom) >= cfg.eps_denominator
        safe_denom = np.where(denom != 0, denom, F(1.0))
        dl = c / safe_denom
        pred[:, 1] = np.where(active, pred[:, 1] + w * dl, pred[:, 1])
        # positional friction (SoftBodyCPU.cs:392-397): y-component of the
        # tangential velocity is zeroed, so only x/z move
        scale = dt * F(min(max(cfg.friction, 0.0), 1.0))
        vx = (pred[:, 0] - self.x[:, 0]) / dt
        vz = (pred[:, 2] - self.x[:, 2]) / dt
        pred[:, 0] = np.where(active, pred[:, 0] - vx * scale, pred[:, 0])
        pred[:, 2] = np.where(active, pred[:, 2] - vz * scale, pred[:, 2])
