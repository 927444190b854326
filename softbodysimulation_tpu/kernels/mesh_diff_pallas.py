"""Fused Mosaic BACKWARD for the mesh kernel's distance-sweep substep.

``kernels/diff.py`` pairs the fused mesh forward with the XLA engine's VJP
— honest, but the gradient step then costs exactly what differentiating
the XLA engine costs (round-3 verdict item 4).  This module hand-writes
the backward as a Pallas kernel, exploiting that the windowed signed
one-hot structure is SELF-TRANSPOSING: the same ``Gd`` block matrix that
gathers endpoint differences in the forward carries the ``d``-cotangents
back to the particle window in the backward (and the gather contraction
doubles as the scatter-cotangent carrier), so the backward substep runs
the exact MXU contractions the forward already uses — three per block
instead of two — plus elementwise VJPs for predict / Chebyshev /
floor-contact / finalize.

Construction (custom-VJP):

  primal   — the fused mesh kernel, unchanged (``make_mesh_substep_runner``);
  residual — the INPUT state only; the backward recomputes chunk-boundary
             states with the same fused kernel (identical arithmetic, so
             the linearization point IS the primal trajectory — no
             straight-through approximation);
  backward — ONE Pallas program per C-substep chunk, run in a reverse
             ``lax.scan`` over chunks: phase A replays the chunk's C
             substeps (K Jacobi iterations each) in-kernel, stashing every
             iteration's entry positions / Chebyshev-prev / multipliers,
             the post-sweep positions, and each substep's entry state in
             VMEM scratch (traced leading-axis stash indexing — probed on
             hardware, scripts/probe_stash_index.py); phase B walks
             substeps and iterations backward propagating cotangents.

The chunking is the memory story AND the dispatch story: only the
N/C chunk-boundary states ever exist in HBM (built-in sqrt-style
rematerialisation — no ``jax.checkpoint`` needed), and a 40-substep
gradient runs as a handful of Mosaic calls instead of hundreds of XLA
ops (the axon relay charges ~20 ms per HOST call, so wall-clock wins
also need few, fat device programs — BENCHMARKS.md methodology notes).

Cotangent contract: gradients flow to ``positions``, ``velocities`` and
``lambda_dist`` (and through the reverse scan to the initial state).
``inv_mass`` and ``ext_force`` get ZERO cotangents — mass gradients stay
with the XLA pairing (``kernels/diff.py``'s heterogeneous-ensemble
factory); the runner is built ``with_ext=False`` so ext_force never
enters the forward either.

Envelope (checked; the error names the fallback): JACOBI solve mode
(Chebyshev-accelerated or plain), RESET/DECAY/WARM_START lambda modes,
distance constraints only, floor NONE or XPBD_INEQUALITY, no rigid
colliders, no self-collision, exact math, single body.  Everything else
keeps the paired XLA backward.

WARM_START (the shipped ``__graft_entry__.entry()`` config) adds one
extra sweep per substep — the carried-impulse pre-application
(``general._warm_apply_distance``) — whose VJP is the SAME self-
transposing one-hot algebra with the multiplier held fixed: the carried
lambda cotangent chains through clip -> static per-edge scale -> decay
across substeps, and the pre-apply's position cotangent rides the usual
gather/scatter pair.  The substep-entry multipliers are stashed one slab
per substep (``st_wlam``) and the POST-PREDICT positions one plane set
per substep (``st_wx`` — restored via ``pred[:] = st_wx[sub]`` in the
cotangent phase; both are counted in ``_backward_vmem_bytes``).

Reference intent: the reference solver is not differentiable at all; this
is TPU-native capability beyond ``SoftBodyCPU.cs`` (cited for the substep
semantics via kernels/mesh_pallas.py).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.config import (DampingMode, FloorMode, LambdaMode, SolveMode,
                           SolverConfig)
from ..core.state import SimState, Topology
from ..ops.mxu_exact import dot_oh
from .mesh_pallas import VMEM_BUDGET, build_mesh_plan, make_mesh_substep_runner


def check_fused_backward_envelope(cfg: SolverConfig, topo: Topology):
    """Raise NotImplementedError when the config/topology is outside the
    fused-backward envelope (module docstring)."""
    why = None
    if cfg.solve_mode != SolveMode.JACOBI:
        why = f"solve mode {cfg.solve_mode} (JACOBI only)"
    elif cfg.lambda_mode not in (LambdaMode.RESET, LambdaMode.DECAY,
                                 LambdaMode.WARM_START):
        why = f"lambda mode {cfg.lambda_mode}"
    elif cfg.enable_bending and topo.n_hinges > 0:
        why = "bending constraints"
    elif cfg.enable_volume and topo.triangles.shape[0] > 0:
        why = "the global volume constraint"
    elif cfg.enable_tet_volume and topo.n_tets > 0:
        why = "per-tet volume constraints"
    elif cfg.enable_self_collision:
        why = "self-collision"
    elif cfg.floor_mode == FloorMode.VELOCITY_REFLECT:
        why = "the velocity-reflect floor"
    elif cfg.sphere_colliders or cfg.box_colliders:
        why = "rigid colliders"
    if why is not None:
        raise NotImplementedError(
            f"fused mesh backward does not cover {why} — use the paired "
            "XLA backward (kernels.diff.make_differentiable_mesh_runner "
            "with backward='xla')")


def _om_schedule(cfg: SolverConfig) -> np.ndarray:
    """Chebyshev omega per iteration (data-independent — mirrors the
    forward kernel's in-loop recurrence exactly)."""
    rho2 = cfg.jacobi_rho ** 2
    oms, om = [], 1.0
    for it in range(cfg.iterations):
        if it < cfg.jacobi_cheby_delay:
            om_n = 1.0
        elif it == cfg.jacobi_cheby_delay:
            om_n = 2.0 / (2.0 - rho2)
        else:
            om_n = 4.0 / (4.0 - rho2 * om)
        oms.append(om_n)
        om = om_n
    return np.asarray(oms, np.float32).reshape(1, -1)


def _backward_vmem_bytes(plan, cfg: SolverConfig, C: int) -> int:
    """VMEM bytes for a C-substep backward-chunk program."""
    K = cfg.iterations
    n_pad = plan.n_pad
    plane_b = 3 * n_pad * 4
    slab_b = plan.n_blocks * plan.block_edges * 4
    accelerate = (cfg.jacobi_rho > 0
                  and cfg.iterations > cfg.jacobi_cheby_delay)
    n_stash = 3 if accelerate else 2           # st_pred, st_new (+st_prev)
    need_v = cfg.world_bounds > 0 or cfg.max_velocity > 0
    if plan.synth:
        struct_b = (2 * plan.n_blocks * plan.block_edges * 4
                    + 4 * max(plan.widths) * plan.block_edges * 2)
    else:
        struct_b = 2 * plan.n_blocks * plan.window * plan.block_edges * 2
    planes = (6 + 2                            # x,v,gx,gv in + gxo,gvo out
              + 9                              # xw,vw,pred,delta,gp,gprev,
              #                                  gxc,gvc (+1 slack)
              + C * (1 + int(need_v))          # st_x (+st_v)
              + C * K * n_stash)
    slabs = 10 + C * K                         # io slabs + lamw + st_lam
    if cfg.lambda_mode == LambdaMode.WARM_START:
        # st_wlam stash + carried-warm slab; the wlim input slab exists
        # only when the clamp is active (mirrors the arg construction)
        slabs += C + 1 + int(cfg.warm_start_clamp > 0)
        planes += C                            # st_wx (post-predict stash)
    return planes * plane_b + slabs * slab_b + struct_b


def _make_backward_chunk(topo: Topology, cfg: SolverConfig, dt: float,
                         plan, C: int):
    """Jitted ``(inv_mass, x, v, lam, gx, gv, glam) -> (gx0, gv0, glam0)``:
    the VJP of C fused substeps, linearized at the chunk-entry state
    ``(x, v, lam)`` — one Pallas program (in-kernel replay + cotangent
    phases, module docstring)."""
    if plan.color_ranges is not None:
        raise NotImplementedError("fused mesh backward: JACOBI plans only")
    k_blocks, s_edges = plan.n_blocks, plan.block_edges
    n = topo.n_particles
    n_pad = plan.n_pad
    e_real = topo.n_edges
    K = cfg.iterations
    inv_dt2 = 1.0 / (dt * dt)
    gx_, gy_, gz_ = cfg.gravity
    accelerate = (cfg.jacobi_rho > 0
                  and cfg.iterations > cfg.jacobi_cheby_delay)
    gamma = cfg.jacobi_gamma
    has_contacts = cfg.floor_mode == FloorMode.XPBD_INEQUALITY
    need_v = cfg.world_bounds > 0 or cfg.max_velocity > 0
    fr = min(max(cfg.friction, 0.0), 1.0)
    alpha_col = cfg.collision_compliance * inv_dt2
    if cfg.damping_mode == DampingMode.PER_STEP:
        dampf = 1.0 - min(max(cfg.damping, 0.0), 1.0)
    else:
        dampf = 1.0 - cfg.damping * dt

    need = _backward_vmem_bytes(plan, cfg, C)
    if need > VMEM_BUDGET:
        raise NotImplementedError(
            f"fused mesh backward chunk needs ~{need / 1e6:.1f} MB of VMEM "
            f"(C={C}, iterations={K}, n_pad={n_pad}) — exceeds the budget")

    if plan.synth:
        didx_c = jnp.asarray(plan.didx)
    else:
        gd_c = jnp.asarray(plan.gd)
        gs_c = jnp.asarray(plan.gs)
    rest_c = jnp.asarray(plan.rest)
    alpha_c = jnp.asarray(plan.alpha)
    relax_c = jnp.asarray(plan.relax)
    bound_c = (None if plan.dl_bound is None
               else jnp.asarray(plan.dl_bound))
    valid_c = jnp.asarray(plan.valid)
    ea_c = jnp.asarray(plan.ea)
    eb_c = jnp.asarray(plan.eb)
    om_c = jnp.asarray(_om_schedule(cfg))
    warm = cfg.lambda_mode == LambdaMode.WARM_START
    warm_c = jnp.asarray(plan.warm_scale) if warm else None
    warm_clamped = warm and cfg.warm_start_clamp > 0
    wsf = cfg.warm_start_fraction

    in_names = (["x", "v", "w", "lam", "di", "act",
                 "rest", "alpha", "relax"]
                + (["warm"] if warm else [])
                + (["wlim"] if warm_clamped else [])
                + (["bound"] if bound_c is not None else [])
                + (["didx"] if plan.synth else ["gd", "gs"])
                + ["gx", "gv", "glam"]
                + (["om"] if accelerate else []))

    def kernel(*refs):
        m = dict(zip(in_names, refs))
        x_in, v_in, w_in, lam_in = m["x"], m["v"], m["w"], m["lam"]
        di, act = m["di"], m["act"]
        rest_r, alpha_r, relax_r = m["rest"], m["alpha"], m["relax"]
        bnd = m.get("bound")
        gx_ct, gv_ct, glam_ct = m["gx"], m["gv"], m["glam"]
        om_ref = m.get("om")
        gxo, gvo, glamo = refs[len(in_names):]

        def scoped(xw, vw, pred, delta, gp, gprev, gxc, gvc, lamw,
                   st_x, st_pred, st_new, st_lam, st_v=None, st_prev=None,
                   st_wlam=None, st_wx=None):
            w = w_in[:]                          # (1, n_pad)
            pinned = w == 0.0
            warm_r = m.get("warm")
            wlim_r = m.get("wlim")

            def gdk_of(kb):
                wk = plan.widths[kb]
                if plan.synth:
                    iota = lax.broadcasted_iota(jnp.int32, (wk, s_edges), 0)
                    dloc = m["didx"][kb]
                    return ((iota == dloc[1:2]).astype(jnp.bfloat16)
                            - (iota == dloc[0:1]).astype(jnp.bfloat16))
                return m["gd"][kb]

            def gath(a3w, gdk):
                """(3, Wk) @ block -> (3, S) — the forward gather; also
                carries wd-cotangents to the slot axis in the backward."""
                return dot_oh(a3w, gdk, (((1,), (0,)), ((), ())),
                              exact=True, stack_axis=0)

            def scat(a3s, kb, gdk):
                """(3, S) -> (3, Wk) — the forward scatter; also carries
                d-cotangents back to the particle window."""
                if plan.synth:
                    return dot_oh(a3s, gdk, (((1,), (1,)), ((), ())),
                                  exact=True, stack_axis=0)
                return dot_oh(a3s, m["gs"][kb], (((1,), (0,)), ((), ())),
                              exact=True, stack_axis=0)

            def block_fwd(kb, gdk, win, lam_e):
                """Replay one block's forward quantities from its entry
                window and multipliers (identical arithmetic to
                mesh_pallas.solve_block, exact math)."""
                d = gath(win, gdk)                        # (3, S)
                len_sq = (d[0:1] * d[0:1] + d[1:2] * d[1:2]
                          + d[2:3] * d[2:3])
                length = jnp.sqrt(jnp.maximum(len_sq, 1e-24))
                cerr = length - rest_r[kb]
                u = (-cerr - alpha_r[kb] * lam_e) * di[kb]
                if bnd is not None:
                    b = bnd[kb]
                    u_cl = jnp.clip(u, -b, b)
                else:
                    u_cl = u
                dl = u_cl * relax_r[kb]
                active = (act[kb] > 0.5) & (length >= cfg.eps_length)
                dl = jnp.where(active, dl, 0.0)
                lam_f = lam_e + dl
                if cfg.lambda_clamp > 0:
                    lam_f = jnp.clip(lam_f, -cfg.lambda_clamp,
                                     cfg.lambda_clamp)
                scale = dl / length
                return d, len_sq, length, u, dl, lam_f, scale, active

            def sweep_fwd():
                """Forward distance sweep on pred/lamw (replay phase)."""
                delta[:] = jnp.zeros_like(delta)
                for kb in range(k_blocks):
                    b0, wk = plan.bases[kb], plan.widths[kb]
                    gdk = gdk_of(kb)
                    win = pred[:, b0:b0 + wk]
                    d, _, _, _, dl, lam_f, scale, _ = block_fwd(
                        kb, gdk, win, lamw[kb])
                    lamw[kb] = lam_f
                    delta[:, b0:b0 + wk] += scat(d * scale, kb, gdk)
                # per-coordinate apply (no (1,N)->(3,N) broadcast: Mosaic
                # rejects sublane-broadcasts of lane-padded operands)
                for c in range(3):
                    pred[c:c + 1] += w * delta[c:c + 1]

            def sweep_bwd(si, g_after):
                """VJP of one sweep, linearized at stash slot ``si``'s
                entry state.  Updates ``glamo`` (the running multiplier
                cotangent) in place; returns the entry-pred cotangent."""
                pred[:] = st_pred[si]
                lamw[:] = st_lam[si]
                delta[:] = jnp.zeros_like(delta)
                for kb in range(k_blocks):
                    b0, wk = plan.bases[kb], plan.widths[kb]
                    gdk = gdk_of(kb)
                    win = pred[:, b0:b0 + wk]
                    lam_e = lamw[kb]
                    (d, len_sq, length, u, dl, lam_f, scale,
                     active) = block_fwd(kb, gdk, win, lam_e)
                    # pred' = pred + w * delta: fold the destination
                    # inverse mass into the window cotangent (per-row —
                    # Mosaic rejects sublane-broadcasts of lane slices)
                    wwin = w[:, b0:b0 + wk]
                    g_wd = jnp.concatenate(
                        [wwin * g_after[c:c + 1, b0:b0 + wk]
                         for c in range(3)], axis=0)
                    g_dp = gath(g_wd, gdk)                # (3, S)
                    g_d = g_dp * scale
                    g_scale = (g_dp[0:1] * d[0:1] + g_dp[1:2] * d[1:2]
                               + g_dp[2:3] * d[2:3])      # (1, S)
                    g_dl = g_scale / length
                    g_len_sc = -g_scale * scale / length
                    g_lam_o = glamo[kb]
                    if cfg.lambda_clamp > 0:
                        lam_pre = lam_e + dl
                        inl = ((lam_pre > -cfg.lambda_clamp)
                               & (lam_pre < cfg.lambda_clamp))
                        g_lam_o = jnp.where(inl, g_lam_o, 0.0)
                    g_dl_tot = jnp.where(active, g_dl + g_lam_o, 0.0)
                    g_u = g_dl_tot * relax_r[kb]
                    if bnd is not None:
                        b = bnd[kb]
                        g_u = jnp.where((u > -b) & (u < b), g_u, 0.0)
                    g_cerr = -di[kb] * g_u
                    glamo[kb] = g_lam_o - alpha_r[kb] * di[kb] * g_u
                    g_length = g_cerr + g_len_sc
                    g_lsq = jnp.where(len_sq >= 1e-24,
                                      g_length * 0.5 / length, 0.0)
                    g_d = g_d + d * (2.0 * g_lsq)
                    delta[:, b0:b0 + wk] += scat(g_d, kb, gdk)
                return g_after + delta[:]

            def warm_block_fwd(kb, gdk, win, lam_e):
                """Replay one block of the warm pre-apply from its entry
                window and DECAYED entry multipliers (identical arithmetic
                to mesh_pallas's sweep('warm'), exact math)."""
                d = gath(win, gdk)                        # (3, S)
                len_sq = (d[0:1] * d[0:1] + d[1:2] * d[1:2]
                          + d[2:3] * d[2:3])
                length = jnp.sqrt(jnp.maximum(len_sq, 1e-24))
                lam_pre = lam_e * warm_r[kb]
                if wsf != 1.0:
                    lam_pre = lam_pre * wsf
                if wlim_r is not None:
                    lim = wlim_r[kb]
                    lam_f = jnp.clip(lam_pre, -lim, lim)
                else:
                    lam_f = lam_pre
                dl = jnp.where(relax_r[kb] > 0.0, lam_f, 0.0)
                scale = dl / length
                return d, len_sq, length, lam_pre, lam_f, scale

            def warm_fwd():
                """Forward warm pre-apply on pred/lamw (replay phase) —
                carried multipliers applied along current directions, the
                scaled multiplier stored back as iteration-0's entry."""
                delta[:] = jnp.zeros_like(delta)
                for kb in range(k_blocks):
                    b0, wk = plan.bases[kb], plan.widths[kb]
                    gdk = gdk_of(kb)
                    win = pred[:, b0:b0 + wk]
                    d, _, _, _, lam_f, scale = warm_block_fwd(
                        kb, gdk, win, lamw[kb])
                    lamw[kb] = lam_f
                    delta[:, b0:b0 + wk] += scat(d * scale, kb, gdk)
                for c in range(3):
                    pred[c:c + 1] += w * delta[c:c + 1]

            def warm_bwd(sub, g_after):
                """VJP of the warm pre-apply, linearized at substep
                ``sub``'s entry: ``pred`` must already hold the
                recomputed post-predict positions.  Transforms ``glamo``
                from the pre-apply's OUTPUT-multiplier cotangent to its
                (decayed) entry-multiplier cotangent; returns the
                post-predict position cotangent."""
                lamw[:] = st_wlam[sub]
                delta[:] = jnp.zeros_like(delta)
                for kb in range(k_blocks):
                    b0, wk = plan.bases[kb], plan.widths[kb]
                    gdk = gdk_of(kb)
                    win = pred[:, b0:b0 + wk]
                    (d, len_sq, length, lam_pre, lam_f,
                     scale) = warm_block_fwd(kb, gdk, win, lamw[kb])
                    wwin = w[:, b0:b0 + wk]
                    g_wd = jnp.concatenate(
                        [wwin * g_after[c:c + 1, b0:b0 + wk]
                         for c in range(3)], axis=0)
                    g_dp = gath(g_wd, gdk)                # (3, S)
                    g_d = g_dp * scale
                    g_scale = (g_dp[0:1] * d[0:1] + g_dp[1:2] * d[1:2]
                               + g_dp[2:3] * d[2:3])      # (1, S)
                    g_dl = g_scale / length
                    g_len_sc = -g_scale * scale / length
                    # lam_f feeds BOTH the applied impulse (dl) and the
                    # iteration-0 entry multiplier (glamo)
                    g_lam_f = glamo[kb] + jnp.where(relax_r[kb] > 0.0,
                                                    g_dl, 0.0)
                    if wlim_r is not None:
                        lim = wlim_r[kb]
                        inl = (lam_pre > -lim) & (lam_pre < lim)
                        g_lam_pre = jnp.where(inl, g_lam_f, 0.0)
                    else:
                        g_lam_pre = g_lam_f
                    gl = g_lam_pre * warm_r[kb]
                    glamo[kb] = gl * wsf if wsf != 1.0 else gl
                    g_length = g_len_sc
                    g_lsq = jnp.where(len_sq >= 1e-24,
                                      g_length * 0.5 / length, 0.0)
                    g_d = g_d + d * (2.0 * g_lsq)
                    delta[:, b0:b0 + wk] += scat(g_d, kb, gdk)
                return g_after + delta[:]

            denc = jnp.maximum(w + alpha_col, 1e-30)

            def floor_hit(p):
                pen = cfg.ground_height - p[1:2]
                return pen, ((pen > 0)
                             & (w >= cfg.static_inv_mass_eps)
                             & (jnp.abs(w + alpha_col)
                                >= cfg.eps_denominator))

            def contacts_fwd():
                """Floor contact applied in place to pred (replay) —
                mirrors mesh_pallas.contacts (floor only; envelope).
                Friction anchors at the substep-entry positions xw."""
                pen, hit = floor_hit(pred[:])
                pred[1:2] += jnp.where(hit, w * (pen / denc), 0.0)
                pred[0:1] -= jnp.where(hit, (pred[0:1] - xw[0:1]) * fr, 0.0)
                pred[2:3] -= jnp.where(hit, (pred[2:3] - xw[2:3]) * fr, 0.0)

            def contacts_val(p, anchor):
                """Floor contact as a value function (backward replay);
                ``anchor`` is the substep-entry position plane."""
                pen, hit = floor_hit(p)
                py = p[1:2] + jnp.where(hit, w * (pen / denc), 0.0)
                px = p[0:1] - jnp.where(hit, (p[0:1] - anchor[0:1]) * fr,
                                        0.0)
                pz = p[2:3] - jnp.where(hit, (p[2:3] - anchor[2:3]) * fr,
                                        0.0)
                return jnp.concatenate([px, py, pz], axis=0)

            def contacts_bwd(g, p):
                """VJP of the floor contact at input value ``p``; returns
                (g_p, g_anchor) — friction anchors at the substep-entry
                positions, so cotangent leaks into that substep's gx."""
                _, hit = floor_hit(p)
                gpy = g[1:2] * (1.0 - jnp.where(hit, w / denc, 0.0))
                frh = jnp.where(hit, fr, 0.0)
                gpx = g[0:1] * (1.0 - frh)
                gpz = g[2:3] * (1.0 - frh)
                g_p = jnp.concatenate([gpx, gpy, gpz], axis=0)
                zero = jnp.zeros_like(gpy)
                g_a = jnp.concatenate([g[0:1] * frh, zero, g[2:3] * frh],
                                      axis=0)
                return g_p, g_a

            def predict_vc(c, gc, vrow):
                """The predict velocity chain for coordinate c from entry
                velocity row ``vrow``; returns (vc3, mv_mask)."""
                vc = vrow
                if cfg.gravity_is_acceleration:
                    vc = vc + dt * jnp.where(w > 0, gc, 0.0)
                else:
                    force = gc
                    if cfg.max_force > 0:
                        force = min(max(gc, -cfg.max_force), cfg.max_force)
                    vc = vc + dt * w * force
                vc = vc * dampf
                if cfg.max_velocity > 0:
                    mv_mask = ((vc > -cfg.max_velocity)
                               & (vc < cfg.max_velocity))
                    vc = jnp.clip(vc, -cfg.max_velocity, cfg.max_velocity)
                else:
                    mv_mask = None
                return vc, mv_mask

            # ================= phase A: replay C substeps =================
            xw[:] = x_in[:]
            vw[:] = v_in[:]
            lamw[:] = lam_in[:]

            def replay_it(si):
                def body(it, carry):
                    st_pred[si + it] = pred[:]
                    st_lam[si + it] = lamw[:]
                    if accelerate:
                        st_prev[si + it] = gprev[:]
                    sweep_fwd()
                    st_new[si + it] = pred[:]
                    if has_contacts:
                        contacts_fwd()
                    if accelerate:
                        om = om_ref[0, it]
                        cur = st_pred[si + it]
                        acc = (om * (gamma * (pred[:] - cur) + cur
                                     - gprev[:]) + gprev[:])
                        gprev[:] = cur
                        pred[:] = acc
                        if has_contacts:
                            contacts_fwd()
                    return carry

                lax.fori_loop(0, K, body, 0)

            def replay_sub(sub, carry):
                st_x[sub] = xw[:]
                if need_v:
                    st_v[sub] = vw[:]
                # lambda lifecycle (general._substep)
                if cfg.lambda_mode == LambdaMode.RESET:
                    lamw[:] = jnp.zeros_like(lamw)
                else:
                    lamw[:] = lamw[:] * cfg.lambda_decay
                # predict
                for c, gc in ((0, gx_), (1, gy_), (2, gz_)):
                    vc, _ = predict_vc(c, gc, vw[c:c + 1])
                    pc = xw[c:c + 1] + dt * vc
                    if cfg.world_bounds > 0:
                        pc = jnp.clip(pc, -cfg.world_bounds,
                                      cfg.world_bounds)
                    pred[c:c + 1] = pc
                if warm:
                    # stash the pre-apply's linearization point (decayed
                    # entry multipliers + post-predict positions), then
                    # pre-apply (updates pred AND lamw — iteration 0
                    # starts from the scaled lam)
                    st_wlam[sub] = lamw[:]
                    st_wx[sub] = pred[:]
                    warm_fwd()
                if accelerate:
                    gprev[:] = pred[:]      # doubles as the replay prev
                replay_it(sub * K)
                # finalize -> next substep's (xw, vw)
                for c in range(3):
                    vnew = jnp.where(pinned, 0.0,
                                     (pred[c:c + 1] - xw[c:c + 1]) / dt)
                    xw[c:c + 1] = jnp.where(pinned, xw[c:c + 1],
                                            pred[c:c + 1])
                    vw[c:c + 1] = vnew
                return carry

            lax.fori_loop(0, C, replay_sub, 0)

            # ================= phase B: cotangents =================
            gxc[:] = gx_ct[:]
            gvc[:] = gv_ct[:]
            glamo[:] = glam_ct[:]

            def back_it(si, anchor):
                def body(j, carry):
                    it = K - 1 - j
                    if accelerate:
                        cur = st_pred[si + it]
                        prevv = st_prev[si + it]
                        new0 = st_new[si + it]
                        om = om_ref[0, it]
                        new1 = (contacts_val(new0, anchor)
                                if has_contacts else new0)
                        acc = (om * (gamma * (new1 - cur) + cur - prevv)
                               + prevv)
                        gpv = gp[:]
                        if has_contacts:
                            gacc, ga = contacts_bwd(gpv, acc)
                            gxc[:] += ga
                        else:
                            gacc = gpv
                        gnew1 = (om * gamma) * gacc
                        gcur = (om * (1.0 - gamma)) * gacc + gprev[:]
                        gprev[:] = (1.0 - om) * gacc
                        if has_contacts:
                            gnew0, ga = contacts_bwd(gnew1, new0)
                            gxc[:] += ga
                        else:
                            gnew0 = gnew1
                        gp[:] = sweep_bwd(si + it, gnew0) + gcur
                    else:
                        gpv = gp[:]
                        if has_contacts:
                            gnew0, ga = contacts_bwd(gpv, st_new[si + it])
                            gxc[:] += ga
                        else:
                            gnew0 = gpv
                        gp[:] = sweep_bwd(si + it, gnew0)
                    return carry

                lax.fori_loop(0, K, body, 0)

            def back_sub(sj, carry):
                sub = C - 1 - sj
                anchor = st_x[sub]
                # finalize VJP: v' = (pred - x)/dt, x' = pred (unpinned);
                # gxc becomes the running entry-x cotangent accumulator
                for c in range(3):
                    a = gxc[c:c + 1]
                    b = gvc[c:c + 1]
                    gp[c:c + 1] = jnp.where(pinned, 0.0, a + b / dt)
                    gxc[c:c + 1] = jnp.where(pinned, a, -b / dt)
                if accelerate:
                    gprev[:] = jnp.zeros_like(gprev)
                back_it(sub * K, anchor)
                if accelerate:
                    # prev was initialized from the (post-warm) predicted
                    # positions
                    gp[:] = gp[:] + gprev[:]
                if warm:
                    # warm pre-apply VJP at its stashed linearization
                    # point; gp becomes the post-predict cotangent and
                    # glamo the decayed-entry-multiplier cotangent
                    pred[:] = st_wx[sub]
                    gp[:] = warm_bwd(sub, gp[:])
                # predict VJP
                for c, gc in ((0, gx_), (1, gy_), (2, gz_)):
                    gpred0 = gp[c:c + 1]
                    if cfg.world_bounds > 0:
                        vc3, _ = predict_vc(c, gc,
                                            st_v[sub][c:c + 1])
                        praw = anchor[c:c + 1] + dt * vc3
                        gpred0 = jnp.where((praw > -cfg.world_bounds)
                                           & (praw < cfg.world_bounds),
                                           gpred0, 0.0)
                    gxc[c:c + 1] += gpred0
                    gvc_row = dt * gpred0
                    if cfg.max_velocity > 0:
                        _, mv_mask = predict_vc(c, gc,
                                                st_v[sub][c:c + 1])
                        gvc_row = jnp.where(mv_mask, gvc_row, 0.0)
                    gvc[c:c + 1] = gvc_row * dampf
                # lambda lifecycle VJP
                if cfg.lambda_mode == LambdaMode.RESET:
                    glamo[:] = jnp.zeros_like(glamo)
                else:
                    glamo[:] = glamo[:] * cfg.lambda_decay
                return carry

            lax.fori_loop(0, C, back_sub, 0)
            gxo[:] = gxc[:]
            gvo[:] = gvc[:]

        scoped_shapes = dict(
            xw=pltpu.VMEM((3, n_pad), jnp.float32),
            vw=pltpu.VMEM((3, n_pad), jnp.float32),
            pred=pltpu.VMEM((3, n_pad), jnp.float32),
            delta=pltpu.VMEM((3, n_pad), jnp.float32),
            gp=pltpu.VMEM((3, n_pad), jnp.float32),
            gprev=pltpu.VMEM((3, n_pad), jnp.float32),
            gxc=pltpu.VMEM((3, n_pad), jnp.float32),
            gvc=pltpu.VMEM((3, n_pad), jnp.float32),
            lamw=pltpu.VMEM((k_blocks, 1, s_edges), jnp.float32),
            st_x=pltpu.VMEM((C, 3, n_pad), jnp.float32),
            st_pred=pltpu.VMEM((C * K, 3, n_pad), jnp.float32),
            st_new=pltpu.VMEM((C * K, 3, n_pad), jnp.float32),
            st_lam=pltpu.VMEM((C * K, k_blocks, 1, s_edges), jnp.float32),
        )
        if need_v:
            scoped_shapes["st_v"] = pltpu.VMEM((C, 3, n_pad), jnp.float32)
        if accelerate:
            scoped_shapes["st_prev"] = pltpu.VMEM((C * K, 3, n_pad),
                                                  jnp.float32)
        if warm:
            scoped_shapes["st_wlam"] = pltpu.VMEM(
                (C, k_blocks, 1, s_edges), jnp.float32)
            scoped_shapes["st_wx"] = pltpu.VMEM((C, 3, n_pad), jnp.float32)
        pl.run_scoped(scoped, **scoped_shapes)

    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    in_specs = []
    for nm in in_names:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM)
                        if nm == "om" else vspec)
    out_shapes = (
        jax.ShapeDtypeStruct((3, n_pad), jnp.float32),        # gx0
        jax.ShapeDtypeStruct((3, n_pad), jnp.float32),        # gv0
        jax.ShapeDtypeStruct((k_blocks, 1, s_edges), jnp.float32),
    )
    call = pl.pallas_call(
        kernel,
        out_shape=out_shapes,
        in_specs=in_specs,
        out_specs=(vspec,) * 3,
    )

    def to_plane(a):
        return jnp.pad(a.T, ((0, 0), (0, n_pad - n)))

    def to_slab(lam):
        return jnp.pad(lam, (0, k_blocks * s_edges - e_real)).reshape(
            k_blocks, 1, s_edges)

    epad = k_blocks * s_edges

    @jax.jit
    def fn(inv_mass, ex, ev, elam, gx, gv, glam):
        w = jnp.pad(inv_mass[None, :], ((0, 0), (0, n_pad - n)))
        wa = inv_mass[ea_c].reshape(k_blocks, 1, s_edges)
        wb = inv_mass[eb_c].reshape(k_blocks, 1, s_edges)
        denom = wa + wb + alpha_c
        di = 1.0 / jnp.maximum(denom, 1e-30)
        act = (valid_c
               * ((jnp.abs(denom) >= cfg.eps_denominator)
                  & ((wa >= cfg.static_inv_mass_eps)
                     | (wb >= cfg.static_inv_mass_eps))
                  ).astype(jnp.float32))
        args = [to_plane(ex), to_plane(ev), w, to_slab(elam), di, act,
                rest_c, alpha_c, relax_c]
        if warm:
            args.append(warm_c)
        if warm_clamped:
            wmax = jnp.maximum(jnp.maximum(wa, wb), 1e-12)
            args.append(cfg.warm_start_clamp * rest_c / wmax)
        args += (([bound_c] if bound_c is not None else [])
                 + ([didx_c] if plan.synth else [gd_c, gs_c])
                 + [to_plane(gx), to_plane(gv), to_slab(glam)]
                 + ([om_c] if accelerate else []))
        gxo, gvo, glamo = call(*args)
        return (gxo[:, :n].T, gvo[:, :n].T,
                glamo.reshape(epad)[:e_real])

    return fn


def _pick_chunk(plan, cfg: SolverConfig, n_substeps: int) -> int:
    """Largest divisor of ``n_substeps`` whose backward-chunk program fits
    the VMEM budget."""
    for C in sorted({d for d in range(1, n_substeps + 1)
                     if n_substeps % d == 0}, reverse=True):
        if _backward_vmem_bytes(plan, cfg, C) <= VMEM_BUDGET:
            return C
    raise NotImplementedError(
        "fused mesh backward: even a 1-substep chunk exceeds the VMEM "
        f"budget (iterations={cfg.iterations}, n_pad={plan.n_pad}) — use "
        "the paired XLA backward")


def make_fused_differentiable_mesh_runner(topo: Topology, cfg: SolverConfig,
                                          dt_sub: float, n_substeps: int,
                                          chunk_substeps=None,
                                          block_edges: int = 256,
                                          synth_gd=None):
    """Differentiable fused mesh rollout with the FUSED MOSAIC BACKWARD:
    forward is the fused mesh kernel; reverse-mode recomputes chunk
    boundaries with the same kernel and runs the hand-written
    backward-chunk kernel in a reverse scan (module docstring).  Gradients
    reach positions / velocities / lambda_dist; inv_mass and ext_force get
    zero cotangents (use the paired XLA factories for those).

    ``chunk_substeps`` (must divide ``n_substeps``; default auto) sets the
    substeps per backward Mosaic call; memory is O(N/C) states in HBM plus
    O(C·iterations) stash planes in VMEM — rematerialisation is built in."""
    check_fused_backward_envelope(cfg, topo)
    plan = build_mesh_plan(topo, cfg, dt_sub, block_edges=block_edges,
                           synth_gd=synth_gd)
    if chunk_substeps is None:
        chunk = _pick_chunk(plan, cfg, n_substeps)
    else:
        chunk = int(chunk_substeps)
        if chunk < 1 or n_substeps % chunk:
            raise ValueError(
                f"chunk_substeps {chunk} must divide n_substeps "
                f"{n_substeps}")
    n_chunks = n_substeps // chunk
    fwd_full = make_mesh_substep_runner(topo, cfg, dt_sub, n_substeps,
                                        plan=plan)
    fwd_chunk = (fwd_full if n_chunks == 1
                 else make_mesh_substep_runner(topo, cfg, dt_sub, chunk,
                                               plan=plan))
    bwd_chunk = _make_backward_chunk(topo, cfg, dt_sub, plan, chunk)

    @jax.custom_vjp
    def run(state: SimState) -> SimState:
        return fwd_full(state)

    def fwd(state: SimState):
        return fwd_full(state), state

    def bwd(state0: SimState, ct: SimState):
        inv_mass = state0.inv_mass
        ct3 = (ct.positions, ct.velocities, ct.lambda_dist)
        if n_chunks == 1:
            gx0, gv0, glam0 = bwd_chunk(
                inv_mass, state0.positions, state0.velocities,
                state0.lambda_dist, *ct3)
        else:
            def big(c, _):
                return fwd_chunk(c), (c.positions, c.velocities,
                                      c.lambda_dist)

            _, bounds = lax.scan(big, state0, None, length=n_chunks)

            def back(carry, bound):
                gx, gv, glam = carry
                bx, bv, blam = bound
                return bwd_chunk(inv_mass, bx, bv, blam,
                                 gx, gv, glam), None

            (gx0, gv0, glam0), _ = lax.scan(back, ct3, bounds,
                                            reverse=True)
        zero = jax.tree_util.tree_map(jnp.zeros_like, state0)
        return (zero.replace(positions=gx0, velocities=gv0,
                             lambda_dist=glam0),)

    run.defvjp(fwd, bwd)
    return run
