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
distance constraints only, floor NONE or XPBD_INEQUALITY, sphere
colliders (config constants OR ``kin_colliders`` traced poses — the
latter with in-kernel pose/velocity/ground cotangents, round 5), no box
colliders, no self-collision, exact math, single body.  Round 5 also
adds TRACED MATERIALS (``make_fused_differentiable_material_runner``:
per-edge rest/compliance cotangents as two extra slab reductions inside
the cotangent sweep).  Everything else keeps the paired XLA backward.

Accuracy note (measured, round 5): where the kernel and engine forwards
are bitwise-equal, the fused backward matches the engine VJP exactly —
and against an x64 replica it is often CLOSER to the true derivative
than the engine's own f32 VJP (the windowed transpose's scatter-add
cancellation costs the engine ~0.5% on material cotangents).  On deep
Chebyshev + contact-rich rollouts the two forwards drift at ulp level
and the discontinuous contact gates turn that into up-to-percent-level
gradient differences between the two linearization points — both sides
being exact gradients of their own trajectory.

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


def check_fused_backward_envelope(cfg: SolverConfig, topo: Topology,
                                  kin_colliders=None):
    """Raise NotImplementedError when the config/topology is outside the
    fused-backward envelope (module docstring).

    ``kin_colliders=(S, B)``: traced ColliderSet poses (they REPLACE the
    config's rigid world, so the static-collider check is skipped) —
    spheres are covered in-kernel with pose cotangents; boxes are not."""
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
    elif kin_colliders is not None and int(kin_colliders[1]) > 0:
        why = "kinematic box colliders"
    elif kin_colliders is None and cfg.box_colliders:
        why = "box colliders"
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


def _backward_vmem_bytes(plan, cfg: SolverConfig, C: int,
                         materials: bool = False,
                         kin_colliders=None) -> int:
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
    if materials:
        slabs += 2                             # g_rest + g_alpha outputs
    n_sph = (int(kin_colliders[0]) if kin_colliders is not None
             else len(cfg.sphere_colliders))
    if n_sph:
        # contact-chain intermediates held live during contacts_bwd
        planes += 3 * (n_sph + 1)
    if cfg.lambda_mode == LambdaMode.WARM_START:
        # st_wlam stash + carried-warm slab; the wlim input slab exists
        # only when the clamp is active (mirrors the arg construction)
        slabs += C + 1 + int(cfg.warm_start_clamp > 0)
        planes += C                            # st_wx (post-predict stash)
    return planes * plane_b + slabs * slab_b + struct_b


def _make_backward_chunk(topo: Topology, cfg: SolverConfig, dt: float,
                         plan, C: int, materials: bool = False,
                         kin_colliders=None):
    """Jitted ``(inv_mass, x, v, lam, gx, gv, glam) -> (gx0, gv0, glam0)``:
    the VJP of C fused substeps, linearized at the chunk-entry state
    ``(x, v, lam)`` — one Pallas program (in-kernel replay + cotangent
    phases, module docstring).

    ``materials=True``: rest/compliance become TRACED inputs (the fn
    signature gains ``(rest_vec, comp_vec)`` and the outputs gain their
    per-edge cotangents) — rest enters only through ``cerr = length -
    rest`` (VJP: one slab accumulation of ``di * g_u``) and alpha through
    ``u = (-cerr - alpha*lam) / (wa+wb+alpha)`` (VJP: ``-g_u * di *
    (lam + u)``), so the material backward costs two extra elementwise
    slab accumulations per block pass — no new contractions."""
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
    has_floor = cfg.floor_mode == FloorMode.XPBD_INEQUALITY
    kin = kin_colliders is not None
    kin_s = int(kin_colliders[0]) if kin else 0
    if kin and int(kin_colliders[1]) > 0:
        raise NotImplementedError(
            "fused mesh backward: kinematic box colliders are not fused — "
            "use the paired XLA backward")
    n_sph = kin_s if kin else len(cfg.sphere_colliders)
    kin_rows = 1 + kin_s
    has_contacts = has_floor or n_sph > 0
    need_v = cfg.world_bounds > 0 or cfg.max_velocity > 0
    fr = min(max(cfg.friction, 0.0), 1.0)
    alpha_col = cfg.collision_compliance * inv_dt2
    if cfg.damping_mode == DampingMode.PER_STEP:
        dampf = 1.0 - min(max(cfg.damping, 0.0), 1.0)
    else:
        dampf = 1.0 - cfg.damping * dt

    need = _backward_vmem_bytes(plan, cfg, C, materials=materials,
                                kin_colliders=kin_colliders)
    if need > VMEM_BUDGET:
        raise NotImplementedError(
            f"fused mesh backward chunk needs ~{need / 1e6:.1f} MB of VMEM "
            f"(C={C}, iterations={K}, n_pad={n_pad}) — exceeds the budget")
    if materials and cfg.max_dlambda_rel > 0:
        raise NotImplementedError(
            "fused material backward: max_dlambda_rel makes the dlambda "
            "bound a function of rest — use the paired XLA backward")
    if materials and (cfg.lambda_mode == LambdaMode.WARM_START
                      and cfg.warm_start_clamp > 0):
        raise NotImplementedError(
            "fused material backward: warm_start_clamp makes the warm "
            "limit a function of rest — use the paired XLA backward")

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
                + (["ca"] if kin else [])
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
        outs = refs[len(in_names):]
        gxo, gvo, glamo = outs[:3]
        _oi = 3
        if materials:
            gmro, gmao = outs[3], outs[4]
            _oi = 5
        else:
            gmro = gmao = None
        gcao = outs[_oi] if kin else None
        ca = m.get("ca")

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
                    if materials:
                        # rest: cerr = length - rest  ->  -g_cerr
                        gmro[kb] += di[kb] * g_u
                        # alpha: u = (-cerr - a*lam)/(wa+wb+a)  ->
                        # du/da = -di*(lam + u)  (numerator + denominator)
                        gmao[kb] += -g_u * di[kb] * (lam_e + u)
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
            gh_val = ca[0, 0] if kin else cfg.ground_height
            lane128 = lax.broadcasted_iota(jnp.int32, (1, 128), 1)

            def sphere_params(si):
                if kin:
                    r0 = 1 + si
                    return ((ca[r0, 0], ca[r0, 1], ca[r0, 2]), ca[r0, 3],
                            (ca[r0, 4], ca[r0, 5], ca[r0, 6]))
                cx, cy, cz, radius = cfg.sphere_colliders[si]
                return (cx, cy, cz), radius, None

            def floor_hit(p):
                pen = gh_val - p[1:2]
                return pen, ((pen > 0)
                             & (w >= cfg.static_inv_mass_eps)
                             & (jnp.abs(w + alpha_col)
                                >= cfg.eps_denominator))

            def floor_val(p, anchor):
                """Floor contact as a value function; ``anchor`` is the
                substep-entry position plane (friction anchor)."""
                pen, hit = floor_hit(p)
                py = p[1:2] + jnp.where(hit, w * (pen / denc), 0.0)
                px = p[0:1] - jnp.where(hit, (p[0:1] - anchor[0:1]) * fr,
                                        0.0)
                pz = p[2:3] - jnp.where(hit, (p[2:3] - anchor[2:3]) * fr,
                                        0.0)
                return jnp.concatenate([px, py, pz], axis=0)

            def floor_bwd(g, p):
                """VJP of the floor contact at input value ``p``; returns
                (g_p, g_anchor); accumulates the traced-ground cotangent
                into ``gcao`` row 0 when kin."""
                _, hit = floor_hit(p)
                wdc = jnp.where(hit, w / denc, 0.0)
                gpy = g[1:2] * (1.0 - wdc)
                frh = jnp.where(hit, fr, 0.0)
                gpx = g[0:1] * (1.0 - frh)
                gpz = g[2:3] * (1.0 - frh)
                g_p = jnp.concatenate([gpx, gpy, gpz], axis=0)
                zero = jnp.zeros_like(gpy)
                g_a = jnp.concatenate([g[0:1] * frh, zero, g[2:3] * frh],
                                      axis=0)
                if kin:
                    g_gh = jnp.sum(g[1:2] * wdc)
                    gcao[0:1, :] += jnp.where(lane128 == 0, g_gh, 0.0)
                return g_p, g_a

            def sphere_fwd_parts(si, p, anchor):
                """Shared forward recomputation for one sphere's contact
                (mirrors mesh_pallas.contacts' sphere pass exactly)."""
                c3, radius, sv = sphere_params(si)
                dv = [p[c:c + 1] - c3[c] for c in range(3)]
                s_sq = dv[0] * dv[0] + dv[1] * dv[1] + dv[2] * dv[2]
                dist = jnp.sqrt(jnp.maximum(s_sq, 1e-24))
                pen = radius - dist
                a = (pen > 0) & (w >= cfg.static_inv_mass_eps)
                nv = [dv[c] / dist for c in range(3)]
                p1 = [p[c:c + 1] + jnp.where(a, nv[c] * pen, 0.0)
                      for c in range(3)]
                vel = [(p1[c] - anchor[c:c + 1]) / dt
                       - (sv[c] if sv is not None else 0.0)
                       for c in range(3)]
                vn = vel[0] * nv[0] + vel[1] * nv[1] + vel[2] * nv[2]
                return dv, s_sq, dist, pen, a, nv, p1, vel, vn

            def sphere_val(si, p, anchor):
                (_, _, _, _, a, nv, p1, vel,
                 vn) = sphere_fwd_parts(si, p, anchor)
                p2 = [p1[c] - jnp.where(a, (vel[c] - vn * nv[c])
                                        * (dt * fr), 0.0)
                      for c in range(3)]
                return jnp.concatenate(p2, axis=0)

            def sphere_bwd(si, g2, p, anchor):
                """VJP of one sphere's contact at entry value ``p``;
                returns (g_p, g_anchor) and accumulates the pose
                cotangents (center/radius/velocity) into gcao when kin."""
                (dv, s_sq, dist, pen, a, nv, p1, vel,
                 vn) = sphere_fwd_parts(si, p, anchor)
                F = jnp.where(a, fr, 0.0)
                g2c = [g2[c:c + 1] for c in range(3)]
                gdotn = g2c[0] * nv[0] + g2c[1] * nv[1] + g2c[2] * nv[2]
                g_p1 = [g2c[c] * (1.0 - F) + F * nv[c] * gdotn
                        for c in range(3)]
                g_a = [F * (g2c[c] - nv[c] * gdotn) for c in range(3)]
                # n-cotangent: push (p1 = p + a*n*pen) + friction
                # (p2 = p1 - F dt (vel - vn n); dvn/dn_c = vel_c)
                am = jnp.where(a, 1.0, 0.0)
                g_n = [g_p1[c] * am * pen
                       + F * dt * (vel[c] * gdotn + vn * g2c[c])
                       for c in range(3)]
                g_pen = am * (g_p1[0] * nv[0] + g_p1[1] * nv[1]
                              + g_p1[2] * nv[2])
                g_dist = (-g_pen
                          - (g_n[0] * dv[0] + g_n[1] * dv[1]
                             + g_n[2] * dv[2]) / (dist * dist))
                g_sq = jnp.where(s_sq >= 1e-24, g_dist * 0.5 / dist, 0.0)
                g_dv = [g_n[c] / dist + 2.0 * dv[c] * g_sq
                        for c in range(3)]
                g_p = jnp.concatenate(
                    [g_p1[c] + g_dv[c] for c in range(3)], axis=0)
                g_anchor = jnp.concatenate(g_a, axis=0)
                if kin:
                    r0 = 1 + si
                    row = jnp.zeros_like(gcao[r0:r0 + 1, :])
                    for c in range(3):
                        row += jnp.where(lane128 == c,
                                         -jnp.sum(g_dv[c]), 0.0)
                        row += jnp.where(lane128 == 4 + c,
                                         dt * jnp.sum(g_a[c]), 0.0)
                    row += jnp.where(lane128 == 3, jnp.sum(g_pen), 0.0)
                    gcao[r0:r0 + 1, :] += row
                return g_p, g_anchor

            def contacts_fwd():
                """Contact chain applied in place to pred (replay):
                floor then spheres — mesh_pallas.contacts order.
                Friction anchors at the substep-entry positions xw."""
                if has_floor:
                    pen, hit = floor_hit(pred[:])
                    pred[1:2] += jnp.where(hit, w * (pen / denc), 0.0)
                    pred[0:1] -= jnp.where(hit, (pred[0:1] - xw[0:1]) * fr,
                                           0.0)
                    pred[2:3] -= jnp.where(hit, (pred[2:3] - xw[2:3]) * fr,
                                           0.0)
                for si in range(n_sph):
                    pred[:] = sphere_val(si, pred[:], xw)

            def contacts_val(p, anchor):
                if has_floor:
                    p = floor_val(p, anchor)
                for si in range(n_sph):
                    p = sphere_val(si, p, anchor)
                return p

            def contacts_bwd(g, p, anchor):
                """VJP of the whole contact chain at entry value ``p``;
                recomputes the chain's intermediate inputs, then walks it
                backward.  Returns (g_p, g_anchor_total); pose cotangents
                accumulate into gcao (kin)."""
                vals = [p]
                q = p
                if has_floor:
                    q = floor_val(q, anchor)
                    vals.append(q)
                for si in range(n_sph):
                    q = sphere_val(si, q, anchor)
                    vals.append(q)
                idx0 = 1 if has_floor else 0
                ga_tot = jnp.zeros_like(g)
                for si in reversed(range(n_sph)):
                    g, ga = sphere_bwd(si, g, vals[idx0 + si], anchor)
                    ga_tot = ga_tot + ga
                if has_floor:
                    g, ga = floor_bwd(g, vals[0])
                    ga_tot = ga_tot + ga
                return g, ga_tot

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
            if materials:
                gmro[:] = jnp.zeros_like(gmro)
                gmao[:] = jnp.zeros_like(gmao)
            if kin:
                gcao[:] = jnp.zeros_like(gcao)

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
                            gacc, ga = contacts_bwd(gpv, acc, anchor)
                            gxc[:] += ga
                        else:
                            gacc = gpv
                        gnew1 = (om * gamma) * gacc
                        gcur = (om * (1.0 - gamma)) * gacc + gprev[:]
                        gprev[:] = (1.0 - om) * gacc
                        if has_contacts:
                            gnew0, ga = contacts_bwd(gnew1, new0, anchor)
                            gxc[:] += ga
                        else:
                            gnew0 = gnew1
                        gp[:] = sweep_bwd(si + it, gnew0) + gcur
                    else:
                        gpv = gp[:]
                        if has_contacts:
                            gnew0, ga = contacts_bwd(gpv, st_new[si + it], anchor)
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
    if materials:
        out_shapes = out_shapes + (
            jax.ShapeDtypeStruct((k_blocks, 1, s_edges), jnp.float32),
            jax.ShapeDtypeStruct((k_blocks, 1, s_edges), jnp.float32),
        )
    if kin:
        out_shapes = out_shapes + (
            jax.ShapeDtypeStruct((kin_rows, 128), jnp.float32),  # gca
        )
    call = pl.pallas_call(
        kernel,
        out_shape=out_shapes,
        in_specs=in_specs,
        out_specs=(vspec,) * len(out_shapes),
    )

    def to_plane(a):
        return jnp.pad(a.T, ((0, 0), (0, n_pad - n)))

    def to_slab(lam):
        return jnp.pad(lam, (0, k_blocks * s_edges - e_real)).reshape(
            k_blocks, 1, s_edges)

    epad = k_blocks * s_edges
    inv_dt2_f = inv_dt2

    def _run(inv_mass, ex, ev, elam, gx, gv, glam, rest_s, alpha_s,
             ca_blk=None):
        w = jnp.pad(inv_mass[None, :], ((0, 0), (0, n_pad - n)))
        wa = inv_mass[ea_c].reshape(k_blocks, 1, s_edges)
        wb = inv_mass[eb_c].reshape(k_blocks, 1, s_edges)
        denom = wa + wb + alpha_s
        di = 1.0 / jnp.maximum(denom, 1e-30)
        act = (valid_c
               * ((jnp.abs(denom) >= cfg.eps_denominator)
                  & ((wa >= cfg.static_inv_mass_eps)
                     | (wb >= cfg.static_inv_mass_eps))
                  ).astype(jnp.float32))
        args = [to_plane(ex), to_plane(ev), w, to_slab(elam), di, act,
                rest_s, alpha_s, relax_c]
        if warm:
            args.append(warm_c)
        if warm_clamped:
            wmax = jnp.maximum(jnp.maximum(wa, wb), 1e-12)
            args.append(cfg.warm_start_clamp * rest_s / wmax)
        args += (([bound_c] if bound_c is not None else [])
                 + ([didx_c] if plan.synth else [gd_c, gs_c])
                 + ([ca_blk] if kin else [])
                 + [to_plane(gx), to_plane(gv), to_slab(glam)]
                 + ([om_c] if accelerate else []))
        return call(*args)

    def _ca_block(coll):
        """ColliderSet -> the (kin_rows, 128) traced pose block — same
        layout as the forward mesh kernel's coll_ref."""
        cab = jnp.zeros((kin_rows, 128), jnp.float32)
        cab = cab.at[0, 0].set(coll.ground_height)
        if kin_s:
            cab = cab.at[1:1 + kin_s, :4].set(coll.spheres)
            cab = cab.at[1:1 + kin_s, 4:7].set(coll.sphere_velocities)
        return cab

    if materials:
        @jax.jit
        def fn(inv_mass, ex, ev, elam, gx, gv, glam, rest_vec, comp_vec,
               coll=None):
            rest_pad = jnp.pad(jnp.asarray(rest_vec, jnp.float32),
                               (0, epad - e_real), constant_values=1.0)
            comp_pad = jnp.pad(jnp.asarray(comp_vec, jnp.float32),
                               (0, epad - e_real))
            alpha_raw = comp_pad * inv_dt2_f
            floored = (cfg.min_alpha_tilde > 0)
            alpha_pad = (jnp.maximum(alpha_raw, cfg.min_alpha_tilde)
                         if floored else alpha_raw)
            rest_s = rest_pad.reshape(k_blocks, 1, s_edges)
            alpha_s = alpha_pad.reshape(k_blocks, 1, s_edges)
            outs = _run(inv_mass, ex, ev, elam, gx, gv, glam,
                        rest_s, alpha_s,
                        _ca_block(coll) if kin else None)
            gxo, gvo, glamo, gmr, gma = outs[:5]
            g_rest = gmr.reshape(epad)[:e_real]
            g_alpha = gma.reshape(epad)
            if floored:
                # maximum() VJP: cotangent reaches compliance only where
                # the raw alpha is above the floor
                g_alpha = jnp.where(alpha_raw > cfg.min_alpha_tilde,
                                    g_alpha, 0.0)
            g_comp = (g_alpha * inv_dt2_f)[:e_real]
            ret = (gxo[:, :n].T, gvo[:, :n].T,
                   glamo.reshape(epad)[:e_real], g_rest, g_comp)
            return ret + ((outs[5],) if kin else ())

        return fn

    @jax.jit
    def fn(inv_mass, ex, ev, elam, gx, gv, glam, coll=None):
        outs = _run(inv_mass, ex, ev, elam, gx, gv, glam,
                    rest_c, alpha_c, _ca_block(coll) if kin else None)
        gxo, gvo, glamo = outs[:3]
        ret = (gxo[:, :n].T, gvo[:, :n].T,
               glamo.reshape(epad)[:e_real])
        return ret + ((outs[3],) if kin else ())

    return fn


def _pick_chunk(plan, cfg: SolverConfig, n_substeps: int,
                materials: bool = False, kin_colliders=None) -> int:
    """Largest divisor of ``n_substeps`` whose backward-chunk program fits
    the VMEM budget."""
    for C in sorted({d for d in range(1, n_substeps + 1)
                     if n_substeps % d == 0}, reverse=True):
        if _backward_vmem_bytes(plan, cfg, C, materials=materials,
                                kin_colliders=kin_colliders) <= VMEM_BUDGET:
            return C
    raise NotImplementedError(
        "fused mesh backward: even a 1-substep chunk exceeds the VMEM "
        f"budget (iterations={cfg.iterations}, n_pad={plan.n_pad}) — use "
        "the paired XLA backward")


def make_fused_differentiable_mesh_runner(topo: Topology, cfg: SolverConfig,
                                          dt_sub: float, n_substeps: int,
                                          chunk_substeps=None,
                                          block_edges: int = 256,
                                          synth_gd=None,
                                          kin_colliders=None):
    """Differentiable fused mesh rollout with the FUSED MOSAIC BACKWARD:
    forward is the fused mesh kernel; reverse-mode recomputes chunk
    boundaries with the same kernel and runs the hand-written
    backward-chunk kernel in a reverse scan (module docstring).  Gradients
    reach positions / velocities / lambda_dist; inv_mass and ext_force get
    zero cotangents (use the paired XLA factories for those).

    ``kin_colliders=(S, B)`` (B must be 0): the state carries a
    ``ColliderSet`` whose traced poses enter BOTH kernels; the backward
    additionally returns cotangents for the sphere poses / velocities and
    the ground height (pose-gradient contact control: compose with
    ``interact.animator.kinematic_rollout`` for trajectory gradients).

    ``chunk_substeps`` (must divide ``n_substeps``; default auto) sets the
    substeps per backward Mosaic call; memory is O(N/C) states in HBM plus
    O(C·iterations) stash planes in VMEM — rematerialisation is built in."""
    check_fused_backward_envelope(cfg, topo, kin_colliders=kin_colliders)
    kin = kin_colliders is not None
    plan = build_mesh_plan(topo, cfg, dt_sub, block_edges=block_edges,
                           synth_gd=synth_gd)
    if chunk_substeps is None:
        chunk = _pick_chunk(plan, cfg, n_substeps,
                            kin_colliders=kin_colliders)
    else:
        chunk = int(chunk_substeps)
        if chunk < 1 or n_substeps % chunk:
            raise ValueError(
                f"chunk_substeps {chunk} must divide n_substeps "
                f"{n_substeps}")
    n_chunks = n_substeps // chunk
    fwd_full = make_mesh_substep_runner(topo, cfg, dt_sub, n_substeps,
                                        plan=plan,
                                        kin_colliders=kin_colliders)
    fwd_chunk = (fwd_full if n_chunks == 1
                 else make_mesh_substep_runner(topo, cfg, dt_sub, chunk,
                                               plan=plan,
                                               kin_colliders=kin_colliders))
    bwd_chunk = _make_backward_chunk(topo, cfg, dt_sub, plan, chunk,
                                     kin_colliders=kin_colliders)

    @jax.custom_vjp
    def run(state: SimState) -> SimState:
        return fwd_full(state)

    def fwd(state: SimState):
        return fwd_full(state), state

    def bwd(state0: SimState, ct: SimState):
        inv_mass = state0.inv_mass
        ct3 = (ct.positions, ct.velocities, ct.lambda_dist)
        coll = (state0.colliders,) if kin else ()
        if n_chunks == 1:
            outs = bwd_chunk(
                inv_mass, state0.positions, state0.velocities,
                state0.lambda_dist, *ct3, *coll)
            gx0, gv0, glam0 = outs[:3]
            gca = outs[3] if kin else None
        else:
            def big(c, _):
                return fwd_chunk(c), (c.positions, c.velocities,
                                      c.lambda_dist)

            _, bounds = lax.scan(big, state0, None, length=n_chunks)
            gca0 = ((jnp.zeros((1 + int(kin_colliders[0]), 128),
                               jnp.float32),) if kin else ())

            def back(carry, bound):
                gx, gv, glam = carry[:3]
                bx, bv, blam = bound
                outs = bwd_chunk(inv_mass, bx, bv, blam,
                                 gx, gv, glam, *coll)
                if kin:
                    # pose constant across the rollout: cotangents SUM
                    return outs[:3] + (carry[3] + outs[3],), None
                return outs, None

            carry_out, _ = lax.scan(back, ct3 + gca0, bounds,
                                    reverse=True)
            gx0, gv0, glam0 = carry_out[:3]
            gca = carry_out[3] if kin else None
        zero = jax.tree_util.tree_map(jnp.zeros_like, state0)
        g_state = zero.replace(positions=gx0, velocities=gv0,
                               lambda_dist=glam0)
        if kin:
            ks = int(kin_colliders[0])
            g_state = g_state.replace(colliders=zero.colliders.replace(
                ground_height=gca[0, 0],
                spheres=gca[1:1 + ks, :4],
                sphere_velocities=gca[1:1 + ks, 4:7]))
        return (g_state,)

    run.defvjp(fwd, bwd)
    return run


def make_fused_differentiable_material_runner(topo: Topology,
                                              cfg: SolverConfig,
                                              dt_sub: float,
                                              n_substeps: int,
                                              chunk_substeps=None,
                                              block_edges: int = 256,
                                              synth_gd=None):
    """Differentiable-in-MATERIALS fused mesh rollout with the FUSED
    MOSAIC BACKWARD: ``fn(state, materials) -> SimState`` with
    ``materials = {"rest_lengths": (E,), "compliance": (E,)}`` (topo edge
    order) — the fused twin of ``kernels.diff.
    make_differentiable_material_runner``.  Both the forward mesh kernel
    and the backward-chunk kernel take the material slabs as traced
    inputs; the backward accumulates the per-edge rest/compliance
    cotangents as two extra slab reductions inside the existing cotangent
    sweep (``_make_backward_chunk`` docstring), so the material VJP rides
    the same Mosaic program — no XLA replay.  Gradients reach positions /
    velocities / lambda_dist AND both material vectors; inv_mass /
    ext_force get zero cotangents.

    Envelope: the distance envelope (``check_fused_backward_envelope``)
    plus ``max_dlambda_rel == 0`` and ``warm_start_clamp == 0`` (both
    would make clip bounds functions of rest)."""
    check_fused_backward_envelope(cfg, topo)
    plan = build_mesh_plan(topo, cfg, dt_sub, block_edges=block_edges,
                           synth_gd=synth_gd)
    if chunk_substeps is None:
        chunk = _pick_chunk(plan, cfg, n_substeps, materials=True)
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
    bwd_chunk = _make_backward_chunk(topo, cfg, dt_sub, plan, chunk,
                                     materials=True)

    @jax.custom_vjp
    def run(state: SimState, materials) -> SimState:
        return fwd_full(state, materials)

    def fwd(state: SimState, materials):
        return fwd_full(state, materials), (state, materials)

    def bwd(res, ct: SimState):
        state0, materials = res
        inv_mass = state0.inv_mass
        rest_vec = jnp.asarray(materials["rest_lengths"], jnp.float32)
        comp_vec = jnp.asarray(materials["compliance"], jnp.float32)
        ct3 = (ct.positions, ct.velocities, ct.lambda_dist)
        if n_chunks == 1:
            gx0, gv0, glam0, g_rest, g_comp = bwd_chunk(
                inv_mass, state0.positions, state0.velocities,
                state0.lambda_dist, *ct3, rest_vec, comp_vec)
        else:
            def big(c, _):
                return (fwd_chunk(c, materials),
                        (c.positions, c.velocities, c.lambda_dist))

            _, bounds = lax.scan(big, state0, None, length=n_chunks)

            def back(carry, bound):
                gx, gv, glam, gr, gc = carry
                bx, bv, blam = bound
                gx, gv, glam, gr_c, gc_c = bwd_chunk(
                    inv_mass, bx, bv, blam, gx, gv, glam,
                    rest_vec, comp_vec)
                # material cotangents SUM over chunks (rest/compliance
                # enter every substep)
                return (gx, gv, glam, gr + gr_c, gc + gc_c), None

            zero_e = jnp.zeros_like(rest_vec)
            (gx0, gv0, glam0, g_rest, g_comp), _ = lax.scan(
                back, ct3 + (zero_e, zero_e), bounds, reverse=True)
        zero = jax.tree_util.tree_map(jnp.zeros_like, state0)
        return (zero.replace(positions=gx0, velocities=gv0,
                             lambda_dist=glam0),
                {"rest_lengths": g_rest, "compliance": g_comp})

    run.defvjp(fwd, bwd)
    return run
