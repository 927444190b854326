"""XPBD distance-constraint math, batched (jnp).

Semantics: ``CPUDistanceConstraint.Solve`` (``CPUDistanceConstraint.cs:46-117``)
and the GPU kernel ``SolveConstraints`` (``XPBDSoftBody.compute:106-179``),
with every guard/clamp expressed as branchless masked arithmetic.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.config import SolverConfig


def distance_delta_lambda(pa, pb, wa, wb, rest, compliance, lam, dt,
                          cfg: SolverConfig):
    """Compute per-constraint XPBD delta-lambda and unit gradient.

    All inputs batched over the leading axis.  Returns (dlambda (K,),
    normal (K,3)); invalid constraints (degenerate length, both endpoints
    static, tiny denominator) yield dlambda == 0.
    """
    d = pb - pa
    len_sq = jnp.sum(d * d, axis=-1)
    length = jnp.sqrt(jnp.maximum(len_sq, 1e-24))
    n = d / length[..., None]

    c = length - rest
    inv_dt2 = 1.0 / (dt * dt)
    alpha = compliance * inv_dt2
    if cfg.min_alpha_tilde > 0:
        alpha = jnp.maximum(alpha, cfg.min_alpha_tilde)
    denom = wa + wb + alpha

    valid = (
        (length >= cfg.eps_length)
        & (jnp.abs(denom) >= cfg.eps_denominator)
        & ((wa >= cfg.static_inv_mass_eps) | (wb >= cfg.static_inv_mass_eps))
    )
    # Safe-where double guard: valid lanes divide by denom (>= eps >> 1e-30,
    # so forward-bitwise-equal to the old maximum(denom, 1e-30) divisor);
    # invalid lanes (e.g. the windowed backend's zero-padded slots) divide by
    # 1.0 so the division VJP stays finite — max(0, 1e-30)**2 underflows f32
    # and the cotangent-zero x inf-primal-derivative product was NaN.
    dl = (-c - alpha * lam) / jnp.where(valid, denom, 1.0)
    if cfg.max_dlambda > 0:
        dl = jnp.clip(dl, -cfg.max_dlambda, cfg.max_dlambda)
    if cfg.max_dlambda_rel > 0:
        m = cfg.max_dlambda_rel * rest
        dl = jnp.clip(dl, -m, m)
    dl = jnp.where(valid, dl, 0.0)
    return dl, n


def accumulate_lambda(lam, dl, cfg: SolverConfig):
    lam = lam + dl
    if cfg.lambda_clamp > 0:
        lam = jnp.clip(lam, -cfg.lambda_clamp, cfg.lambda_clamp)
    return lam


def constraint_error(positions, edges, rest):
    """|current length - rest| per edge (diagnostics,
    ``XPBDSoftBody.compute:256-266``)."""
    pa = positions[edges[:, 0]]
    pb = positions[edges[:, 1]]
    length = jnp.linalg.norm(pb - pa, axis=-1)
    return jnp.abs(length - rest)
