"""On-device diagnostics reductions.

Port of the single-threaded ``ComputeDiagnostics`` kernel
(``XPBDSoftBody.compute:234-270``) — max velocity, max constraint error,
mean |lambda|, ground-contact count — plus kinetic/potential energy and the
finite-health reduction, all as O(log N) parallel reductions returned from a
single jitted call (the reference read its float4 debug buffer back every 30
frames, ``SoftBodySimulator.cs:625-631``; here the numbers never need to
leave the device unless you ask).
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp

from ..core.config import SolverConfig
from ..core.state import SimState, Topology
from ..ops.distance import constraint_error


@functools.partial(jax.jit, static_argnames=("ground_height",))
def diagnostics(state: SimState, topo: Topology,
                ground_height: float = 0.0) -> Dict[str, jax.Array]:
    speed = jnp.linalg.norm(state.velocities, axis=1)
    err = constraint_error(state.positions, topo.edges, topo.rest_lengths)
    ground = jnp.abs(state.positions[:, 1] - ground_height) < 0.01
    mass = jnp.where(state.inv_mass > 0,
                     1.0 / jnp.maximum(state.inv_mass, 1e-12), 0.0)
    ke = 0.5 * jnp.sum(mass * jnp.sum(state.velocities ** 2, axis=1))
    finite = (
        jnp.isfinite(state.positions).all()
        & jnp.isfinite(state.velocities).all()
        & jnp.isfinite(state.lambda_dist).all()
    )
    return {
        "max_velocity": speed.max(),
        "max_constraint_error": err.max(),
        "mean_constraint_error": err.mean(),
        "mean_abs_lambda": jnp.abs(state.lambda_dist).mean(),
        "ground_contacts": ground.sum(),
        "kinetic_energy": ke,
        "is_finite": finite,
        "com": state.positions.mean(axis=0),
    }


@functools.partial(jax.jit, static_argnames=("cfg",))
def _blocked_overflow_impl(positions, inv_mass, cfg):
    from ..ops import spatial_hash as _sh

    order = _sh.morton_order(positions, cfg)
    return _sh.self_collision_blocked_overflow(
        positions, inv_mass, order, cfg)


def blocked_overflow(state: SimState, cfg: SolverConfig) -> int:
    """Worst-case AABB-touching neighbor blocks dropped by the 'blocked'
    self-collision backend for the CURRENT positions (0 => the blocked pass
    is exact here).  The production-visible surface for the exactness
    precondition of ``ops.spatial_hash.self_collision_project_blocked`` —
    long runs should sample this (the CLI's ``--log-every`` does) and raise
    ``block_neighbors`` if it ever goes positive.  Conservative: see
    ``blocked_dropped_pairs`` for the pair-accurate check.
    """
    return int(_blocked_overflow_impl(state.positions, state.inv_mass, cfg))


@functools.partial(jax.jit, static_argnames=("cfg",))
def _blocked_dropped_impl(positions, inv_mass, cfg):
    from ..ops import spatial_hash as _sh

    order = _sh.morton_order(positions, cfg)
    return _sh.self_collision_blocked_dropped_pairs(
        positions, inv_mass, order, cfg)


def blocked_dropped_pairs(state: SimState, cfg: SolverConfig) -> int:
    """Pair-accurate exactness check for the 'blocked' backend at the
    CURRENT positions: the number of real contact contributions (directed
    particle pairs within the contact diameter) the top-M candidate
    selection would MISS.  0 => the blocked pass's coverage here is
    identical to the dense backend's, even when the conservative AABB
    bound (``blocked_overflow``) is exceeded — e.g. flat sheets whose
    blocks all AABB-touch in the thin axis while every pair sits beyond
    2r.  O(N^2 / block) work, blockwise under scan — cheap enough for
    gate points and sampled logging, not for every substep."""
    return int(_blocked_dropped_impl(state.positions, state.inv_mass, cfg))


def format_diagnostics(d: Dict[str, jax.Array]) -> str:
    """Human-readable one-liner (the Debug.Log analog,
    ``SoftBodySimulator.cs:629-630``)."""
    import numpy as np

    g = {k: np.asarray(v) for k, v in d.items()}
    return (
        f"maxVel={g['max_velocity']:.3f} "
        f"maxErr={g['max_constraint_error']:.4f} "
        f"avgLambda={g['mean_abs_lambda']:.4f} "
        f"ground={int(g['ground_contacts'])} "
        f"KE={g['kinetic_energy']:.3f} "
        f"finite={bool(g['is_finite'])}"
    )
