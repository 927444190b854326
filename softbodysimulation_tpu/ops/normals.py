"""On-device mesh post-processing: vertex normals + bounds (jnp).

Replaces the per-frame engine-native ``Mesh.RecalculateNormals`` /
``RecalculateBounds`` calls (``SoftBodySimulator.cs:868-869``,
``SoftBodyCPU.cs:348-349``, ``SoftBodyGPU.cs:270-271``) with area-weighted
face-normal scatter via segment-sum, so the headless render/export path never
touches the host.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def vertex_normals(positions, triangles):
    """Area-weighted vertex normals, (N,3), unit length (zero-degree vertices
    get +Y, mirroring SafeNormalize, ``XPBDSoftBody.compute:57-61``)."""
    n = positions.shape[0]
    p1 = positions[triangles[:, 0]]
    p2 = positions[triangles[:, 1]]
    p3 = positions[triangles[:, 2]]
    face_n = jnp.cross(p2 - p1, p3 - p1)  # length = 2*area -> area weighting
    idx = jnp.concatenate([triangles[:, 0], triangles[:, 1], triangles[:, 2]])
    acc = jax.ops.segment_sum(
        jnp.concatenate([face_n, face_n, face_n], axis=0), idx, num_segments=n
    )
    length = jnp.linalg.norm(acc, axis=-1, keepdims=True)
    up = jnp.array([0.0, 1.0, 0.0], dtype=positions.dtype)
    return jnp.where(length > 1e-12, acc / jnp.maximum(length, 1e-12), up)


def bounds(positions):
    """(min, max) corner reduction — RecalculateBounds analog."""
    return positions.min(axis=0), positions.max(axis=0)


def center_of_mass(positions, inv_mass=None):
    """COM used for recentring in the readback path
    (``SoftBodySimulator.cs:850-863``); mass-weighted when inv_mass given."""
    if inv_mass is None:
        return positions.mean(axis=0)
    mass = jnp.where(inv_mass > 0, 1.0 / jnp.maximum(inv_mass, 1e-12), 0.0)
    total = jnp.maximum(mass.sum(), 1e-12)
    return (positions * mass[:, None]).sum(axis=0) / total
