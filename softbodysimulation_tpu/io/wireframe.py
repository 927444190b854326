"""Headless debug visualization: wireframe/particle SVG snapshots.

The functional stand-in for the reference's gizmo rendering
(``SoftBodyDebugger.OnDrawGizmos``, ``SoftBodyDebugger.cs:59-116``;
``SoftBodyCPU.OnDrawGizmos``, ``SoftBodyCPU.cs:402-462``): particles as
dots, constraints as lines, the ground as a horizon line — written to an
SVG you can open anywhere, no engine required.  Simple orthographic
projection; enough to eyeball a deformation or a debug state.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from ..core.state import SimState, Topology

_AXES = {"xy": (0, 1), "xz": (0, 2), "zy": (2, 1)}


def render_svg(path: str, state: SimState, topo: Optional[Topology] = None,
               plane: str = "xy", size: int = 640,
               ground_height: Optional[float] = None,
               show_particles: bool = True, show_edges: bool = True,
               particle_radius: float = 2.5) -> None:
    ax, ay = _AXES[plane]
    pos = np.asarray(state.positions)
    u, v = pos[:, ax], pos[:, ay]

    lo = np.array([u.min(), v.min()])
    hi = np.array([u.max(), v.max()])
    if ground_height is not None and ay == 1:
        lo[1] = min(lo[1], ground_height)
    span = np.maximum(hi - lo, 1e-6)
    pad = 0.08 * span.max()
    lo -= pad
    span = (hi + pad) - lo
    scale = size / span.max()

    def sx(x):
        return (x - lo[0]) * scale

    def sy(y):
        return size - (y - lo[1]) * scale  # flip: +y up

    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{size}" '
        f'height="{size}" viewBox="0 0 {size} {size}">',
        f'<rect width="{size}" height="{size}" fill="#111418"/>',
    ]

    if ground_height is not None and ay == 1:
        gy = sy(ground_height)
        parts.append(
            f'<line x1="0" y1="{gy:.1f}" x2="{size}" y2="{gy:.1f}" '
            f'stroke="#3fae6a" stroke-width="1.5"/>')

    if show_edges and topo is not None and topo.n_edges:
        edges = np.asarray(topo.edges)
        pinned = np.asarray(state.inv_mass) == 0
        seg = []
        for a, b in edges:
            seg.append(
                f'<line x1="{sx(u[a]):.1f}" y1="{sy(v[a]):.1f}" '
                f'x2="{sx(u[b]):.1f}" y2="{sy(v[b]):.1f}"/>')
        parts.append(
            '<g stroke="#49b8d8" stroke-width="0.7" opacity="0.55">'
            + "".join(seg) + "</g>")

    if show_particles:
        pinned = np.asarray(state.inv_mass) == 0
        dots = []
        for i in range(len(u)):
            color = "#e86a6a" if pinned[i] else "#e8c74a"
            dots.append(
                f'<circle cx="{sx(u[i]):.1f}" cy="{sy(v[i]):.1f}" '
                f'r="{particle_radius}" fill="{color}"/>')
        parts.append("<g>" + "".join(dots) + "</g>")

    parts.append("</svg>")
    directory = os.path.dirname(os.path.abspath(path))
    os.makedirs(directory, exist_ok=True)
    with open(path, "w") as f:
        f.write("\n".join(parts))
