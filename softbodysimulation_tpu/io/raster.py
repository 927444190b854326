"""Headless software rasterizer: shaded preview images without any renderer.

Completes the render path (SURVEY L0 'engine services' parity): where the
reference leaned on Unity's renderer + RecalculateNormals, we compute
normals on device (``ops/normals``) and rasterize a Lambertian-shaded,
z-buffered preview on host — dependency-free binary PPM (readable by any
image viewer/converter).  Painter-free: a real z-buffer, vectorized over
triangles with NumPy (scanline-free barycentric fill per triangle batch).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np

from ..core.state import SimState, Topology
from ..ops.normals import vertex_normals

_AXES = {"xy": (0, 1, 2), "xz": (0, 2, 1), "zy": (2, 1, 0)}


def rasterize(positions: np.ndarray, triangles: np.ndarray,
              size: int = 512, plane: str = "xy",
              light=(0.4, 0.8, 0.45), base_color=(90, 170, 220),
              background=(17, 20, 24),
              ground_height: Optional[float] = None,
              markers=()) -> np.ndarray:
    """Render (H, W, 3) uint8.  Orthographic along the plane's normal axis;
    depth = the third coordinate (towards the viewer).

    ``markers``: [(x, y, z), ...] world points drawn as always-on-top
    crosshairs (the watch-mode 3D cursor, ``interact/keyboard.Cursor``) —
    brightness encodes depth so the cursor's third coordinate stays
    readable in a 2D projection."""
    ax, ay, az = _AXES[plane]
    pos = np.asarray(positions, np.float64)
    tri = np.asarray(triangles, np.int64)

    u, v, depth = pos[:, ax], pos[:, ay], pos[:, az]
    lo = np.array([u.min(), v.min()])
    hi = np.array([u.max(), v.max()])
    if ground_height is not None and ay == 1:
        lo[1] = min(lo[1], ground_height)
    span = np.maximum(hi - lo, 1e-6)
    pad = 0.08 * span.max()
    lo -= pad
    scale = (size - 1) / (span + 2 * pad).max()

    px = (u - lo[0]) * scale
    py = (size - 1) - (v - lo[1]) * scale

    img = np.empty((size, size, 3), np.uint8)
    img[:] = np.asarray(background, np.uint8)
    zbuf = np.full((size, size), -np.inf)

    if ground_height is not None and ay == 1:
        gy = int(round((size - 1) - (ground_height - lo[1]) * scale))
        if 0 <= gy < size:
            img[gy:min(gy + 2, size), :] = np.array([63, 174, 106], np.uint8)

    # lambertian shade per face
    p1, p2, p3 = pos[tri[:, 0]], pos[tri[:, 1]], pos[tri[:, 2]]
    fn = np.cross(p2 - p1, p3 - p1)
    fl = np.linalg.norm(fn, axis=1, keepdims=True)
    fn = fn / np.maximum(fl, 1e-12)
    lightv = np.asarray(light, np.float64)
    lightv = lightv / np.linalg.norm(lightv)
    lam = np.abs(fn @ lightv)  # double-sided
    shade = 0.25 + 0.75 * lam
    color = (np.asarray(base_color, np.float64)[None, :]
             * shade[:, None]).clip(0, 255).astype(np.uint8)

    # z-buffered barycentric fill, one triangle at a time (host-side debug
    # path — fine for preview sizes)
    tx = px[tri]  # (T, 3)
    ty = py[tri]
    tz = depth[tri]
    order = np.argsort(tz.mean(axis=1))  # near-far irrelevant with z-buffer
    for t in order:
        x0, x1, x2 = tx[t]
        y0, y1, y2 = ty[t]
        minx = max(int(np.floor(min(x0, x1, x2))), 0)
        maxx = min(int(np.ceil(max(x0, x1, x2))), size - 1)
        miny = max(int(np.floor(min(y0, y1, y2))), 0)
        maxy = min(int(np.ceil(max(y0, y1, y2))), size - 1)
        if minx > maxx or miny > maxy:
            continue
        gx, gy = np.meshgrid(np.arange(minx, maxx + 1),
                             np.arange(miny, maxy + 1))
        d = (y1 - y2) * (x0 - x2) + (x2 - x1) * (y0 - y2)
        if abs(d) < 1e-12:
            continue
        w0 = ((y1 - y2) * (gx - x2) + (x2 - x1) * (gy - y2)) / d
        w1 = ((y2 - y0) * (gx - x2) + (x0 - x2) * (gy - y2)) / d
        w2 = 1.0 - w0 - w1
        inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0)
        if not inside.any():
            continue
        z = w0 * tz[t, 0] + w1 * tz[t, 1] + w2 * tz[t, 2]
        zb = zbuf[miny:maxy + 1, minx:maxx + 1]
        write = inside & (z > zb)
        zb[write] = z[write]
        img[miny:maxy + 1, minx:maxx + 1][write] = color[t]

    if len(markers):
        zlo, zhi = float(depth.min()), float(depth.max())
        zspan = max(zhi - zlo, 1e-6)
        arm = max(2, size // 28)
        for mpos in markers:
            mp = np.asarray(mpos, np.float64)
            mx = int(round((mp[ax] - lo[0]) * scale))
            my = int(round((size - 1) - (mp[ay] - lo[1]) * scale))
            if not (0 <= mx < size and 0 <= my < size):
                continue
            t01 = np.clip((mp[az] - zlo) / zspan, 0.0, 1.0)
            col = np.array([255, 120 + 135 * t01, 60], np.uint8)
            img[my, max(mx - arm, 0):min(mx + arm + 1, size)] = col
            img[max(my - arm, 0):min(my + arm + 1, size), mx] = col
    return img


def write_ppm(path: str, image: np.ndarray) -> None:
    image = np.asarray(image, np.uint8)
    h, w = image.shape[:2]
    directory = os.path.dirname(os.path.abspath(path))
    os.makedirs(directory, exist_ok=True)
    with open(path, "wb") as f:
        f.write(f"P6\n{w} {h}\n255\n".encode())
        f.write(image.tobytes())


def render_ppm(path: str, state: SimState, topo: Topology,
               size: int = 512, plane: str = "xy",
               ground_height: Optional[float] = None,
               recenter_com: bool = False) -> None:
    """Shaded z-buffered snapshot of the current surface to a PPM file.

    recenter_com=True renders in the body's COM frame (the reference's
    COM-follow transform, ``SoftBodySimulator.cs:850-863``) — useful for
    stable framing of a drifting body."""
    pos = np.asarray(state.positions)
    if recenter_com:
        pos = pos - pos.mean(axis=0)
        ground_height = None  # world-frame floor is meaningless here
    img = rasterize(pos, np.asarray(topo.triangles),
                    size=size, plane=plane, ground_height=ground_height)
    write_ppm(path, img)
