"""Terminal (ANSI) live preview — the headless analog of the reference's
real-time viewport + debug overlay (``SoftBodyDebugger.cs:118-140``,
``SoftBodyInteractor`` feedback loop).

Renders the z-buffered raster (``io/raster.py``) as 24-bit-color half-block
characters: each character cell shows two vertically stacked pixels
(upper = foreground '▀', lower = background), so a ``cols`` x ``cols``
image becomes ``cols/2`` terminal rows at roughly square aspect.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..core.state import SimState, Topology
from . import raster as _raster

HOME = "\x1b[H"
CLEAR = "\x1b[2J"
RESET = "\x1b[0m"


def ansi_frame(image: np.ndarray) -> str:
    """(H, W, 3) uint8 -> ANSI half-block string (H/2 text rows)."""
    img = np.asarray(image, np.uint8)
    h = img.shape[0] - (img.shape[0] % 2)
    top = img[0:h:2]
    bot = img[1:h:2]
    lines = []
    for tr, br in zip(top, bot):
        parts = []
        last = None
        for (r1, g1, b1), (r2, g2, b2) in zip(tr, br):
            key = (r1, g1, b1, r2, g2, b2)
            if key != last:
                parts.append(f"\x1b[38;2;{r1};{g1};{b1}m"
                             f"\x1b[48;2;{r2};{g2};{b2}m")
                last = key
            parts.append("▀")
        parts.append(RESET)
        lines.append("".join(parts))
    return "\n".join(lines)


def frame(state: SimState, topo: Topology, cols: int = 72,
          plane: str = "xy",
          ground_height: Optional[float] = None,
          status: str = "", markers=()) -> str:
    """One renderable frame (positions fetched to host here — the only
    device crossing of the preview path).  ``markers``: world points drawn
    as crosshairs (the watch-mode cursor)."""
    img = _raster.rasterize(
        np.asarray(state.positions), np.asarray(topo.triangles),
        size=cols, plane=plane, ground_height=ground_height,
        markers=markers)
    body = ansi_frame(img)
    return body + ("\n" + status if status else "")


def show(text: str, first: bool = False) -> None:
    import sys

    if first:
        sys.stdout.write(CLEAR)
    sys.stdout.write(HOME + text + "\n")
    sys.stdout.flush()
