"""Non-blocking keyboard input for the live ``run --watch`` loop.

The TPU-native answer to the reference's human-in-the-loop interaction
(``SoftBodyInteractor.cs:37-67``: Space = upward impulse, P/U = pin/unpin,
held-key drag; ``SoftBodyController.cs:56-80``: R = reset) minus the mouse
ray — headless terminals have no cursor-to-world ray, so directional pokes
ride WASD instead.  stdin is switched to raw/no-echo mode for the duration
of the watch loop and polled with ``select`` between frames: the
simulation never blocks on input, and every key maps to a device-side
``Session`` verb (impulses ride into the jitted step as state — zero extra
host round-trips, unlike the reference's full-buffer re-upload on every
poke, ``SoftBodySimulator.cs:940``).

Keys (see ``legend()``):
  space   impulse up at the COM          (AddForce(up*50, com, r=2))
  w/s     poke -z / +z                   a/d   poke -x / +x
  j/k     poke down / up
  p       pin around the COM             u     unpin around the COM
  r       restart from the initial snapshot
  q       quit the watch loop
"""

from __future__ import annotations

import contextlib
import os
import select
import sys
from typing import Callable, Iterator, List, Optional


@contextlib.contextmanager
def raw_stdin() -> Iterator[Callable[[], List[str]]]:
    """Context manager yielding a non-blocking ``poll() -> [keys]``.

    Falls back to a no-op poller when stdin is not a TTY (piped runs, CI,
    tests) so the watch loop degrades gracefully."""
    interactive = False
    fd = -1
    old = None
    try:
        fd = sys.stdin.fileno()
        interactive = fd >= 0 and os.isatty(fd)
    except Exception:  # noqa: BLE001 — pseudofiles (pytest), closed stdin
        interactive = False
    if interactive:
        import termios
        import tty

        old = termios.tcgetattr(fd)
        tty.setcbreak(fd)

    def poll() -> List[str]:
        if not interactive:
            return []
        keys = []
        while select.select([sys.stdin], [], [], 0)[0]:
            ch = sys.stdin.read(1)
            if not ch:
                break
            keys.append(ch)
        return keys

    try:
        yield poll
    finally:
        if interactive and old is not None:
            import termios

            termios.tcsetattr(fd, termios.TCSADRAIN, old)


def legend() -> str:
    return ("keys: space=impulse  wasd/jk=poke  p=pin  u=unpin  "
            "r=restart  q=quit")


def apply_keys(session, keys, center=None,
               impulse: float = 50.0, poke: float = 20.0,
               radius: float = 2.0, pin_radius: float = 0.5) -> dict:
    """Apply a batch of pressed keys to a ``Session``.  ``center`` defaults
    to the body's current centre of mass.  Returns a report dict with
    ``quit``/``acted`` flags and the actions taken (for the status line)."""
    import numpy as np

    report = {"quit": False, "acted": [], "restarted": False}
    if not keys:
        return report
    if center is None:
        center = tuple(np.asarray(session.state.positions).mean(axis=0))
    dirs = {
        " ": ("impulse", (0.0, impulse, 0.0)),
        "w": ("poke -z", (0.0, 0.0, -poke)),
        "s": ("poke +z", (0.0, 0.0, poke)),
        "a": ("poke -x", (-poke, 0.0, 0.0)),
        "d": ("poke +x", (poke, 0.0, 0.0)),
        "j": ("poke -y", (0.0, -poke, 0.0)),
        "k": ("poke +y", (0.0, poke, 0.0)),
    }
    for ch in keys:
        c = ch.lower()
        if c == "q":
            report["quit"] = True
        elif c in dirs:
            name, force = dirs[c]
            session.poke(force, center, radius)
            report["acted"].append(name)
        elif c == "p":
            session.pin(center, pin_radius)
            report["acted"].append("pin")
        elif c == "u":
            session.unpin(center, max(radius, pin_radius))
            report["acted"].append("unpin")
        elif c == "r":
            session.restart()
            report["acted"].append("restart")
            report["restarted"] = True
    return report
