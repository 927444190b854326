"""Example 8 — the fused Pallas engine end-to-end: a braced lattice
settles on the floor with the WHOLE interactive step (gravity, solve,
contacts, external-force lifecycle) compiled into one Mosaic kernel
(``kernels.lattice_pallas.make_pallas_step``), then gets poked.

On a TPU backend the kernel runs natively (the fastest engine —
BENCHMARKS.md); on CPU it runs in Pallas interpret mode so the example
stays runnable anywhere (slowly — keep ``steps`` small there).
"""

from __future__ import annotations

import contextlib

import jax
import numpy as np

from ..core.config import LambdaMode, SolveMode, SolverConfig
from ..kernels import lattice_pallas
from ..solvers import lattice as lat_engine
from ..topology import lattice


def run(res: int = 6, steps: int = 40, dt: float = 1 / 60,
        poke_at: int = 20, verbose: bool = True):
    spec = lattice.lattice_spec(res, braced=True)
    cfg = SolverConfig(
        substeps=4, iterations=1, damping=0.02,
        solve_mode=SolveMode.JACOBI, lambda_mode=LambdaMode.RESET,
        gravity_is_acceleration=True,
        ground_height=0.0, friction=0.3)
    state = lat_engine.make_lattice_state(spec, center=(0.0, 0.6, 0.0),
                                          mass=0.001)

    if jax.default_backend() == "tpu":
        ctx = contextlib.nullcontext()
    else:
        from jax.experimental.pallas import tpu as pltpu

        ctx = pltpu.force_tpu_interpret_mode()

    with ctx:
        step = lattice_pallas.make_pallas_step(spec, cfg, dt)
        for i in range(steps):
            if i == poke_at:
                # sideways impulse through the fused force lifecycle
                f = np.zeros((spec.n_particles, 3), np.float32)
                f[:, 0] = 2e-3
                state = state.replace(ext_force=jax.numpy.asarray(f))
            state = step(state)

    p = np.asarray(state.positions)
    if verbose:
        print(f"fused kernel: {spec.n_particles} particles x {steps} "
              f"frames  finite={np.isfinite(p).all()} "
              f"ymin={p[:, 1].min():.4f} "
              f"com_x={p[:, 0].mean():.4f}")
    return state


if __name__ == "__main__":
    run()
