"""Named solver presets.

Replaces the reflection-based ScriptableObject presets
(``SOs/SoftBodyPreset.cs:15-27``) and the jelly/firm/bouncy trio wired into
``SoftBodyController`` (``SoftBodyController.cs:19-23``, hotkeys 1/2/3) with
a plain dict of frozen configs.  Compliance values follow the flagship
scene's structural/shear/bend split (``Scenes/SoftBodySimulator.unity``:
1e-4 / 1e-3 / 1e-2) scaled per feel.
"""

from __future__ import annotations

from typing import Dict

from .config import DampingMode, FloorMode, LambdaMode, SolveMode, SolverConfig

PRESETS: Dict[str, SolverConfig] = {
    # wobbly, heavily compliant, low damping
    "jelly": SolverConfig(
        substeps=4,
        iterations=8,
        damping=0.005,
        solve_mode=SolveMode.JACOBI,
        ground_height=0.0,
        friction=0.2,
    ),
    # stiff: near-zero compliance, more iterations
    "firm": SolverConfig(
        substeps=4,
        iterations=16,
        damping=0.02,
        solve_mode=SolveMode.JACOBI,
        ground_height=0.0,
        friction=0.4,
    ),
    # bouncy: velocity-level floor with high restitution
    "bouncy": SolverConfig(
        substeps=4,
        iterations=8,
        damping=0.0,
        solve_mode=SolveMode.JACOBI,
        floor_mode=FloorMode.VELOCITY_REFLECT,
        restitution=0.8,
        penetration_kick=2.0,
        friction=0.1,
    ),
    # the flagship GPU engine's semantics (SoftBodySimulator + XPBDSoftBody)
    "flagship": SolverConfig(
        substeps=4,
        iterations=9,
        damping=0.01,
        damping_mode=DampingMode.PER_DT,
        lambda_mode=LambdaMode.DECAY,
        lambda_decay=0.99,
        max_dlambda_rel=0.1,
        lambda_clamp=100.0,
        min_alpha_tilde=1e-10,
        solve_mode=SolveMode.COLORED,
        floor_mode=FloorMode.VELOCITY_REFLECT,
    ),
    # the canonical CPU engine's semantics (SoftBodyCPU)
    "reference_cpu": SolverConfig(
        substeps=1,
        iterations=10,
        damping=0.01,
        lambda_mode=LambdaMode.RESET,
        solve_mode=SolveMode.COLORED,
        floor_mode=FloorMode.XPBD_INEQUALITY,
        friction=0.1,
    ),
}


# per-preset compliances (distance constraints), applied at topology build
PRESET_COMPLIANCE = {
    "jelly": 1e-2,
    "firm": 1e-6,
    "bouncy": 1e-3,
    "flagship": 1e-4,
    "reference_cpu": 1e-2,
}


def get_preset(name: str) -> SolverConfig:
    try:
        return PRESETS[name]
    except KeyError:
        raise KeyError(
            f"unknown preset {name!r}; available: {sorted(PRESETS)}"
        ) from None
