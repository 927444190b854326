"""Fused Pallas TPU kernel: the general-topology (mesh) substep loop in one
kernel, built on the windowed one-hot MXU structure.

The XLA windowed backend (``solvers/general._solve_distance_windowed`` +
``topology/windows.py``) already removed every gather/scatter HLO from the
mesh sweep, but at single-instance scale the sweep is per-op dispatch-bound
(~45 us for ~16 ops on <100 KB operands, BENCHMARKS.md).  This kernel fuses
the ENTIRE substep loop — predict, K Jacobi iterations of the windowed
distance sweep (optionally Chebyshev-accelerated), contacts, finalize —
into one Mosaic program with everything VMEM-resident: positions,
velocities, multiplier slabs, and the one-hot block matrices themselves.
Per-op dispatch cost disappears; the sweep runs at MXU/VPU speed.

Formulation (leaner than the XLA backend's, same arithmetic):

* particle planes live component-major ``(3, Npad)`` — sublane = coordinate,
  lane = (RCM-renumbered) particle index, so every block's particle window
  is a static lane slice ``pred[:, base:base+W]`` (no window-extraction
  matmul at all);
* the endpoint-difference ``d = pb - pa`` comes from a signed one-hot
  matmul per block: ``d = win @ Gd_k`` with ``Gd_k[w, s] = +1`` at slot s's
  b endpoint, ``-1`` at its a endpoint.  {0, +-1} entries are exact in
  bf16, but the MXU truncates the f32 WINDOW operand to bf16 in the
  mixed product (measured ~7e-3 on O(1) positions — hardware only;
  interpret mode is exact, which is why this hid from the CPU tests), so
  the default path splits the f32 operand into 3 bf16 terms and
  accumulates 3 MXU passes (``ops/mxu_exact.py``, error ~2e-7):
  ``d`` then matches the XLA backend's ``pb - pa`` to f32 rounding.
  ``approx_math`` keeps the single-pass truncated dot (bench regime);
* the correction scatter exploits that the per-endpoint weights are the
  DESTINATION particle's inverse mass: correction_a = -w_a dp,
  correction_b = +w_b dp, so  delta = w * (dp @ Gd_k^T)  — one signed
  matmul (the gather matrix transposed) and a single elementwise inverse-
  mass scale on the accumulated delta, instead of the XLA backend's
  2S-wide two-sided scatter;
* per-edge static quantities (rest, alpha, relax = omega/maxdeg, clamp
  bounds) and per-call quantities (wa+wb denominators, validity guards)
  are precomputed outside the kernel into (K, 1, S) slabs;
* meshes whose resident matrices would blow the VMEM budget (~20k edges
  at W=256) automatically switch to the SYNTHESIZED spelling: the block
  matrix is rebuilt in-registers per sweep from a (K, 2, S) int32
  endpoint slab via two ``broadcasted_iota`` compares (the bending
  mechanism below, applied to distance) — bitwise-identical output
  (pinned by test), mesh size bounded only by particle planes and
  per-edge slabs (~100k+ edges).

Capability envelope mirrors the XLA windowed backend: JACOBI solve mode
(plus its Chebyshev acceleration), RESET/DECAY/WARM_START lambda modes,
both floor modes, sphere/box SDF colliders, clamps, external-force
lifecycle, BENDING (dihedral) constraints, and the global VOLUME/pressure
constraint (``ops/volume.py``: synthesized triangle one-hots gather the
three corners, gradients scatter into the correction plane, V and the
w-weighted gradient norm reduce to per-body scalars).  DENSE
self-collision runs IN-KERNEL: the all-pairs separation pass
(``ops/spatial_hash.self_collision_project_dense``) as row-blocked
K=5/K=2 Gram contractions on the MXU against the resident position
plane — multi-body contact scenes (``ball_on_cloth``) fuse end-to-end;
the sorted/hash/blocked backends still route to the general engine
(``_check_supported``).

Bending rides a different mechanism than distance: the hinge one-hot
matrices are too large to keep VMEM-resident (~16 MB bf16 at bunny scale,
4x the distance structure) and streaming them from HBM would add ~16 MB
of DMA per sweep.  Instead the kernel SYNTHESIZES each block's four
endpoint one-hots in-registers from tiny ``(4, S)`` int32 index slabs
(``broadcasted_iota == idx`` compare, exact {0,1} bf16), then runs the
same split-compensated gather/scatter MXU dots (one ``split3`` of the
window shared by all four endpoint gathers) — zero extra HBM traffic.
``arccos`` has no
Mosaic lowering, so the dihedral angle uses a branchless Cephes-style
``asin`` polynomial (``_acos``, float32-accurate to ~1e-7 — below the
bf16-one-hot noise floor of the validation methodology).

Reference semantics carried over (citations in ops/distance.py and
solvers/general.py): XPBD distance projection ``XPBDSoftBody.compute:
106-179``, predict/finalize ``SoftBodyCPU.cs:294-324``, floor
``XPBDSoftBody.compute:272-316`` / ``SoftBodyCPU.cs:352-400``.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.config import FloorMode, LambdaMode, SolveMode, SolverConfig
from ..core.state import SimState, Topology
from ..ops.mxu_exact import dot_oh, split3

SEG = 128          # lane alignment of window bases
VMEM_BUDGET = 14_000_000   # leave ~2 MB of the ~16 MB scope for Mosaic stack


def _check_supported(cfg: SolverConfig, topo: Topology):
    if cfg.solve_mode not in (SolveMode.JACOBI, SolveMode.COLORED):
        raise NotImplementedError(
            f"mesh pallas kernel: solve mode {cfg.solve_mode} — use the "
            "general engine")
    if (cfg.enable_self_collision
            and cfg.self_collision_backend != "dense"):
        raise NotImplementedError(
            "mesh pallas kernel: only the dense self-collision backend is "
            "fused in-kernel — use the general engine (or the hybrid "
            "cadence step) for the sorted/hash/blocked backends")


def _acos(x):
    """Branchless float32 arccos for Mosaic (no ``acos``/``atan2`` lowering
    exists): Cephes-style ``asin`` minimax polynomial with the |x|>0.5
    range reduction, accurate to ~1e-7 rad over [-1, 1] — below the
    validation methodology's ulp-amplification noise floor.  Used only
    inside the Pallas kernel; interpret mode runs the same formula so
    kernel-vs-engine comparisons see one consistent rounding."""
    half_pi = jnp.float32(1.5707963267948966)
    a = jnp.abs(x)
    big = a > 0.5
    z = jnp.where(big, (1.0 - a) * 0.5, a * a)
    r = jnp.where(big, jnp.sqrt(jnp.maximum((1.0 - a) * 0.5, 0.0)), a)
    p = ((((4.2163199048e-2 * z + 2.4181311049e-2) * z + 4.5470025998e-2)
          * z + 7.4953002686e-2) * z + 1.6666752422e-1)
    t = r + r * z * p
    asin_a = jnp.where(big, half_pi - 2.0 * t, t)
    return half_pi - jnp.where(x < 0, -asin_a, asin_a)


def _colored_pack(mins, maxs, colors, s: int, max_window: int, what: str):
    """Span-bounded greedy packing of color-sorted constraints into
    fixed-``s``-slot blocks (the distance sweep's COLORED packing, shared
    by the bending/tet plans).  Inputs must be sorted by (color, min
    endpoint).  A block closes when it reaches ``s`` slots OR its particle
    window would exceed ``max_window`` (color classes scatter constraints
    across the mesh, so fixed-count blocks would need mesh-wide windows).
    Returns ``(rows, valid, bases, width, color_ranges)`` where
    ``rows[i]`` is the input row filling slot i (padded slots replicate
    the block's last real row, ``valid`` 0) and ``color_ranges`` records
    the block range of every color for the kernel's apply-after-each-
    color GS ordering."""
    n_colors = int(colors[-1]) + 1
    cbounds = np.searchsorted(colors, np.arange(n_colors + 1))
    slot_blocks, vmasks, bases_l, ranges = [], [], [], []
    span_max = 0
    for c in range(n_colors):
        i, end = int(cbounds[c]), int(cbounds[c + 1])
        b_first = len(bases_l)
        while i < end:
            base = int(mins[i] // SEG) * SEG
            hi = int(maxs[i])
            if hi - base + 1 > max_window:
                raise NotImplementedError(
                    f"mesh kernel {what} span {hi - base + 1} > "
                    f"{max_window}: bandwidth too large (is the topology "
                    "RCM-renumbered?)")
            j = i + 1
            while j < end and (j - i) < s:
                nhi = max(hi, int(maxs[j]))
                if nhi - base + 1 > max_window:
                    break
                hi = nhi
                j += 1
            ids = np.arange(i, j, dtype=np.int64)
            ids = np.concatenate(
                [ids, np.full(s - len(ids), j - 1, np.int64)])
            slot_blocks.append(ids)
            vmasks.append((np.arange(s) < (j - i)).astype(np.float32))
            bases_l.append(base)
            span_max = max(span_max, hi - base + 1)
            i = j
        if len(bases_l) > b_first:
            ranges.append((b_first, len(bases_l)))
    w = SEG * -(-span_max // SEG)
    return (np.concatenate(slot_blocks), np.concatenate(vmasks),
            np.asarray(bases_l, np.int64), w, tuple(ranges))


def _slot_inverse(slot_ids, valid, n: int):
    """Slot of each real constraint (multiplier in/out mapping)."""
    inv = np.empty(n, np.int64)
    fv = valid > 0
    inv[slot_ids[fv]] = np.flatnonzero(fv)
    return inv


@dataclasses.dataclass(frozen=True)
class BendPlan:
    """Host-built hinge-block structure for in-kernel bending.

    The one-hot matrices themselves are NOT stored — they are synthesized
    in-kernel from ``idx_loc`` (iota compare), so the only resident data is
    a handful of (Kb, ., S) slabs.  ``color_ranges`` (COLORED mode): block
    range of each hinge color, packed color-major — the kernel applies
    corrections after each color (exact parallel GS, the in-kernel twin of
    ``general._solve_bending_colored``); None = Jacobi sweep.  Slots are a
    padded permutation of hinges in either mode (``slot_ids`` hinge id per
    slot, ``cslot`` slot of each real hinge — the multiplier mapping)."""

    idx_loc: np.ndarray     # (Kb, 4, S) int32 window-local A,B,C,D indices
    idx_glob: np.ndarray    # (4, Kb*S) int32 global indices (per-call masses)
    bases: Tuple[int, ...]  # per-block window base (static, SEG-aligned)
    rest: np.ndarray        # (Kb, 1, S) f32 rest dihedral angles
    alpha: np.ndarray       # (Kb, 1, S) f32 compliance * inv_dt2
    relax: np.ndarray       # (Kb, 1, S) f32 omega / max-bend-degree, masked
                            #   (COLORED: validity only — full strength)
    slot_ids: np.ndarray    # (Kb*S,) int64 hinge id per slot
    cslot: np.ndarray       # (H,) int64 slot of each real hinge
    n_blocks: int
    block_hinges: int
    window: int
    color_ranges: Optional[Tuple[Tuple[int, int], ...]] = None


def _build_bend_plan(topo: Topology, cfg: SolverConfig, dt_sub: float,
                     block_hinges: int, max_window: int,
                     colored: bool = False) -> BendPlan:
    hg0 = np.asarray(topo.hinges, np.int64)
    h = hg0.shape[0]
    s = int(block_hinges)
    color_ranges = None
    if colored:
        bc = np.asarray(topo.bend_colors, np.int64)
        order = np.lexsort((hg0.min(axis=1), bc))
        hgs = hg0[order]
        rows, valid, bases, w, color_ranges = _colored_pack(
            hgs.min(axis=1), hgs.max(axis=1), bc[order], s, max_window,
            "hinge")
        slot_ids = order[rows]
        k = bases.shape[0]
        hg = hg0[slot_ids]
    else:
        if not (np.diff(hg0.min(axis=1)) >= 0).all():
            raise NotImplementedError(
                "mesh kernel bending needs window-sorted hinges — build "
                "the topology with topology_from_mesh(windowed=True)")
        k = -(-h // s)
        hpad = k * s
        slot_ids = np.concatenate([np.arange(h, dtype=np.int64),
                                   np.full(hpad - h, h - 1, np.int64)])
        valid = (np.arange(hpad) < h).astype(np.float32)
        hg = hg0[slot_ids]
        blocks0 = hg.reshape(k, s, 4)
        bases = (blocks0.min(axis=(1, 2)) // SEG) * SEG
        span = int((blocks0.max(axis=(1, 2)) - bases + 1).max())
        w = SEG * -(-span // SEG)
        if w > max_window:
            raise NotImplementedError(
                f"mesh kernel hinge window {w} > {max_window}: bandwidth "
                "too large — bending falls back to the general engine")

    blocks = hg.reshape(k, s, 4)
    loc = (blocks - bases[:, None, None]).astype(np.int32)   # (k, s, 4)
    idx_loc = np.ascontiguousarray(np.transpose(loc, (0, 2, 1)))

    # padded slots replicate a real hinge (finite geometry); their dl is
    # exactly zeroed by the validity-masked relax slab
    rest = np.asarray(topo.rest_angles, np.float32)[slot_ids]
    comp = np.asarray(topo.bend_compliance, np.float32)[slot_ids]
    alpha = comp / (dt_sub * dt_sub)

    if colored:
        # exact GS: full-strength projection, one color at a time
        # (general._solve_bending_colored has no omega/degree scaling)
        relax = valid.astype(np.float32)
    else:
        bd = np.asarray(topo.bend_degree, np.float32)
        maxdeg = np.maximum(
            np.maximum(np.maximum(bd[hg[:, 0]], bd[hg[:, 1]]),
                       np.maximum(bd[hg[:, 2]], bd[hg[:, 3]])), 1.0)
        omega = cfg.omega if cfg.omega > 0 else 1.0
        relax = (valid * omega / maxdeg).astype(np.float32)

    def slab(a):
        return np.ascontiguousarray(a.reshape(k, 1, s), np.float32)

    return BendPlan(
        idx_loc=idx_loc,
        idx_glob=np.ascontiguousarray(hg.T.astype(np.int32)),
        bases=tuple(int(b) for b in bases),
        rest=slab(rest),
        alpha=slab(alpha),
        relax=slab(relax),
        slot_ids=slot_ids,
        cslot=_slot_inverse(slot_ids, valid, h),
        n_blocks=k,
        block_hinges=s,
        window=w,
        color_ranges=color_ranges,
    )


@dataclasses.dataclass(frozen=True)
class VolumePlan:
    """Host-built triangle-block structure for the in-kernel global
    volume constraint (``ops/volume.py``'s math).  One-hot matrices are
    synthesized in-registers from ``idx_loc`` (the bending mechanism);
    padded slots point all three endpoints at the same local index, so
    their cross products — and hence their V contribution and gradient
    scatter — cancel to exact zeros (no mask needed)."""

    idx_loc: np.ndarray     # (Kt, 3, S) int32 window-local p1,p2,p3
    bases: Tuple[int, ...]
    n_blocks: int
    block_tris: int
    window: int
    rest_volume: float


def _build_volume_plan(topo: Topology, block_tris: int,
                       max_window: int) -> VolumePlan:
    tr = np.asarray(topo.triangles, np.int64)
    t = tr.shape[0]
    # processing order is free (fp summation order only): sort by min
    # vertex so RCM renumbering gives tight windows
    order = np.argsort(tr.min(axis=1), kind="stable")
    tr = tr[order]
    s = int(block_tris)
    k = -(-t // s)
    tpad = k * s
    if tpad > t:
        # padded slots: all three endpoints equal -> zero contribution
        pad = np.full((tpad - t, 3), tr[-1, 0], np.int64)
        tr = np.vstack([tr, pad])
    blocks = tr.reshape(k, s, 3)
    bases = (blocks.min(axis=(1, 2)) // SEG) * SEG
    span = int((blocks.max(axis=(1, 2)) - bases + 1).max())
    w = SEG * -(-span // SEG)
    if w > max_window:
        raise NotImplementedError(
            f"mesh kernel volume window {w} > {max_window}: bandwidth too "
            "large — volume falls back to the general engine")
    loc = (blocks - bases[:, None, None]).astype(np.int32)
    return VolumePlan(
        idx_loc=np.ascontiguousarray(np.transpose(loc, (0, 2, 1))),
        bases=tuple(int(b) for b in bases),
        n_blocks=k, block_tris=s, window=w,
        rest_volume=float(topo.rest_volume))


@dataclasses.dataclass(frozen=True)
class TetPlan:
    """Host-built tet-block structure for the in-kernel PER-TET volume
    family (``ops/tet_volume.py``).  Same synthesized-one-hot mechanism as
    bending (4 endpoints, translation-invariant gradients,
    grad0 = -(g1+g2+g3)).  JACOBI (``color_ranges`` None): the apply step
    divides by the per-particle tet degree (the general engine's
    mass-splitting Jacobi, ``general._solve_tets_jacobi``), carried in as
    a per-call ``wtd = inv_mass / tet_degree`` plane.  COLORED: blocks are
    packed color-major, projections run at full strength and corrections
    apply after each color with the plain inverse mass (the in-kernel twin
    of ``general._solve_tets_colored``).  Padded slots replicate a real
    tet (finite geometry); their dl is exactly zeroed by the
    validity-masked relax slab."""

    idx_loc: np.ndarray     # (Kt, 4, S) int32 window-local p0..p3
    idx_glob: np.ndarray    # (4, Kt*S) int32 global indices (per-call masses)
    bases: Tuple[int, ...]
    rest6: np.ndarray       # (Kt, 1, S) f32 6x rest volumes
    alpha: np.ndarray       # (Kt, 1, S) f32 compliance * inv_dt2
    relax: np.ndarray       # (Kt, 1, S) f32 omega, validity-masked
                            #   (COLORED: validity only — full strength)
    slot_ids: np.ndarray    # (Kt*S,) int64 original tet id per slot
    cslot: np.ndarray       # (T,) int64 slot of each real tet
    n_blocks: int
    block_tets: int
    window: int
    color_ranges: Optional[Tuple[Tuple[int, int], ...]] = None


def _flat_tet_colors(topo: Topology) -> np.ndarray:
    """Per-tet color ids, reconstructed from the padded ``tcol_*`` buckets
    (the general engine's COLORED structures — flat colors aren't stored)."""
    t = topo.n_tets
    tc = np.full(t, -1, np.int64)
    ids = np.asarray(topo.tcol_tet_ids, np.int64)
    val = np.asarray(topo.tcol_valid) > 0
    for c in range(topo.num_tet_colors):
        tc[ids[c][val[c]]] = c
    if (tc < 0).any():
        raise ValueError("tet coloring does not cover every tet")
    return tc


def _build_tet_plan(topo: Topology, cfg: SolverConfig, dt_sub: float,
                    block_tets: int, max_window: int,
                    colored: bool = False) -> TetPlan:
    tt0 = np.asarray(topo.tets, np.int64)
    t = tt0.shape[0]
    s = int(block_tets)
    color_ranges = None
    if colored:
        tc = _flat_tet_colors(topo)
        order = np.lexsort((tt0.min(axis=1), tc))
        tts = tt0[order]
        rows, valid, bases, w, color_ranges = _colored_pack(
            tts.min(axis=1), tts.max(axis=1), tc[order], s, max_window,
            "tet")
        slot_ids = order[rows]
        k = bases.shape[0]
    else:
        # Jacobi processing order is free (fp summation order only): sort
        # by min vertex so RCM renumbering gives tight windows
        order = np.argsort(tt0.min(axis=1), kind="stable")
        k = -(-t // s)
        tpad = k * s
        rows = np.concatenate([np.arange(t, dtype=np.int64),
                               np.full(tpad - t, t - 1, np.int64)])
        slot_ids = order[rows]
        valid = (np.arange(tpad) < t).astype(np.float32)
        blocks0 = tt0[slot_ids].reshape(k, s, 4)
        bases = (blocks0.min(axis=(1, 2)) // SEG) * SEG
        span = int((blocks0.max(axis=(1, 2)) - bases + 1).max())
        w = SEG * -(-span // SEG)
        if w > max_window:
            raise NotImplementedError(
                f"mesh kernel tet window {w} > {max_window}: bandwidth too "
                "large — tets fall back to the general engine")
    tt = tt0[slot_ids]
    rest6 = np.asarray(topo.rest_tet_volumes, np.float32)[slot_ids]
    comp = np.asarray(topo.tet_compliance, np.float32)[slot_ids]
    blocks = tt.reshape(k, s, 4)
    loc = (blocks - bases[:, None, None]).astype(np.int32)
    alpha = comp / (dt_sub * dt_sub)
    if colored:
        # exact GS: full-strength projection, one color at a time
        # (general._solve_tets_colored has no omega scaling)
        relax = valid.astype(np.float32)
    else:
        omega = cfg.omega if cfg.omega > 0 else 1.0
        # mass-splitting Jacobi: full-strength projection, per-PARTICLE
        # mean at apply time (general._solve_tets_jacobi; max-degree
        # pre-scaling collapses on centroid-fan hubs)
        relax = (valid * omega).astype(np.float32)

    def slab(a):
        return np.ascontiguousarray(a.reshape(k, 1, s), np.float32)

    return TetPlan(
        idx_loc=np.ascontiguousarray(np.transpose(loc, (0, 2, 1))),
        idx_glob=np.ascontiguousarray(tt.T.astype(np.int32)),
        bases=tuple(int(b) for b in bases),
        rest6=slab(rest6),
        alpha=slab(alpha),
        relax=slab(relax),
        slot_ids=slot_ids,
        cslot=_slot_inverse(slot_ids, valid, t),
        n_blocks=k,
        block_tets=s,
        window=w,
        color_ranges=color_ranges,
    )


@dataclasses.dataclass(frozen=True)
class MeshKernelPlan:
    """Host-built static structure for the fused mesh kernel.

    Two spellings of the signed one-hot structure:

    * resident (``synth=False``): ``gd``/``gs`` are (K, W, S)/(K, S, W)
      bf16 matrices held VMEM-resident for the whole call — fastest, but
      the 2·E·W·2-byte footprint caps the mesh at ~20k edges (W=256);
    * synthesized (``synth=True``): only a (K, 2, S) int32 endpoint-index
      slab (``didx``) is resident and each block's matrix is rebuilt
      in-registers per sweep from two ``broadcasted_iota`` compares —
      the same mechanism the bending path already uses, arithmetic
      identical ({0,±1} exact in bf16, same MXU contractions), removing
      the matrix footprint so mesh size is bounded only by the particle
      planes and per-edge slabs (~100k+ edges).

    ``build_mesh_plan`` picks resident when it fits the VMEM budget and
    falls back to synthesized automatically (``synth_gd`` forces)."""

    gd: Optional[np.ndarray]  # (K, W, S) bf16 signed gather one-hots
    gs: Optional[np.ndarray]  # (K, S, W) bf16 = gd transposed (scatter)
    bases: Tuple[int, ...]  # per-block window base (static, SEG-aligned)
    widths: Tuple[int, ...]  # per-block window width (static, SEG multiple;
    #                          uniform == window for the resident spelling)
    ea: np.ndarray        # (K*S,) padded endpoint indices (for per-call wa)
    eb: np.ndarray
    rest: np.ndarray      # (K, 1, S) f32
    alpha: np.ndarray     # (K, 1, S) f32  (compliance * inv_dt2, floored)
    relax: np.ndarray     # (K, 1, S) f32  omega / max-degree, valid-masked
    warm_scale: np.ndarray  # (K, 1, S) f32  1/maxdeg (warm-start pre-apply)
    valid: np.ndarray     # (K, 1, S) f32  1 = real edge
    dl_bound: Optional[np.ndarray]   # (K, 1, S) f32 or None (no clamp)
    n_blocks: int
    block_edges: int
    window: int
    n_pad: int            # padded particle-lane count
    vmem_bytes: int
    bend: Optional[BendPlan] = None
    vol: Optional[VolumePlan] = None
    tet: Optional[TetPlan] = None
    didx: Optional[np.ndarray] = None  # (K, 2, S) int32 local a,b indices
    synth: bool = False
    # COLORED (exact parallel-GS) structure: blocks grouped color-major so
    # the kernel applies corrections AFTER each color (later colors see
    # earlier colors' corrections — GS ordering); None = Jacobi sweep.
    color_ranges: Optional[Tuple[Tuple[int, int], ...]] = None
    slot_ids: Optional[np.ndarray] = None   # (K*S,) edge id per slot
    edge_slot: Optional[np.ndarray] = None  # (E,) slot of each real edge


def build_mesh_plan(topo: Topology, cfg: SolverConfig, dt_sub: float,
                    block_edges: int = 256,
                    max_window: int = 1024,
                    block_hinges: int = 256,
                    synth_gd: Optional[bool] = None,
                    colored: bool = False,
                    n_bodies: int = 1,
                    per_body_mass: bool = False) -> MeshKernelPlan:
    """Build the blocked signed-one-hot structure from a topology whose
    particles are RCM-renumbered and whose edges are sorted by min endpoint
    (``topology/build.build_windowed_topology`` produces exactly this).
    ``synth_gd``: None = auto (resident matrices when they fit the VMEM
    budget, else in-kernel synthesis — see ``MeshKernelPlan``); a bool
    forces.  Raises if any block's window exceeds ``max_window`` (mesh
    bandwidth too large) or even the synthesized structure would blow the
    VMEM budget.

    ``colored=True`` builds the COLORED (exact parallel-GS) structure
    instead: the topology's edges must be color-contiguous
    (``topology_from_mesh(windowed='colored')``), and blocks are packed
    WITHIN each color by a span-bounded greedy walk — a block closes when
    it reaches ``block_edges`` slots OR its particle window would exceed
    ``max_window`` (color classes scatter edges across the mesh, so
    fixed-count blocks would need mesh-wide windows; span-bounded packing
    keeps per-block windows small at the cost of more, partially-filled
    blocks).  Each block gets its OWN window width, the one-hot matrices
    are always synthesized in-registers (ragged widths), and
    ``color_ranges`` records the block range of every color so the kernel
    can apply corrections between colors (GS ordering)."""
    edges = np.asarray(topo.edges, np.int64)
    n = topo.n_particles
    e = edges.shape[0]
    if e == 0:
        raise NotImplementedError("mesh kernel needs at least one edge")
    mins = edges.min(axis=1)
    s = int(block_edges)

    color_ranges = None
    slot = None
    edge_slot = None
    if colored:
        colors = np.asarray(topo.colors, np.int64)
        if colors.shape[0] != e or (np.diff(colors) < 0).any():
            raise NotImplementedError(
                "mesh kernel COLORED solve needs a color-contiguous "
                "windowed topology — build with topology_from_mesh("
                "windowed='colored')")
        maxs = edges.max(axis=1)
        n_colors = int(colors[-1]) + 1
        cbounds = np.searchsorted(colors, np.arange(n_colors + 1))
        slot_blocks, vmasks = [], []
        bases_l, widths_l, ranges = [], [], []
        for c in range(n_colors):
            i, end = int(cbounds[c]), int(cbounds[c + 1])
            b_first = len(widths_l)
            while i < end:
                base = int(mins[i] // SEG) * SEG
                hi = int(maxs[i])
                if hi - base + 1 > max_window:
                    raise NotImplementedError(
                        f"mesh kernel edge span {hi - base + 1} > "
                        f"{max_window}: bandwidth too large (is the "
                        "topology RCM-renumbered?)")
                j = i + 1
                while j < end and (j - i) < s:
                    nhi = max(hi, int(maxs[j]))
                    if nhi - base + 1 > max_window:
                        break
                    hi = nhi
                    j += 1
                ids = np.arange(i, j, dtype=np.int64)
                ids = np.concatenate(
                    [ids, np.full(s - len(ids), j - 1, np.int64)])
                slot_blocks.append(ids)
                vmasks.append((np.arange(s) < (j - i)).astype(np.float32))
                bases_l.append(base)
                widths_l.append(SEG * -(-(hi - base + 1) // SEG))
                i = j
            if len(widths_l) > b_first:
                ranges.append((b_first, len(widths_l)))
        color_ranges = tuple(ranges)
        slot = np.concatenate(slot_blocks)
        valid = np.concatenate(vmasks)
        k = len(widths_l)
        epad = k * s
        ea = edges[slot, 0]
        eb = edges[slot, 1]
        bases = np.asarray(bases_l, np.int64)
        widths = tuple(widths_l)
        w = max(widths_l)
        # slot of each real edge (multiplier in/out mapping)
        edge_slot = np.empty(e, np.int64)
        fv = valid > 0
        edge_slot[slot[fv]] = np.flatnonzero(fv)
    else:
        if not (np.diff(mins) >= 0).all():
            raise NotImplementedError(
                "mesh kernel needs window-sorted edges — build the topology "
                "with build_windowed_topology / topology_from_mesh("
                "windowed=True)")
        k = -(-e // s)
        epad = k * s
        ea = np.concatenate([edges[:, 0], np.full(epad - e, edges[-1, 0])])
        eb = np.concatenate([edges[:, 1], np.full(epad - e, edges[-1, 1])])
        valid = (np.arange(epad) < e).astype(np.float32)
        blk_a0 = ea.reshape(k, s)
        blk_b0 = eb.reshape(k, s)
        blk_min = np.minimum(blk_a0, blk_b0).min(axis=1)
        blk_max = np.maximum(blk_a0, blk_b0).max(axis=1)
        bases = (blk_min // SEG) * SEG
        span = int((blk_max - bases + 1).max())
        w = SEG * -(-span // SEG)
        if w > max_window:
            raise NotImplementedError(
                f"mesh kernel window {w} > {max_window}: bandwidth too "
                "large (is the topology RCM-renumbered?)")
        widths = (w,) * k

    n_pad = SEG * max(-(-n // SEG),
                      max(int(b + wd) for b, wd in zip(bases, widths))
                      // SEG)

    blk_a = ea.reshape(k, s)
    blk_b = eb.reshape(k, s)
    la = (blk_a - bases[:, None]).astype(np.int64)
    lb = (blk_b - bases[:, None]).astype(np.int64)
    vm = valid.reshape(k, s)
    # synthesized spelling: padded slots point both endpoints at the same
    # local index, so onehot(b) - onehot(a) cancels to the same zero column
    didx = np.stack([np.where(vm > 0, la, 0), np.where(vm > 0, lb, 0)],
                    axis=1).astype(np.int32)                 # (k, 2, s)

    deg = np.asarray(topo.degree, np.float32)
    maxdeg = np.maximum(np.maximum(deg[ea], deg[eb]), 1.0)
    omega = cfg.omega if cfg.omega > 0 else 1.0
    if colored:
        # exact GS: corrections apply at full strength, one color at a time
        # (general._solve_distance_colored has no omega/degree scaling)
        relax = valid.astype(np.float32)
    else:
        relax = (valid * omega / maxdeg).astype(np.float32)
    warm_scale = (valid / maxdeg).astype(np.float32)

    if colored:
        rest = np.asarray(topo.rest_lengths, np.float32)[slot]
        comp = np.asarray(topo.compliance, np.float32)[slot]
    else:
        rest = np.concatenate([
            np.asarray(topo.rest_lengths, np.float32),
            np.full(epad - e, 1.0, np.float32)])
        comp = np.concatenate([
            np.asarray(topo.compliance, np.float32), np.zeros(epad - e,
                                                              np.float32)])
    inv_dt2 = 1.0 / (dt_sub * dt_sub)
    alpha = comp * inv_dt2
    if cfg.min_alpha_tilde > 0:
        alpha = np.maximum(alpha, cfg.min_alpha_tilde)

    bound = None
    if cfg.max_dlambda > 0 or cfg.max_dlambda_rel > 0:
        bound = np.full(epad, np.inf, np.float32)
        if cfg.max_dlambda > 0:
            bound = np.minimum(bound, cfg.max_dlambda)
        if cfg.max_dlambda_rel > 0:
            bound = np.minimum(bound, cfg.max_dlambda_rel * rest)

    def slab(a):
        return np.ascontiguousarray(a.reshape(k, 1, s), np.float32)

    bend = None
    if cfg.enable_bending and topo.n_hinges > 0:
        bend = _build_bend_plan(topo, cfg, dt_sub, block_hinges, max_window,
                                colored=colored)
        n_pad = max(n_pad,
                    SEG * int((max(bend.bases) + bend.window) // SEG))

    vol = None
    if cfg.enable_volume and topo.triangles.shape[0] > 0:
        vol = _build_volume_plan(topo, block_hinges, max_window)
        n_pad = max(n_pad,
                    SEG * int((max(vol.bases) + vol.window) // SEG))

    tet = None
    if cfg.enable_tet_volume and topo.n_tets > 0:
        tet = _build_tet_plan(topo, cfg, dt_sub, block_hinges, max_window,
                              colored=colored)
        n_pad = max(n_pad,
                    SEG * int((max(tet.bases) + tet.window) // SEG))

    # ensemble row count: bodies stack on the sublane axis (runner pads
    # to a multiple of the 8-sublane f32 tile).  Plane accounting: the
    # live set is 9 (3R, n_pad) arrays (x/v in, x/v out, ext, pred/delta/
    # prev/tmp scratch); the single-body path keeps its original
    # conservative 12 so the resident/synth auto-switch point is unchanged.
    r_rows = 1 if n_bodies <= 1 else 8 * -(-n_bodies // 8)
    planes = 12 if r_rows == 1 else 10
    base_bytes = int(
        10 * k * s * 4               # per-edge slabs (incl. dynamic)
        + 2 * k * s * 4 * (r_rows - 1)   # lambda slabs gain a body axis
        + planes * n_pad * 4 * 3 * r_rows    # particle planes + scratch
        + (0 if bend is None else
           12 * bend.n_blocks * bend.block_hinges * 4   # hinge slabs
           + 2 * bend.n_blocks * bend.block_hinges * 4 * (r_rows - 1)
           # transient synthesized one-hots (4 live bf16 matrices)
           + 4 * bend.window * bend.block_hinges * 2)
        + (0 if vol is None else
           3 * vol.n_blocks * vol.block_tris * 4        # triangle idx slab
           + 3 * vol.window * vol.block_tris * 2)       # transient one-hots
        + (0 if tet is None else
           12 * tet.n_blocks * tet.block_tets * 4       # tet slabs
           + 2 * tet.n_blocks * tet.block_tets * 4 * (r_rows - 1)
           + 4 * tet.window * tet.block_tets * 2        # transient one-hots
           + n_pad * 4))                                # wtd plane
    if per_body_mass and r_rows > 1:
        # heterogeneous farms: the mass-derived dynamic slabs gain a body
        # axis too (di/act/wlim per edge; bwa..bwd+bany per hinge;
        # tw0..tw3 per tet; w and wtd planes)
        base_bytes += int(
            3 * k * s * 4 * (r_rows - 1)
            + (0 if bend is None else
               5 * bend.n_blocks * bend.block_hinges * 4 * (r_rows - 1))
            + (0 if tet is None else
               4 * tet.n_blocks * tet.block_tets * 4 * (r_rows - 1)
               + n_pad * 4 * (r_rows - 1))
            + n_pad * 4 * (r_rows - 1))
    resident_bytes = base_bytes + 2 * k * w * s * 2      # gd + gs (bf16)
    # synthesized: only the int32 index slab is resident; per sweep one
    # block's matrix plus its compare temporaries are live (~4 W x S bf16)
    synth_bytes = base_bytes + 2 * k * s * 4 + 4 * w * s * 2
    if colored:
        synth = True   # ragged per-block widths — always synthesized
    else:
        synth = (resident_bytes > VMEM_BUDGET if synth_gd is None
                 else bool(synth_gd))
    plan = MeshKernelPlan(
        gd=None,
        gs=None,
        bases=tuple(int(b) for b in bases),
        widths=tuple(int(wd) for wd in widths),
        ea=ea.astype(np.int32),
        eb=eb.astype(np.int32),
        rest=slab(rest),
        alpha=slab(alpha),
        relax=slab(relax),
        warm_scale=slab(warm_scale),
        valid=slab(valid),
        dl_bound=None if bound is None else slab(bound),
        n_blocks=k,
        block_edges=s,
        window=w,
        n_pad=int(n_pad),
        vmem_bytes=synth_bytes if synth else resident_bytes,
        bend=bend,
        vol=vol,
        tet=tet,
        didx=np.ascontiguousarray(didx) if synth else None,
        synth=synth,
        color_ranges=color_ranges,
        slot_ids=None if slot is None else slot.astype(np.int32),
        edge_slot=None if edge_slot is None else edge_slot.astype(np.int32),
    )
    if not synth:
        # dense resident matrices (uniform width) built only when used
        gd = np.zeros((k, w, s), np.float32)
        kk, ss = np.meshgrid(np.arange(k), np.arange(s), indexing="ij")
        # padded slots keep all-zero columns: d = 0, scatter = 0
        gd[kk, la, ss] -= vm
        gd[kk, lb, ss] += vm
        gd_bf = gd.astype(jnp.bfloat16)
        plan = dataclasses.replace(
            plan, gd=gd_bf,
            gs=np.ascontiguousarray(np.transpose(gd_bf, (0, 2, 1))))
    if plan.vmem_bytes > VMEM_BUDGET:
        raise NotImplementedError(
            f"mesh kernel structure ~{plan.vmem_bytes / 1e6:.1f} MB exceeds "
            "the VMEM budget even synthesized — use the XLA windowed "
            "backend")
    return plan


def make_mesh_substep_runner(topo: Topology, cfg: SolverConfig,
                             dt_sub: float, n_substeps: int,
                             with_ext: bool = False,
                             approx_math: bool = False,
                             block_edges: int = 256,
                             plan: Optional[MeshKernelPlan] = None,
                             synth_gd: Optional[bool] = None,
                             n_bodies: int = 1,
                             batched: Optional[bool] = None,
                             per_body_mass: bool = False,
                             kin_colliders=None):
    """Compile a jitted ``SimState -> SimState`` advancing ``n_substeps``
    raw substeps of the general-mesh XPBD loop in ONE fused kernel
    (``with_ext=True`` adds the reference force lifecycle: ``ext_force``
    consumed on the first substep, zeroed after).  Semantically equivalent
    to ``solvers.general`` with ``distance_backend='windowed'`` — tested in
    interpret mode (tests/test_mesh_pallas.py).  COLORED configs run the
    exact parallel-GS color sweep in-kernel for EVERY family — distance,
    bending, and per-tet volume (corrections applied after each color,
    matching ``general._solve_{distance,bending,tets}_colored``'s
    ordering; needs ``topology_from_mesh(windowed='colored')``).
    ``approx_math``
    swaps sqrt/divide for rsqrt + approximate reciprocal (opt-in, bench
    regime), as in the lattice kernels.

    ``n_bodies > 1`` compiles the ENSEMBLE kernel: B independent instances
    of the same topology stacked on the SUBLANE axis (coordinate-major row
    groups of R = B bodies, padded to the 8-sublane f32 tile).  The one-hot
    block matrices, per-edge slabs, and inverse masses are shared across
    bodies, so the MXU gather/scatter dots go from a 3-row LHS to 3R rows —
    the batch fills the systolic array instead of wasting 5/8 of every
    sublane tile (same idea as the lattice kernel's lane-folded ensembles,
    on the other axis).  The returned fn then takes/returns a SimState of
    BATCHED leaves: positions/velocities/ext_force ``(B, n, 3)``,
    lambda_dist ``(B, e)``, lambda_bend ``(B, h)``; ``inv_mass``/pinning
    is a shared ``(n,)`` by default (the replicated-farm workload), or —
    with ``per_body_mass=True`` — a per-body ``(B, n)`` leaf
    (HETEROGENEOUS farms: per-body masses and pins; every mass-derived
    slab gains a body axis, so the VMEM budget grows accordingly).
    Equivalent to ``jax.vmap`` of the single-body semantics (tested in
    tests/test_mesh_pallas.py).  ``batched=True`` forces the batched state
    contract even at ``n_bodies=1`` (a one-body-per-chip shard of a
    sharded farm).

    The returned fn also accepts an optional second argument
    ``materials = {"rest_lengths": (E,), "compliance": (E,)}`` (topo edge
    order, shared across ensemble bodies): the distance-material slabs are
    then rebuilt from these TRACED vectors per call instead of the
    plan's baked constants — same padding/floors, so passing the
    topology's own values reproduces the static path exactly.  This is
    what lets ``kernels.diff.make_differentiable_material_runner``
    differentiate rollouts w.r.t. rest lengths and compliance (material
    system identification) while keeping the fused-kernel primal."""
    _check_supported(cfg, topo)
    if n_bodies < 1:
        raise ValueError("n_bodies must be >= 1")
    if batched is None:
        batched = n_bodies > 1
    elif not batched and n_bodies > 1:
        raise ValueError("n_bodies > 1 requires the batched contract")
    if per_body_mass and not batched:
        raise ValueError("per_body_mass requires the batched contract")
    n_b = n_bodies
    # pad the body axis to the 8-sublane f32 register tile so every row
    # group slice is tile-aligned (padded bodies simulate zeros, sliced off)
    R = 1 if not batched else 8 * -(-n_b // 8)
    n_bodies = R if batched else 1   # plan VMEM accounting uses padded rows
    colored = cfg.solve_mode == SolveMode.COLORED
    if plan is None:
        plan = build_mesh_plan(topo, cfg, dt_sub, block_edges=block_edges,
                               synth_gd=synth_gd, colored=colored,
                               n_bodies=n_bodies,
                               per_body_mass=per_body_mass)
    if colored and plan.color_ranges is None:
        raise NotImplementedError(
            "mesh kernel COLORED solve needs a plan built with "
            "colored=True")
    k_blocks, s_edges, w_win = plan.n_blocks, plan.block_edges, plan.window
    n = topo.n_particles
    n_pad = plan.n_pad
    e_real = topo.n_edges
    dt = dt_sub
    inv_dt2 = 1.0 / (dt * dt)
    gx, gy, gz = cfg.gravity

    # exact one-hot contractions unless approx_math: the MXU truncates the
    # f32 operand to bf16 in the single-pass dot (ops/mxu_exact.py)
    exact_oh = not approx_math
    accelerate = (not colored and cfg.jacobi_rho > 0
                  and cfg.iterations > cfg.jacobi_cheby_delay)
    rho2 = cfg.jacobi_rho ** 2
    gamma = cfg.jacobi_gamma
    # Kinematic rigid world (core/colliders.ColliderSet): kin_colliders=
    # (S, B) makes the collider POSES one traced (1+S+B, 128) input — row 0
    # lane 0 ground height, rows 1..S spheres (cx,cy,cz,r | vx,vy,vz), then
    # boxes (cx,cy,cz,hx,hy,hz | vx,vy,vz) — so pose animation never
    # recompiles the Mosaic program; the config's rigid-world constants are
    # ignored, exactly as on the XLA engines.  One shared rigid world per
    # call (ensembles share it).
    kin = kin_colliders is not None
    if kin:
        kin_s, kin_b = int(kin_colliders[0]), int(kin_colliders[1])
        kin_rows = 1 + kin_s + kin_b
        has_contacts = (cfg.floor_mode == FloorMode.XPBD_INEQUALITY
                        or kin_s > 0 or kin_b > 0)
    else:
        kin_s = kin_b = kin_rows = 0
        has_contacts = (cfg.floor_mode == FloorMode.XPBD_INEQUALITY
                        or bool(cfg.sphere_colliders)
                        or bool(cfg.box_colliders))

    # In-kernel dense self-collision (ops/spatial_hash.self_collision_
    # project_dense fused): the all-pairs Jacobi separation pass runs as
    # row-blocked K=5/K=2 Gram contractions on the MXU against the
    # VMEM-resident position plane — no host round-trip, no general-engine
    # fallback for self-colliding mesh scenes (ball_on_cloth fused
    # end-to-end).  Exact same guards/omega as the XLA dense backend; the
    # Gram-trick accumulation order differs from the engine's separate
    # adds at ~1-ulp (the dense backend's own documented boundary caveat).
    sc_on = bool(cfg.enable_self_collision)
    sc_every = cfg.self_collision_every if sc_on else 1
    if sc_on:
        if cfg.self_collision_backend != "dense":
            raise NotImplementedError(
                "mesh kernel self-collision: only the dense backend is "
                "fused — route other backends through the general engine "
                "or the hybrid cadence step")
        # R > 1 (sublane ensembles): the dense pass runs BODY-LOCAL — one
        # Gram sweep per body row, so contact never pairs across stacked
        # bodies (matches the vmapped XLA dense backend; round-5 close of
        # the ensemble-contact guard)
        # Row blocks are FIXED at 128 (Mosaic must statically prove every
        # dynamic lane offset is a multiple of 128 — i*128 qualifies,
        # i*64 does not).  VMEM pressure is relieved by chunking the
        # COLUMN axis instead: live temps are ~8 (128, CK) f32 planes
        # plus the 5-row staging scratch, with the two output
        # contractions (mx, msum) accumulated across chunks.  CK must be
        # a 128-multiple divisor of n_pad so chunk offsets stay provable.
        sc_cb = 128
        if n_pad % 128:
            raise NotImplementedError(
                "mesh kernel dense self-collision needs lane-padded "
                "topologies (n_pad % 128 == 0)")
        sc_ck = 0
        m128 = n_pad // 128
        for k in range(m128, 0, -1):
            if m128 % k:
                continue
            if (plan.vmem_bytes + (8 * 128 * k * 128 + 5 * n_pad) * 4
                    <= VMEM_BUDGET):
                sc_ck = k * 128
                break
        if not sc_ck:
            raise NotImplementedError(
                "mesh kernel dense self-collision at this scale exceeds "
                "the VMEM budget — use the general engine's blocked "
                "backend")
        sc_nb = n_pad // sc_cb
        sc_nk = n_pad // sc_ck
        has_contacts = True

    if plan.synth:
        didx_c = jnp.asarray(plan.didx)
    else:
        gd_c = jnp.asarray(plan.gd)
        gs_c = jnp.asarray(plan.gs)
    rest_c = jnp.asarray(plan.rest)
    alpha_c = jnp.asarray(plan.alpha)
    relax_c = jnp.asarray(plan.relax)
    warm_c = jnp.asarray(plan.warm_scale)
    bound_c = (None if plan.dl_bound is None
               else jnp.asarray(plan.dl_bound))
    ea_c = jnp.asarray(plan.ea)
    eb_c = jnp.asarray(plan.eb)
    valid_c = jnp.asarray(plan.valid)
    slot_c = (None if plan.slot_ids is None
              else jnp.asarray(plan.slot_ids))
    eslot_c = (None if plan.edge_slot is None
               else jnp.asarray(plan.edge_slot))

    bplan = plan.bend
    vplan = plan.vol
    tplan = plan.tet
    in_names = (["x", "v", "w", "lam", "di", "act", "wlim"]
                + (["didx"] if plan.synth else ["gd", "gs"])
                + ["rest", "alpha", "relax", "warm"])
    if bound_c is not None:
        in_names.append("bound")
    if with_ext:
        in_names.append("f")
    if bplan is not None:
        in_names += ["blam", "bidx", "brest", "balpha", "brelax",
                     "bwa", "bwb", "bwc", "bwd", "bany"]
    if vplan is not None:
        in_names += ["vlam", "vidx"]
    if tplan is not None:
        in_names += ["tlam", "tidx", "trest", "talpha", "trelax",
                     "tw0", "tw1", "tw2", "tw3", "wtd"]
    if kin:
        in_names.append("coll")   # packed kinematic collider poses

    def kernel(*refs):
        m = dict(zip(in_names, refs))
        x_in, v_in, w_in, lam_in = m["x"], m["v"], m["w"], m["lam"]
        di_in, act_in, wlim_in = m["di"], m["act"], m["wlim"]
        gd_ref, gs_ref = m.get("gd"), m.get("gs")
        didx_ref = m.get("didx")
        rest_ref, alpha_ref = m["rest"], m["alpha"]
        relax_ref, warm_ref = m["relax"], m["warm"]
        bnd_ref = m.get("bound")
        f_ref = m.get("f")
        coll_ref = m.get("coll")
        outs = list(refs[len(in_names):])
        xo_ref, vo_ref, lamo_ref = outs[:3]
        outs = outs[3:]
        blamo_ref = outs.pop(0) if bplan is not None else None
        vlamo_ref = outs.pop(0) if vplan is not None else None
        tlamo_ref = outs.pop(0) if tplan is not None else None

        def scoped(pred, delta, prev, tmp, scs=None):
            xo_ref[:] = x_in[:]
            vo_ref[:] = v_in[:]
            lamo_ref[:] = lam_in[:]
            if bplan is not None:
                blamo_ref[:] = m["blam"][:]
            if vplan is not None:
                vlamo_ref[:] = m["vlam"][:]
            if tplan is not None:
                tlamo_ref[:] = m["tlam"][:]
            w = w_in[:]                        # (1, n_pad)
            pinned = w == 0.0

            def rows(c):
                """Row group of coordinate c: bodies stack on sublanes."""
                return slice(c * R, (c + 1) * R)

            def t3(a):
                """Tile a per-edge (R, S) scalar across the 3 coordinate
                row groups (identity for the single-body kernel, where
                (1, S) broadcasts against (3, S))."""
                return a if R == 1 else jnp.concatenate([a, a, a], axis=0)

            def cross(u, v):
                ux, uy, uz = u[rows(0)], u[rows(1)], u[rows(2)]
                vx, vy, vz = v[rows(0)], v[rows(1)], v[rows(2)]
                return jnp.concatenate([
                    uy * vz - uz * vy,
                    uz * vx - ux * vz,
                    ux * vy - uy * vx], axis=0)

            def nsq(g):
                return (g[rows(0)] * g[rows(0)]
                        + g[rows(1)] * g[rows(1)]
                        + g[rows(2)] * g[rows(2)])

            def vdot(u, v):
                return (u[rows(0)] * v[rows(0)]
                        + u[rows(1)] * v[rows(1)]
                        + u[rows(2)] * v[rows(2)])

            def solve_block(kb, relax_mode):
                """One block's gather -> XPBD project -> scatter-into-delta
                (the body of a sweep; per-block static window width)."""
                b0 = plan.bases[kb]
                wk = plan.widths[kb]
                win = pred[:, b0:b0 + wk]              # (3, Wk) static
                if plan.synth:
                    # rebuild the block's signed one-hot in-registers
                    # (bending's mechanism): {0,±1} exact in bf16,
                    # identical values to the resident matrix; padded
                    # slots have la==lb so their columns cancel to 0
                    iota_ws = lax.broadcasted_iota(
                        jnp.int32, (wk, s_edges), 0)
                    dloc = didx_ref[kb]                # (2, S) int32
                    gdk = ((iota_ws == dloc[1:2]).astype(jnp.bfloat16)
                           - (iota_ws == dloc[0:1]).astype(
                               jnp.bfloat16))          # (Wk, S)
                else:
                    gdk = gd_ref[kb]
                d = dot_oh(win, gdk, (((1,), (0,)), ((), ())),
                           exact=exact_oh, stack_axis=0)  # (3R, S)
                d0, d1, d2 = d[rows(0)], d[rows(1)], d[rows(2)]
                len_sq = d0 * d0 + d1 * d1 + d2 * d2   # (R, S)
                if approx_math:
                    inv_len = lax.rsqrt(jnp.maximum(len_sq, 1e-24))
                    length = len_sq * inv_len
                else:
                    length = jnp.sqrt(jnp.maximum(len_sq, 1e-24))
                if relax_mode == "solve":
                    lam_f = lamo_ref[kb]               # (R, S)
                    cerr = length - rest_ref[kb]
                    dl = (-cerr - alpha_ref[kb] * lam_f) * di_in[kb]
                    if bnd_ref is not None:
                        b = bnd_ref[kb]
                        dl = jnp.clip(dl, -b, b)
                    dl = dl * relax_ref[kb]
                    active = (act_in[kb] > 0.5) & (length
                                                   >= cfg.eps_length)
                    dl = jnp.where(active, dl, 0.0)
                    lam_f = lam_f + dl
                    if cfg.lambda_clamp > 0:
                        lam_f = jnp.clip(lam_f, -cfg.lambda_clamp,
                                         cfg.lambda_clamp)
                    lamo_ref[kb] = lam_f
                else:
                    # warm pre-apply: scaled carried multiplier, clamped
                    lam_f = lamo_ref[kb] * warm_ref[kb]
                    if cfg.warm_start_fraction != 1.0:
                        lam_f = lam_f * cfg.warm_start_fraction
                    if cfg.warm_start_clamp > 0:
                        lim = wlim_in[kb]
                        lam_f = jnp.clip(lam_f, -lim, lim)
                    lamo_ref[kb] = lam_f
                    dl = jnp.where(valid_ref_k(kb), lam_f, 0.0)
                scale = (dl * inv_len if approx_math
                         else dl / length)             # (R, S)
                dp = d * t3(scale)                      # (3R, S)
                if plan.synth:
                    # scatter through the SAME synthesized matrix,
                    # contracting its S axis (bend_sweep's scat shape)
                    wd = dot_oh(dp, gdk, (((1,), (1,)), ((), ())),
                                exact=exact_oh, stack_axis=0)  # (3R, Wk)
                else:
                    wd = dot_oh(dp, gs_ref[kb], (((1,), (0,)), ((), ())),
                                exact=exact_oh, stack_axis=0)  # (3R, Wk)
                delta[:, b0:b0 + wk] += wd

            def apply_delta():
                # destination-weighted overlap-add: correction_i = w_i * sum
                for c in range(3):
                    pred[rows(c)] += w * delta[rows(c)]

            def sweep(relax_mode):
                """One windowed distance sweep applied to pred.

                relax_mode='solve'  — full XPBD projection (lambda updated);
                relax_mode='warm'   — warm-start pre-application (applies
                the carried, decayed multiplier along current directions and
                stores the scaled multiplier back).  Mirrors
                general._solve_distance_windowed / _warm_apply_distance.

                COLORED solve sweeps run color-major with corrections
                applied AFTER EACH COLOR (exact parallel GS: no two edges
                in a color share a particle, so each particle receives at
                most one contribution per color and the apply order within
                a color is arithmetically free) — the in-kernel twin of
                ``general._solve_distance_colored``.  The warm pre-apply
                stays a single simultaneous pass in every mode, matching
                ``general._warm_apply_distance``."""
                if colored and relax_mode == "solve":
                    for b_lo, b_hi in plan.color_ranges:
                        delta[:] = jnp.zeros_like(delta)
                        for kb in range(b_lo, b_hi):
                            solve_block(kb, relax_mode)
                        apply_delta()
                else:
                    delta[:] = jnp.zeros_like(delta)
                    for kb in range(k_blocks):
                        solve_block(kb, relax_mode)
                    apply_delta()

            def valid_ref_k(kb):
                return relax_ref[kb] > 0.0   # valid-masked relax slab

            def bend_sweep():
                """Windowed bending sweep, one-hots synthesized
                in-registers (module docstring).  JACOBI arithmetic
                matches ``general._solve_bending_windowed`` /
                ``ops/bending.py`` (same guards, omega/max-degree scaling;
                ``sin`` via ``sqrt(1-cos^2)`` and ``acos`` via ``_acos`` —
                the only Mosaic-imposed rounding differences).  COLORED
                runs the blocks color-major with corrections applied after
                each color at full strength (exact parallel GS — the
                in-kernel twin of ``general._solve_bending_colored``)."""
                bkn, bsn, bwn = (bplan.n_blocks, bplan.block_hinges,
                                 bplan.window)

                def bend_block(kb):
                    b0 = bplan.bases[kb]
                    win = pred[:, b0:b0 + bwn]               # (3, Wb)
                    iota = lax.broadcasted_iota(jnp.int32, (bwn, bsn), 0)
                    idx = m["bidx"][kb]                      # (4, S)
                    # bf16 is exact for {0,1}; the mixed bf16 x f32 MXU
                    # product is bit-exact (scripts/probe_mesh_kernel.py)
                    # and halves the live one-hot footprint
                    oh = [(iota == idx[i:i + 1]).astype(jnp.bfloat16)
                          for i in range(4)]                 # (Wb, S) {0,1}
                    # the MXU truncates the f32 window to bf16 in the
                    # mixed product (ops/mxu_exact.py) — one stacked
                    # split3 of the window shared by all four endpoint dots
                    wparts = (jnp.concatenate(split3(win), axis=0)
                              if exact_oh else None)
                    pa, pb, pc2, pd2 = (
                        dot_oh(win, o, (((1,), (0,)), ((), ())),
                               exact=exact_oh, parts=wparts, stack_axis=0)
                        for o in oh)                     # (3, S)
                    e0 = pb - pa
                    e1 = pc2 - pa
                    e2 = pd2 - pa
                    n1 = cross(e0, e1)
                    n2 = cross(e2, e0)
                    l1sq = nsq(n1)
                    l2sq = nsq(n2)
                    geom = (l1sq >= 1e-9) & (l2sq >= 1e-9)
                    if approx_math:
                        inv_l1 = lax.rsqrt(jnp.maximum(l1sq, 1e-24))
                        inv_l2 = lax.rsqrt(jnp.maximum(l2sq, 1e-24))
                    else:
                        inv_l1 = 1.0 / jnp.sqrt(jnp.maximum(l1sq, 1e-24))
                        inv_l2 = 1.0 / jnp.sqrt(jnp.maximum(l2sq, 1e-24))
                    n1n = n1 * t3(inv_l1)
                    n2n = n2 * t3(inv_l2)
                    cos = jnp.clip(n1n[rows(0)] * n2n[rows(0)]
                                   + n1n[rows(1)] * n2n[rows(1)]
                                   + n1n[rows(2)] * n2n[rows(2)],
                                   -1.0, 1.0)
                    angle = _acos(cos)
                    cerr = angle - m["brest"][kb]
                    sin = jnp.sqrt(jnp.maximum(1.0 - cos * cos, 0.0))
                    sin_ok = sin >= cfg.bend_skip_sin_eps
                    soften = sin < cfg.bend_soften_sin_eps
                    alpha_b = m["balpha"][kb]
                    alpha_b = jnp.where(soften,
                                        alpha_b * cfg.bend_soften_factor,
                                        alpha_b)
                    neg_inv_sin = -1.0 / jnp.where(sin_ok, sin, 1.0)
                    cos3 = t3(cos)
                    nis3 = t3(neg_inv_sin)
                    a_vec = (n2n - cos3 * n1n) * t3(inv_l1)
                    b_vec = (n1n - cos3 * n2n) * t3(inv_l2)
                    gb = nis3 * (cross(e1, a_vec) + cross(b_vec, e2))
                    gc = nis3 * cross(a_vec, e0)
                    gdv = nis3 * cross(e0, b_vec)
                    ga = -gb - gc - gdv
                    ssum = (m["bwa"][kb] * nsq(ga) + m["bwb"][kb] * nsq(gb)
                            + m["bwc"][kb] * nsq(gc)
                            + m["bwd"][kb] * nsq(gdv))
                    denom = ssum + alpha_b
                    lam_b = blamo_ref[kb]                    # (R, S)
                    dl = (-cerr - alpha_b * lam_b) / jnp.maximum(denom,
                                                                 1e-30)
                    if cfg.max_dlambda > 0:
                        dl = jnp.clip(dl, -cfg.max_dlambda, cfg.max_dlambda)
                    ok = geom & sin_ok & (denom >= 1e-9) & (m["bany"][kb]
                                                            > 0.5)
                    dl = jnp.where(ok, dl, 0.0) * m["brelax"][kb]
                    blamo_ref[kb] = lam_b + dl

                    dl3 = t3(dl)

                    def scat(g, o):
                        return dot_oh(dl3 * g, o, (((1,), (1,)), ((), ())),
                                      exact=exact_oh, stack_axis=0)

                    delta[:, b0:b0 + bwn] += (
                        scat(ga, oh[0]) + scat(gb, oh[1])
                        + scat(gc, oh[2]) + scat(gdv, oh[3]))

                ranges = (bplan.color_ranges
                          if bplan.color_ranges is not None
                          else ((0, bkn),))
                for b_lo, b_hi in ranges:
                    delta[:] = jnp.zeros_like(delta)
                    for kb in range(b_lo, b_hi):
                        bend_block(kb)
                    # destination-weighted overlap-add (same as distance;
                    # COLORED: applied after each color — exact GS)
                    for c in range(3):
                        pred[rows(c)] += w * delta[rows(c)]

            def volume_sweep():
                """Global volume constraint (``ops/volume.py``): ONE XPBD
                multiplier per body over the closed surface.  The gradient
                plane accumulates in ``delta`` (scatter through synthesized
                triangle one-hots); V and the w-weighted gradient norm
                reduce to per-body scalars, then a single elementwise
                update applies ``w * dl * grad``."""
                vkn, vsn, vwn = (vplan.n_blocks, vplan.block_tris,
                                 vplan.window)
                delta[:] = jnp.zeros_like(delta)
                vacc = jnp.zeros((R, 1), jnp.float32)
                for kb in range(vkn):
                    b0 = vplan.bases[kb]
                    win = pred[:, b0:b0 + vwn]               # (3R, Wv)
                    iota = lax.broadcasted_iota(jnp.int32, (vwn, vsn), 0)
                    idx = m["vidx"][kb]                      # (3, S)
                    oh = [(iota == idx[i:i + 1]).astype(jnp.bfloat16)
                          for i in range(3)]                 # (Wv, S) {0,1}
                    wparts = (jnp.concatenate(split3(win), axis=0)
                              if exact_oh else None)
                    p1, p2, p3 = (
                        dot_oh(win, o, (((1,), (0,)), ((), ())),
                               exact=exact_oh, parts=wparts, stack_axis=0)
                        for o in oh)                         # (3R, S)
                    # padded slots: p1==p2==p3 -> all crosses vanish
                    c23 = cross(p2, p3)
                    g1 = c23 / 6.0
                    g2 = cross(p3, p1) / 6.0
                    g3 = cross(p1, p2) / 6.0
                    vacc = vacc + jnp.sum(vdot(p1, c23), axis=1,
                                          keepdims=True)     # (R, 1)

                    def scat(g, o):
                        return dot_oh(g, o, (((1,), (1,)), ((), ())),
                                      exact=exact_oh, stack_axis=0)

                    delta[:, b0:b0 + vwn] += (scat(g1, oh[0])
                                              + scat(g2, oh[1])
                                              + scat(g3, oh[2]))
                # per-body scalars: s = sum_i w_i |grad_i|^2
                wg = w * (delta[rows(0)] * delta[rows(0)]
                          + delta[rows(1)] * delta[rows(1)]
                          + delta[rows(2)] * delta[rows(2)])
                s_den = jnp.sum(wg, axis=1, keepdims=True)   # (R, 1)
                alpha_v = cfg.volume_compliance * inv_dt2
                cerr = vacc / 6.0 - cfg.pressure * vplan.rest_volume
                lam_v = vlamo_ref[:, 0:1]                    # (R, 1)
                denom = s_den + alpha_v
                dl = (-cerr - alpha_v * lam_v) / jnp.maximum(denom, 1e-30)
                dl = jnp.where(denom > 1e-12, dl, 0.0)
                vlamo_ref[:] = ((lam_v + dl)
                                + jnp.zeros((R, 128), jnp.float32))
                for c in range(3):
                    pred[rows(c)] += w * (dl * delta[rows(c)])

            def tet_sweep():
                """Per-tet volume sweep (``ops/tet_volume.py`` math):
                one-hots synthesized in-registers (bending's mechanism),
                full-strength projection.  JACOBI: per-particle MEAN at
                apply time via the ``wtd = inv_mass / tet_degree`` plane
                (``general._solve_tets_jacobi`` mass-splitting — max-degree
                pre-scaling collapses on centroid-fan hubs).  COLORED:
                blocks run color-major, corrections apply after each color
                with the plain inverse mass (exact parallel GS — the
                in-kernel twin of ``general._solve_tets_colored``)."""
                tkn, tsn, twn = (tplan.n_blocks, tplan.block_tets,
                                 tplan.window)

                def tet_block(kb):
                    b0 = tplan.bases[kb]
                    win = pred[:, b0:b0 + twn]               # (3R, Wt)
                    iota = lax.broadcasted_iota(jnp.int32, (twn, tsn), 0)
                    idx = m["tidx"][kb]                      # (4, S)
                    oh = [(iota == idx[i:i + 1]).astype(jnp.bfloat16)
                          for i in range(4)]                 # (Wt, S) {0,1}
                    wparts = (jnp.concatenate(split3(win), axis=0)
                              if exact_oh else None)
                    p0, p1, p2, p3 = (
                        dot_oh(win, o, (((1,), (0,)), ((), ())),
                               exact=exact_oh, parts=wparts, stack_axis=0)
                        for o in oh)                         # (3R, S)
                    # padded slots replicate a real tet; the
                    # validity-masked relax slab zeroes their dl
                    e1 = p1 - p0
                    e2 = p2 - p0
                    e3 = p3 - p0
                    g1 = cross(e2, e3)
                    g2 = cross(e3, e1)
                    g3 = cross(e1, e2)
                    g0 = -(g1 + g2 + g3)
                    vol6 = vdot(e1, g1)                      # (R, S)
                    cerr = vol6 - cfg.tet_pressure * m["trest"][kb]
                    alpha_t = m["talpha"][kb]
                    denom = (m["tw0"][kb] * nsq(g0) + m["tw1"][kb] * nsq(g1)
                             + m["tw2"][kb] * nsq(g2)
                             + m["tw3"][kb] * nsq(g3) + alpha_t)
                    lam_t = tlamo_ref[kb]                    # (R, S)
                    dl = ((-cerr - alpha_t * lam_t)
                          / jnp.maximum(denom, 1e-30))
                    dl = jnp.where(denom > cfg.eps_denominator, dl, 0.0)
                    dl = dl * m["trelax"][kb]
                    tlamo_ref[kb] = lam_t + dl

                    dl3 = t3(dl)

                    def scat(g, o):
                        return dot_oh(dl3 * g, o, (((1,), (1,)), ((), ())),
                                      exact=exact_oh, stack_axis=0)

                    delta[:, b0:b0 + twn] += (
                        scat(g0, oh[0]) + scat(g1, oh[1])
                        + scat(g2, oh[2]) + scat(g3, oh[3]))

                if tplan.color_ranges is not None:
                    # exact GS: plain inverse-mass apply after each color
                    for b_lo, b_hi in tplan.color_ranges:
                        delta[:] = jnp.zeros_like(delta)
                        for kb in range(b_lo, b_hi):
                            tet_block(kb)
                        for c in range(3):
                            pred[rows(c)] += w * delta[rows(c)]
                else:
                    delta[:] = jnp.zeros_like(delta)
                    for kb in range(tkn):
                        tet_block(kb)
                    # mass-splitting apply:
                    # correction_i = (w_i / tet_deg_i) * sum
                    wtd = m["wtd"][:]
                    for c in range(3):
                        pred[rows(c)] += wtd * delta[rows(c)]

            def dense_self_collision():
                """All-pairs separation pass (ops/spatial_hash.self_
                collision_project_dense fused).  Corrections for ALL rows
                are computed from the entry ``pred`` (Jacobi), staged in
                ``delta`` (free between sweeps), then applied at once.
                Row-block operands are STAGED in the ``scs`` scratch and
                read back through dynamic lane REF slices — Mosaic has no
                lowering for ``dynamic_slice`` on values inside the loop
                (the contact_pallas kernel established the ref-slice
                pattern on hardware)."""
                lane = lax.broadcasted_iota(jnp.int32, (1, n_pad), 1)
                validf = jnp.where(lane < n, 1.0, 0.0)
                inv_n = jnp.float32(1.0 / n)
                radius = cfg.particle_radius
                col_id0 = lax.broadcasted_iota(jnp.int32, (sc_cb, sc_ck), 1)
                one_cb = jnp.full((1, sc_cb), 1.0)
                one_ck = jnp.full((1, sc_ck), 1.0)

                def body_pass(r):
                    """All-pairs pass for body row ``r`` (BODY-LOCAL: the
                    5-row staging holds one body's centered coordinates,
                    so pairs never cross stacked bodies).  Padded body
                    rows compute inert zeros (x=0 -> dist<=1e-9 ->
                    touch false) and their outputs are dropped at the
                    output slice."""
                    for c in range(3):
                        xc = pred[c * R + r:c * R + r + 1]
                        mc = jnp.sum(xc * validf) * inv_n
                        scs[c:c + 1, :] = (xc - mc) * validf
                    scs[3:4, :] = (scs[0:1, :] * scs[0:1, :]
                                   + scs[1:2, :] * scs[1:2, :]
                                   + scs[2:3, :] * scs[2:3, :])
                    scs[4:5, :] = (w[r:r + 1] if per_body_mass else w)

                    def blk(i, carry):
                        xi = scs[0:3, pl.dslice(i * sc_cb, sc_cb)]
                        sqi = scs[3:4, pl.dslice(i * sc_cb, sc_cb)]
                        wi = scs[4:5, pl.dslice(i * sc_cb, sc_cb)]
                        li = jnp.concatenate([xi, sqi, one_cb], axis=0)
                        l2 = jnp.concatenate([wi, one_cb], axis=0)
                        row_id = i * sc_cb + lax.broadcasted_iota(
                            jnp.int32, (sc_cb, sc_ck), 0)

                        def chunk(j, acc):
                            mx, msum = acc
                            xj = scs[0:3, pl.dslice(j * sc_ck, sc_ck)]
                            sqj = scs[3:4, pl.dslice(j * sc_ck, sc_ck)]
                            wj = scs[4:5, pl.dslice(j * sc_ck, sc_ck)]
                            # Gram trick, both norm terms folded in:
                            # d2 = [x,y,z,sq,1]_i . [-2x,-2y,-2z,1,sq]_j
                            rhs5 = jnp.concatenate(
                                [-2.0 * xj, one_ck, sqj], axis=0)
                            d2 = lax.dot_general(
                                li, rhs5, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=lax.Precision.HIGHEST)  # (CB,CK)
                            rhs2 = jnp.concatenate([one_ck, wj], axis=0)
                            wsum = lax.dot_general(
                                l2, rhs2, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=lax.Precision.HIGHEST)
                            dist = jnp.sqrt(jnp.maximum(d2, 1e-18))
                            overlap = 2.0 * radius - dist
                            col_id = j * sc_ck + col_id0
                            touch = ((row_id != col_id) & (overlap > 0)
                                     & (dist > 1e-9) & (wsum > 1e-12)
                                     & (row_id < n) & (col_id < n))
                            mm = jnp.where(
                                touch,
                                overlap / (jnp.maximum(dist, 1e-12)
                                           * jnp.maximum(wsum, 1e-12)),
                                0.0)
                            # corr_i = w_i * (x_i * sum_j m - m @ x), both
                            # contractions landing in the (3, CB)
                            # orientation and ACCUMULATED over col chunks
                            mx = mx + lax.dot_general(
                                xj, mm, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=lax.Precision.HIGHEST)  # (3,CB)
                            msum = msum + lax.dot_general(
                                one_ck, mm, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=lax.Precision.HIGHEST)  # (1,CB)
                            return mx, msum

                        mx, msum = lax.fori_loop(
                            0, sc_nk, chunk,
                            (jnp.zeros((3, sc_cb), jnp.float32),
                             jnp.zeros((1, sc_cb), jnp.float32)))
                        xi = scs[0:3, pl.dslice(i * sc_cb, sc_cb)]
                        wi = scs[4:5, pl.dslice(i * sc_cb, sc_cb)]
                        corr = wi * (xi * msum - mx)
                        for c in range(3):
                            delta[c * R + r:c * R + r + 1,
                                  pl.dslice(i * sc_cb, sc_cb)] = (
                                corr[c:c + 1])
                        return carry

                    lax.fori_loop(0, sc_nb, blk, 0)

                for r in range(R):
                    body_pass(r)
                for c in range(3):
                    pred[rows(c)] += (cfg.self_collision_omega
                                      * delta[rows(c)])

            def contacts(step_i):
                # self-collision FIRST — general.project_contacts order;
                # cadence configs gate it on the substep index (substep i
                # contacts iff i %% every == 0; make_mesh_pallas_step
                # enforces substeps %% every == 0 so the raw index matches
                # the engine's per-frame pattern)
                if sc_on:
                    if sc_every > 1:
                        lax.cond(step_i % sc_every == 0,
                                 dense_self_collision, lambda: None)
                    else:
                        dense_self_collision()
                if cfg.floor_mode == FloorMode.XPBD_INEQUALITY:
                    gh = coll_ref[0, 0] if kin else cfg.ground_height
                    pen = gh - pred[rows(1)]
                    alpha_col = cfg.collision_compliance * inv_dt2
                    denom = w + alpha_col
                    dl = pen / jnp.maximum(denom, 1e-30)
                    hit = ((pen > 0)
                           & (w >= cfg.static_inv_mass_eps)
                           & (jnp.abs(denom) >= cfg.eps_denominator))
                    pred[rows(1)] += jnp.where(hit, w * dl, 0.0)
                    fr = min(max(cfg.friction, 0.0), 1.0)
                    pred[rows(0)] -= jnp.where(
                        hit, (pred[rows(0)] - xo_ref[rows(0)]) * fr, 0.0)
                    pred[rows(2)] -= jnp.where(
                        hit, (pred[rows(2)] - xo_ref[rows(2)]) * fr, 0.0)
                # spheres BEFORE boxes — same order as the general engine's
                # project_contacts (solvers/general.py) so particles touching
                # both resolve identically
                n_sph = kin_s if kin else len(cfg.sphere_colliders)
                if n_sph:
                    fr = min(max(cfg.friction, 0.0), 1.0)
                    for si in range(n_sph):
                        if kin:
                            r0 = 1 + si
                            cx, cy, cz = (coll_ref[r0, 0], coll_ref[r0, 1],
                                          coll_ref[r0, 2])
                            radius = coll_ref[r0, 3]
                            sv = (coll_ref[r0, 4], coll_ref[r0, 5],
                                  coll_ref[r0, 6])
                        else:
                            cx, cy, cz, radius = cfg.sphere_colliders[si]
                            sv = None
                        dvs = [pred[rows(0)] - cx, pred[rows(1)] - cy,
                               pred[rows(2)] - cz]
                        dist = jnp.sqrt(jnp.maximum(
                            dvs[0] ** 2 + dvs[1] ** 2 + dvs[2] ** 2, 1e-24))
                        penet = radius - dist
                        act = (penet > 0) & (w >= cfg.static_inv_mass_eps)
                        for c in range(3):
                            nc = dvs[c] / dist
                            pred[rows(c)] += jnp.where(act, nc * penet, 0.0)
                        vn = None
                        for c in range(3):
                            nc = dvs[c] / dist
                            velc = (pred[rows(c)] - xo_ref[rows(c)]) / dt
                            if sv is not None:
                                # friction in the moving collider's frame
                                velc = velc - sv[c]
                            vn = (velc * nc if vn is None
                                  else vn + velc * nc)
                        for c in range(3):
                            nc = dvs[c] / dist
                            velc = (pred[rows(c)] - xo_ref[rows(c)]) / dt
                            if sv is not None:
                                velc = velc - sv[c]
                            vt = velc - vn * nc
                            pred[rows(c)] -= jnp.where(act, vt * (dt * fr),
                                                       0.0)
                n_box = kin_b if kin else len(cfg.box_colliders)
                if n_box:
                    fr = min(max(cfg.friction, 0.0), 1.0)
                    for bi in range(n_box):
                        if kin:
                            r0 = 1 + kin_s + bi
                            cx, cy, cz = (coll_ref[r0, 0], coll_ref[r0, 1],
                                          coll_ref[r0, 2])
                            hx, hy, hz = (coll_ref[r0, 3], coll_ref[r0, 4],
                                          coll_ref[r0, 5])
                            bv = (coll_ref[r0, 6], coll_ref[r0, 7],
                                  coll_ref[r0, 8])
                        else:
                            cx, cy, cz, hx, hy, hz = cfg.box_colliders[bi]
                            bv = None
                        loc = [pred[rows(0)] - cx, pred[rows(1)] - cy,
                               pred[rows(2)] - cz]
                        fd = [hx - jnp.abs(loc[0]), hy - jnp.abs(loc[1]),
                              hz - jnp.abs(loc[2])]
                        inside = (fd[0] > 0) & (fd[1] > 0) & (fd[2] > 0)
                        act = inside & (w >= cfg.static_inv_mass_eps)
                        m0 = (fd[0] <= fd[1]) & (fd[0] <= fd[2])
                        m1 = (~m0) & (fd[1] <= fd[2])
                        m2 = (~m0) & (~m1)
                        nvec = []
                        for c, mc in enumerate((m0, m1, m2)):
                            sg = jnp.where(loc[c] < 0, -1.0, 1.0)
                            push = jnp.where(act & mc, sg * fd[c], 0.0)
                            pred[rows(c)] += push
                            nvec.append(jnp.where(mc, sg, 0.0))
                        vn = None
                        for c in range(3):
                            velc = (pred[rows(c)] - xo_ref[rows(c)]) / dt
                            if bv is not None:
                                velc = velc - bv[c]
                            vn = (velc * nvec[c] if vn is None
                                  else vn + velc * nvec[c])
                        for c in range(3):
                            velc = (pred[rows(c)] - xo_ref[rows(c)]) / dt
                            if bv is not None:
                                velc = velc - bv[c]
                            vt = velc - vn * nvec[c]
                            pred[rows(c)] -= jnp.where(act, vt * (dt * fr),
                                                       0.0)

            def substep(step_i, carry):
                # ---- lambda lifecycle (general._substep)
                if cfg.lambda_mode == LambdaMode.RESET:
                    lamo_ref[:] = jnp.zeros_like(lamo_ref)
                else:
                    lamo_ref[:] = lamo_ref[:] * cfg.lambda_decay
                if bplan is not None:
                    # bending restarts fresh except in DECAY (general.
                    # _substep: WARM_START carries distance impulses only)
                    if cfg.lambda_mode == LambdaMode.DECAY:
                        blamo_ref[:] = blamo_ref[:] * cfg.lambda_decay
                    else:
                        blamo_ref[:] = jnp.zeros_like(blamo_ref)
                if vplan is not None:
                    # volume follows the bending lifecycle (general._substep)
                    if cfg.lambda_mode == LambdaMode.DECAY:
                        vlamo_ref[:] = vlamo_ref[:] * cfg.lambda_decay
                    else:
                        vlamo_ref[:] = jnp.zeros_like(vlamo_ref)
                if tplan is not None:
                    # tets follow the bending lifecycle (general._substep)
                    if cfg.lambda_mode == LambdaMode.DECAY:
                        tlamo_ref[:] = tlamo_ref[:] * cfg.lambda_decay
                    else:
                        tlamo_ref[:] = jnp.zeros_like(tlamo_ref)

                # ---- predict (per coordinate plane)
                for c, gc in ((0, gx), (1, gy), (2, gz)):
                    vc = vo_ref[rows(c)]
                    ext = None
                    if with_ext:
                        ext = f_ref[rows(c)] * jnp.where(step_i == 0, 1.0,
                                                         0.0)
                    if cfg.gravity_is_acceleration:
                        if ext is not None:
                            if cfg.max_force > 0:
                                ext = jnp.clip(ext, -cfg.max_force,
                                               cfg.max_force)
                            vc = vc + dt * (jnp.where(w > 0, gc, 0.0)
                                            + w * ext)
                        else:
                            vc = vc + dt * jnp.where(w > 0, gc, 0.0)
                    else:
                        force = (gc if ext is None else gc + ext)
                        if cfg.max_force > 0:
                            force = jnp.clip(force, -cfg.max_force,
                                             cfg.max_force)
                        vc = vc + dt * w * force
                    if cfg.damping_mode.value == "per_step":
                        vc = vc * (1.0 - min(max(cfg.damping, 0.0), 1.0))
                    else:
                        vc = vc * (1.0 - cfg.damping * dt)
                    if cfg.max_velocity > 0:
                        vc = jnp.clip(vc, -cfg.max_velocity,
                                      cfg.max_velocity)
                    vo_ref[rows(c)] = vc
                    pc = xo_ref[rows(c)] + dt * vc
                    if cfg.world_bounds > 0:
                        pc = jnp.clip(pc, -cfg.world_bounds,
                                      cfg.world_bounds)
                    pred[rows(c)] = pc

                if cfg.lambda_mode == LambdaMode.WARM_START:
                    sweep("warm")

                # ---- solver iterations
                if accelerate:
                    prev[:] = pred[:]

                    def iteration(it, om):
                        tmp[:] = pred[:]
                        sweep("solve")
                        if bplan is not None:
                            bend_sweep()
                        if tplan is not None:
                            tet_sweep()
                        if vplan is not None:
                            volume_sweep()
                        if has_contacts:
                            contacts(step_i)
                        om_next = jnp.where(
                            it < cfg.jacobi_cheby_delay, 1.0,
                            jnp.where(it == cfg.jacobi_cheby_delay,
                                      2.0 / (2.0 - rho2),
                                      4.0 / (4.0 - rho2 * om)))
                        for c in range(3):
                            newc = pred[rows(c)]
                            curc = tmp[rows(c)]
                            acc = om_next * (gamma * (newc - curc)
                                             + curc - prev[rows(c)]) \
                                + prev[rows(c)]
                            prev[rows(c)] = curc
                            pred[rows(c)] = acc
                        if has_contacts:
                            contacts(step_i)
                        return om_next

                    lax.fori_loop(0, cfg.iterations, iteration,
                                  jnp.ones((), jnp.float32))
                else:
                    def iteration(_, carry2):
                        sweep("solve")
                        if bplan is not None:
                            bend_sweep()
                        if tplan is not None:
                            tet_sweep()
                        if vplan is not None:
                            volume_sweep()
                        if has_contacts:
                            contacts(step_i)
                        return carry2

                    lax.fori_loop(0, cfg.iterations, iteration, 0)

                # ---- finalize (+ optional velocity-reflect floor)
                if cfg.floor_mode == FloorMode.VELOCITY_REFLECT:
                    for c in range(3):
                        vo_ref[rows(c)] = jnp.where(
                            pinned, 0.0,
                            (pred[rows(c)] - xo_ref[rows(c)]) / dt)
                    gh = coll_ref[0, 0] if kin else cfg.ground_height
                    x1 = jnp.where(pinned, xo_ref[rows(1)], pred[rows(1)])
                    pen = gh - x1
                    hit = (pen > 0) & (w > 0)
                    x1 = jnp.where(hit, gh + cfg.floor_offset, x1)
                    v1 = vo_ref[rows(1)]
                    falling = hit & (v1 < 0)
                    vy = (jnp.abs(v1) * cfg.restitution
                          + pen * cfg.penetration_kick)
                    v1n = jnp.where(falling, vy, v1)
                    normal_force = jnp.abs(v1n) + pen * cfg.normal_force_scale
                    h_speed = jnp.sqrt(jnp.maximum(
                        vo_ref[rows(0)] ** 2 + vo_ref[rows(2)] ** 2, 1e-24))
                    moving = h_speed > 1e-3
                    fmag = jnp.minimum(
                        h_speed,
                        normal_force * cfg.floor_friction_coeff * dt)
                    scalef = jnp.where(falling & moving, fmag / h_speed, 0.0)
                    vo_ref[rows(0)] = vo_ref[rows(0)] - vo_ref[rows(0)] * scalef
                    vo_ref[rows(1)] = v1n
                    vo_ref[rows(2)] = vo_ref[rows(2)] - vo_ref[rows(2)] * scalef
                    xo_ref[rows(0)] = jnp.where(pinned, xo_ref[rows(0)],
                                                pred[rows(0)])
                    xo_ref[rows(1)] = x1
                    xo_ref[rows(2)] = jnp.where(pinned, xo_ref[rows(2)],
                                                pred[rows(2)])
                else:
                    for c in range(3):
                        vo_ref[rows(c)] = jnp.where(
                            pinned, 0.0,
                            (pred[rows(c)] - xo_ref[rows(c)]) / dt)
                        xo_ref[rows(c)] = jnp.where(pinned, xo_ref[rows(c)],
                                                    pred[rows(c)])
                return carry

            lax.fori_loop(0, n_substeps, substep, 0)

        scoped_shapes = dict(
            pred=pltpu.VMEM((3 * R, n_pad), jnp.float32),
            delta=pltpu.VMEM((3 * R, n_pad), jnp.float32),
            prev=pltpu.VMEM((3 * R, n_pad), jnp.float32),
            tmp=pltpu.VMEM((3 * R, n_pad), jnp.float32),
        )
        if sc_on:
            # dense-contact staging: centered x/y/z + |x|^2 + w rows, read
            # back block-wise through dynamic lane ref slices
            scoped_shapes["scs"] = pltpu.VMEM((5, n_pad), jnp.float32)
        pl.run_scoped(scoped, **scoped_shapes)

    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_shapes = [
        jax.ShapeDtypeStruct((3 * R, n_pad), jnp.float32),    # x
        jax.ShapeDtypeStruct((3 * R, n_pad), jnp.float32),    # v
        jax.ShapeDtypeStruct((k_blocks, R, s_edges), jnp.float32),
    ]
    if bplan is not None:
        out_shapes.append(jax.ShapeDtypeStruct(
            (bplan.n_blocks, R, bplan.block_hinges), jnp.float32))
    if vplan is not None:
        out_shapes.append(jax.ShapeDtypeStruct((R, 128), jnp.float32))
    if tplan is not None:
        out_shapes.append(jax.ShapeDtypeStruct(
            (tplan.n_blocks, R, tplan.block_tets), jnp.float32))
    call = pl.pallas_call(
        kernel,
        out_shape=tuple(out_shapes),
        in_specs=[vspec] * len(in_names),
        out_specs=(vspec,) * len(out_shapes),
    )

    if bplan is not None:
        bidx_c = jnp.asarray(bplan.idx_loc)
        brest_c = jnp.asarray(bplan.rest)
        balpha_c = jnp.asarray(bplan.alpha)
        brelax_c = jnp.asarray(bplan.relax)
        bha, bhb, bhc, bhd = (jnp.asarray(bplan.idx_glob[i])
                              for i in range(4))
        # slots are a (padded) permutation of hinges (multiplier mapping)
        bslot_c = jnp.asarray(bplan.slot_ids.astype(np.int32))
        bcslot_c = jnp.asarray(bplan.cslot.astype(np.int32))
    if vplan is not None:
        vidx_c = jnp.asarray(vplan.idx_loc)
    if tplan is not None:
        tidx_c = jnp.asarray(tplan.idx_loc)
        trest_c = jnp.asarray(tplan.rest6)
        talpha_c = jnp.asarray(tplan.alpha)
        trelax_c = jnp.asarray(tplan.relax)
        tg0, tg1, tg2, tg3 = (jnp.asarray(tplan.idx_glob[i])
                              for i in range(4))
        # slots are a (padded) permutation of tets (multiplier mapping)
        tslot_c = jnp.asarray(tplan.slot_ids.astype(np.int32))
        tcslot_c = jnp.asarray(tplan.cslot.astype(np.int32))
        tdeg_c = jnp.asarray(topo.tet_degree)

    def to_planes(a):
        """(B, n, 3) component-major batched planes -> (3R, n_pad)."""
        t = jnp.transpose(a, (2, 0, 1))                       # (3, B, n)
        t = jnp.pad(t, ((0, 0), (0, R - n_b), (0, n_pad - n)))
        return t.reshape(3 * R, n_pad)

    def from_planes(p):
        """(3R, n_pad) -> (B, n, 3)."""
        return p.reshape(3, R, n_pad)[:, :n_b, :n].transpose(1, 2, 0)

    def lam_to_slab(lam2d, kb, sb):
        """(B, kb*sb)-padded multipliers -> (kb, R, sb) kernel slab."""
        t = lam2d.reshape(n_b, kb, sb).transpose(1, 0, 2)
        return jnp.pad(t, ((0, 0), (0, R - n_b), (0, 0)))

    def slab_to_lam(slab, kb, sb):
        """(kb, R, sb) -> (B, kb*sb)."""
        return slab.transpose(1, 0, 2)[:n_b].reshape(n_b, kb * sb)

    def material_slabs(materials):
        """Traced twin of ``build_mesh_plan``'s distance-material slab
        construction: same padding (rest 1.0 / compliance 0.0 on dead
        slots; colored packing replicates via ``slot_ids``), same
        ``min_alpha_tilde`` floor and ``max_dlambda*`` bound — so a call
        with ``materials == (topo.rest_lengths, topo.compliance)``
        reproduces the static plan's operands exactly, while tracing keeps
        rest/compliance differentiable (system identification)."""
        rest_v = jnp.asarray(materials["rest_lengths"], jnp.float32)
        comp_v = jnp.asarray(materials["compliance"], jnp.float32)
        per_body = rest_v.ndim == 2
        if per_body and not batched:
            raise ValueError(
                "(B, E) per-body materials need the batched contract "
                "(n_bodies > 1 or batched=True)")
        if slot_c is not None:
            rest_flat = rest_v[..., slot_c]
            comp_flat = comp_v[..., slot_c]
        else:
            epad = k_blocks * s_edges
            pad = ((0, 0),) * (rest_v.ndim - 1) + ((0, epad - e_real),)
            rest_flat = jnp.pad(rest_v, pad, constant_values=1.0)
            comp_flat = jnp.pad(comp_v, pad, constant_values=0.0)
        alpha_flat = comp_flat * inv_dt2
        if cfg.min_alpha_tilde > 0:
            alpha_flat = jnp.maximum(alpha_flat, cfg.min_alpha_tilde)
        bound_flat = None
        if bound_c is not None:
            b = jnp.full(rest_flat.shape, jnp.inf, jnp.float32)
            if cfg.max_dlambda > 0:
                b = jnp.minimum(b, cfg.max_dlambda)
            if cfg.max_dlambda_rel > 0:
                b = jnp.minimum(b, cfg.max_dlambda_rel * rest_flat)
            bound_flat = b
        if per_body:
            # heterogeneous-material farm: the material slabs gain the
            # body (sublane-row) axis, exactly like the lambda slabs —
            # kernel-side reads broadcast (R, S) in place of (1, S).
            # lam_to_slab zero-pads the body rows AFTER the floor, so
            # padded rows carry rest = alpha = 0 and compute inert
            # garbage that the output slice drops (row-independent ops).
            def mslab(a):
                return lam_to_slab(a, k_blocks, s_edges)
        else:
            def mslab(a):
                return a.reshape(k_blocks, 1, s_edges)
        return (mslab(rest_flat), mslab(alpha_flat),
                None if bound_flat is None else mslab(bound_flat))

    @jax.jit
    def fn(state: SimState, materials=None) -> SimState:
        if materials is None:
            rest_s, alpha_s, bound_s = rest_c, alpha_c, bound_c
        else:
            rest_s, alpha_s, bound_s = material_slabs(materials)
        if batched:
            x = to_planes(state.positions)
            v = to_planes(state.velocities)
            if slot_c is not None:
                lam = lam_to_slab(state.lambda_dist[:, slot_c],
                                  k_blocks, s_edges)
            else:
                lam = lam_to_slab(
                    jnp.pad(state.lambda_dist,
                            ((0, 0), (0, k_blocks * s_edges - e_real))),
                    k_blocks, s_edges)
        else:
            x = jnp.pad(state.positions.T, ((0, 0), (0, n_pad - n)))
            v = jnp.pad(state.velocities.T, ((0, 0), (0, n_pad - n)))
            if slot_c is not None:
                # colored packing: slots are a (padded) permutation of edges
                lam = state.lambda_dist[slot_c].reshape(
                    k_blocks, 1, s_edges)
            else:
                lam = jnp.pad(state.lambda_dist,
                              (0, k_blocks * s_edges - e_real)
                              ).reshape(k_blocks, 1, s_edges)
        if per_body_mass:
            # heterogeneous farm: (B, n) masses -> (R, n_pad) plane
            # (padded bodies get w = 0: fully pinned, rows sliced off)
            w = jnp.pad(state.inv_mass,
                        ((0, R - n_b), (0, n_pad - n)))
        else:
            w = jnp.pad(state.inv_mass[None, :], ((0, 0), (0, n_pad - n)))

        def wsel(idx, kb, sb):
            """Endpoint inverse-mass slab from a flat (kb*sb,) global index
            array: (kb, 1, sb) shared across bodies, (kb, R, sb) when
            per-body (the mass-derived slabs gain the body axis)."""
            if per_body_mass:
                return lam_to_slab(state.inv_mass[:, idx], kb, sb)
            return state.inv_mass[idx].reshape(kb, 1, sb)

        # per-call slabs (inv_mass is dynamic state: SetPinned)
        wa = wsel(ea_c, k_blocks, s_edges)
        wb = wsel(eb_c, k_blocks, s_edges)
        denom = wa + wb + alpha_s
        denom_inv = 1.0 / jnp.maximum(denom, 1e-30)
        act = (valid_c
               * ((jnp.abs(denom) >= cfg.eps_denominator)
                  & ((wa >= cfg.static_inv_mass_eps)
                     | (wb >= cfg.static_inv_mass_eps))
                  ).astype(jnp.float32))
        if cfg.warm_start_clamp > 0:
            wmax = jnp.maximum(jnp.maximum(wa, wb), 1e-12)
            wlim = cfg.warm_start_clamp * rest_s / wmax
        else:
            wlim = jnp.zeros_like(denom)

        args = ([x, v, w, lam, denom_inv, act, wlim]
                + ([didx_c] if plan.synth else [gd_c, gs_c])
                + [rest_s, alpha_s, relax_c, warm_c])
        if bound_c is not None:
            args.append(bound_s)
        if with_ext:
            args.append(to_planes(state.ext_force) if batched
                        else jnp.pad(state.ext_force.T,
                                     ((0, 0), (0, n_pad - n))))
        if bplan is not None:
            bkn, bsn = bplan.n_blocks, bplan.block_hinges
            if batched:
                blam = lam_to_slab(state.lambda_bend[:, bslot_c], bkn, bsn)
            else:
                blam = state.lambda_bend[bslot_c].reshape(bkn, 1, bsn)
            bwa = wsel(bha, bkn, bsn)
            bwb = wsel(bhb, bkn, bsn)
            bwc = wsel(bhc, bkn, bsn)
            bwd = wsel(bhd, bkn, bsn)
            eps = cfg.static_inv_mass_eps
            bany = ((bwa >= eps) | (bwb >= eps) | (bwc >= eps)
                    | (bwd >= eps)).astype(jnp.float32)
            args += [blam, bidx_c, brest_c, balpha_c, brelax_c,
                     bwa, bwb, bwc, bwd, bany]
        if vplan is not None:
            lam_v_in = state.lambda_volume.reshape(-1)   # (1,) or (B,)
            if batched and lam_v_in.shape[0] != n_b:
                # a shared scalar would silently mean "body 0 only" in
                # WARM_START/DECAY modes — demand the explicit (B,) leaf
                raise ValueError(
                    f"volume-enabled ensembles need a (n_bodies,) "
                    f"lambda_volume leaf; got shape "
                    f"{state.lambda_volume.shape} for n_bodies={n_b}")
            vlam = jnp.zeros((R, 128), jnp.float32).at[
                :lam_v_in.shape[0], :].set(lam_v_in[:, None])
            args += [vlam, vidx_c]
        if tplan is not None:
            tkn, tsn = tplan.n_blocks, tplan.block_tets
            # state multipliers are in original tet order; the plan's slots
            # are a padded permutation -> permute in, un-permute out
            if batched:
                tlam = lam_to_slab(state.lambda_tet[:, tslot_c], tkn, tsn)
            else:
                tlam = state.lambda_tet[tslot_c].reshape(tkn, 1, tsn)
            tw0 = wsel(tg0, tkn, tsn)
            tw1 = wsel(tg1, tkn, tsn)
            tw2 = wsel(tg2, tkn, tsn)
            tw3 = wsel(tg3, tkn, tsn)
            if per_body_mass:
                wtd = jnp.pad(
                    state.inv_mass / jnp.maximum(tdeg_c, 1.0)[None, :],
                    ((0, R - n_b), (0, n_pad - n)))
            else:
                wtd = jnp.pad((state.inv_mass
                               / jnp.maximum(tdeg_c, 1.0))[None, :],
                              ((0, 0), (0, n_pad - n)))
            args += [tlam, tidx_c, trest_c, talpha_c, trelax_c,
                     tw0, tw1, tw2, tw3, wtd]
        if kin:
            coll = state.colliders
            if coll is None:
                raise ValueError(
                    "runner built with kin_colliders needs a state "
                    "carrying a ColliderSet (core.colliders.make_colliders)")
            if coll.n_spheres != kin_s or coll.n_boxes != kin_b:
                raise ValueError(
                    f"ColliderSet counts ({coll.n_spheres} spheres, "
                    f"{coll.n_boxes} boxes) do not match the runner's "
                    f"kin_colliders=({kin_s}, {kin_b})")
            ca = jnp.zeros((kin_rows, 128), jnp.float32)
            ca = ca.at[0, 0].set(coll.ground_height)
            if kin_s:
                ca = ca.at[1:1 + kin_s, :4].set(coll.spheres)
                ca = ca.at[1:1 + kin_s, 4:7].set(coll.sphere_velocities)
            if kin_b:
                ca = ca.at[1 + kin_s:, :6].set(coll.boxes)
                ca = ca.at[1 + kin_s:, 6:9].set(coll.box_velocities)
            args.append(ca)
        elif state.colliders is not None:
            raise NotImplementedError(
                "this mesh runner was built without kin_colliders; rebuild "
                "with kin_colliders=(n_spheres, n_boxes) to animate "
                "colliders")
        res = list(call(*args))
        xo, vo, lamo = res[:3]
        res = res[3:]
        blamo = res.pop(0) if bplan is not None else None
        vlamo = res.pop(0) if vplan is not None else None
        tlamo = res.pop(0) if tplan is not None else None
        if batched:
            lam_flat = slab_to_lam(lamo, k_blocks, s_edges)
            out = state.replace(
                positions=from_planes(xo),
                velocities=from_planes(vo),
                lambda_dist=(lam_flat[:, :e_real] if eslot_c is None
                             else lam_flat[:, eslot_c]),
            )
            if blamo is not None:
                out = out.replace(lambda_bend=slab_to_lam(
                    blamo, bplan.n_blocks,
                    bplan.block_hinges)[:, bcslot_c])
            if vlamo is not None:
                out = out.replace(lambda_volume=vlamo[:n_b, 0])
            if tlamo is not None:
                out = out.replace(lambda_tet=slab_to_lam(
                    tlamo, tplan.n_blocks,
                    tplan.block_tets)[:, tcslot_c])
        else:
            lam_flat = lamo.reshape(-1)
            out = state.replace(
                positions=xo[:, :n].T,
                velocities=vo[:, :n].T,
                lambda_dist=(lam_flat[:e_real] if eslot_c is None
                             else lam_flat[eslot_c]),
            )
            if blamo is not None:
                out = out.replace(lambda_bend=blamo.reshape(-1)[bcslot_c])
            if vlamo is not None:
                out = out.replace(
                    lambda_volume=vlamo[0, 0].reshape(
                        state.lambda_volume.shape))
            if tlamo is not None:
                out = out.replace(lambda_tet=tlamo.reshape(-1)[tcslot_c])
        if with_ext:
            out = out.replace(ext_force=jnp.zeros_like(state.ext_force))
        return out

    return fn


def make_mesh_pallas_step(topo: Topology, cfg: SolverConfig, dt: float,
                          n_steps: int = 1, approx_math: bool = False,
                          kin_colliders=None):
    """Full step semantics fused in one kernel: ``n_steps`` frames of
    ``cfg.substeps`` substeps, ``ext_force`` consumed on the first substep
    and zeroed — drop-in for ``solvers.general.make_step`` on supported
    configs (JACOBI + windowed-buildable topology).  Self-colliding
    configs with a contact cadence that divides the frame route to
    ``make_mesh_hybrid_contact_step`` — contact-free substeps stay
    fused.  ``kin_colliders=(S, B)``: the state's ColliderSet poses enter
    the kernel as traced data (animated rigid world, no recompiles)."""
    if cfg.enable_self_collision:
        if cfg.self_collision_backend == "dense":
            # dense contact is fused IN-KERNEL (cadence included via the
            # step-index gate) — fall through to the fused runner
            if (cfg.self_collision_every >= 2
                    and cfg.substeps % cfg.self_collision_every != 0):
                raise NotImplementedError(
                    "fused dense contact cadence needs substeps % "
                    "self_collision_every == 0 (the engine's per-frame "
                    "pattern must equal the kernel's raw-substep gate)")
        elif (cfg.self_collision_every >= 2
                and cfg.substeps % cfg.self_collision_every == 0):
            if kin_colliders is not None:
                raise NotImplementedError(
                    "mesh hybrid contact cadence with kinematic colliders "
                    "is not fused yet — use the general engine for this "
                    "config")
            return make_mesh_hybrid_contact_step(topo, cfg, dt,
                                                 n_steps=n_steps)
    return make_mesh_substep_runner(
        topo, cfg, dt / cfg.substeps, n_steps * cfg.substeps,
        with_ext=True, approx_math=approx_math,
        kin_colliders=kin_colliders)


def make_mesh_hybrid_contact_step(topo: Topology, cfg: SolverConfig,
                                  dt: float, n_steps: int = 1):
    """Contact-cadence twin of ``kernels.lattice_pallas.
    make_hybrid_contact_step`` for MESH topologies: each frame runs
    ``substeps // every`` cadence groups of [general-engine contact
    substep ; every-1 fused-kernel substeps], with the external-force
    lifecycle (consumed on the first substep of the first step, zeroed
    after) — drop-in for ``solvers.general.make_step`` on self-colliding
    cadence configs (``make_mesh_pallas_step`` routes here).  The
    contact substep is the general engine's own (any self-collision
    backend), so its semantics match ``general.step_fn``'s cadence
    exactly; the fused substeps match the windowed backend to the usual
    bf16-one-hot ulp noise."""
    from ..solvers import general as _gen

    every = cfg.self_collision_every
    if not cfg.enable_self_collision or every < 2:
        raise ValueError("mesh hybrid contact step needs "
                         "enable_self_collision and "
                         "self_collision_every >= 2")
    if cfg.substeps % every != 0:
        raise NotImplementedError(
            "mesh hybrid contact step needs substeps % "
            "self_collision_every == 0 (use the general engine otherwise)")
    dt_sub = dt / cfg.substeps
    cfg_free = cfg.replace(enable_self_collision=False)
    inner = make_mesh_substep_runner(topo, cfg_free, dt_sub, every - 1)
    groups = cfg.substeps // every
    # topology as a traced argument, not a closure: the contact substep's
    # windowed matrices would otherwise inline as HLO constants and blow
    # the remote-compile payload at scale (general.make_step's fix)
    topo_d = jax.device_put(topo)

    @jax.jit
    def fn2(state: SimState, t: Topology) -> SimState:
        f0 = state.ext_force

        def one_step(carry, step_idx):
            st = carry.replace(
                ext_force=jnp.where(step_idx == 0, 1.0, 0.0) * f0)
            for g in range(groups):
                st = _gen._substep(st, t, cfg, dt_sub,
                                   apply_ext=(g == 0), contact_on=True)
                st = inner(st)
            return st, None

        state, _ = lax.scan(one_step, state, jnp.arange(n_steps))
        return state.replace(ext_force=jnp.zeros_like(state.ext_force))

    def fn(state: SimState) -> SimState:
        return fn2(state, topo_d)

    return fn
