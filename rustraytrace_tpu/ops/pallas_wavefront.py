"""Wavefront Pallas path tracing: image textures on the fast path.

The monolithic megakernel (pallas_megakernel.py) cannot fetch megapixel
texels in-kernel — Mosaic dynamic gathers are confined to one 128-lane tile.
This module therefore runs the kernel with a DEFERRED-TEXEL protocol and
lets XLA — where megapixel gathers are native — resolve the texel records
the kernel emits.  Two drivers share that protocol:

* PERSIST (round 3, the default — ``_wavefront_pass_persist``): the
  persistent respawn kernel made resumable across launches.  Lanes walk
  whole samples in-kernel (camera respawn included) for up to
  ``persist_iters`` bounces per launch, FREEZING individually when they hit
  an image texture; the driver resolves frozen lanes' texels between
  launches.  Per-bounce XLA spawn work and state traffic disappear for
  every lane not looking at the image (v5e: earth 78.2 vs 39.2 Mpaths/s
  segmented, book2_final 7.9 vs 5.6).
* SEGMENT (round 2, kept for head-to-head benchmarking —
  ``per_bounce_segments=True``): ONE bounce per launch over carried ray
  state, XLA respawning dead lanes' next samples between segments.

The texel records:

* an image-textured albedo hit scatters with UNIT albedo in-kernel and emits
  ``(normal, +(image_id+1))``; XLA derives the sphere UV from the outward
  normal (acos/atan2 have no Mosaic lowering), gathers the texel, and
  multiplies it into the attenuation,
* an image-textured light emits ``(normal, -(image_id+1))`` instead of adding
  its radiance; XLA adds ``attenuation * texel``.

Because albedo factors commute and each segment is exactly ONE bounce, every
radiance contribution sees the correct attenuation prefix.  Russian roulette
inside the kernel uses the running product WITHOUT pending texel factors —
a different but consistent survival probability (the same p divides), so the
estimator stays unbiased; only the variance differs marginally from the XLA
path.  This replaces the reference's CPU texel lookup inside the hit loop
(texture.rs:89-109, rtw_image.rs) with a TPU-shaped split: VPU-resident
intersection/shading, XLA gather for texels.

The bounce loop is a ``lax.while_loop`` over segments that exits as soon as
every lane is dead, and per-tile ``pl.when`` guards skip all compute for
fully-dead tiles — the wavefront analog of the megakernel's whole-tile early
exit.  Like the megakernel, the on-core PRNG has no CPU lowering: TPU-only.

DEAD-LANE ECONOMICS (two designs measured on the v5e, round 2):

1. ALIVE-RAY COMPACTION (stable-partition surviving rays between segments
   so dead-majority tiles become all-dead tiles the kernel skips) LOST on
   every tested workload — the XLA scatter+gather permutation of the whole
   ray state cost more than the dead-tile skips saved, because (a) the
   32x32 screen swizzle already gives spatially-coherent death, so
   whole-tile early exits capture most of the win, and (b) TPU scatter at
   R~1e6 is slow.  flagship d50: 11.2M paths/s uncompacted vs 0.94M with
   an every-bounce trigger; earth 14.8M vs 4.0M; final 1.19M vs 0.85M.
   The code was removed (see git history).
2. SAMPLE RESPAWN (this file, ``_wavefront_pass``): instead of moving
   surviving rays, refill dead lanes in place with the lane's own next
   sample.  No permutation, no tail — see the function docstring.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..scene import Scene, TEX_IMAGE
from .pallas_megakernel import (B_COLS, L_COLS, M_COLS, Q_COLS,
                                TILE_LANES, TILE_ROWS, _BLK, _F32,
                                _make_kernel, _unswizzle_index,
                                active_primitive_count,
                                prepare_megakernel)
from .textures import image_texel

_GOLDEN = -1640531527  # 0x9E3779B9 as i32 — the reference's per-pass seed
#                         stride (src/gpu/mod.rs:454)

# Bounces per persist launch, swept on v5e (scripts/bench_persist.py,
# Mpaths/s at launch bounds seg/inf/4/8/16/32):
#   book2_final (image-SPARSE, texel gate on):  5.6 / 1.2 / 7.3 / 6.5 / 5.0 / 3.6
#   book2_earth (image-DENSE,  texel gate off): 39.2 / 67.6 / 78.1 / 78.2 / 76.3 / 72.4
# Small bounds win even on earth: frozen lanes idle inside a long launch,
# so resolving texels every few bounces keeps whole tiles marching.
PERSIST_SPARSE_ITERS = 4
PERSIST_DENSE_ITERS = 8
# With between-launch ray sorting the optimum moves UP (coherence persists
# through a longer launch): book2_final rows32 sorted at iters 4/8/12/16 =
# 8.96/9.51/8.96/8.31 Mpaths/s vs 8.33 unsorted-i4 (scripts/sweep_sort.py)
PERSIST_SORT_ITERS = 8
# NON-image scenes (has_image=False: freeze protocol compiled out, pend
# carry elided) want a still-longer bound — no frozen lanes ever stall a
# launch — and the optimum tracks the per-lane TOTAL work (~spp x mean
# path length): v5e sweeps vs respawn (scripts/bench_persist_plain.py +
# follow-ups): flagship (spp 128) 47.6 -> 54.6 at iters 32; field10k
# (spp 64) 10.3 -> 11.8 at 16 (flat through 32); bouncing (spp 1024)
# 30.4 -> 43.4 rising through 48/64/96/128.  iters ~ spp/4 hits each
# scene's plateau; the floor keeps launch counts sane at tiny spp and the
# cap bounds while-loop trip-count compilation.
def persist_plain_iters(spp: int) -> int:
    return max(16, min(spp // 4, 128))


def persist_sort_every(persist_iters: int) -> int:
    """Sort-cadence routing for the sorted persist loop (round 5).  The
    sort's dominant cost is the 21-row permute gather (per LAUNCH); plain
    scenes amortize it over >= 16 in-kernel iterations, but the
    image-route sorted path (book2_final) is bounded to 8 and pays the
    permute every ~0.1 s launch.  Measured in-process (v5e, 2 reps each):
    final @64spp sort_every 1/2/4/8/16 = 10.1/11.2/11.5/11.4/11.0
    Mpaths/s (+14% at 4); plain scenes prefer every boundary (flagship
    69.8/70.2/66.1, bouncing 43.9/43.2/42.6, field10k 12.7/12.5/11.8 at
    1/2/4).  Route: sparse cadence for short-bound launches (the exact
    value co-tuned WITH the per-tile adaptive bounds that ride the same
    route: se 3/4/6/8/12/16/32 = 11.51/11.84/12.06/12.11/11.82/11.84/
    11.31 Mpaths/s under adaptive (4,8,.25) — spike_tile_bounds.py),
    every boundary otherwise."""
    return 8 if persist_iters <= 8 else 1


def persist_adaptive_bounds(persist_iters: int) -> tuple:
    """Per-TILE launch-bound routing (round-5 redistribution spike,
    scripts/spike_tile_bounds.py).  On the short-bound image route
    (book2_final), capping DECOHERED tiles at half the uniform bound —
    they return to the between-launch sort sooner while tight tiles keep
    marching — measures 11.84 vs 11.46 Mpaths/s uniform (+3.3%,
    reproducible; flat across rel thresholds .15/.25/.4; short=2 and
    long=16 variants lose; sort_every=4 remains essential).  Plain
    long-bound scenes LOSE with the same recipe (flagship 64.2 -> 60.9,
    field10k 12.7 -> 12.1: their launches are few and the early returns
    just serialize extra launches), so they keep uniform bounds."""
    return (4, 8, 0.25) if persist_iters <= 8 else ()

# In-kernel serial texel DMA for image-SPARSE scenes: tile-bounces with
# <= DMA_THRESH image winners resolve them in-kernel (polynomial sphere UV +
# an (8,128) HBM block DMA per winner); denser tiles keep the freeze
# protocol.  Measured on book2_final (v5e, persist_iters x dma):
# dma/inf 2.1, dma/64 4.0, dma/16 6.3, dma/4 8.13, nodma/4 8.01 Mpaths/s —
# i.e. DMA is neutral-to-slightly-positive at the launch bound that wins,
# and even with no freezes the LONG launches lose (the bound is about
# in-kernel loop economics, not texel stalls).  Kept on: it removes the
# XLA-resolve dependence for sparse tiles and is the exact
# texture.rs:89-109 semantics fully in-kernel.
DMA_TEXELS_SPARSE = True
DMA_THRESH = 16


def wavefront_eligible(scene: Scene, integrator: str = "path") -> bool:
    """Image-textured scenes where image textures sit on SPHERE or QUAD
    materials (spheres emit the outward normal for XLA to derive UV from;
    quads emit their direct planar (u, v) — round 3 lifted the round-2
    sphere-only restriction; image-textured BOXES are baked to quads by
    SceneBuilder.add_box, so they ride the quad path).  Only image-textured
    MEDIA still fall back to XLA (the reference's ConstantMedium never sets
    real UVs, constant_medium.rs:69-75, so nothing real is excluded).

    integrator="mis" (round 3): the segment kernel now compiles the in-kernel
    NEE/MIS closures too, under the same light/isotropic constraints as
    megakernel_mis_eligible — image+MIS scenes no longer fall to XLA."""
    import numpy as np

    if integrator == "mis":
        from .pallas_megakernel import mis_lights_ok

        if not mis_lights_ok(scene):
            return False
    elif integrator != "path":
        return False
    feats = set(scene.features)
    if "image" not in feats:
        return False
    tex_kind = np.asarray(scene.tex_kind)
    mat_tex = np.asarray(scene.mat_tex)
    img_mats = set(np.nonzero(tex_kind[mat_tex] == TEX_IMAGE)[0].tolist())
    for mats, mask in ((scene.msph_mat, scene.msph_mask),
                       (scene.mbox_mat, scene.mbox_mask)):
        used = set(np.asarray(mats)[np.asarray(mask) > 0].tolist())
        if used & img_mats:
            return False
    return True


SEG_KEYS = ("n_quads", "n_qclusters",
            "n_clusters", "n_sclusters", "moving", "sky_bg",
            "has_checker", "n_media", "media_kinds", "has_noise", "n_slabs",
            "n_boxes", "n_bclusters", "b_slabs", "has_image", "interpret",
            "unroll", "b_unroll", "mis", "n_lights", "n_ssc_static")


def seg_statics_tuple(statics: dict) -> tuple:
    """The static-kwargs contract of _wavefront_seg_raw as a hashable
    tuple — built here (single source of truth) for both the single-chip
    pass (render_pass_wavefront) and the spp-sharded pass
    (parallel/megakernel.py)."""
    return tuple(sorted((k, statics[k]) for k in SEG_KEYS))


def texel_gate_heuristic(scene: Scene) -> bool:
    """Static choice for the per-segment texel-resolve gate: True when
    image-textured spheres are a sliver of the scene's primitives, so most
    segments see zero flagged lanes and the whole R-lane gather can be
    skipped (book2_final: 1 of ~1800 -> gate, measured 3.7 -> 4.5 Mpaths/s);
    False when the image object dominates and the gate would always fire,
    paying its reduction+cond for nothing (book2_earth: the globe IS the
    scene, 32.5 ungated vs 24.5 gated)."""
    import numpy as np

    tex_kind = np.asarray(scene.tex_kind)
    mat_tex = np.asarray(scene.mat_tex)
    img_mat = tex_kind[mat_tex] == TEX_IMAGE
    n_img = 0
    for mats, mask in ((scene.sph_mat, scene.sph_mask),
                       (scene.quad_mat, scene.quad_mask),
                       (scene.box_mat, scene.box_mask)):
        n_img += int(np.sum((np.asarray(mask) > 0)
                            & img_mat[np.asarray(mats)]))
    return active_primitive_count(scene) > 8 * max(n_img, 1)


# Sorting pays a per-launch argsort+permute — dominated by the 21-row
# permute GATHER, linear in lane count (the round-4 "super-linear argsort"
# attribution was corrected round 5: the argsort is near-flat) — AND huge
# images get tiny per-pass spp from the ray-budget pass folding, so each
# launch carries less work to amortize against.
# Measured (v5e): sort+permute of 21-row state = 17 ms at 856k lanes
# (flagship 1200x675; nets +15%), 75 ms at 2.1M, 276 ms at 8.4M lanes —
# where BASELINE config 5 (4K flagship, 7 spp/pass) regressed 58 -> 21
# Mpaths/s.  Above the cap the dispatcher keeps the round-4 defaults
# (respawn megakernel / unsorted persist).
RAY_SORT_MAX_LANES = 1 << 21


def ray_sort_heuristic(scene: Scene, n_lanes: int = 0) -> bool:
    """Static choice for between-launch ray sorting in the persist driver
    (see _persist_sort_perm).  The sort only pays for itself when tiles
    lose coherence AND re-coherent tiles actually cull work — i.e. on
    primitive-heavy scenes where the ANY-LANE cluster cull is the
    bottleneck (book2_final's 1006-sphere cloud: 8.0 -> 9.5 Mpaths/s at
    the shared iters=8 bound, +19%; scripts/sweep_sort.py, v5e).  Tiny
    scenes (earth: one globe) have nothing to cull, so the argsort+gather
    per launch is pure tax — and so are very LARGE framebuffers
    (``n_lanes`` > RAY_SORT_MAX_LANES, see above).  Env override:
    RTT_SORT_RAYS=1 forces on, =0 forces off."""
    import os

    env = os.environ.get("RTT_SORT_RAYS")
    if env is not None:
        # the f32-exactness ceiling (2^24 slot ids, see the assert in
        # _wavefront_pass_persist) is a CORRECTNESS bound, not a perf knob:
        # honoring a forced RTT_SORT_RAYS=1 past it would assert and degrade
        # the whole render to XLA through the fallback (ADVICE r4)
        return env not in ("0", "") and n_lanes < (1 << 24)
    if n_lanes > RAY_SORT_MAX_LANES:
        return False
    return active_primitive_count(scene) >= 256


def slot_lane_count(width: int, height: int) -> int:
    """Lanes of the swizzled slot space for an H x W framebuffer (the R the
    persist state holds; rows are further padded to tile_rows multiples,
    which never crosses a RAY_SORT_MAX_LANES power-of-two boundary)."""
    tiles_x = -(-width // _BLK)
    tiles_y = -(-height // _BLK)
    return tiles_x * tiles_y * _BLK * _BLK


def sorted_persist_route(scene: Scene, width: int, height: int) -> bool:
    """THE routing predicate for 'non-image scene takes the RAY-SORTED
    persist loop instead of the respawn megakernel' — one definition shared
    by every dispatcher (single-chip render_pass_wavefront and the
    render.py 'megakernel' branch; sharded render_pass_wavefront_sharded
    and the sharded pass loop), so single-chip and multi-chip routing
    cannot drift apart for the same scene.  Callers still add their own
    EXECUTION gates (TPU platform, not-interpret, per_bounce_segments)."""
    return ("image" not in scene.features
            and ray_sort_heuristic(scene, slot_lane_count(width, height)))


@functools.partial(
    jax.jit,
    static_argnames=("n_quads", "n_qclusters",
                     "n_clusters", "n_sclusters", "moving",
                     "max_depth",
                     "sky_bg", "rows", "tile_rows", "has_checker", "n_media",
                     "media_kinds", "has_noise", "n_slabs", "n_boxes",
                     "n_bclusters", "b_slabs", "has_image", "interpret",
                     "unroll", "b_unroll", "mis", "n_lights",
                     "n_ssc_static"),
)
def _wavefront_seg_raw(tab, qtab, clb, cls, sclb, scls, btab, bclb, bcls,
                       batab, ltab,
                       mtab, ptab, vtab, atab, bg, st, seed, *,
                       n_quads: int, n_clusters: int, n_sclusters: int,
                       moving: bool,
                       max_depth: int, sky_bg: bool, rows: int,
                       tile_rows: int, has_checker: bool, n_media: int,
                       media_kinds: tuple, has_noise: bool, n_slabs: int,
                       n_boxes: int,
                       n_bclusters: int, b_slabs: int, has_image: bool,
                       interpret: bool, unroll: int = 1, b_unroll: int = 1,
                       mis: bool = False, n_lights: int = 0,
                       n_ssc_static: int = 0, n_qclusters: int = 0):
    """One bounce for every ray: st [15, rows, 128] -> (st', pending [4,...]).

    State rows: 0 tm, 1-3 origin, 4-6 direction, 7-9 attenuation,
    10-12 radiance, 13 alive, 14 per-lane bounce count."""
    grid = (rows // tile_rows,)
    st_spec = pl.BlockSpec((15, tile_rows, TILE_LANES), lambda i: (0, i, 0),
                           memory_space=pltpu.VMEM)
    pend_spec = pl.BlockSpec((4, tile_rows, TILE_LANES), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM)
    smem = lambda *shp: pl.BlockSpec(shp, lambda i: tuple(0 for _ in shp),
                                     memory_space=pltpu.SMEM)
    vmem = lambda *shp: pl.BlockSpec(shp, lambda i: tuple(0 for _ in shp),
                                     memory_space=pltpu.VMEM)
    outs = (jax.ShapeDtypeStruct((15, rows, TILE_LANES), _F32),
            jax.ShapeDtypeStruct((4, rows, TILE_LANES), _F32))
    kernel = _make_kernel(
        tab.shape[1], n_quads, n_clusters, moving, max_depth, sky_bg,
        spp=1, width=1, height=1, defocus=False, tile_rows=tile_rows,
        has_checker=has_checker, mis=mis, n_lights=n_lights,
        stratified=False,
        sqrt_spp=0, n_media=n_media, media_kinds=media_kinds,
        has_noise=has_noise, n_slabs=n_slabs,
        n_boxes=n_boxes, n_bclusters=n_bclusters, b_slabs=b_slabs,
        n_sclusters=n_sclusters, segment=True, has_image=has_image,
        unroll=unroll, b_unroll=b_unroll, n_ssc_static=n_ssc_static,
        n_qclusters=n_qclusters)
    return pl.pallas_call(
        kernel,
        out_shape=outs,
        grid=grid,
        in_specs=[
            smem(*tab.shape),
            smem(qtab.shape[0], Q_COLS),
            smem(clb.shape[0], 8),
            smem(cls.shape[0]),
            smem(sclb.shape[0], 8),
            smem(scls.shape[0]),
            smem(btab.shape[0], B_COLS),
            smem(bclb.shape[0], 8),
            smem(bcls.shape[0]),
            vmem(batab.shape[0], TILE_LANES),
            smem(ltab.shape[0], L_COLS),
            smem(mtab.shape[0], M_COLS),
            vmem(6, TILE_LANES),
            vmem(6, TILE_LANES),
            vmem(atab.shape[0], TILE_LANES),
            smem(2),
            smem(4),
            st_spec,
        ],
        out_specs=(st_spec, pend_spec),
        interpret=interpret,
    )(tab, qtab, clb, cls, sclb, scls, btab, bclb, bcls, batab, ltab, mtab,
      ptab, vtab, atab, seed, bg, st)


PERSIST_KEYS = SEG_KEYS + ("spp", "width", "height", "defocus",
                           "stratified", "sqrt_spp", "dma_meta")


def persist_statics_tuple(statics: dict) -> tuple:
    """Hashable static-kwargs for _persist_raw (single source of truth for
    the single-chip and spp-sharded persist drivers)."""
    return tuple(sorted((k, statics[k]) for k in PERSIST_KEYS))


@functools.partial(
    jax.jit,
    static_argnames=("n_quads", "n_clusters", "n_sclusters", "moving",
                     "max_depth", "sky_bg", "rows", "tile_rows",
                     "has_checker", "n_media", "media_kinds", "has_noise",
                     "n_slabs", "n_boxes", "n_bclusters", "b_slabs",
                     "has_image", "interpret", "unroll", "b_unroll", "mis",
                     "n_lights", "spp", "width", "height", "defocus",
                     "stratified", "sqrt_spp", "persist_iters",
                     "dma_texels", "dma_meta", "dma_thresh",
                     "n_ssc_static", "n_qclusters", "sorted_lanes"),
)
def _persist_raw(tab, qtab, clb, cls, sclb, scls, btab, bclb, bcls,
                 batab, ltab, mtab, ptab, vtab, atab, bg, cam_u, img_dma,
                 st, seed, tile_bounds=None, *,
                 n_quads: int, n_clusters: int, n_sclusters: int,
                 moving: bool, max_depth: int, sky_bg: bool, rows: int,
                 tile_rows: int, has_checker: bool, n_media: int,
                 media_kinds: tuple, has_noise: bool, n_slabs: int,
                 n_boxes: int, n_bclusters: int, b_slabs: int,
                 has_image: bool, interpret: bool, unroll: int,
                 b_unroll: int, mis: bool, n_lights: int, spp: int,
                 width: int, height: int, defocus: bool, stratified: bool,
                 sqrt_spp: int, persist_iters: int = 0,
                 dma_texels: bool = False, dma_meta: tuple = (),
                 dma_thresh: int = 16, n_ssc_static: int = 0,
                 n_qclusters: int = 0, sorted_lanes: bool = False):
    """ONE launch of the persistent respawn+texel-freeze kernel: every lane
    advances through its own samples until it finishes them all or FREEZES
    on an image-texture hit (pend record set).  st [20 (+1 when
    ``sorted_lanes``), rows, 128] -> (st', pend [4, rows, 128]); see the
    kernel's persist branch for the state-row layout (row 20 = SLOT id,
    sorted_lanes only: the lane's pixel identity, which travels with the
    lane so the driver may permute lanes between launches — spatial ray
    sorting / dead-lane compaction; unsorted persist keeps the 20-row
    layout, the free iota pixel mapping, and no lane-count ceiling).

    ``has_image=False`` (round 4): the freeze protocol compiles out (every
    lane is permanently unfrozen, the pend carry is elided) and the launch
    is a plain bounded respawn step — the execution mode that lets
    NON-image scenes ride between-launch ray sorting."""
    grid = (rows // tile_rows,)
    n_st = 21 if sorted_lanes else 20
    st_spec = pl.BlockSpec((n_st, tile_rows, TILE_LANES),
                           lambda i: (0, i, 0), memory_space=pltpu.VMEM)
    pend_spec = pl.BlockSpec((4, tile_rows, TILE_LANES), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM)
    smem = lambda *shp: pl.BlockSpec(shp, lambda i: tuple(0 for _ in shp),
                                     memory_space=pltpu.SMEM)
    vmem = lambda *shp: pl.BlockSpec(shp, lambda i: tuple(0 for _ in shp),
                                     memory_space=pltpu.VMEM)
    outs = (jax.ShapeDtypeStruct((n_st, rows, TILE_LANES), _F32),
            jax.ShapeDtypeStruct((4, rows, TILE_LANES), _F32))
    kernel = _make_kernel(
        tab.shape[1], n_quads, n_clusters, moving, max_depth, sky_bg,
        spp=spp, width=width, height=height, defocus=defocus,
        tile_rows=tile_rows, has_checker=has_checker, mis=mis,
        n_lights=n_lights, stratified=stratified, sqrt_spp=sqrt_spp,
        n_media=n_media, media_kinds=media_kinds, has_noise=has_noise,
        n_slabs=n_slabs, n_boxes=n_boxes, n_bclusters=n_bclusters,
        b_slabs=b_slabs, n_sclusters=n_sclusters, has_image=has_image,
        unroll=unroll, b_unroll=b_unroll, persist=True,
        persist_iters=persist_iters, dma_texels=dma_texels,
        dma_meta=dma_meta, dma_thresh=dma_thresh,
        n_ssc_static=n_ssc_static, n_qclusters=n_qclusters,
        sorted_lanes=sorted_lanes, tile_bounds=tile_bounds is not None)
    in_specs = [
        smem(*tab.shape),
        smem(qtab.shape[0], Q_COLS),
        smem(clb.shape[0], 8),
        smem(cls.shape[0]),
        smem(sclb.shape[0], 8),
        smem(scls.shape[0]),
        smem(btab.shape[0], B_COLS),
        smem(bclb.shape[0], 8),
        smem(bcls.shape[0]),
        vmem(batab.shape[0], TILE_LANES),
        smem(ltab.shape[0], L_COLS),
        smem(mtab.shape[0], M_COLS),
        vmem(6, TILE_LANES),
        vmem(6, TILE_LANES),
        vmem(atab.shape[0], TILE_LANES),
        smem(20),
        smem(2),
        smem(4),
    ]
    args = [tab, qtab, clb, cls, sclb, scls, btab, bclb, bcls, batab,
            ltab, mtab, ptab, vtab, atab, cam_u, seed, bg]
    if tile_bounds is not None:
        in_specs.append(smem(tile_bounds.shape[0]))
        args.append(tile_bounds)
    scratch_shapes = []
    if dma_texels:
        # the flat texel table stays in HBM (ANY); the kernel DMAs (8, 128)
        # blocks into the scratch on demand
        in_specs.append(pl.BlockSpec(memory_space=pltpu.ANY))
        args.append(img_dma)
        scratch_shapes = [pltpu.VMEM((8, TILE_LANES), _F32),
                          pltpu.SemaphoreType.DMA]
    in_specs.append(st_spec)
    args.append(st)
    return pl.pallas_call(
        kernel,
        out_shape=outs,
        grid=grid,
        in_specs=in_specs,
        out_specs=(st_spec, pend_spec),
        scratch_shapes=scratch_shapes,
        interpret=interpret,
    )(*args)


def _resolve_texels(scene: Scene, atten, rad, pend):
    """XLA half of the deferred-texel protocol: decode the pend record
    ((u,v) direct for quads, sphere normal otherwise — see _UV_FLAG),
    gather the texel, and apply it (+flag: multiply into the attenuation;
    -flag: add attenuation*texel emission into the radiance).  Returns
    (atten', rad')."""
    from .pallas_megakernel import _UV_FLAG

    nx_, ny_, nz_, flag = pend[0], pend[1], pend[2], pend[3]
    pi_ = jnp.float32(jnp.pi)
    code = jnp.abs(flag)
    direct = code >= _UV_FLAG  # quad: (nx_, ny_) IS (u, v)
    th_ = jnp.arccos(jnp.clip(-ny_, -1.0, 1.0))
    ph_ = jnp.arctan2(-nz_, nx_) + pi_
    pu = jnp.where(direct, nx_, ph_ * (0.5 / pi_))
    pv = jnp.where(direct, ny_, th_ * (1.0 / pi_))
    img_id = jnp.clip(
        (code - jnp.where(direct, _UV_FLAG, 0.0) - 1.0).astype(jnp.int32),
        0, scene.images.shape[0] - 1)
    texel = jnp.moveaxis(image_texel(scene, img_id, pu, pv), -1, 0)
    mul = jnp.where(flag[None, :, :] > 0.5, texel, 1.0)
    add = jnp.where(flag[None, :, :] < -0.5, texel, 0.0) * atten
    return atten * mul, rad + add


def _morton8(q):
    """Spread each lane's 8-bit int to every 3rd bit (Morton interleave
    component).  Standard magic-mask spread; int32-safe for q < 1024."""
    q = (q | (q << 16)) & 0x030000FF
    q = (q | (q << 8)) & 0x0300F00F
    q = (q | (q << 4)) & 0x030C30C3
    q = (q | (q << 2)) & 0x09249249
    return q


def _persist_sort_perm(st, spp, R, key_mode: str = "pos_oct"):
    """Between-launch lane permutation for the persist kernel (round 4).

    The persist tiles lose screen coherence after a few bounces — lanes
    scatter across the scene, the ANY-LANE cluster cull admits ~every
    cluster, and dense-cloud scenes (book2_final) pay the whole cloud per
    tile-bounce.  Both round-3/4 ablations (per-lane descent; grid
    binning) pinned the ceiling on TILE COHERENCE, which no traversal or
    representation change can restore — but the driver can: every launch
    boundary it re-sorts the HBM-resident lane state so each tile holds
    spatially-adjacent rays again.  Key (int32, ascending):

    * mid-sample lanes: 24-bit Morton code of the ray origin (256^3 cells
      over the live lanes' bounding box) + 3-bit direction octant — tiles
      get a tight frustum for the cluster cull AND slab-local winners for
      the windowed attribute fetch;
    * idle lanes with samples left: 2<<28 + slot — respawns stay
      pixel-coherent (the swizzled slot order IS screen-tile order);
    * finished lanes: 3<<28 — they pool into all-done tiles whose kernel
      while_loop exits immediately (dead-lane compaction for free).

    Ties (same cell+octant) keep slot order via stable argsort, so the
    permutation is deterministic.

    COST (round 5, scripts/bench_sort_seg.py): the round-4 "argsort is
    super-linear" attribution was WRONG — with scalar-slice fences the
    argsort measures near-flat (28/29/44 ms at 0.86/2.1/8.4 M keys) and
    the dominant, truly linear cost is the 21-row PERMUTE gather
    (32/95/293 ms, ~4.8 GB/s random-access bound, identical under every
    layout tried).  A SEGMENTED variant (``_segmented_argsort``:
    batched per-segment sorts, lanes confined to their segment, restore
    = the same local argsort) therefore saves nothing on cost and loses
    ~3% coherence (flagship global 69.5-69.7 M vs seg2^17 67.2-67.4); it
    ships off by default (SORT_SEG_LANES=0; RTT_SORT_SEG for
    experiments).  The levers that DO pay ride elsewhere: sort CADENCE
    (persist_sort_every) and per-tile adaptive launch bounds
    (persist_adaptive_bounds)."""
    mid = st[19].reshape(R)
    done = st[15].reshape(R)
    slot = st[20].reshape(R).astype(jnp.int32)
    ox, oy, oz = (st[k].reshape(R) for k in (1, 2, 3))
    dx, dy, dz = (st[k].reshape(R) for k in (4, 5, 6))
    act = mid > 0.0
    big = jnp.float32(3e38)

    def qaxis(v):
        mn = jnp.min(jnp.where(act, v, big))
        mx = jnp.max(jnp.where(act, v, -big))
        scale = 255.999 / jnp.maximum(mx - mn, jnp.float32(1e-20))
        return jnp.clip((v - mn) * scale, 0.0, 255.0).astype(jnp.int32)

    morton = (_morton8(qaxis(ox)) | (_morton8(qaxis(oy)) << 1)
              | (_morton8(qaxis(oz)) << 2))
    octant = ((dx > 0).astype(jnp.int32) + 2 * (dy > 0).astype(jnp.int32)
              + 4 * (dz > 0).astype(jnp.int32))
    if key_mode == "pos_oct":       # cell-major, direction octant minor
        key_mid = (morton << 3) | octant  # < 2**27
    elif key_mode == "oct_major":   # direction-major: tight frusta first
        key_mid = (octant << 24) | morton  # < 2**27
    elif key_mode == "pos_only":
        key_mid = morton  # < 2**24
    else:  # pragma: no cover
        raise ValueError(f"unknown sort key_mode {key_mode!r}")
    finished = ~act & (done >= float(spp))
    key = jnp.where(act, key_mid,
                    jnp.where(finished, jnp.int32(3 << 28),
                              jnp.int32(2 << 28) + slot))
    return _segmented_argsort(key, R)


# Segment size for the between-launch lane sort, in lanes; the actual
# segment is the largest divisor of R that is <= this (so the reshape is
# exact).  DEFAULT 0 = GLOBAL argsort: the round-5 decomposition
# (scripts/bench_sort_seg.py + the CLAUDE.md fence note) found the
# round-4 "argsort is super-linear" attribution WRONG — argsort measures
# near-FLAT (28/29/44 ms at 0.86/2.1/8.4 M keys) and the LINEAR,
# dominant cost is the 21-row permute gather (32/95/293 ms, ~4.8 GB/s
# random-access bound, identical under every layout tried), which
# segmentation cannot reduce; meanwhile segment-confined sorting costs
# coherence (flagship in-process A/B: global 69.5-69.7 M vs seg2^17
# 67.2-67.4 M vs nosort 54.6-54.8).  RTT_SORT_SEG=<lanes> keeps the
# segmented machinery available for experiments.
SORT_SEG_LANES = 0


def _sort_seg(R: int) -> int:
    """Largest divisor of R (in lanes) that is <= the configured segment
    size and a multiple of the 128-lane row; R itself when none fits."""
    import os

    env = os.environ.get("RTT_SORT_SEG")
    target = int(env) if env else SORT_SEG_LANES
    if target <= 0 or R <= target:
        return R
    rows = R // TILE_LANES
    best = 1
    for k in range(1, rows + 1):
        if rows % k == 0 and k * TILE_LANES <= target:
            best = k
    return best * TILE_LANES


def _segmented_argsort(key: jnp.ndarray, R: int) -> jnp.ndarray:
    """Stable argsort of ``key`` [R] restricted to independent segments:
    returns a GLOBAL permutation (local order + segment offsets).  With
    seg == R this is exactly the round-4 global argsort."""
    seg = _sort_seg(R)
    if seg >= R:
        return jnp.argsort(key, stable=True)
    s = R // seg
    local = jnp.argsort(key.reshape(s, seg), axis=-1, stable=True)
    return (local + (jnp.arange(s, dtype=local.dtype) * seg)[:, None]
            ).reshape(R)


@functools.partial(
    jax.jit,
    static_argnames=("spp", "max_depth", "rows", "tile_rows", "statics",
                     "gate_texels", "persist_iters", "dma_texels",
                     "dma_thresh", "sort_rays", "sort_key", "sort_every",
                     "adaptive_bounds"),
)
def _wavefront_pass_persist(scene: Scene, arrays: dict, key, sample_offset,
                            *, spp: int, max_depth: int, rows: int,
                            tile_rows: int, statics: tuple,
                            gate_texels: bool = True,
                            persist_iters: int = 0,
                            dma_texels: bool = False,
                            dma_thresh: int = 16,
                            sort_rays: bool = False,
                            sort_key: str = "pos_oct",
                            sort_every: int = 1,
                            adaptive_bounds: tuple = ()):
    """Image-scene render pass via the PERSIST kernel: whole samples run
    in-kernel (camera respawn included); a launch returns only when every
    lane has finished its ``spp`` samples or sits FROZEN on an image-texture
    hit, and the driver resolves the frozen lanes' texels between launches.
    Launch count ~ max per-lane image-hit count (1 + hits), NOT
    spp x E[path length] — the per-bounce segment tax is gone for every
    lane that isn't looking at the globe.  Returns [R, 3] radiance sums.

    ``sort_rays``: permute the lane state by spatial key at every launch
    boundary (see _persist_sort_perm) — the tile-coherence lever for
    dense-cloud scenes.  Lane pixel identity travels in state row 20, and
    the final banked sums are scattered back to slot order."""
    stat = dict(statics)
    R = rows * TILE_LANES
    if sort_rays:
        # f32 slot ids are exact below 2^24; ray_sort_heuristic's lane cap
        # (RAY_SORT_MAX_LANES = 2^21) keeps heuristic routing far under
        # this, but RTT_SORT_RAYS=1 bypasses the cap and direct callers
        # can force sort_rays — either reaches this assert on >=16.7M-lane
        # framebuffers (~8K), where render_image's fallback then degrades
        # the render to XLA
        assert R < (1 << 24), "sorted persist needs f32-exact slot ids"
    seg_args = (arrays["tab"], arrays["qtab"], arrays["clb"], arrays["cls"],
                arrays["sclb"], arrays["scls"],
                arrays["btab"], arrays["bclb"], arrays["bcls"],
                arrays["batab"], arrays["ltab"], arrays["mtab"],
                arrays["ptab"], arrays["vtab"], arrays["atab"], arrays["bg"],
                arrays["cam_u"], arrays["img_dma"])
    key = jax.random.fold_in(key, sample_offset)
    seed_base = jax.random.key_data(
        jax.random.fold_in(key, 0x0B0B)).astype(jnp.int32).reshape(-1)[0]
    st0 = jnp.zeros((20, rows, TILE_LANES), _F32)
    if sort_rays:
        # row 20: slot ids, identity-initialized — matches the grid-iota
        # pixel mapping bit-for-bit until a sort permutes it
        st0 = jnp.concatenate(
            [st0, jnp.arange(R, dtype=jnp.int32).astype(_F32).reshape(
                1, rows, TILE_LANES)], axis=0)
    max_launches = spp * max_depth + 2  # 1 freeze/bounce worst case
    use_tb = bool(adaptive_bounds)
    n_tiles = rows // tile_rows

    def _tile_bounds_next(st2):
        """Per-tile launch bounds for the NEXT launch (round-5
        redistribution spike): tiles whose ACTIVE lanes span a large
        fraction of the global active extent have decohered inside the
        launch — give them a SHORT bound so they come back to the driver
        (and its sort) sooner; tight tiles keep marching on a LONG one."""
        short_b, long_b, rel = adaptive_bounds
        act = st2[19].reshape(n_tiles, -1) > 0.0
        big = jnp.float32(3e38)
        ext = jnp.float32(0)
        gext = jnp.float32(0)
        exts = jnp.zeros((n_tiles,), jnp.float32)
        for k in (1, 2, 3):
            v = st2[k].reshape(n_tiles, -1)
            mn = jnp.min(jnp.where(act, v, big), axis=1)
            mx = jnp.max(jnp.where(act, v, -big), axis=1)
            has = jnp.any(act, axis=1)
            exts = exts + jnp.where(has, mx - mn, 0.0)
            gext = gext + (jnp.max(jnp.where(act, v, -big))
                           - jnp.min(jnp.where(act, v, big)))
        deco = exts > rel * jnp.maximum(gext, jnp.float32(1e-20))
        return jnp.where(deco, jnp.int32(short_b),
                         jnp.int32(long_b))

    def cond(c):
        g, st = c[0], c[1]
        work = (st[19] > 0.0) | (st[15] < float(spp))
        return (g < max_launches) & (jnp.max(
            jnp.where(work, 1.0, 0.0)) > 0.0)

    def body(c):
        g, st = c[0], c[1]
        seed = jnp.stack(
            [jax.lax.bitwise_xor(seed_base, g * _GOLDEN), sample_offset]
        ).astype(jnp.int32)
        st2, pend = _persist_raw(
            *seg_args, st, seed, c[2] if use_tb else None,
            rows=rows, tile_rows=tile_rows,
            max_depth=max_depth, persist_iters=persist_iters,
            dma_texels=dma_texels, dma_thresh=dma_thresh,
            sorted_lanes=sort_rays, **stat)

        def _resolve(st2_):
            atten, rad = _resolve_texels(scene, st2_[7:10], st2_[10:13],
                                         pend)
            st2_ = st2_.at[7:10].set(atten)
            return st2_.at[10:13].set(rad)

        if not stat["has_image"]:
            pass  # no freeze protocol: pend is structurally zero
        elif gate_texels:
            flag = pend[3]
            st2 = jax.lax.cond(jnp.max(jnp.abs(flag)) > 0.0,
                               _resolve, lambda s: s, st2)
        else:
            st2 = _resolve(st2)
        if sort_rays:
            # pend is already resolved into the state, so permuting here
            # cannot orphan a frozen lane's texel record
            def do_sort(s):
                perm = _persist_sort_perm(s, spp, R, sort_key)
                return s.reshape(21, R)[:, perm].reshape(
                    21, rows, TILE_LANES)

            if sort_every > 1:
                # sort-frequency knob: the permute gather is the sort's
                # dominant cost (see SORT_SEG_LANES note); skipping
                # boundaries trades permute traffic for staler coherence
                st2 = jax.lax.cond(g % sort_every == 0, do_sort,
                                   lambda s: s, st2)
            else:
                st2 = do_sort(st2)
        if use_tb:
            return g + 1, st2, _tile_bounds_next(st2)
        return g + 1, st2

    init = (jnp.asarray(0, jnp.int32), st0)
    if use_tb:
        init = init + (jnp.full((n_tiles,), adaptive_bounds[1],
                                jnp.int32),)
    out = jax.lax.while_loop(cond, body, init)
    st = out[1]
    sums = st[16:19].reshape(3, R)
    if sort_rays:
        # lanes are permuted: restore slot order via the INVERSE
        # permutation as an argsort+gather — row 20 is a bijection over
        # [0, R), so argsort(slot) is exactly its inverse, and a TPU
        # gather is far cheaper than the equivalent scatter (v5e at 8.4M
        # lanes: 125 ms vs 690 ms)
        slot = st[20].reshape(R).astype(jnp.int32)
        # slots never leave their sort segment, so the inverse is the same
        # batched local argsort (round 5; global argsort when seg == R)
        sums = sums[:, _segmented_argsort(slot, R)]
    return sums.T  # [R, 3] banked radiance sums


def _slot_pixels(width: int, height: int, tile_rows: int):
    """Per-slot pixel coordinates under the 32x32 screen-block swizzle —
    identical to the megakernel's in-kernel mapping, so _unswizzle_index
    inverts both."""
    import numpy as np

    tiles_x = -(-width // _BLK)
    tiles_y = -(-height // _BLK)
    n_slots = tiles_x * tiles_y * _BLK * _BLK
    tile_r = tile_rows * TILE_LANES
    rows = (-(-n_slots // tile_r)) * tile_rows
    slot = np.arange(rows * TILE_LANES)
    blk = slot // (_BLK * _BLK)
    within = slot % (_BLK * _BLK)
    pxi = (blk % tiles_x) * _BLK + within % _BLK
    pyi = (blk // tiles_x) * _BLK + within // _BLK
    px = np.minimum(pxi, width - 1).astype(np.float32)
    py = np.minimum(pyi, height - 1).astype(np.float32)
    return jnp.asarray(px), jnp.asarray(py), rows


@functools.partial(
    jax.jit,
    static_argnames=("spp", "max_depth", "rows", "tile_rows", "stratified",
                     "sqrt_spp", "statics", "gate_texels"),
)
def _wavefront_pass(scene: Scene, arrays: dict, cam, key, px, py,
                    sample_offset, *, spp: int, max_depth: int, rows: int,
                    tile_rows: int, stratified: bool, sqrt_spp: int,
                    statics: tuple, gate_texels: bool = True):
    """Persistent-lane wavefront pass with SAMPLE RESPAWN: every lane owns
    one pixel slot and walks through its ``spp`` samples back-to-back — the
    moment a path dies (absorbed, missed, RR-killed, depth-exhausted) the
    lane's radiance is banked and the NEXT sample's camera ray respawns in
    the same slot on the next segment.  Tiles therefore stay ~100% alive
    until the global tail, so the total segment count is
    ~ spp x E[path length] instead of spp x max(path length): the
    dead-lane-tail problem that compaction tried (and measurably failed,
    see module docstring) to fix disappears at the source.

    RNG: camera draws for respawns at segment g come from the
    fold_in(key, g) threefry stream — each lane respawns at most once per
    segment, so (lane, segment) pairs never reuse a draw.  Path draws use
    the on-core PRNG keyed by (pass, segment, tile), never reused.  Streams
    differ from the per-sample XLA path's but the estimator is identical in
    distribution; per-pixel sample counts are exactly ``spp``."""
    from ..camera import generate_rays

    stat = dict(statics)
    R = rows * TILE_LANES
    has_image = stat["has_image"]
    seg_args = (arrays["tab"], arrays["qtab"], arrays["clb"], arrays["cls"],
                arrays["sclb"], arrays["scls"],
                arrays["btab"], arrays["bclb"], arrays["bcls"],
                arrays["batab"], arrays["ltab"], arrays["mtab"],
                arrays["ptab"], arrays["vtab"], arrays["atab"], arrays["bg"])
    shape2 = (rows, TILE_LANES)
    ones = jnp.ones(shape2, _F32)
    zeros = jnp.zeros(shape2, _F32)

    # fold the pass's sample_offset into EVERY stream: without this, the
    # multi-pass loop (render_image calls each pass with the same key and
    # only sample_offset varying) and the spp-sharded per-device offsets
    # would re-draw identical sample sets — N passes of 16 spp would be N
    # copies of the same 16 samples (found in round-2 code review; the
    # megakernel path already folds the offset in
    # megakernel_pass_from_prepared)
    key = jax.random.fold_in(key, sample_offset)
    k_cam = jax.random.fold_in(key, 0x0CAF)
    seed_base = jax.random.key_data(
        jax.random.fold_in(key, 0x0B0B)).astype(jnp.int32).reshape(-1)[0]

    def rr_(x):
        return x.reshape(shape2)

    def spawn(g, s_next):
        """Camera rays for lanes starting absolute sample s_next [R] i32."""
        draws = jax.random.uniform(jax.random.fold_in(k_cam, g), (R, 5),
                                   dtype=_F32)
        if stratified:
            # per-lane stratum from the lane's own absolute sample index
            # (the_rest_of_your_life/camera.rs:114-116,173-177), wrapped to
            # the sqrt_spp^2 grid so shard-padded extras stay in-pixel
            n2 = float(sqrt_spp * sqrt_spp)
            s_w = jnp.mod(s_next.astype(_F32), n2)
            s_i = jnp.mod(s_w, float(sqrt_spp))
            s_j = jnp.floor(s_w * (1.0 / float(sqrt_spp)))
            strat = (s_i, s_j, float(sqrt_spp))
        else:
            strat = None
        o, d, time = generate_rays(cam, px, py, draws, strat)
        return (rr_(time), rr_(o[:, 0]), rr_(o[:, 1]), rr_(o[:, 2]),
                rr_(d[:, 0]), rr_(d[:, 1]), rr_(d[:, 2]))

    tm0, ox0, oy0, oz0, dx0, dy0, dz0 = spawn(
        0, jnp.zeros(R, jnp.int32) + sample_offset)
    st0 = jnp.stack([tm0, ox0, oy0, oz0, dx0, dy0, dz0,
                     ones, ones, ones, zeros, zeros, zeros, ones, zeros])
    max_segs = spp * max_depth + 1  # safety bound; real count is ~spp*E[len]

    def cond(c):
        g, st, done, accum = c
        return (g < max_segs) & (jnp.max(st[13]) > 0.0)

    def body(c):
        g, st, done, accum = c
        seed = jnp.stack(
            [jax.lax.bitwise_xor(seed_base, g * _GOLDEN), g]
        ).astype(jnp.int32)
        st2, pend = _wavefront_seg_raw(
            *seg_args, st, seed, rows=rows, tile_rows=tile_rows,
            max_depth=max_depth, **stat)
        if has_image:
            # resolve deferred texels: +flag multiplies the attenuation,
            # -flag adds light emission (atten unchanged by the kernel
            # for light lanes, so this is the attenuation AT the hit).
            # Decoding (sphere normal vs direct quad UV) in _resolve_texels.
            flag = pend[3]

            def _resolve(st2_):
                atten, rad = _resolve_texels(scene, st2_[7:10],
                                             st2_[10:13], pend)
                st2_ = st2_.at[7:10].set(atten)
                return st2_.at[10:13].set(rad)

            if gate_texels:
                # segments where NO lane hit an image sphere skip the
                # R-lane texel gather outright — it is the single most
                # expensive XLA op in the segment loop.  Static per-scene
                # choice (see render_pass_wavefront): when image spheres
                # are a sliver of the scene (book2_final: 1 of ~1800
                # primitives) most segments skip and the gate wins
                # (measured 3.7 -> 4.5 Mpaths/s); when they dominate
                # (book2_earth IS the globe) the gate always fires and
                # its reduction+cond overhead only costs (32.5 -> 24.5).
                st2 = jax.lax.cond(jnp.max(jnp.abs(flag)) > 0.0,
                                   _resolve, lambda s: s, st2)
            else:
                st2 = _resolve(st2)
        # bank radiance of paths that died THIS segment, then respawn the
        # lane's next sample (if any remain) in place
        fin = (st[13] > 0.0) & (st2[13] <= 0.0)
        accum = accum + jnp.where(fin[None], st2[10:13], 0.0)
        done = done + jnp.where(fin, 1.0, 0.0)
        live_next = fin & (done < float(spp))
        s_next = done.reshape(R).astype(jnp.int32) + sample_offset
        tm, ox, oy, oz, dx, dy, dz = spawn(g + 1, s_next)

        def sel(new, old):
            return jnp.where(live_next, new, old)

        finz = jnp.where(fin, 0.0, 1.0)
        st3 = jnp.stack([
            sel(tm, st2[0]), sel(ox, st2[1]), sel(oy, st2[2]),
            sel(oz, st2[3]),
            sel(dx, st2[4]), sel(dy, st2[5]), sel(dz, st2[6]),
            sel(ones, st2[7]), sel(ones, st2[8]), sel(ones, st2[9]),
            st2[10] * finz, st2[11] * finz, st2[12] * finz,
            jnp.where(live_next, 1.0, st2[13]),
            sel(zeros, st2[14]),
        ])
        return g + 1, st3, done, accum

    _, _, _, accum = jax.lax.while_loop(
        cond, body,
        (jnp.asarray(0, jnp.int32), st0, zeros,
         jnp.zeros((3,) + shape2, _F32)))
    return accum.reshape(3, R).T  # [R, 3] radiance sums


def wavefront_tile_rows(scene: Scene) -> int:
    """Scene-adaptive tile height for the image-scene persist kernel (v5e,
    round-3 sweep under persist_iters routing,
    scripts/bench_final_knobs.py): big tiles amortize per-tile loop
    overhead, small tiles tighten the cluster-cull frustum AND shrink the
    20-row state I/O a persist launch pays per tile — book2_final (~1800
    prims): 7.88/7.0/5.6 Mpaths/s at 32/64/128; book2_earth (1 sphere):
    78.2 at its 128 default.  Round-2 segment-mode numbers (64 won on
    mid-size scenes) no longer apply."""
    n = active_primitive_count(scene)
    if n <= 4:
        return 128
    return 32


def render_pass_wavefront(scene: Scene, cam, key, *, width: int, height: int,
                          spp: int, max_depth: int, sample_offset=0,
                          stratified: bool = False, sqrt_spp: int = 0,
                          mis: bool = False,
                          tile_rows: int | None = None,
                          interpret: bool | None = None,
                          unroll: int | None = None,
                          b_unroll: int | None = None,
                          sphere_max_leaf: int | None = None,
                          box_max_leaf: int | None = None,
                          per_bounce_segments: bool = False) -> jnp.ndarray:
    """Whole-image wavefront render pass; returns the radiance SUM [H, W, 3]
    (the same contract as render.render_pass).

    Non-image scenes run the PERSISTENT RESPAWN megakernel (the respawn
    loop fully in-kernel — zero per-segment HBM state traffic); image
    scenes run the segmented loop below, whose XLA driver resolves the
    deferred texels between bounces.  ``mis=True`` compiles the in-kernel
    book-3 NEE/MIS closures into the segment kernel (round 3: image+MIS
    scenes no longer fall to XLA; eligibility = wavefront_eligible(.,
    "mis"))."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if "image" not in scene.features:
        from .pallas_megakernel import (prepare_megakernel_cached,
                                        render_pass_megakernel,
                                        respawn_tile_rows)

        if (not interpret and not per_bounce_segments
                and sorted_persist_route(scene, width, height)):
            # RAY-SORTED PERSIST (round 4): the persist kernel with
            # has_image=False is a bounded in-kernel respawn step with
            # cross-launch HBM lane state, which lets the driver re-sort
            # lanes spatially every launch — the tile-coherence lever the
            # round-3/4 ablations pinned as the only one left for
            # primitive-heavy scenes (respawn vs this, v5e: flagship 47.6
            # vs 49.9, field10k 10.3 vs 11.8, bouncing 30.4 vs 36.3
            # Mpaths/s; scripts/bench_persist_plain.py)
            tr = (tile_rows if tile_rows is not None
                  else respawn_tile_rows(scene, mis=mis))
            arrays, statics = prepare_megakernel_cached(
                scene, cam, width=width, height=height, spp=spp,
                max_depth=max_depth, tile_rows=tr, interpret=False,
                segment=True, mis=mis, stratified=stratified,
                sqrt_spp=sqrt_spp, unroll=unroll, b_unroll=b_unroll,
                sphere_max_leaf=sphere_max_leaf,
                box_max_leaf=box_max_leaf)
            key = jax.random.fold_in(key, 0x5EED)
            accum = _wavefront_pass_persist(
                scene, arrays, key, jnp.asarray(sample_offset, jnp.int32),
                spp=spp, max_depth=max_depth, rows=statics["rows"],
                tile_rows=tr, statics=persist_statics_tuple(statics),
                gate_texels=False,
                persist_iters=persist_plain_iters(spp), sort_rays=True,
                sort_every=persist_sort_every(persist_plain_iters(spp)))
            return accum[_unswizzle_index(width, height)].reshape(
                height, width, 3)
        return render_pass_megakernel(
            scene, cam, key, width=width, height=height, spp=spp,
            max_depth=max_depth, sample_offset=sample_offset,
            stratified=stratified, sqrt_spp=sqrt_spp, mis=mis,
            tile_rows=(tile_rows if tile_rows is not None
                       else respawn_tile_rows(scene, mis=mis)),
            interpret=interpret, respawn=True, unroll=unroll,
            b_unroll=b_unroll, sphere_max_leaf=sphere_max_leaf,
            box_max_leaf=box_max_leaf)
    if tile_rows is None:
        tile_rows = wavefront_tile_rows(scene)
    from .pallas_megakernel import prepare_megakernel_cached

    arrays, statics = prepare_megakernel_cached(
        scene, cam, width=width, height=height,
        spp=(1 if per_bounce_segments else spp), max_depth=max_depth,
        tile_rows=tile_rows, interpret=interpret, segment=True, mis=mis,
        stratified=stratified, sqrt_spp=sqrt_spp,
        unroll=unroll, b_unroll=b_unroll, sphere_max_leaf=sphere_max_leaf,
        box_max_leaf=box_max_leaf)
    key = jax.random.fold_in(key, 0x5EED)  # disjoint from megakernel streams
    if not per_bounce_segments:
        # PERSIST kernel (round 3 default): samples run in-kernel with
        # in-kernel respawn, bounded to a few bounces per launch so frozen
        # texel lanes never serialize whole tiles (earth 78.2 Mpaths/s vs
        # 39.2 segmented; final 7.3 vs 5.6 — see PERSIST_*_ITERS sweep)
        gate = texel_gate_heuristic(scene)
        sort = ray_sort_heuristic(scene, slot_lane_count(width, height))
        accum = _wavefront_pass_persist(
            scene, arrays, key, jnp.asarray(sample_offset, jnp.int32),
            spp=spp, max_depth=max_depth, rows=statics["rows"],
            tile_rows=tile_rows, statics=persist_statics_tuple(statics),
            gate_texels=gate,
            persist_iters=(PERSIST_SORT_ITERS if sort
                           else PERSIST_SPARSE_ITERS if gate
                           else PERSIST_DENSE_ITERS),
            dma_texels=gate and DMA_TEXELS_SPARSE,
            dma_thresh=DMA_THRESH, sort_rays=sort,
            sort_every=persist_sort_every(
                PERSIST_SORT_ITERS if sort else 1),
            adaptive_bounds=(persist_adaptive_bounds(PERSIST_SORT_ITERS)
                             if sort else ()))
        return accum[_unswizzle_index(width, height)].reshape(
            height, width, 3)
    if mis:
        raise ValueError("per_bounce_segments mode does not drive MIS; "
                         "use the persist path")
    px, py, rows = _slot_pixels(width, height, tile_rows)
    seg_statics = seg_statics_tuple(statics)
    accum = _wavefront_pass(
        scene, arrays, cam, key, px, py,
        jnp.asarray(sample_offset, jnp.int32),
        spp=spp, max_depth=max_depth, rows=rows, tile_rows=tile_rows,
        stratified=stratified, sqrt_spp=sqrt_spp, statics=seg_statics,
        gate_texels=texel_gate_heuristic(scene))
    return accum[_unswizzle_index(width, height)].reshape(height, width, 3)
