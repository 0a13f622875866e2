"""Pallas TPU path-tracing MEGAKERNEL for sphere scenes with solid albedos.

The TPU rebirth of the reference's GPU megakernels (``src/gpu/renderer.wgsl``
iterative ``ray_color`` loop :175-246; CUDA clone ``src/cuda/mod.rs:217-333``):
ONE kernel traces a whole sample — the full bounce loop, intersection,
shading, Russian roulette, and background — entirely in VMEM/registers over a
(64, 128)-ray tile.  The hybrid path (pallas_hit + XLA shading) still pays
~3.4 ms/bounce of XLA round-trips through HBM at R=64k; here a bounce costs
~18 cycles/ray and the loop exits as soon as every lane in the tile is dead.

Scope (megakernel_eligible): spheres + quads (incl. boxes/instances, which
the scene compiler bakes to quads) + constant media, solid/checker/Perlin-
marble albedos, sky-gradient or flat background, motion blur, defocus, and
BOTH integrators — the plain path estimator and the book-3 NEE/MIS estimator
(stratified sampling included).  Image textures fall back to the hybrid /
XLA paths: Mosaic's dynamic gathers are confined to one 128-lane tile, which
fits the split 256-entry Perlin lattice but not megapixel texel fetches.

Semantics pinned to the reference GPU f32 path:
* quadric half-b form with oc subtracted first (renderer.wgsl:122-142),
* t in (1e-3, 1e9) (renderer.wgsl:185),
* lambertian n + random_unit_vector with near-zero guard (:188-195),
* metal reflect + fuzz, absorb below surface (:196-205),
* dielectric Snell/TIR/Schlick stochastic choice (:206-223),
* Russian roulette from bounce 5, p = clamp(max(attenuation), .05, .95),
  attenuation /= p (:225-231),
* sky lerp on unit d.y (:233-239).

RNG: the on-core Mosaic PRNG (pltpu.prng_seed / prng_random_bits), seeded per
(pass-key, grid tile) — a different (but equidistributed) stream than the
XLA threefry path, exactly as the reference's GPU xorshift differs from its
CPU SmallRng (renderer.wgsl:51-75 vs rtweekend.rs:9-11).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..scene import Scene, LAMBERTIAN, METAL, DIELECTRIC, DIFFUSE_LIGHT, ISOTROPIC, TEX_SOLID
from .intersect import T_MIN, T_MAX

_BIG = 1.0e30
_F32 = jnp.float32
TILE_ROWS = 32  # 4096 rays = four 32x32 screen blocks; best measured tradeoff
# between SAH-cluster-cull granularity (smaller = tighter frustums) and
# per-sphere scalar-read amortization (larger = cheaper loop overhead).
# Re-measured after the slab-gather attr refactor: 8 -> 11.1, 16 -> 14.6,
# 32 -> 16.7, 48 -> 16.1, 64 -> 14.7 Mpaths/s on the flagship.
TILE_LANES = 128
TILE_R = TILE_ROWS * TILE_LANES
_TWO_PI = 6.283185307179586

RR_START_BOUNCE = 5
RR_P_MIN = 0.05
RR_P_MAX = 0.95

# Measured defaults for the intersect-loop shape knobs (v5e sweeps,
# scripts/bench_kernel_knobs.py; see ROADMAP.md round-3 notes).  UNROLL
# tests U primitives per scalar-loop iteration (cluster ranges are padded
# to multiples of U with unhittable sentinel rows), trading a few dead
# tests for U-fold fewer loop-carried iterations; MAX_LEAF is the SAH
# treelet-cut leaf size (smaller = tighter cluster frustums, longer cull
# scans).
SPHERE_UNROLL = 4
BOX_UNROLL = 4
# Round-4 multi-second re-sweep (the round-2 tuning ran sub-second):
# flagship (489 spheres) leaf 16/32/64 = 43.0/44.1/47.5 Mpaths/s at
# unroll 4; bouncing 29.1/29.8 and book2_final 8.32/8.46 at 32/64 — 64
# wins or ties everywhere EXCEPT the 10k-sphere field (10.34/10.04 at
# 32/64), so very large scenes keep 32 (sphere_leaf_default).
SPHERE_MAX_LEAF = 64
SPHERE_MAX_LEAF_BIG = 32
SPHERE_BIG_N = 4096
BOX_MAX_LEAF = 32

# joined sphere+material SMEM table columns
J_CX, J_CY, J_CZ, J_R2 = 0, 1, 2, 3
J_VX, J_VY, J_VZ = 4, 5, 6
J_INVR = 7  # 1/radius (normals without per-lane rsqrt of carried r2)
J_KIND = 8
J_AR, J_AG, J_AB = 9, 10, 11
J_FUZZ = 12
J_IOR = 13
J_TEXK = 14  # 0 solid / 1 checker (texture.rs:63-77)
J_C2R, J_C2G, J_C2B = 15, 16, 17
J_INVS = 18  # checker inv_scale
J_IMG = 19  # image index (wavefront segment mode texel deferral)
J_COLS = 24


# quad SMEM table columns (quad.rs:23-43 precomputed frame)
Q_QX, Q_QY, Q_QZ = 0, 1, 2
Q_UX, Q_UY, Q_UZ = 3, 4, 5
Q_VX, Q_VY, Q_VZ = 6, 7, 8
Q_NX, Q_NY, Q_NZ = 9, 10, 11  # unit normal
Q_DP = 12  # plane offset d
Q_WX, Q_WY, Q_WZ = 13, 14, 15  # w = n / dot(n, n)
Q_KIND = 16
Q_AR, Q_AG, Q_AB = 17, 18, 19
Q_FUZZ = 20
Q_IOR = 21
Q_TEXK = 22
Q_C2R, Q_C2G, Q_C2B = 23, 24, 25
Q_INVS = 26
Q_IMG = 27  # image index (wavefront segment mode texel deferral)
Q_COLS = 32

# pend-record flag encoding (segment mode, has_image): |flag| = img_id + 1,
# plus _UV_FLAG when the kernel emitted a DIRECT (u, v) pair (quad planar
# coords / box face coords) instead of a sphere normal for XLA to derive the
# UV from.  Image counts are tiny (<< 2048), so the bands never collide.
_UV_FLAG = 2048.0


def megakernel_eligible(scene: Scene) -> bool:
    feats = set(scene.features)
    return not feats & {"image"}


def pack_perlin_tables(scene: Scene):
    """(ptab int32 [6,128], vtab f32 [6,128]): the 256-entry Perlin
    permutation/vector lattice split into lo/hi 128-lane halves (Mosaic lane
    gathers are confined to one 128-lane tile)."""
    import numpy as np

    perm = np.asarray(scene.perlin_perm, np.int32)  # [3,256]
    vec = np.asarray(scene.perlin_randvec, np.float32)  # [256,3]
    ptab = perm.reshape(3, 2, 128).reshape(6, 128)
    vtab = vec.T.reshape(3, 2, 128).reshape(6, 128).astype(np.float32)
    return ptab, vtab


def pack_joined_table(scene: Scene) -> jnp.ndarray:
    C = scene.sph_center
    N = C.shape[0]
    r = scene.sph_radius
    mat = scene.sph_mat
    tab = jnp.zeros((N, J_COLS), _F32)
    tab = tab.at[:, J_CX:J_CZ + 1].set(C)
    tab = tab.at[:, J_R2].set(jnp.where(scene.sph_mask > 0, r * r, -_BIG))
    tab = tab.at[:, J_VX:J_VZ + 1].set(scene.sph_cvel)
    tab = tab.at[:, J_INVR].set(1.0 / jnp.maximum(r, 1e-30))
    tab = tab.at[:, J_KIND].set(scene.mat_kind[mat].astype(_F32))
    tab = tab.at[:, J_AR:J_AB + 1].set(scene.tex_color1[scene.mat_tex[mat]])
    tab = tab.at[:, J_FUZZ].set(scene.mat_fuzz[mat])
    tab = tab.at[:, J_IOR].set(scene.mat_ior[mat])
    mtex = scene.mat_tex[mat]
    tk = scene.tex_kind[mtex]
    tab = tab.at[:, J_TEXK].set(tk.astype(_F32))
    tab = tab.at[:, J_C2R:J_C2B + 1].set(scene.tex_color2[mtex])
    # dual-use scale column: checker inv_scale / marble noise_scale
    tab = tab.at[:, J_INVS].set(jnp.where(
        tk == 3, scene.tex_noise_scale[mtex], scene.tex_inv_scale[mtex]))
    tab = tab.at[:, J_IMG].set(scene.tex_image[mtex].astype(_F32))
    return tab


def pack_quad_table(scene: Scene) -> jnp.ndarray:
    """[Q, 24] f32; padding/masked quads get a zero normal (|denom| < 1e-8
    rejects them for every ray)."""
    q = scene.quad_q
    u = scene.quad_u
    v = scene.quad_v
    Q = q.shape[0]
    mask = scene.quad_mask > 0
    n = jnp.cross(u, v)
    nn = jnp.maximum(jnp.sum(n * n, axis=-1, keepdims=True), 1e-30)
    w = n / nn
    normal = n / jnp.sqrt(nn)
    normal = jnp.where(mask[:, None], normal, 0.0)
    dp = jnp.sum(normal * q, axis=-1)
    mat = scene.quad_mat
    tab = jnp.zeros((Q, Q_COLS), _F32)
    tab = tab.at[:, Q_QX:Q_QZ + 1].set(q)
    tab = tab.at[:, Q_UX:Q_UZ + 1].set(u)
    tab = tab.at[:, Q_VX:Q_VZ + 1].set(v)
    tab = tab.at[:, Q_NX:Q_NZ + 1].set(normal)
    tab = tab.at[:, Q_DP].set(dp)
    tab = tab.at[:, Q_WX:Q_WZ + 1].set(w)
    tab = tab.at[:, Q_KIND].set(scene.mat_kind[mat].astype(_F32))
    tab = tab.at[:, Q_AR:Q_AB + 1].set(scene.tex_color1[scene.mat_tex[mat]])
    tab = tab.at[:, Q_FUZZ].set(scene.mat_fuzz[mat])
    tab = tab.at[:, Q_IOR].set(scene.mat_ior[mat])
    mtex = scene.mat_tex[mat]
    tk = scene.tex_kind[mtex]
    tab = tab.at[:, Q_TEXK].set(tk.astype(_F32))
    tab = tab.at[:, Q_C2R:Q_C2B + 1].set(scene.tex_color2[mtex])
    tab = tab.at[:, Q_INVS].set(jnp.where(
        tk == 3, scene.tex_noise_scale[mtex], scene.tex_inv_scale[mtex]))
    tab = tab.at[:, Q_IMG].set(scene.tex_image[mtex].astype(_F32))
    return tab


QUAD_CLUSTER_MIN = 32  # reference scenes carry <= 10 quads: linear scan
# leaf sweep on a 1024-quad random field (v5e, 400^2@64 d8, camera inside
# the field — adversarial for the tile cull): linear 9.3 Mpaths/s,
# leaf 16/32/64 = 9.7/10.3/10.4; 8 regressed to 8.4 (slab+cond overhead
# of 128 clusters beats the savings).  32 balances cull granularity
# against per-cluster overhead.
QUAD_MAX_LEAF = 32


def cluster_quad_table(scene: Scene, qtab):
    """SAH-cluster the quad table once it is big enough to matter.

    The reference BVHs everything including quads
    (the_next_week/mod.rs:616-621); the kernel scanned them linearly —
    harmless at the reference's <= 10 quads, but the one primitive class
    with no acceleration for user scenes.  Quads >= QUAD_CLUSTER_MIN get a
    SAH treelet cut over their corner AABBs, the table rows are permuted
    cluster-contiguous, and per-cluster metadata rows are APPENDED to the
    same table ([lo3, hi3, start, end] in cols 0-7) so the kernel needs no
    new refs — just the ``n_qclusters`` static.  Padding/masked quads form
    a trailing cluster with ~f32-max bounds whose slab entry distance can
    never beat a live best-t.  Below the threshold the table is returned
    untouched (reference scenes stay bit-identical).

    Returns (qtab', n_quads, n_qclusters): ``n_quads`` counts REAL rows
    (the appended metadata rows are only ever read by the cull)."""
    import numpy as np

    n_rows = qtab.shape[0]
    if "quads" not in scene.features:
        return qtab, 0, 0
    mask = np.asarray(scene.quad_mask) > 0
    if (int(mask.sum()) < QUAD_CLUSTER_MIN
            or os.environ.get("RTT_NO_QUAD_CLUSTER")):
        return qtab, n_rows, 0
    from ..native import build_aabb_clusters

    qt = np.asarray(qtab)
    act = np.where(mask)[0]
    pad = np.where(~mask)[0]
    q = qt[act, Q_QX:Q_QZ + 1]
    u = qt[act, Q_UX:Q_UZ + 1]
    v = qt[act, Q_VX:Q_VZ + 1]
    corners = [q, q + u, q + v, q + u + v]
    lo = np.minimum.reduce(corners) - 1e-4
    hi = np.maximum.reduce(corners) + 1e-4
    order, cl_start, cl_min, cl_max = build_aabb_clusters(
        lo.astype(np.float32), hi.astype(np.float32),
        max_leaf=QUAD_MAX_LEAF)
    perm = np.concatenate([act[np.asarray(order)], pad]).astype(np.int64)
    starts = np.asarray(cl_start, np.int64).tolist()
    mins = [cl_min[c] for c in range(cl_min.shape[0])]
    maxs = [cl_max[c] for c in range(cl_max.shape[0])]
    if pad.size:
        starts.append(starts[-1] + int(pad.size))
        mins.append(np.full(3, 3.2e38, np.float32))
        maxs.append(np.full(3, 3.3e38, np.float32))
    n_qc = len(starts) - 1
    crows = np.zeros((n_qc, Q_COLS), np.float32)
    for c in range(n_qc):
        crows[c, 0:3] = mins[c]
        crows[c, 3:6] = maxs[c]
        crows[c, 6] = float(starts[c])
        crows[c, 7] = float(starts[c + 1])
    out = np.concatenate([qt[perm], crows]).astype(np.float32)
    return jnp.asarray(out), n_rows, n_qc


# box SMEM table columns (axis-aligned box primitives; the slab-test
# replacement for the reference's make_box six-quad expansion, quad.rs:90-113)
B_LOX, B_LOY, B_LOZ = 0, 1, 2
B_HIX, B_HIY, B_HIZ = 3, 4, 5
B_COLS = 8

# box winner-attribute rows in the batab gather table (order matters)
_BOX_ATTRS_BASE = 12  # kind, a(3), fuzz, ior, lo(3), hi(3)


def _pad_cluster_ranges(order, cl_start, u: int):
    """Pad every [start, end) range of ``order`` to a multiple of ``u`` with
    -1 sentinels (unhittable rows), so the kernel's unrolled fori bounds
    (``cl_start // u``) cover each cluster exactly."""
    import numpy as np

    order = np.asarray(order, np.int32)
    cl_start = np.asarray(cl_start, np.int32)
    if u <= 1:
        return order, cl_start
    segs, starts, tot = [], [0], 0
    for c in range(cl_start.shape[0] - 1):
        seg = order[cl_start[c]:cl_start[c + 1]]
        pad = (-seg.shape[0]) % u
        if pad:
            seg = np.concatenate([seg, np.full(pad, -1, np.int32)])
        segs.append(seg)
        tot += seg.shape[0]
        starts.append(tot)
    return (np.concatenate(segs).astype(np.int32),
            np.asarray(starts, np.int32))


def pack_box_tables(scene: Scene, max_leaf: int = 32, pad_to: int = 1):
    """(btab [NB,8] f32, order, cl_start [C+1] i32, cl_bounds [C,8] f32) of
    the ACTIVE boxes, SAH-cluster-reordered (tight AABB clusters via the
    native rtt_cluster_aabbs; the same treelet-cut machinery as spheres).

    ``pad_to`` pads each cluster's range to a multiple of the kernel's
    box-loop unroll; padded rows (order = -1) are degenerate lo == hi points
    far from the scene, rejected by the strict t1 < t2 slab test."""
    import numpy as np

    from ..native import build_aabb_clusters

    mask = np.asarray(scene.box_mask) > 0
    lo = np.asarray(scene.box_lo, np.float32)[mask]
    hi = np.asarray(scene.box_hi, np.float32)[mask]
    n = lo.shape[0]
    if n == 0:
        return (np.zeros((1, B_COLS), np.float32), np.zeros(1, np.int32),
                np.zeros(2, np.int32), np.zeros((1, 8), np.float32))
    if n > max_leaf:
        order, cl_start, cl_min, cl_max = build_aabb_clusters(
            lo, hi, max_leaf=max_leaf)
    else:
        order = np.arange(n, dtype=np.int32)
        cl_start = np.asarray([0, n], np.int32)
        cl_min = lo.min(axis=0, keepdims=True)
        cl_max = hi.max(axis=0, keepdims=True)
    order, cl_start = _pad_cluster_ranges(order, cl_start, pad_to)
    dead = order < 0
    lo = np.where(dead[:, None], 1e28, lo[np.maximum(order, 0)])
    hi = np.where(dead[:, None], 1e28, hi[np.maximum(order, 0)])
    btab = np.zeros((order.shape[0], B_COLS), np.float32)
    btab[:, B_LOX:B_LOZ + 1] = lo
    btab[:, B_HIX:B_HIZ + 1] = hi
    clb = np.concatenate(
        [cl_min, cl_max, np.zeros((cl_min.shape[0], 2), np.float32)], axis=1)
    return btab, order, cl_start.astype(np.int32), clb


# constant-medium SMEM table columns (constant_medium.rs)
M_KIND = 0  # 0 sphere / 1 oriented box
M_CX, M_CY, M_CZ = 1, 2, 3  # center (sphere) / offset (box)
M_R2 = 4
M_NID = 5  # neg_inv_density
M_AR, M_AG, M_AB = 6, 7, 8  # isotropic phase albedo
M_COS, M_SIN = 9, 10
M_LOX, M_LOY, M_LOZ = 11, 12, 13
M_HIX, M_HIY, M_HIZ = 14, 15, 16
M_COLS = 24


def pack_media_table(scene: Scene):
    """[M, 24] f32 numpy table of active constant media (spheres + oriented
    boxes); masked rows are made unhittable (sphere r2=-BIG, box lo>hi)."""
    import numpy as np

    rows = []
    kmask = np.asarray(scene.msph_mask) > 0
    for k in np.nonzero(kmask)[0]:
        r = np.zeros(M_COLS, np.float32)
        r[M_KIND] = 0.0
        r[M_CX:M_CZ + 1] = np.asarray(scene.msph_center)[k]
        rad = float(np.asarray(scene.msph_radius)[k])
        r[M_R2] = rad * rad
        r[M_NID] = float(np.asarray(scene.msph_neg_inv_density)[k])
        mat = int(np.asarray(scene.msph_mat)[k])
        r[M_AR:M_AB + 1] = np.asarray(scene.tex_color1)[
            int(np.asarray(scene.mat_tex)[mat])]
        rows.append(r)
    bmask = np.asarray(scene.mbox_mask) > 0
    for b in np.nonzero(bmask)[0]:
        r = np.zeros(M_COLS, np.float32)
        r[M_KIND] = 1.0
        r[M_CX:M_CZ + 1] = np.asarray(scene.mbox_offset)[b]
        r[M_COS] = float(np.asarray(scene.mbox_cos)[b])
        r[M_SIN] = float(np.asarray(scene.mbox_sin)[b])
        r[M_LOX:M_LOZ + 1] = np.asarray(scene.mbox_lo)[b]
        r[M_HIX:M_HIZ + 1] = np.asarray(scene.mbox_hi)[b]
        r[M_NID] = float(np.asarray(scene.mbox_neg_inv_density)[b])
        mat = int(np.asarray(scene.mbox_mat)[b])
        r[M_AR:M_AB + 1] = np.asarray(scene.tex_color1)[
            int(np.asarray(scene.mat_tex)[mat])]
        rows.append(r)
    n = len(rows)
    tab = (np.stack(rows) if rows
           else np.zeros((1, M_COLS), np.float32))
    return tab, n


# light SMEM table columns (book-3 NEE targets)
L_KIND = 0  # 0 quad / 1 sphere
L_QX, L_QY, L_QZ = 1, 2, 3
L_UX, L_UY, L_UZ = 4, 5, 6
L_VX, L_VY, L_VZ = 7, 8, 9
L_WX, L_WY, L_WZ = 10, 11, 12
L_NX, L_NY, L_NZ = 13, 14, 15
L_DP = 16
L_AREA = 17
L_CX, L_CY, L_CZ = 18, 19, 20
L_RAD = 21
L_COLS = 24


def pack_light_table(scene: Scene):
    """[L_active, 24] f32 numpy table of the book-3 NEE light list
    (the_rest_of_your_life/mod.rs:128-140)."""
    import numpy as np

    mask = np.asarray(scene.light_mask) > 0
    kinds = np.asarray(scene.light_kind)[mask]
    q = np.asarray(scene.light_q)[mask]
    u = np.asarray(scene.light_u)[mask]
    v = np.asarray(scene.light_v)[mask]
    c = np.asarray(scene.light_center)[mask]
    r = np.asarray(scene.light_radius)[mask]
    L = kinds.shape[0]
    tab = np.zeros((max(L, 1), L_COLS), np.float32)
    if L:
        n = np.cross(u, v)
        nn = np.maximum((n * n).sum(-1, keepdims=True), 1e-30)
        w = n / nn
        area = np.sqrt(nn[:, 0])
        nhat = n / np.sqrt(nn)
        tab[:L, L_KIND] = kinds
        tab[:L, L_QX:L_QZ + 1] = q
        tab[:L, L_UX:L_UZ + 1] = u
        tab[:L, L_VX:L_VZ + 1] = v
        tab[:L, L_WX:L_WZ + 1] = w
        tab[:L, L_NX:L_NZ + 1] = nhat
        tab[:L, L_DP] = (nhat * q).sum(-1)
        tab[:L, L_AREA] = area
        tab[:L, L_CX:L_CZ + 1] = c
        tab[:L, L_RAD] = r
    return tab, L


def mis_lights_ok(scene: Scene) -> bool:
    """Shared in-kernel NEE/MIS constraints (megakernel AND the segmented
    wavefront): 1..16 NEE lights.

    The light loops unroll at compile time (static n_lights), so the cap is
    a compile-time cost knob, not a hardware limit: every reference scene
    has <= 2 NEE lights; 16 leaves headroom for user scenes while keeping
    the unrolled pdf/sample code well inside the instruction budget.
    Isotropic materials / medium scatter events were excluded through
    round 3; round 4 lifted that (the MIS branch now draws the SpherePdf
    uniform direction and 1/4π scattering pdf for is_iso lanes, matching
    trace_mis), so volumetric MIS scenes stay on the fast path."""
    import numpy as np

    n_lights = int(np.asarray(jnp.sum(scene.light_mask)))
    return 1 <= n_lights <= 16


def megakernel_mis_eligible(scene: Scene) -> bool:
    """Book-3 MIS in-kernel: megakernel-eligible scene + mis_lights_ok."""
    return megakernel_eligible(scene) and mis_lights_ok(scene)


def pack_image_dma(scene: Scene):
    """(dma_img [R, 128] f32, meta) for the IN-KERNEL texel fetch.

    Texels are flattened image-major as RGBA quads (4 f32 — a texel never
    straddles a 128-lane row), padded to whole (8, 128) tiles: Mosaic DMA
    slices must be tiling-aligned, so the kernel fetches the (8, 128) block
    containing a texel and extracts the 3 floats with masked reductions.
    ``meta`` is a static tuple of (base_texel, W, H) per image, baked into
    the kernel as constants (image counts are tiny)."""
    import numpy as np

    imgs = np.asarray(scene.images)
    hw = np.asarray(scene.image_hw)
    metas, chunks, base = [], [], 0
    for k in range(imgs.shape[0]):
        h, w = int(hw[k, 0]), int(hw[k, 1])
        tex = imgs[k, :h, :w, :].reshape(-1, 3).astype(np.float32)
        rgba = np.concatenate(
            [tex, np.zeros((h * w, 1), np.float32)], axis=1)
        metas.append((base, w, h))
        chunks.append(rgba.reshape(-1))
        base += h * w
    flat = (np.concatenate(chunks) if chunks
            else np.zeros(4, np.float32))
    pad = (-flat.size) % (8 * 128)
    flat = np.concatenate([flat, np.zeros(pad, np.float32)])
    return flat.reshape(-1, 128), tuple(metas)


def active_primitive_count(scene: Scene) -> int:
    """Total active primitives (spheres + quads + boxes + media); shared by
    respawn_tile_rows and the wavefront texel-gate heuristic."""
    import numpy as np

    return int(sum(float(np.asarray(m).sum()) for m in (
        scene.sph_mask, scene.quad_mask, scene.box_mask,
        scene.msph_mask, scene.mbox_mask)))


def noise_dominant(scene: Scene) -> bool:
    """True when Perlin-marble primitives ARE the scene (book2_perlin:
    both spheres marble) rather than one object among many (book2_final).
    Drives the unroll default: the 7-octave turbulence evaluation already
    saturates registers/VMEM, and unrolling the intersect loops on top
    measurably spills (perlin_spheres v5e: 51-54 Mpaths/s at unroll=1 vs
    38.7 at unroll=4; book2_final, noise-sparse, prefers 4: 8.1 vs 6.8)."""
    import numpy as np

    if "noise" not in scene.features:
        return False
    tex_kind = np.asarray(scene.tex_kind)
    mat_tex = np.asarray(scene.mat_tex)
    noise_mat = tex_kind[mat_tex] == 3  # TEX_NOISE
    n_noise = int(np.sum((np.asarray(scene.sph_mask) > 0)
                         & noise_mat[np.asarray(scene.sph_mat)]))
    return active_primitive_count(scene) <= 8 * n_noise


def respawn_tile_rows(scene: Scene, mis: bool = False) -> int:
    """Measured tile height for the PERSISTENT RESPAWN kernel.

    Round 3 re-sweep under the unrolled intersect loops (v5e, one process,
    Mpaths/s at 16/32/64 rows): flagship 32.4/33.5/29.5, cornell_d20
    35.6/39.1/35.9, smoke 35.8/36.8/34.2, cornell_mis 50.4/53.3/49.1,
    field10k 9.3/10.0/8.2, perlin 20.9/21.0/21.2 — 32 wins or ties
    everywhere (unroll=4 quarters the per-iteration scalar overhead that
    used to favor 64-row tiles), so the round-2 scene-conditional rule
    collapsed to a constant."""
    return 32


def atan2_poly(y, x):
    """Branchless vector atan2 via an odd minimax polynomial on [0, 1] —
    Mosaic has no atan2 lowering.  Max error ~1e-5 rad (~0.003 texel at a
    2048-wide image); at (0, 0) returns 0, matching the XLA path's guarded
    pole case (intersect.sphere_uv).  Pure jnp: runs in-kernel and on CPU
    (accuracy pinned by tests/test_round3.py::test_atan2_acos_poly)."""
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    mx = jnp.maximum(ax, ay)
    mn = jnp.minimum(ax, ay)
    t = mn / jnp.maximum(mx, 1e-30)
    s = t * t
    r = t * (0.99997726 + s * (-0.33262347 + s * (
        0.19354346 + s * (-0.11643287 + s * (
            0.05265332 + s * -0.01172120)))))
    r = jnp.where(ay > ax, 1.5707963267948966 - r, r)
    r = jnp.where(x < 0.0, 3.141592653589793 - r, r)
    return jnp.where(y < 0.0, -r, r)


def acos_poly(z):
    """acos via atan2(sqrt(1-z^2), z); z clipped to [-1, 1]."""
    zc = jnp.clip(z, -1.0, 1.0)
    return atan2_poly(jnp.sqrt(jnp.maximum(1.0 - zc * zc, 0.0)), zc)


def _uniform(shape):
    # prng_random_bits yields int32; mask to the low 23 bits (always
    # non-negative — an arithmetic >> of negative bits would yield negative
    # "uniforms" and bias RR survival / dielectric choices)
    bits = pltpu.prng_random_bits(shape)
    return (bits & 0x7FFFFF).astype(_F32) * (1.0 / 8388608.0)


_BLK = 32  # screen-space swizzle block (32x32 pixels = 1024 consecutive slots)


def _make_kernel(n_spheres: int, n_quads: int, n_clusters: int, moving: bool,
                 max_depth: int, sky_bg: bool, spp: int, width: int,
                 height: int, defocus: bool, tile_rows: int,
                 has_checker: bool, mis: bool = False, n_lights: int = 0,
                 stratified: bool = False, sqrt_spp: int = 0,
                 n_media: int = 0, has_noise: bool = False,
                 n_slabs: int = 4, n_boxes: int = 0, n_bclusters: int = 0,
                 b_slabs: int = 1, n_sclusters: int = 0,
                 segment: bool = False, has_image: bool = False,
                 respawn: bool = False, unroll: int = 1, b_unroll: int = 1,
                 media_kinds: tuple = (), persist: bool = False,
                 persist_iters: int = 0, dma_texels: bool = False,
                 dma_meta: tuple = (), dma_thresh: int = 16,
                 n_ssc_static: int = 0, n_qclusters: int = 0,
                 sorted_lanes: bool = False, tile_bounds: bool = False):
    """Build either the monolithic megakernel (``segment=False``: in-kernel
    camera rays + spp loop + whole bounce loop) or the SEGMENT kernel
    (``segment=True``: ONE bounce over carried ray-state refs — the wavefront
    building block that lets XLA resolve image-texture texels between
    bounces; see ops/pallas_wavefront.py).  Both modes share every inner
    closure (intersect, shading, RR), so estimator semantics are identical
    by construction.

    ``respawn`` (monolithic only): replace the sequential
    ``fori(spp){while(bounce)}`` with ONE persistent while_loop in which
    every lane walks its own ``spp`` samples back-to-back, respawning its
    next camera ray the moment its path dies.  This is the fully-in-kernel
    version of the wavefront driver's sample respawn
    (pallas_wavefront.py): same dead-lane economics, but with zero
    per-segment HBM state traffic and no XLA spawn work.  Non-image
    scenes only (image texels still need the segment loop's XLA resolve).

    ``has_image`` (segment mode only): image-textured sphere hits get unit
    albedo in-kernel and emit a pending record (outward normal,
    ±(image_id+1)) for the XLA texel resolve — +albedo multiply, -emission
    add; XLA derives the sphere UV from the normal (acos/atan2 have no
    Mosaic lowering)."""
    shape = (tile_rows, TILE_LANES)
    use_clusters = n_clusters > 0
    tiles_x = -(-width // _BLK)
    has_tex = has_checker or has_noise or has_image
    inv_pi = 0.3183098861837907

    def kernel(*refs):
        if segment:
            (tab_ref, qtab_ref, clb_ref, cls_ref, sclb_ref, scls_ref,
             btab_ref, bclb_ref,
             bcls_ref, batab_ref, ltab_ref, mtab_ref,
             ptab_ref, vtab_ref, atab_ref, seed_ref, bg_ref,
             st_ref, sto_ref, pend_ref) = refs
        elif persist:
            (tab_ref, qtab_ref, clb_ref, cls_ref, sclb_ref, scls_ref,
             btab_ref, bclb_ref,
             bcls_ref, batab_ref, ltab_ref, mtab_ref,
             ptab_ref, vtab_ref, atab_ref, cam_ref, seed_ref, bg_ref,
             *rest) = refs
            if tile_bounds:
                # per-TILE launch bound (round-5 redistribution spike):
                # the driver hands each tile its own iteration budget
                tb_ref, *rest = rest
            if dma_texels:
                (img_ref, st_ref, sto_ref, pend_ref,
                 tex_scratch, tex_sem) = rest
            else:
                st_ref, sto_ref, pend_ref = rest
        else:
            (tab_ref, qtab_ref, clb_ref, cls_ref, sclb_ref, scls_ref,
             btab_ref, bclb_ref,
             bcls_ref, batab_ref, ltab_ref, mtab_ref,
             ptab_ref, vtab_ref, atab_ref, cam_ref, seed_ref, bg_ref,
             rx_ref, ry_ref, rz_ref) = refs

        def _make_fetch_group(ref, nsl):
            """Slab-WINDOWED winner-attribute fetch: gathers every requested
            attribute row in one sweep over only the slabs the tile's
            winners actually occupy.  Ray tiles are screen-coherent (32x32
            swizzle) and primitive tables are SAH-ordered, so winners within
            a tile usually share ONE 128-lane slab — the per-slab
            ``lax.cond`` then skips the other nsl-1 slabs whole-tile.  This
            replaced the unconditional all-slab loop that made the
            1000-sphere cloud of book2_final dominate its bounce cost
            (measured: 62% of kernel time at n_slabs=8; see ROADMAP.md)."""

            def fetch_group(rows, lane, slab, valid):
                if nsl == 1:
                    return [jnp.take_along_axis(
                        jnp.broadcast_to(ref[a:a + 1, :], shape), lane,
                        axis=1) for a in rows]
                slabf = slab.astype(_F32)
                smin = jnp.min(jnp.where(valid, slabf, float(nsl - 1)))
                smax = jnp.max(jnp.where(valid, slabf, 0.0))
                vals = tuple(zeros for _ in rows)

                for k in range(nsl):
                    def take(*vs, _k=k):
                        sel = slab == _k
                        return tuple(
                            jnp.where(sel, jnp.take_along_axis(
                                jnp.broadcast_to(
                                    ref[a * nsl + _k:a * nsl + _k + 1, :],
                                    shape), lane, axis=1), v)
                            for a, v in zip(rows, vs))

                    need = (smin <= float(k)) & (float(k) <= smax)
                    vals = jax.lax.cond(need, take,
                                        lambda *vs: tuple(vs), *vals)
                return list(vals)

            return fetch_group

        fetch_attrs = _make_fetch_group(atab_ref, n_slabs)
        fetch_batts = _make_fetch_group(batab_ref, b_slabs)
        pltpu.prng_seed(seed_ref[0], pl.program_id(0))

        zeros = jnp.zeros(shape, _F32)
        ones = jnp.ones(shape, _F32)

        if not segment:
            # per-lane pixel coordinates: ray slots are swizzled into 32x32
            # screen blocks so a program's rays share a narrow primary
            # frustum (what makes tile-level cluster culling bite); the host
            # unswizzles the output with one gather.
            # SORTED persist mode (round 4) reads each lane's SLOT from
            # state row 20 instead of deriving it from the grid position:
            # the driver PERMUTES lanes between launches (spatial ray
            # sorting / dead-lane compaction), so a lane's pixel identity
            # must travel with its state.  Unsorted persist keeps the
            # 20-row state and the free iota arithmetic (and, because f32
            # slot ids are only exact below 2^24, it also has no lane-count
            # ceiling).
            if persist and sorted_lanes:
                gid = st_ref[20].astype(jnp.int32)
            else:
                gid = (
                    pl.program_id(0) * (tile_rows * TILE_LANES)
                    + jax.lax.broadcasted_iota(jnp.int32, shape, 0)
                    * TILE_LANES
                    + jax.lax.broadcasted_iota(jnp.int32, shape, 1)
                )
            blk = gid // (_BLK * _BLK)
            within = gid % (_BLK * _BLK)
            pxi = (blk % tiles_x) * _BLK + within % _BLK
            pyi = (blk // tiles_x) * _BLK + within // _BLK
            px = jnp.minimum(pxi, width - 1).astype(_F32)
            py = jnp.minimum(pyi, height - 1).astype(_F32)

        def intersect(tm, ox, oy, oz, dx, dy, dz, a, inv_a):
            def body_of(mv):
                # tab_ref is the geometry-ONLY SMEM table (cx, cy, cz, r2
                # [, vx, vy, vz]): the hot loop reads nothing else, and the
                # slim layout keeps 10k-sphere scenes inside the scalar-
                # memory budget (winner attributes live in the VMEM atab).
                # Each iteration tests ``unroll`` consecutive spheres
                # (cluster ranges are padded to multiples of ``unroll`` with
                # r2 = -BIG sentinels, which can never pass disc > 0).
                # ``mv`` is the PER-GROUP motion flag: when a moving scene
                # has a static majority (book2_final: 1 moving of ~1006),
                # prepare_megakernel clusters the static and moving spheres
                # separately so the static loop skips the 3 SMEM velocity
                # reads + 3 FMAs per sphere entirely (sphere.rs:30-35
                # center-at-time analog, paid only where centers move).
                def body(k, carry):
                    bt, bi = carry
                    for jj in range(unroll):
                        s = k * unroll + jj if unroll > 1 else k
                        cx = tab_ref[0, s]
                        cy = tab_ref[1, s]
                        cz = tab_ref[2, s]
                        r2 = tab_ref[3, s]
                        if mv:
                            cx = cx + tm * tab_ref[4, s]
                            cy = cy + tm * tab_ref[5, s]
                            cz = cz + tm * tab_ref[6, s]
                        ocx = cx - ox
                        ocy = cy - oy
                        ocz = cz - oz
                        h = dx * ocx + dy * ocy + dz * ocz
                        c = ocx * ocx + ocy * ocy + ocz * ocz - r2
                        disc = h * h - a * c
                        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
                        tn = (h - sq) * inv_a
                        tf = (h + sq) * inv_a
                        root = jnp.where((tn > T_MIN) & (tn < T_MAX), tn, tf)
                        take = ((disc > 0.0) & (root > T_MIN)
                                & (root < T_MAX) & (root < bt))
                        bt = jnp.where(take, root, bt)
                        bi = jnp.where(take, s, bi)
                    return bt, bi

                return body

            body = body_of(moving)

            init = (jnp.full(shape, _BIG, _F32),
                    jnp.full(shape, -1, jnp.int32))
            if use_clusters or n_boxes or n_qclusters:
                # sign-safe inverse direction for slab tests (clusters/boxes)
                sgx = jnp.where(dx < 0.0, -1e-20, 1e-20)
                sgy = jnp.where(dy < 0.0, -1e-20, 1e-20)
                sgz = jnp.where(dz < 0.0, -1e-20, 1e-20)
                ivx = 1.0 / jnp.where(jnp.abs(dx) < 1e-20, sgx, dx)
                ivy = 1.0 / jnp.where(jnp.abs(dy) < 1e-20, sgy, dy)
                ivz = 1.0 / jnp.where(jnp.abs(dz) < 1e-20, sgz, dz)
            def make_cull(bounds_ref, starts_ref, inner):
                """AABB treelet cull: slab-test node ci's bounds against
                the whole ray tile; descend into inner over
                [starts[ci], starts[ci+1]) only if ANY lane hits the box
                closer than its current best t.  Stacking two of these
                (super-clusters over clusters) gives the 2-level SAH
                hierarchy that keeps 10k-sphere scenes fast; the analog of
                the reference's recursive BVH descent (bvh.rs:160-172) with
                tile-coherent, compiler-friendly control flow."""

                def cull_body(ci, carry):
                    bt = carry[0]
                    tx1 = (bounds_ref[ci, 0] - ox) * ivx
                    tx2 = (bounds_ref[ci, 3] - ox) * ivx
                    ty1 = (bounds_ref[ci, 1] - oy) * ivy
                    ty2 = (bounds_ref[ci, 4] - oy) * ivy
                    tz1 = (bounds_ref[ci, 2] - oz) * ivz
                    tz2 = (bounds_ref[ci, 5] - oz) * ivz
                    t1 = jnp.maximum(
                        jnp.maximum(jnp.minimum(tx1, tx2),
                                    jnp.minimum(ty1, ty2)),
                        jnp.minimum(tz1, tz2))
                    t2 = jnp.minimum(
                        jnp.minimum(jnp.maximum(tx1, tx2),
                                    jnp.maximum(ty1, ty2)),
                        jnp.maximum(tz1, tz2))
                    hit_box = (t1 <= t2) & (t2 > T_MIN) & (t1 < bt)
                    any_hit = jnp.max(jnp.where(hit_box, 1.0, 0.0)) > 0.0
                    lo = starts_ref[ci]
                    hi_ = starts_ref[ci + 1]
                    return jax.lax.cond(
                        any_hit,
                        lambda c: jax.lax.fori_loop(lo, hi_, inner, c),
                        lambda c: c,
                        carry,
                    )

                return cull_body

            # NOTE: when unroll > 1, cls_ref holds PRE-DIVIDED sphere starts
            # (cluster ranges padded to multiples of unroll, then // unroll)
            # so the cull's fori bounds are already in body-iteration units;
            # scls_ref indexes clusters and is never divided.
            if n_sclusters > 1:
                if moving and 0 < n_ssc_static < n_sclusters:
                    # split hierarchy: leading super-clusters hold only
                    # STATIC spheres (motion-free body), the tail holds the
                    # moving ones (prepare_megakernel groups + orders them)
                    scl_st = make_cull(sclb_ref, scls_ref,
                                       make_cull(clb_ref, cls_ref,
                                                 body_of(False)))
                    carry = jax.lax.fori_loop(0, n_ssc_static, scl_st, init)
                    scl_mv = make_cull(sclb_ref, scls_ref,
                                       make_cull(clb_ref, cls_ref,
                                                 body_of(True)))
                    carry = jax.lax.fori_loop(n_ssc_static, n_sclusters,
                                              scl_mv, carry)
                else:
                    scl_body = make_cull(sclb_ref, scls_ref,
                                         make_cull(clb_ref, cls_ref, body))
                    carry = jax.lax.fori_loop(0, n_sclusters, scl_body, init)
            elif use_clusters:
                cl_body = make_cull(clb_ref, cls_ref, body)
                carry = jax.lax.fori_loop(0, n_clusters, cl_body, init)
            else:
                carry = jax.lax.fori_loop(0, n_spheres // unroll, body, init)

            # --- axis-aligned box primitives: slab tests over the SAH-
            #     cluster-culled box table (the reference tests the same
            #     geometry as 6 quads each through its BVH, bvh.rs:160-172 /
            #     quad.rs:90-113) ---
            if n_boxes:
                def bbody(k, bcarry):
                    # b_unroll boxes per iteration (padded with degenerate
                    # lo == hi sentinels that fail the strict t1 < t2 test);
                    # bcls_ref starts are pre-divided like cls_ref
                    bt_, bbi_ = bcarry
                    for jj in range(b_unroll):
                        s = k * b_unroll + jj if b_unroll > 1 else k
                        tx1 = (btab_ref[s, B_LOX] - ox) * ivx
                        tx2 = (btab_ref[s, B_HIX] - ox) * ivx
                        ty1 = (btab_ref[s, B_LOY] - oy) * ivy
                        ty2 = (btab_ref[s, B_HIY] - oy) * ivy
                        tz1 = (btab_ref[s, B_LOZ] - oz) * ivz
                        tz2 = (btab_ref[s, B_HIZ] - oz) * ivz
                        t1 = jnp.maximum(
                            jnp.maximum(jnp.minimum(tx1, tx2),
                                        jnp.minimum(ty1, ty2)),
                            jnp.minimum(tz1, tz2))
                        t2 = jnp.minimum(
                            jnp.minimum(jnp.maximum(tx1, tx2),
                                        jnp.maximum(ty1, ty2)),
                            jnp.maximum(tz1, tz2))
                        near_ok = (t1 > T_MIN) & (t1 < T_MAX)
                        # entry face if in window, else exit face (inside)
                        root = jnp.where(near_ok, t1, t2)
                        take = ((t1 < t2) & (root > T_MIN) & (root < T_MAX)
                                & (root < bt_))
                        bt_ = jnp.where(take, root, bt_)
                        bbi_ = jnp.where(take, s, bbi_)
                    return bt_, bbi_

                binit = (carry[0], jnp.full(shape, -1, jnp.int32))
                if n_bclusters > 1:
                    bt, bbi = jax.lax.fori_loop(
                        0, n_bclusters,
                        make_cull(bclb_ref, bcls_ref, bbody), binit)
                else:
                    bt, bbi = jax.lax.fori_loop(
                        0, n_boxes // b_unroll, bbody, binit)
                carry = (bt, carry[1])

            def qbody(qi, carry):
                (bt, kind, ar, ag, ab, fz, io, nx, ny, nz) = carry[:10]
                # plane hit + planar-coords interior test (quad.rs:59-88)
                nqx = qtab_ref[qi, Q_NX]
                nqy = qtab_ref[qi, Q_NY]
                nqz = qtab_ref[qi, Q_NZ]
                denom = dx * nqx + dy * nqy + dz * nqz
                safe = jnp.where(jnp.abs(denom) < 1e-8, 1.0, denom)
                tq = (qtab_ref[qi, Q_DP]
                      - (ox * nqx + oy * nqy + oz * nqz)) / safe
                relx = ox + tq * dx - qtab_ref[qi, Q_QX]
                rely = oy + tq * dy - qtab_ref[qi, Q_QY]
                relz = oz + tq * dz - qtab_ref[qi, Q_QZ]
                ux = qtab_ref[qi, Q_UX]
                uy = qtab_ref[qi, Q_UY]
                uz = qtab_ref[qi, Q_UZ]
                vx = qtab_ref[qi, Q_VX]
                vy = qtab_ref[qi, Q_VY]
                vz = qtab_ref[qi, Q_VZ]
                wx = qtab_ref[qi, Q_WX]
                wy = qtab_ref[qi, Q_WY]
                wz = qtab_ref[qi, Q_WZ]
                # alpha = w . (rel x v); beta = w . (u x rel)
                alpha = (wx * (rely * vz - relz * vy)
                         + wy * (relz * vx - relx * vz)
                         + wz * (relx * vy - rely * vx))
                beta = (wx * (uy * relz - uz * rely)
                        + wy * (uz * relx - ux * relz)
                        + wz * (ux * rely - uy * relx))
                take = ((jnp.abs(denom) >= 1e-8)
                        & (tq > T_MIN) & (tq < T_MAX)
                        & (alpha >= 0.0) & (alpha <= 1.0)
                        & (beta >= 0.0) & (beta <= 1.0)
                        & (tq < bt))
                out = (
                    jnp.where(take, tq, bt),
                    jnp.where(take, qtab_ref[qi, Q_KIND], kind),
                    jnp.where(take, qtab_ref[qi, Q_AR], ar),
                    jnp.where(take, qtab_ref[qi, Q_AG], ag),
                    jnp.where(take, qtab_ref[qi, Q_AB], ab),
                    jnp.where(take, qtab_ref[qi, Q_FUZZ], fz),
                    jnp.where(take, qtab_ref[qi, Q_IOR], io),
                    jnp.where(take, nqx + zeros, nx),
                    jnp.where(take, nqy + zeros, ny),
                    jnp.where(take, nqz + zeros, nz),
                )
                if has_tex:
                    (tk, c2r, c2g, c2b, ivs) = carry[10:15]
                    out = out + (
                        jnp.where(take, qtab_ref[qi, Q_TEXK], tk),
                        jnp.where(take, qtab_ref[qi, Q_C2R], c2r),
                        jnp.where(take, qtab_ref[qi, Q_C2G], c2g),
                        jnp.where(take, qtab_ref[qi, Q_C2B], c2b),
                        jnp.where(take, qtab_ref[qi, Q_INVS], ivs),
                    )
                if has_image:
                    # a quad's (u, v) IS its planar-interior coordinate pair
                    # (quad.rs:84-86) — emit it directly
                    (img, uq, vq, isuv) = carry[15:19]
                    out = out + (
                        jnp.where(take, qtab_ref[qi, Q_IMG], img),
                        jnp.where(take, alpha, uq),
                        jnp.where(take, beta, vq),
                        jnp.where(take, 1.0, isuv),
                    )
                return out

            # one-time winner-attribute fetch (windowed slab gathers) — the
            # sphere loop carries only (best_t, best_idx)
            bt, bi = carry
            lane = bi & 127
            slab = bi >> 7
            shit = bi >= 0
            rows_ = list(range(10))
            na = 10
            if moving:
                rows_ += [na, na + 1, na + 2]
                na += 3
            if has_tex:
                rows_ += [na, na + 1, na + 2, na + 3, na + 4]
            if has_image:
                rows_ += [na + 5]
            got = fetch_attrs(rows_, lane, slab, shit)
            (kind, ar, ag, ab, fz, io, cxw, cyw, czw, invr) = got[:10]
            gi = 10
            if moving:
                cxw = cxw + tm * got[gi]
                cyw = cyw + tm * got[gi + 1]
                czw = czw + tm * got[gi + 2]
                gi += 3
            kind = jnp.where(shit, kind, 0.0)
            # outward normal = (p - c)/r = (bt*d - oc)/r
            nx = (bt * dx - (cxw - ox)) * invr
            ny = (bt * dy - (cyw - oy)) * invr
            nz = (bt * dz - (czw - oz)) * invr
            nx = jnp.where(shit, nx, 0.0)
            ny = jnp.where(shit, ny, 0.0)
            nz = jnp.where(shit, nz, 1.0)
            carry = (bt, kind, ar, ag, ab, fz, io, nx, ny, nz)
            if has_tex:
                tk = jnp.where(shit, got[gi], 0.0)
                c2r, c2g, c2b, ivs = got[gi + 1:gi + 5]
                gi += 5
                carry = carry + (tk, c2r, c2g, c2b, ivs)
            if has_image:
                # image-winner block (img id, u, v, is_uv): spheres leave
                # is_uv = 0 (XLA derives UV from the emitted normal — no
                # acos/atan2 in Mosaic); quad/box winners overwrite it below
                # with their DIRECT planar/face (u, v) (quad.rs:59-88 alpha/
                # beta; make_box face frames quad.rs:90-113)
                img_w = jnp.where(shit, got[gi], 0.0)
                carry = carry + (img_w, zeros, zeros, zeros)

            if n_boxes:
                # box-winner attributes + face normal: refetch lo/hi through
                # the batab slab gathers, recompute the winning slab axis
                (bt2, kind, ar, ag, ab, fz, io, nx, ny, nz) = carry[:10]
                bwon = bbi >= 0
                blane = bbi & 127
                bslab = bbi >> 7
                brows = list(range(17 if has_tex else 12))
                bgot = fetch_batts(brows, blane, bslab, bwon)
                (bkind, bar, bag, bab, bfz, bio,
                 blox, bloy, bloz, bhix, bhiy, bhiz) = bgot[:12]
                tx1 = (blox - ox) * ivx
                tx2 = (bhix - ox) * ivx
                ty1 = (bloy - oy) * ivy
                ty2 = (bhiy - oy) * ivy
                tz1 = (bloz - oz) * ivz
                tz2 = (bhiz - oz) * ivz
                txn = jnp.minimum(tx1, tx2)
                txf = jnp.maximum(tx1, tx2)
                tyn = jnp.minimum(ty1, ty2)
                tyf = jnp.maximum(ty1, ty2)
                tzn = jnp.minimum(tz1, tz2)
                tzf = jnp.maximum(tz1, tz2)
                t1b = jnp.maximum(jnp.maximum(txn, tyn), tzn)
                entry = (t1b > T_MIN) & (t1b < T_MAX)
                # face axis: entry -> argmax of slab entries; exit (origin
                # inside the box) -> argmin of slab exits; outward sign from
                # the ray direction, matching the quad expansion's normals
                ex_ = (txn >= tyn) & (txn >= tzn)
                ey_ = (~ex_) & (tyn >= tzn)
                xx_ = (txf <= tyf) & (txf <= tzf)
                xy_ = (~xx_) & (tyf <= tzf)
                usex = (entry & ex_) | (~entry & xx_)
                usey = (entry & ey_) | (~entry & xy_)
                s_e = jnp.where(entry, -1.0, 1.0)
                bnx = jnp.where(usex,
                                s_e * jnp.where(dx >= 0.0, 1.0, -1.0), 0.0)
                bny = jnp.where(usey,
                                s_e * jnp.where(dy >= 0.0, 1.0, -1.0), 0.0)
                bnz = jnp.where(usex | usey, 0.0,
                                s_e * jnp.where(dz >= 0.0, 1.0, -1.0))
                out = (bt2,
                       jnp.where(bwon, bkind, kind),
                       jnp.where(bwon, bar, ar),
                       jnp.where(bwon, bag, ag),
                       jnp.where(bwon, bab, ab),
                       jnp.where(bwon, bfz, fz),
                       jnp.where(bwon, bio, io),
                       jnp.where(bwon, bnx, nx),
                       jnp.where(bwon, bny, ny),
                       jnp.where(bwon, bnz, nz))
                if has_tex:
                    (tk, c2r, c2g, c2b, ivs) = carry[10:15]
                    btk, bc2r, bc2g, bc2b, bivs = bgot[12:17]
                    out = out + (jnp.where(bwon, btk, tk),
                                 jnp.where(bwon, bc2r, c2r),
                                 jnp.where(bwon, bc2g, c2g),
                                 jnp.where(bwon, bc2b, c2b),
                                 jnp.where(bwon, bivs, ivs))
                if has_image:
                    # pass-through: a box primitive can never carry an image
                    # texture (SceneBuilder.add_box bakes image-textured
                    # boxes to 6 quads for UV support), and a box winner's
                    # tk is never TEX_IMAGE, so the pend gate stays off
                    out = out + tuple(carry[15:19])
                carry = out

            if n_quads and n_qclusters > 1:
                # SAH-culled quad scan (cluster_quad_table): metadata rows
                # [n_quads + ci] of the SAME table carry [lo3, hi3, start,
                # end]; descend only when any lane hits the box closer
                # than its best t — the quad analog of make_cull
                def qcull(ci, qcarry):
                    bt0 = qcarry[0]
                    row = n_quads + ci
                    tx1 = (qtab_ref[row, 0] - ox) * ivx
                    tx2 = (qtab_ref[row, 3] - ox) * ivx
                    ty1 = (qtab_ref[row, 1] - oy) * ivy
                    ty2 = (qtab_ref[row, 4] - oy) * ivy
                    tz1 = (qtab_ref[row, 2] - oz) * ivz
                    tz2 = (qtab_ref[row, 5] - oz) * ivz
                    t1 = jnp.maximum(
                        jnp.maximum(jnp.minimum(tx1, tx2),
                                    jnp.minimum(ty1, ty2)),
                        jnp.minimum(tz1, tz2))
                    t2 = jnp.minimum(
                        jnp.minimum(jnp.maximum(tx1, tx2),
                                    jnp.maximum(ty1, ty2)),
                        jnp.maximum(tz1, tz2))
                    hit_box = (t1 <= t2) & (t2 > T_MIN) & (t1 < bt0)
                    any_hit = jnp.max(jnp.where(hit_box, 1.0, 0.0)) > 0.0
                    lo_q = qtab_ref[row, 6].astype(jnp.int32)
                    hi_q = qtab_ref[row, 7].astype(jnp.int32)
                    return jax.lax.cond(
                        any_hit,
                        lambda c: jax.lax.fori_loop(lo_q, hi_q, qbody, c),
                        lambda c: c,
                        qcarry,
                    )

                carry = jax.lax.fori_loop(0, n_qclusters, qcull, carry)
            elif n_quads:
                carry = jax.lax.fori_loop(0, n_quads, qbody, carry)

            # constant media: stochastic free-flight through boundary
            # intervals, each clipped by the RUNNING closest hit, mirroring
            # the ordered list scan (constant_medium.rs:40-79,
            # hittable_list.rs:42-54).  Python loop: media counts are tiny.
            for m in range(n_media):
                (bt, kind, ar, ag, ab, fz, io, nx, ny, nz) = carry[:10]
                # medium KIND is static per scene (media_kinds from
                # pack_media_table order), so each medium evaluates ONLY its
                # own boundary test — book2_final's r=5000 whole-scene mist
                # paid the oriented-box transform + slab test for nothing on
                # every bounce before this specialization
                km_static = media_kinds[m] if media_kinds else None
                if km_static != 1:
                    # --- sphere boundary roots over (-inf, inf)
                    ocx = mtab_ref[m, M_CX] - ox
                    ocy = mtab_ref[m, M_CY] - oy
                    ocz = mtab_ref[m, M_CZ] - oz
                    hh = dx * ocx + dy * ocy + dz * ocz
                    cc = (ocx * ocx + ocy * ocy + ocz * ocz
                          - mtab_ref[m, M_R2])
                    disc = hh * hh - a * cc
                    sqd = jnp.sqrt(jnp.maximum(disc, 0.0))
                    s_t1 = (hh - sqd) * inv_a
                    s_t2 = (hh + sqd) * inv_a
                    s_ok = disc > 0.0
                if km_static != 0:
                    # --- oriented-box boundary (world->local: offset+rot -th)
                    cth = mtab_ref[m, M_COS]
                    sth = mtab_ref[m, M_SIN]
                    rox = ox - mtab_ref[m, M_CX]
                    roz = oz - mtab_ref[m, M_CZ]
                    lox_ = cth * rox - sth * roz
                    loy_ = oy - mtab_ref[m, M_CY]
                    loz_ = sth * rox + cth * roz
                    ldx_ = cth * dx - sth * dz
                    ldy_ = dy
                    ldz_ = sth * dx + cth * dz
                    def sinv(dv):
                        sg = jnp.where(dv < 0.0, -1e-20, 1e-20)
                        return 1.0 / jnp.where(jnp.abs(dv) < 1e-20, sg, dv)
                    ivx_ = sinv(ldx_)
                    ivy_ = sinv(ldy_)
                    ivz_ = sinv(ldz_)
                    tx1 = (mtab_ref[m, M_LOX] - lox_) * ivx_
                    tx2 = (mtab_ref[m, M_HIX] - lox_) * ivx_
                    ty1 = (mtab_ref[m, M_LOY] - loy_) * ivy_
                    ty2 = (mtab_ref[m, M_HIY] - loy_) * ivy_
                    tz1 = (mtab_ref[m, M_LOZ] - loz_) * ivz_
                    tz2 = (mtab_ref[m, M_HIZ] - loz_) * ivz_
                    b_t1 = jnp.maximum(jnp.maximum(jnp.minimum(tx1, tx2),
                                                   jnp.minimum(ty1, ty2)),
                                       jnp.minimum(tz1, tz2))
                    b_t2 = jnp.minimum(jnp.minimum(jnp.maximum(tx1, tx2),
                                                   jnp.maximum(ty1, ty2)),
                                       jnp.maximum(tz1, tz2))
                    b_ok = b_t1 < b_t2

                if km_static == 0:
                    t1, t2, in_ok = s_t1, s_t2, s_ok
                elif km_static == 1:
                    t1, t2, in_ok = b_t1, b_t2, b_ok
                else:
                    is_box = mtab_ref[m, M_KIND] > 0.5
                    t1 = jnp.where(is_box, b_t1, s_t1)
                    t2 = jnp.where(is_box, b_t2, s_t2)
                    # logical combine, not select: Mosaic cannot legalize
                    # arith.select on i1 vectors
                    in_ok = (b_ok & is_box) | (s_ok & ~is_box)

                t1c = jnp.maximum(t1, T_MIN)
                t2c = jnp.minimum(t2, bt)
                ok = in_ok & (t1c < t2c)
                t1c = jnp.maximum(t1c, 0.0)
                inv_len_m = jax.lax.rsqrt(a)
                dlen = a * inv_len_m  # |d|
                dist_inside = (t2c - t1c) * dlen
                um = _uniform(shape)
                hitd = mtab_ref[m, M_NID] * jnp.log(jnp.maximum(um, 1e-12))
                ok = ok & (hitd <= dist_inside)
                t_med = t1c + hitd * inv_len_m
                take = ok & (t_med < bt)
                out = (
                    jnp.where(take, t_med, bt),
                    jnp.where(take, float(ISOTROPIC), kind),
                    jnp.where(take, mtab_ref[m, M_AR], ar),
                    jnp.where(take, mtab_ref[m, M_AG], ag),
                    jnp.where(take, mtab_ref[m, M_AB], ab),
                    fz, io,
                    jnp.where(take, 1.0, nx),
                    jnp.where(take, 0.0, ny),
                    jnp.where(take, 0.0, nz),
                )
                if has_tex:
                    (tk, c2r, c2g, c2b, ivs) = carry[10:15]
                    # a medium winner is always solid-isotropic: tk -> 0
                    # gates the pend-record emission off for it, so the img
                    # block passes through untouched
                    out = out + (jnp.where(take, 0.0, tk), c2r, c2g, c2b,
                                 ivs) + tuple(carry[15:])
                carry = out
            return carry

        def bounce_body(state):
            (b, tm, ox, oy, oz, dx, dy, dz, ax, ay, az, rx, ry, rz,
             alive) = state
            a = dx * dx + dy * dy + dz * dz
            inv_a = 1.0 / a
            hitres = intersect(tm, ox, oy, oz, dx, dy, dz, a, inv_a)
            (t, kind, car, cag, cab, fz, io, owx, owy, owz) = hitres[:10]
            hit = t < _BIG

            # background on miss (renderer.wgsl:233-239)
            inv_len = jax.lax.rsqrt(a)
            if sky_bg:
                sa = 0.5 * (dy * inv_len + 1.0)
                bgr = (1.0 - sa) + sa * 0.5
                bgg = (1.0 - sa) + sa * 0.7
                bgb = (1.0 - sa) + sa * 1.0
            else:
                bgr = bg_ref[0]
                bgg = bg_ref[1]
                bgb = bg_ref[2]
            missf = alive * jnp.where(hit, 0.0, 1.0)
            rx = rx + missf * ax * bgr
            ry = ry + missf * ay * bgg
            rz = rz + missf * az * bgb

            alive = alive * jnp.where(hit, 1.0, 0.0)
            px_ = ox + t * dx
            py_ = oy + t * dy
            pz_ = oz + t * dz

            if has_tex:
                (tk, c2r, c2g, c2b, ivs) = hitres[10:15]
            if has_image:
                (img_w, uq_w, vq_w, isuv_w) = hitres[15:19]
            if has_checker:
                # 3-D lattice parity (texture.rs:63-77): odd cells take c2
                csum = (jnp.floor(ivs * px_).astype(jnp.int32)
                        + jnp.floor(ivs * py_).astype(jnp.int32)
                        + jnp.floor(ivs * pz_).astype(jnp.int32))
                odd = (csum % 2) != 0
                use2 = (tk == 1.0) & odd  # TEX_CHECKER
                car = jnp.where(use2, c2r, car)
                cag = jnp.where(use2, c2g, cag)
                cab = jnp.where(use2, c2b, cab)
            if has_noise:
                # marble: 0.5*(1 + sin(scale*z + 10*turb(p,7)))
                # (texture.rs:122-126; turbulence perlin.rs:50-62; lattice
                # noise perlin.rs:25-98 with the exact 256-entry tables,
                # gathered as lo/hi 128-lane halves).  The whole turbulence
                # evaluation (7 octaves x ~38 dual-slab gathers) is gated
                # whole-tile on "any winner is TEX_NOISE": scenes where
                # marble is one object among many (book2_final's single
                # perlin sphere) would otherwise pay ~500 gathers per bounce
                # on every tile, marble or not.
                def g6(row, idx):
                    lo = jnp.take_along_axis(
                        jnp.broadcast_to(ptab_ref[2 * row:2 * row + 1, :],
                                         shape), idx & 127, axis=1)
                    hi = jnp.take_along_axis(
                        jnp.broadcast_to(ptab_ref[2 * row + 1:2 * row + 2, :],
                                         shape), idx & 127, axis=1)
                    return jnp.where(idx < 128, lo, hi)

                def gv6(row, idx):
                    lo = jnp.take_along_axis(
                        jnp.broadcast_to(vtab_ref[2 * row:2 * row + 1, :],
                                         shape), idx & 127, axis=1)
                    hi = jnp.take_along_axis(
                        jnp.broadcast_to(vtab_ref[2 * row + 1:2 * row + 2, :],
                                         shape), idx & 127, axis=1)
                    return jnp.where(idx < 128, lo, hi)

                def noise_at(qx, qy, qz):
                    fxq = jnp.floor(qx)
                    fyq = jnp.floor(qy)
                    fzq = jnp.floor(qz)
                    uxq = qx - fxq
                    uyq = qy - fyq
                    uzq = qz - fzq
                    iq = fxq.astype(jnp.int32)
                    jq = fyq.astype(jnp.int32)
                    kq = fzq.astype(jnp.int32)
                    sxq = uxq * uxq * (3.0 - 2.0 * uxq)
                    syq = uyq * uyq * (3.0 - 2.0 * uyq)
                    szq = uzq * uzq * (3.0 - 2.0 * uzq)
                    acc = zeros
                    for di in range(2):
                        pi = g6(0, (iq + di) & 255)
                        wxf = sxq if di else (1.0 - sxq)
                        for dj in range(2):
                            pj = g6(1, (jq + dj) & 255)
                            wyf = syq if dj else (1.0 - syq)
                            for dk in range(2):
                                pk = g6(2, (kq + dk) & 255)
                                idxc = pi ^ pj ^ pk
                                cxn = gv6(0, idxc)
                                cyn = gv6(1, idxc)
                                czn = gv6(2, idxc)
                                dot = (cxn * (uxq - di) + cyn * (uyq - dj)
                                       + czn * (uzq - dk))
                                wzf = szq if dk else (1.0 - szq)
                                acc = acc + wxf * wyf * wzf * dot
                    return acc

                isn = tk == 3.0  # TEX_NOISE

                def _marble(albs):
                    car_, cag_, cab_ = albs
                    tacc = zeros
                    wgt = 1.0
                    qx, qy, qz = px_, py_, pz_
                    for _ in range(7):
                        tacc = tacc + wgt * noise_at(qx, qy, qz)
                        wgt *= 0.5
                        qx, qy, qz = qx * 2.0, qy * 2.0, qz * 2.0
                    turbv = jnp.abs(tacc)
                    marble = 0.5 * (1.0 + jnp.sin(ivs * pz_ + 10.0 * turbv))
                    return (jnp.where(isn, marble, car_),
                            jnp.where(isn, marble, cag_),
                            jnp.where(isn, marble, cab_))

                car, cag, cab = jax.lax.cond(
                    jnp.max(jnp.where(isn, 1.0, 0.0)) > 0.0,
                    _marble, lambda albs: albs, (car, cag, cab))

            if has_image and dma_texels:
                # ---- IN-KERNEL TEXEL RESOLVE (round 3) ----
                # When a tile-bounce has only a few image-texture winners
                # (the common case in image-SPARSE scenes like book2_final:
                # the globe is 1 of ~1800 primitives), resolve them HERE by
                # DMA-ing each winner's texel block from the HBM image table
                # serially — no freeze, no extra launch.  Dense tiles
                # (> dma_thresh flagged) fall through to the freeze/pend
                # protocol below.  UV comes from the polynomial atan2/acos
                # for spheres (no Mosaic lowering exists) and the direct
                # planar coords for quads; the fetch reproduces
                # texture.rs:89-109 nearest-texel semantics exactly.
                is_img_t = tk == 2.0
                flagged0 = (alive > 0.0) & is_img_t
                fmask0 = jnp.where(flagged0, 1.0, 0.0)
                cntf = jnp.sum(fmask0)
                lin_idx = (
                    jax.lax.broadcasted_iota(jnp.int32, shape, 0)
                    * TILE_LANES
                    + jax.lax.broadcasted_iota(jnp.int32, shape, 1))

                def _serial_resolve(args):
                    car_, cag_, cab_, tk_ = args
                    inv_2pi = 0.15915494309189535
                    u_sph = (atan2_poly(-owz, owx)
                             + 3.141592653589793) * inv_2pi
                    v_sph = acos_poly(-owy) * inv_pi
                    uu = jnp.where(isuv_w > 0.0, uq_w, u_sph)
                    vv = jnp.where(isuv_w > 0.0, vq_w, v_sph)
                    w_l = jnp.full(shape, 1.0)
                    h_l = jnp.full(shape, 1.0)
                    b_l = zeros
                    for k, (bk, wk, hk) in enumerate(dma_meta):
                        selk = img_w == float(k)
                        w_l = jnp.where(selk, float(wk), w_l)
                        h_l = jnp.where(selk, float(hk), h_l)
                        b_l = jnp.where(selk, float(bk), b_l)
                    uc = jnp.clip(uu, 0.0, 1.0)
                    vc = 1.0 - jnp.clip(vv, 0.0, 1.0)
                    i_t = jnp.minimum((uc * w_l).astype(jnp.int32),
                                      w_l.astype(jnp.int32) - 1)
                    j_t = jnp.minimum((vc * h_l).astype(jnp.int32),
                                      h_l.astype(jnp.int32) - 1)
                    T = (b_l.astype(jnp.int32)
                         + j_t * w_l.astype(jnp.int32) + i_t)
                    r8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
                    l8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)

                    def rcond(c):
                        return jnp.max(c[0]) > 0.0

                    def rbody(c):
                        f, cr, cg, cb = c
                        tgt = jnp.max(jnp.where(f > 0.0, lin_idx, -1))
                        sel_t = lin_idx == tgt
                        tt = jnp.max(jnp.where(sel_t, T, 0))
                        off = tt * 4
                        row = off // 128
                        brow = (row // 8) * 8
                        dma = pltpu.make_async_copy(
                            img_ref.at[pl.ds(brow, 8), :],
                            tex_scratch, tex_sem)
                        dma.start()
                        dma.wait()
                        sc = tex_scratch[...]
                        pick = r8 == (row - brow)
                        lane0 = off % 128
                        tr = jnp.max(jnp.where(pick & (l8 == lane0),
                                               sc, -_BIG))
                        tg = jnp.max(jnp.where(pick & (l8 == lane0 + 1),
                                               sc, -_BIG))
                        tb = jnp.max(jnp.where(pick & (l8 == lane0 + 2),
                                               sc, -_BIG))
                        return (f * jnp.where(sel_t, 0.0, 1.0),
                                jnp.where(sel_t, tr, cr),
                                jnp.where(sel_t, tg, cg),
                                jnp.where(sel_t, tb, cb))

                    _, car_, cag_, cab_ = jax.lax.while_loop(
                        rcond, rbody, (fmask0, car_, cag_, cab_))
                    # resolved winners behave like solids from here on: the
                    # freeze/pend path below keys on tk == TEX_IMAGE
                    tk_ = jnp.where(flagged0, 0.0, tk_)
                    return car_, cag_, cab_, tk_

                car, cag, cab, tk = jax.lax.cond(
                    (cntf > 0.0) & (cntf <= float(dma_thresh)),
                    _serial_resolve, lambda a: a, (car, cag, cab, tk))

            d_dot_ow = dx * owx + dy * owy + dz * owz
            front = d_dot_ow < 0.0
            sgn = jnp.where(front, 1.0, -1.0)
            nx = sgn * owx
            ny = sgn * owy
            nz = sgn * owz

            # emission (DiffuseLight adds, then dies); book 3 gates on
            # front_face (the_rest_of_your_life/material.rs:154-161)
            is_light = kind == float(DIFFUSE_LIGHT)
            emit_gate = is_light & front if mis else is_light
            if has_image:
                # texel values are unknown in-kernel: image-textured LIGHTS
                # defer their emission add; image-textured ALBEDOS scatter
                # with unit albedo and defer the multiply. Both resolve in
                # XLA between segments (pallas_wavefront.py). RR below then
                # sees the running product WITHOUT pending texel factors —
                # a different (but consistent: the same p divides) survival
                # probability, so the estimator stays unbiased.
                is_img = tk == 2.0  # TEX_IMAGE
                pend_alb = (alive > 0.0) & is_img & ~is_light
                pend_emit = (alive > 0.0) & is_img & emit_gate
                # SPHERE winners: the pending record carries the PRE-FLIP
                # outward normal (sphere.rs:47-53) — the acos/atan2 of the
                # sphere UV mapping have no Mosaic lowering, so XLA derives
                # (u, v) from it during the texel resolve.  QUAD/BOX winners
                # (is_uv = 1): the record carries the DIRECT (u, v) the
                # kernel already computed, and the flag gains _UV_FLAG
                # (texture.rs:89-109 takes (u, v) as given for those).
                direct = isuv_w > 0.0
                pend_nx = jnp.where(direct, uq_w, owx)
                pend_ny = jnp.where(direct, vq_w, owy)
                pend_nz = jnp.where(direct, 0.0, owz)
                code = img_w + 1.0 + _UV_FLAG * isuv_w
                pend_flag = jnp.where(pend_alb, code,
                                      jnp.where(pend_emit, -code, 0.0))
                lf = alive * jnp.where(emit_gate & ~is_img, 1.0, 0.0)
                car = jnp.where(is_img, 1.0, car)
                cag = jnp.where(is_img, 1.0, cag)
                cab = jnp.where(is_img, 1.0, cab)
            else:
                lf = alive * jnp.where(emit_gate, 1.0, 0.0)
            rx = rx + lf * ax * car
            ry = ry + lf * ay * cag
            rz = rz + lf * az * cab
            alive = alive * jnp.where(is_light, 0.0, 1.0)

            u1 = _uniform(shape)
            u2 = _uniform(shape)
            u3 = _uniform(shape)
            u4 = _uniform(shape)

            # shared random unit vector (renderer.wgsl:78-83)
            rz_ = u2 * 2.0 - 1.0
            rr_ = jnp.sqrt(jnp.maximum(0.0, 1.0 - rz_ * rz_))
            phi = u1 * _TWO_PI
            rvx = rr_ * jnp.cos(phi)
            rvy = rr_ * jnp.sin(phi)
            rvz = rz_

            # lambertian: n + ruv with degenerate guard
            lx = nx + rvx
            ly = ny + rvy
            lz = nz + rvz
            near0 = (lx * lx + ly * ly + lz * lz) < 1e-16
            lx = jnp.where(near0, nx, lx)
            ly = jnp.where(near0, ny, ly)
            lz = jnp.where(near0, nz, lz)

            # metal: reflect(unit d, n) + fuzz*ruv
            ux = dx * inv_len
            uy = dy * inv_len
            uz = dz * inv_len
            udn = ux * nx + uy * ny + uz * nz
            mx = ux - 2.0 * udn * nx + fz * rvx
            my = uy - 2.0 * udn * ny + fz * rvy
            mz = uz - 2.0 * udn * nz + fz * rvz
            met_ok = (mx * nx + my * ny + mz * nz) > 0.0

            # dielectric
            ri = jnp.where(front, 1.0 / io, io)
            cos_t = jnp.minimum(-udn, 1.0)
            sin2 = jnp.maximum(0.0, 1.0 - cos_t * cos_t)
            cannot = ri * ri * sin2 > 1.0
            r0 = (1.0 - ri) / (1.0 + ri)
            r0 = r0 * r0
            one_m = 1.0 - cos_t
            om2 = one_m * one_m
            schl = r0 + (1.0 - r0) * om2 * om2 * one_m
            refl_choice = cannot | (schl > u3)
            # refract (renderer.wgsl:95-100)
            ppx = ri * (ux + cos_t * nx)
            ppy = ri * (uy + cos_t * ny)
            ppz = ri * (uz + cos_t * nz)
            pp2 = ppx * ppx + ppy * ppy + ppz * ppz
            par = -jnp.sqrt(jnp.maximum(jnp.abs(1.0 - pp2), 1e-12))
            fx = ppx + par * nx
            fy = ppy + par * ny
            fz_ = ppz + par * nz
            gx = ux - 2.0 * udn * nx
            gy = uy - 2.0 * udn * ny
            gz = uz - 2.0 * udn * nz
            ex = jnp.where(refl_choice, gx, fx)
            ey = jnp.where(refl_choice, gy, fy)
            ez = jnp.where(refl_choice, gz, fz_)

            is_lam = kind == float(LAMBERTIAN)
            is_met = kind == float(METAL)
            is_die = kind == float(DIELECTRIC)

            is_iso = kind == float(ISOTROPIC)

            if not mis:
                # isotropic media scatter uniformly: the shared random unit
                # vector (the_next_week/material.rs Isotropic)
                ndx = jnp.where(is_met, mx, jnp.where(is_die, ex,
                                jnp.where(is_iso, rvx, lx)))
                ndy = jnp.where(is_met, my, jnp.where(is_die, ey,
                                jnp.where(is_iso, rvy, ly)))
                ndz = jnp.where(is_met, mz, jnp.where(is_die, ez,
                                jnp.where(is_iso, rvz, lz)))

                atr = jnp.where(is_die, 1.0, car)
                atg = jnp.where(is_die, 1.0, cag)
                atb = jnp.where(is_die, 1.0, cab)

                alive = alive * jnp.where(is_met & ~met_ok, 0.0, 1.0)
                live = alive > 0.0
                ax = ax * jnp.where(live, atr, 1.0)
                ay = ay * jnp.where(live, atg, 1.0)
                az = az * jnp.where(live, atb, 1.0)

                # Russian roulette (renderer.wgsl:225-231)
                if max_depth > RR_START_BOUNCE:
                    do_rr = b >= RR_START_BOUNCE
                    pmax = jnp.maximum(ax, jnp.maximum(ay, az))
                    p = jnp.clip(pmax, RR_P_MIN, RR_P_MAX)
                    survive = u4 <= p
                    if_rr_killed = do_rr & ~survive
                    alive = alive * jnp.where(if_rr_killed, 0.0, 1.0)
                    scale = jnp.where(do_rr & (alive > 0.0), 1.0 / p, 1.0)
                    ax = ax * scale
                    ay = ay * scale
                    az = az * scale
            else:
                # ---- book-3 NEE/MIS estimator in-kernel
                #      (the_rest_of_your_life/camera.rs:184-254) ----
                # RR from the PER-HIT attenuation, folded into both branches'
                # denominators (camera.rs:223-237)
                if max_depth > RR_START_BOUNCE:
                    do_rr = b >= RR_START_BOUNCE
                    pmax = jnp.maximum(car, jnp.maximum(cag, cab))
                    prr = jnp.clip(pmax, RR_P_MIN, RR_P_MAX)
                    rr_prob = jnp.where(do_rr, prr, 1.0)
                    alive = alive * jnp.where(do_rr & (u4 > prr), 0.0, 1.0)
                else:
                    rr_prob = ones

                spec = is_met | is_die
                sdx = jnp.where(is_met, mx, ex)
                sdy = jnp.where(is_met, my, ey)
                sdz = jnp.where(is_met, mz, ez)
                inv_rr = 1.0 / rr_prob
                swr = jnp.where(is_die, 1.0, car) * inv_rr
                swg = jnp.where(is_die, 1.0, cag) * inv_rr
                swb = jnp.where(is_die, 1.0, cab) * inv_rr

                u5 = _uniform(shape)
                u6 = _uniform(shape)
                u7 = _uniform(shape)
                u8 = _uniform(shape)
                u9 = _uniform(shape)
                u10 = _uniform(shape)

                def onb(wx, wy, wz):
                    # onb.rs:8-18 branchless: helper axis by |w.x| > 0.9
                    big = jnp.abs(wx) > 0.9
                    hx = jnp.where(big, 0.0, 1.0)
                    hy = jnp.where(big, 1.0, 0.0)
                    # v = normalize(cross(w, h)), h = (hx, hy, 0)
                    cx_ = -wz * hy
                    cy_ = wz * hx
                    cz_ = wx * hy - wy * hx
                    inv = jax.lax.rsqrt(
                        jnp.maximum(cx_ * cx_ + cy_ * cy_ + cz_ * cz_, 1e-30))
                    vx_, vy_, vz_ = cx_ * inv, cy_ * inv, cz_ * inv
                    # u = cross(w, v)
                    ux_ = wy * vz_ - wz * vy_
                    uy_ = wz * vx_ - wx * vz_
                    uz_ = wx * vy_ - wy * vx_
                    return ux_, uy_, uz_, vx_, vy_, vz_

                # cosine-weighted material direction (vec3.rs:212-221)
                bu_x, bu_y, bu_z, bv_x, bv_y, bv_z = onb(nx, ny, nz)
                phi2 = _TWO_PI * u5
                sq6 = jnp.sqrt(u6)
                cl_x = jnp.cos(phi2) * sq6
                cl_y = jnp.sin(phi2) * sq6
                cl_z = jnp.sqrt(jnp.maximum(0.0, 1.0 - u6))
                mdx = cl_x * bu_x + cl_y * bv_x + cl_z * nx
                mdy = cl_x * bu_y + cl_y * bv_y + cl_z * ny
                mdz = cl_x * bu_z + cl_y * bv_z + cl_z * nz
                # isotropic lanes (medium scatter events / Isotropic
                # materials) draw the SpherePdf uniform direction instead
                # (the_rest_of_your_life/material.rs:177-190, pdf.rs:19-29;
                # same u5/u6 draws, uniform-sphere mapping — the XLA
                # estimator's iso_dir analog, integrator.py trace_mis)
                z_i = u6 * 2.0 - 1.0
                r_i = jnp.sqrt(jnp.maximum(0.0, 1.0 - z_i * z_i))
                mdx = jnp.where(is_iso, jnp.cos(phi2) * r_i, mdx)
                mdy = jnp.where(is_iso, jnp.sin(phi2) * r_i, mdy)
                mdz = jnp.where(is_iso, z_i, mdz)

                # per-light sampled directions (HittableList::random,
                # hittable_list.rs:71-75)
                ldirs = []
                for l in range(n_lights):
                    kl = ltab_ref[l, L_KIND]
                    qdx = (ltab_ref[l, L_QX] + u7 * ltab_ref[l, L_UX]
                           + u8 * ltab_ref[l, L_VX] - px_)
                    qdy = (ltab_ref[l, L_QY] + u7 * ltab_ref[l, L_UY]
                           + u8 * ltab_ref[l, L_VY] - py_)
                    qdz = (ltab_ref[l, L_QZ] + u7 * ltab_ref[l, L_UZ]
                           + u8 * ltab_ref[l, L_VZ] - pz_)
                    # sphere cone sample (sphere.rs:55-65)
                    tcx = ltab_ref[l, L_CX] - px_
                    tcy = ltab_ref[l, L_CY] - py_
                    tcz = ltab_ref[l, L_CZ] - pz_
                    d2 = jnp.maximum(tcx * tcx + tcy * tcy + tcz * tcz, 1e-30)
                    rl = ltab_ref[l, L_RAD]
                    cmax = jnp.sqrt(jnp.maximum(0.0, 1.0 - rl * rl / d2))
                    zc = 1.0 + u8 * (cmax - 1.0)
                    phl = _TWO_PI * u7
                    sc = jnp.sqrt(jnp.maximum(0.0, 1.0 - zc * zc))
                    idl = jax.lax.rsqrt(d2)
                    w2x, w2y, w2z = tcx * idl, tcy * idl, tcz * idl
                    s_ux, s_uy, s_uz, s_vx, s_vy, s_vz = onb(w2x, w2y, w2z)
                    csl = jnp.cos(phl) * sc
                    snl = jnp.sin(phl) * sc
                    sdx_l = csl * s_ux + snl * s_vx + zc * w2x
                    sdy_l = csl * s_uy + snl * s_vy + zc * w2y
                    sdz_l = csl * s_uz + snl * s_vz + zc * w2z
                    is_q = kl < 0.5
                    ldirs.append((jnp.where(is_q, qdx, sdx_l),
                                  jnp.where(is_q, qdy, sdy_l),
                                  jnp.where(is_q, qdz, sdz_l)))
                ldx, ldy, ldz = ldirs[0]
                for l in range(1, n_lights):
                    pickl = u9 * n_lights >= l
                    ldx = jnp.where(pickl, ldirs[l][0], ldx)
                    ldy = jnp.where(pickl, ldirs[l][1], ldy)
                    ldz = jnp.where(pickl, ldirs[l][2], ldz)

                # 50/50 mixture (MixturePdf::generate, pdf.rs:93-99)
                use_l = u10 < 0.5
                gdx = jnp.where(use_l, ldx, mdx)
                gdy = jnp.where(use_l, ldy, mdy)
                gdz = jnp.where(use_l, ldz, mdz)
                g2 = jnp.maximum(gdx * gdx + gdy * gdy + gdz * gdz, 1e-30)
                ginv = jax.lax.rsqrt(g2)
                cos_th = (nx * gdx + ny * gdy + nz * gdz) * ginv
                cpdf = jnp.maximum(cos_th, 0.0) * inv_pi  # pdf.rs:41-49
                # isotropic: uniform-sphere pdf 1/4π for BOTH the mixture
                # density and the scattering_pdf (material.rs:187-189) —
                # mat_pdf == scattering_pdf, exactly as the XLA estimator
                cpdf = jnp.where(is_iso, 0.25 * inv_pi, cpdf)

                # mixture pdf value: mean over lights of pdf(dir)
                # (hittable_list.rs:60-69)
                lp = zeros
                for l in range(n_lights):
                    kl = ltab_ref[l, L_KIND]
                    # quad area pdf (quad.rs:92-102)
                    dn = (ltab_ref[l, L_NX] * gdx + ltab_ref[l, L_NY] * gdy
                          + ltab_ref[l, L_NZ] * gdz)
                    safe = jnp.where(jnp.abs(dn) < 1e-8, 1.0, dn)
                    ndp = (ltab_ref[l, L_NX] * px_ + ltab_ref[l, L_NY] * py_
                           + ltab_ref[l, L_NZ] * pz_)
                    tq = (ltab_ref[l, L_DP] - ndp) / safe
                    hx_ = px_ + tq * gdx - ltab_ref[l, L_QX]
                    hy_ = py_ + tq * gdy - ltab_ref[l, L_QY]
                    hz_ = pz_ + tq * gdz - ltab_ref[l, L_QZ]
                    lux, luy, luz = (ltab_ref[l, L_UX], ltab_ref[l, L_UY],
                                     ltab_ref[l, L_UZ])
                    lvx, lvy, lvz = (ltab_ref[l, L_VX], ltab_ref[l, L_VY],
                                     ltab_ref[l, L_VZ])
                    lwx, lwy, lwz = (ltab_ref[l, L_WX], ltab_ref[l, L_WY],
                                     ltab_ref[l, L_WZ])
                    alp = (lwx * (hy_ * lvz - hz_ * lvy)
                           + lwy * (hz_ * lvx - hx_ * lvz)
                           + lwz * (hx_ * lvy - hy_ * lvx))
                    bet = (lwx * (luy * hz_ - luz * hy_)
                           + lwy * (luz * hx_ - lux * hz_)
                           + lwz * (lux * hy_ - luy * hx_))
                    okq = ((jnp.abs(dn) >= 1e-8) & (tq > T_MIN) & (tq < T_MAX)
                           & (alp >= 0.0) & (alp <= 1.0)
                           & (bet >= 0.0) & (bet <= 1.0))
                    cosq = jnp.abs(dn) * ginv
                    pdfq = jnp.where(
                        okq,
                        tq * tq * g2 / jnp.maximum(
                            cosq * ltab_ref[l, L_AREA], 1e-30),
                        0.0)
                    # sphere solid-angle pdf (sphere.rs:102-115)
                    ocx2 = ltab_ref[l, L_CX] - px_
                    ocy2 = ltab_ref[l, L_CY] - py_
                    ocz2 = ltab_ref[l, L_CZ] - pz_
                    hq = gdx * ocx2 + gdy * ocy2 + gdz * ocz2
                    rl = ltab_ref[l, L_RAD]
                    cq = (ocx2 * ocx2 + ocy2 * ocy2 + ocz2 * ocz2 - rl * rl)
                    disc2 = hq * hq - g2 * cq
                    sq2 = jnp.sqrt(jnp.maximum(disc2, 0.0))
                    inv_g2 = 1.0 / g2
                    tn2 = (hq - sq2) * inv_g2
                    tf2 = (hq + sq2) * inv_g2
                    rt2 = jnp.where((tn2 > T_MIN) & (tn2 < T_MAX), tn2, tf2)
                    oks = (disc2 > 0.0) & (rt2 > T_MIN) & (rt2 < T_MAX)
                    d2s = jnp.maximum(
                        ocx2 * ocx2 + ocy2 * ocy2 + ocz2 * ocz2, 1e-30)
                    cmax2 = jnp.sqrt(
                        jnp.maximum(0.0, 1.0 - rl * rl / d2s))
                    sang = _TWO_PI * (1.0 - cmax2)
                    pdfs = jnp.where(oks, 1.0 / jnp.maximum(sang, 1e-30), 0.0)
                    lp = lp + jnp.where(kl < 0.5, pdfq, pdfs)
                lp = lp * (1.0 / n_lights)
                pdfv = 0.5 * lp + 0.5 * cpdf  # pdf.rs:88-91
                ok_diff = pdfv > 0.0

                # L = atten * scattering_pdf / (pdf * rr)  (camera.rs:248-253)
                dw_den = 1.0 / jnp.maximum(pdfv * rr_prob, 1e-30)
                dwr = car * cpdf * dw_den
                dwg = cag * cpdf * dw_den
                dwb = cab * cpdf * dw_den

                ndx = jnp.where(spec, sdx, gdx)
                ndy = jnp.where(spec, sdy, gdy)
                ndz = jnp.where(spec, sdz, gdz)
                alive = alive * jnp.where(spec | ok_diff, 1.0, 0.0)
                live = alive > 0.0
                ax = ax * jnp.where(live, jnp.where(spec, swr, dwr), 1.0)
                ay = ay * jnp.where(live, jnp.where(spec, swg, dwg), 1.0)
                az = az * jnp.where(live, jnp.where(spec, swb, dwb), 1.0)

            live = alive > 0.0
            ox = jnp.where(live, px_, ox)
            oy = jnp.where(live, py_, oy)
            oz = jnp.where(live, pz_, oz)
            dx = jnp.where(live, ndx, dx)
            dy = jnp.where(live, ndy, dy)
            dz = jnp.where(live, ndz, dz)
            out_state = (b + 1, tm, ox, oy, oz, dx, dy, dz, ax, ay, az,
                         rx, ry, rz, alive)
            if has_image:
                return out_state + (pend_nx, pend_ny, pend_nz,
                                    pend_flag)
            return out_state

        if segment:
            # ---- SEGMENT MODE: one bounce over carried ray state ----
            # state rows: 0 tm, 1-3 o, 4-6 d, 7-9 atten, 10-12 rad,
            # 13 alive, 14 PER-LANE bounce count.  The bounce count is a
            # lane vector (not the scalar segment index) because the XLA
            # driver RESPAWNS a lane's next sample the moment its path
            # dies — lanes in one tile sit at different depths, and RR
            # thresholds / depth exhaustion must follow each lane's own
            # bounce age.
            any_alive = jnp.max(st_ref[13]) > 0.0

            @pl.when(any_alive)
            def _run():
                state = (st_ref[14], st_ref[0], st_ref[1], st_ref[2],
                         st_ref[3],
                         st_ref[4], st_ref[5], st_ref[6], st_ref[7],
                         st_ref[8], st_ref[9], st_ref[10], st_ref[11],
                         st_ref[12], st_ref[13])
                out = bounce_body(state)
                for k in range(13):
                    sto_ref[k] = out[k + 1]
                # depth exhaustion: a lane that has taken max_depth bounces
                # is dead no matter what the material decided
                # (ray_color's depth<=0 base case, camera.rs:186-187)
                sto_ref[13] = jnp.where(out[0] < float(max_depth),
                                        out[14], 0.0)
                sto_ref[14] = out[0]
                if has_image:
                    pend_ref[0] = out[15]
                    pend_ref[1] = out[16]
                    pend_ref[2] = out[17]
                    pend_ref[3] = out[18]
                else:
                    pend_ref[:] = jnp.zeros((4,) + shape, _F32)

            @pl.when(jnp.logical_not(any_alive))
            def _skip():
                # whole tile dead: pass the state through untouched (the
                # radiance rows must survive to the final accumulation)
                sto_ref[:] = st_ref[:]
                pend_ref[:] = jnp.zeros((4,) + shape, _F32)

            return

        def spawn_rays(s_abs):
            """Camera ray per lane from its absolute sample index s_abs [f32]
            (Camera::get_ray, camera.rs:152-180).  Shared by the respawn
            loop; stratified strata wrap to the sqrt_spp^2 grid so
            shard-padded extras stay inside the pixel footprint."""
            u1 = _uniform(shape)
            u2 = _uniform(shape)
            if stratified:
                n2 = float(sqrt_spp * sqrt_spp)
                s_w = s_abs - n2 * jnp.floor(s_abs * (1.0 / n2))
                s_i = s_w - float(sqrt_spp) * jnp.floor(
                    s_w * (1.0 / sqrt_spp))
                s_j = jnp.floor(s_w * (1.0 / sqrt_spp))
                recip = 1.0 / sqrt_spp
                jx = px + ((s_i + u1) * recip - 0.5)
                jy = py + ((s_j + u2) * recip - 0.5)
            else:
                jx = px + (u1 - 0.5)
                jy = py + (u2 - 0.5)
            psx = cam_ref[3] + jx * cam_ref[6] + jy * cam_ref[9]
            psy = cam_ref[4] + jx * cam_ref[7] + jy * cam_ref[10]
            psz = cam_ref[5] + jx * cam_ref[8] + jy * cam_ref[11]
            if defocus:
                u3 = _uniform(shape)
                u4 = _uniform(shape)
                dr = jnp.sqrt(u3)
                dth = u4 * _TWO_PI
                ddx = dr * jnp.cos(dth)
                ddy = dr * jnp.sin(dth)
                ox0 = cam_ref[0] + ddx * cam_ref[12] + ddy * cam_ref[15]
                oy0 = cam_ref[1] + ddx * cam_ref[13] + ddy * cam_ref[16]
                oz0 = cam_ref[2] + ddx * cam_ref[14] + ddy * cam_ref[17]
            else:
                ox0 = cam_ref[0] + zeros
                oy0 = cam_ref[1] + zeros
                oz0 = cam_ref[2] + zeros
            tm = _uniform(shape) if moving else zeros
            return tm, ox0, oy0, oz0, psx - ox0, psy - oy0, psz - oz0

        if persist:
            # ---- PERSISTENT RESPAWN + TEXEL-FREEZE MODE (round 3) ----
            # The respawn loop of ``respawn`` mode, made RESUMABLE across
            # kernel launches so image-textured scenes can run whole samples
            # in-kernel: a lane that hits an image texture FREEZES (its pend
            # record set, its state preserved) and the XLA driver resolves
            # the texel between launches; every other lane keeps walking its
            # own samples with zero per-bounce HBM traffic.  This replaces
            # the per-bounce segment loop for image scenes: book2_final paid
            # ~41% of its throughput to per-segment state traffic + XLA
            # spawn work (scripts/ablate_final.py, v5e) even though only
            # 1 of ~1800 primitives is image-textured.
            #
            # HBM state rows [20 (+1 when sorted_lanes)]: 0 tm, 1-3 o,
            # 4-6 d, 7-9 atten, 10-12 rad, 13 alive, 14 bounce, 15 done,
            # 16-18 banked sums, 19 mid (sample in progress / radiance
            # unbanked), 20 SLOT id (sorted_lanes only: the lane's pixel
            # identity — the driver permutes lanes between launches;
            # round 4).  pend rows [4] are OUTPUT-only: the driver
            # resolves and clears them, so a launch always enters
            # unfrozen.
            # ``persist_iters`` > 0 bounds the in-kernel loop to K bounces
            # per launch: for image-SPARSE scenes (book2_final: 1 earth
            # globe among ~1800 primitives) the unlimited loop serializes on
            # the rare earth-facing lanes — each advances only one sample
            # per launch while every affected tile re-pays full-width
            # iterations for a handful of resumed lanes (measured: 48
            # launches x ~0.5 s tail, 4x slower than per-bounce segments).
            # Bounded launches keep the whole tile marching in lockstep (the
            # XLA driver resolves texels every K bounces) while still
            # deleting the segment loop's per-bounce XLA spawn work — the
            # respawn stays in-kernel.  Image-DOMINANT scenes (earth globe
            # IS the scene) keep persist_iters=0: lanes freeze about once
            # per sample anyway, and the unlimited loop measured +70% there.
            off = jnp.asarray(seed_ref[1], _F32)

            def pcond(c):
                done_, mid_ = c[15], c[19]
                work = (mid_ > 0.0) | (done_ < float(spp))
                if has_image:
                    work = (c[23] == 0.0) & work  # frozen lanes can't run
                ok = jnp.max(jnp.where(work, 1.0, 0.0)) > 0.0
                if persist_iters:
                    bound = (tb_ref[pl.program_id(0)] if tile_bounds
                             else persist_iters)
                    ok = ok & (c[-1] < bound)
                return ok

            def pbody(c):
                (b, tm2, ox2, oy2, oz2, dx2, dy2, dz2, ax2, ay2, az2,
                 rx2, ry2, rz2, alive, done, sx, sy, sz, mid) = c[:20]
                if has_image:
                    pa, pb, pc_, pf = c[20:24]
                    frozen = pf != 0.0
                    unfrozen = ~frozen

                    def mg(n, o_):
                        return jnp.where(unfrozen, n, o_)
                else:
                    # no image textures -> no freeze protocol: every lane
                    # is always unfrozen and the pend carry is elided
                    unfrozen = True

                    def mg(n, o_):
                        return n

                # 1) bank dead unbanked paths (incl. lanes whose emission
                #    pend the driver just resolved into rad)
                fin = (mid > 0.0) & (alive <= 0.0) & unfrozen
                sx = sx + jnp.where(fin, rx2, 0.0)
                sy = sy + jnp.where(fin, ry2, 0.0)
                sz = sz + jnp.where(fin, rz2, 0.0)
                done = done + jnp.where(fin, 1.0, 0.0)
                mid = jnp.where(fin, 0.0, mid)
                finz = jnp.where(fin, 0.0, 1.0)
                rx2, ry2, rz2 = rx2 * finz, ry2 * finz, rz2 * finz
                # 2) (re)spawn idle lanes with samples remaining
                spawn_ok = unfrozen & (mid <= 0.0) & (done < float(spp))
                tmN, oxN, oyN, ozN, dxN, dyN, dzN = spawn_rays(done + off)

                def sel(n, o_):
                    return jnp.where(spawn_ok, n, o_)

                b = jnp.where(spawn_ok, 0.0, b)
                tm2 = sel(tmN, tm2)
                ox2, oy2, oz2 = sel(oxN, ox2), sel(oyN, oy2), sel(ozN, oz2)
                dx2, dy2, dz2 = sel(dxN, dx2), sel(dyN, dy2), sel(dzN, dz2)
                ax2, ay2, az2 = sel(ones, ax2), sel(ones, ay2), sel(ones, az2)
                alive = jnp.where(spawn_ok, 1.0, alive)
                mid = jnp.where(spawn_ok, 1.0, mid)
                # 3) one bounce; merge only unfrozen lanes, freeze new pends
                out = bounce_body((b, tm2, ox2, oy2, oz2, dx2, dy2, dz2,
                                   ax2, ay2, az2, rx2, ry2, rz2, alive))
                alive_n = jnp.where(out[0] < float(max_depth), out[14], 0.0)

                nxt = (mg(out[0], b), mg(out[1], tm2),
                       mg(out[2], ox2), mg(out[3], oy2), mg(out[4], oz2),
                       mg(out[5], dx2), mg(out[6], dy2), mg(out[7], dz2),
                       mg(out[8], ax2), mg(out[9], ay2), mg(out[10], az2),
                       mg(out[11], rx2), mg(out[12], ry2), mg(out[13], rz2),
                       mg(alive_n, alive), done, sx, sy, sz, mid)
                if has_image:
                    nxt = nxt + (mg(out[15], pa), mg(out[16], pb),
                                 mg(out[17], pc_), mg(out[18], pf))
                if persist_iters:
                    nxt = nxt + (c[-1] + 1,)
                return nxt

            init = (st_ref[14], st_ref[0], st_ref[1], st_ref[2], st_ref[3],
                    st_ref[4], st_ref[5], st_ref[6], st_ref[7], st_ref[8],
                    st_ref[9], st_ref[10], st_ref[11], st_ref[12],
                    st_ref[13], st_ref[15], st_ref[16], st_ref[17],
                    st_ref[18], st_ref[19])
            if has_image:
                init = init + (zeros, zeros, zeros, zeros)
            if persist_iters:
                init = init + (jnp.asarray(0, jnp.int32),)
            final = jax.lax.while_loop(pcond, pbody, init)
            sto_ref[14] = final[0]
            sto_ref[0] = final[1]
            for k in range(12):
                sto_ref[k + 1] = final[k + 2]
            sto_ref[13] = final[14]
            for k in range(5):
                sto_ref[k + 15] = final[k + 15]
            if sorted_lanes:
                # the SLOT row rides along unchanged: lane identity is
                # only ever rewritten by the DRIVER (between-launch
                # permutation)
                sto_ref[20] = st_ref[20]
            if has_image:
                for k in range(4):
                    pend_ref[k] = final[k + 20]
            else:
                pend_ref[:] = jnp.zeros((4,) + shape, _F32)
            return

        if respawn:
            # ---- PERSISTENT RESPAWN MODE ----
            # state: 0 per-lane bounce count, 1-14 = bounce_body state,
            # 15 done-sample count, 16-18 banked radiance sums
            off = jnp.asarray(seed_ref[1], _F32)

            def rcond(st):
                return jnp.max(st[14]) > 0.0  # any lane mid-path

            def rbody(st):
                (b2, tm2, ox2, oy2, oz2, dx2, dy2, dz2,
                 ax2, ay2, az2, rx2, ry2, rz2, alive2) = bounce_body(
                    st[:15])
                done, sx, sy, sz = st[15], st[16], st[17], st[18]
                # per-lane depth exhaustion (ray_color's depth<=0 base
                # case, camera.rs:186-187)
                alive2 = jnp.where(b2 < float(max_depth), alive2, 0.0)
                fin = (st[14] > 0.0) & (alive2 <= 0.0)
                sx = sx + jnp.where(fin, rx2, 0.0)
                sy = sy + jnp.where(fin, ry2, 0.0)
                sz = sz + jnp.where(fin, rz2, 0.0)
                done = done + jnp.where(fin, 1.0, 0.0)
                live_next = fin & (done < float(spp))
                tmN, oxN, oyN, ozN, dxN, dyN, dzN = spawn_rays(done + off)

                def sel(n, o):
                    return jnp.where(live_next, n, o)

                finz = jnp.where(fin, 0.0, 1.0)
                return (jnp.where(live_next, 0.0, b2),
                        sel(tmN, tm2), sel(oxN, ox2), sel(oyN, oy2),
                        sel(ozN, oz2),
                        sel(dxN, dx2), sel(dyN, dy2), sel(dzN, dz2),
                        sel(ones, ax2), sel(ones, ay2), sel(ones, az2),
                        rx2 * finz, ry2 * finz, rz2 * finz,
                        jnp.where(live_next, 1.0, alive2),
                        done, sx, sy, sz)

            tm0, ox0, oy0, oz0, dx0, dy0, dz0 = spawn_rays(zeros + off)
            init = (zeros, tm0, ox0, oy0, oz0, dx0, dy0, dz0,
                    ones, ones, ones, zeros, zeros, zeros, ones,
                    zeros, zeros, zeros, zeros)
            final = jax.lax.while_loop(rcond, rbody, init)
            rx_ref[:] = final[16]
            ry_ref[:] = final[17]
            rz_ref[:] = final[18]
            return

        def cond(state):
            b = state[0]
            alive = state[14]
            return (b < max_depth) & (jnp.sum(alive) > 0.0)

        def one_sample(s, accum):
            sx, sy, sz = accum
            # camera ray (Camera::get_ray, camera.rs:152-180): jittered
            # sub-pixel sample + optional defocus-disk origin; time in [0,1);
            # stratified strata index by the absolute sample id
            # (the_rest_of_your_life/camera.rs:114-116,173-177)
            tm, ox0, oy0, oz0, rdx, rdy, rdz = spawn_rays(
                (s + seed_ref[1]).astype(_F32))

            init = (
                jnp.asarray(0, jnp.int32), tm,
                ox0, oy0, oz0,
                rdx, rdy, rdz,
                ones, ones, ones,
                zeros, zeros, zeros,
                ones,  # alive mask as f32 (Mosaic while-carry can't hold i1)
            )
            final = jax.lax.while_loop(cond, bounce_body, init)
            return (sx + final[11], sy + final[12], sz + final[13])

        sx, sy, sz = jax.lax.fori_loop(
            0, spp, one_sample, (zeros, zeros, zeros))
        rx_ref[:] = sx
        ry_ref[:] = sy
        rz_ref[:] = sz

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("n_quads", "n_clusters", "n_sclusters", "moving",
                     "max_depth",
                     "sky_bg", "spp", "width", "height", "defocus", "rows",
                     "tile_rows", "has_checker", "mis", "n_lights",
                     "stratified", "sqrt_spp", "n_media", "has_noise",
                     "n_slabs", "n_boxes", "n_bclusters", "b_slabs",
                     "has_image", "interpret", "respawn", "unroll",
                     "b_unroll", "media_kinds", "n_ssc_static",
                     "n_qclusters"),
)
def _megakernel_raw(tab, qtab, clb, cls, sclb, scls, btab, bclb, bcls,
                    batab, ltab, mtab, ptab, vtab, atab,
                    cam_u, seed, bg, *,
                    n_quads: int, n_clusters: int, n_sclusters: int,
                    moving: bool,
                    max_depth: int, sky_bg: bool, spp: int, width: int,
                    height: int, defocus: bool, rows: int, tile_rows: int,
                    has_checker: bool, mis: bool, n_lights: int,
                    stratified: bool, sqrt_spp: int, n_media: int,
                    has_noise: bool, n_slabs: int, n_boxes: int,
                    n_bclusters: int, b_slabs: int, has_image: bool,
                    interpret: bool, respawn: bool = False,
                    unroll: int = 1, b_unroll: int = 1,
                    media_kinds: tuple = (), n_ssc_static: int = 0,
                    n_qclusters: int = 0):
    if has_image:
        raise ValueError(
            "image textures require the wavefront segment path "
            "(ops/pallas_wavefront.py), not the monolithic megakernel")
    grid = (rows // tile_rows,)
    ray_spec = pl.BlockSpec((tile_rows, TILE_LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out = jax.ShapeDtypeStruct((rows, TILE_LANES), _F32)
    smem = lambda *shp: pl.BlockSpec(shp, lambda i: tuple(0 for _ in shp),
                                     memory_space=pltpu.SMEM)
    vmem = lambda *shp: pl.BlockSpec(shp, lambda i: tuple(0 for _ in shp),
                                     memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _make_kernel(tab.shape[1], n_quads, n_clusters, moving, max_depth,
                     sky_bg, spp, width, height, defocus, tile_rows,
                     has_checker, mis=mis, n_lights=n_lights,
                     stratified=stratified, sqrt_spp=sqrt_spp,
                     n_media=n_media, has_noise=has_noise, respawn=respawn,
                     n_slabs=n_slabs, n_boxes=n_boxes,
                     n_bclusters=n_bclusters, b_slabs=b_slabs,
                     n_sclusters=n_sclusters, unroll=unroll,
                     b_unroll=b_unroll, media_kinds=media_kinds,
                     n_ssc_static=n_ssc_static, n_qclusters=n_qclusters),
        out_shape=(out, out, out),
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
            smem(20),
            smem(2),
            smem(4),
        ],
        out_specs=(ray_spec, ray_spec, ray_spec),
        interpret=interpret,
    )(tab, qtab, clb, cls, sclb, scls, btab, bclb, bcls, batab, ltab, mtab,
      ptab, vtab, atab, cam_u, seed, bg)


_slot_cache: dict = {}


def _unswizzle_index(width: int, height: int):
    """[H*W] slot index of each pixel under the 32x32 block swizzle.

    The cache holds NUMPY (not jnp) arrays: a jnp constant created while a
    shard_map trace is active is a ShardMapTracer, and caching it poisons
    every later call outside that trace (found by a sharded-then-single
    TPU test).  jnp.asarray at use time folds to the same constant."""
    import numpy as np

    key = (width, height)
    if key not in _slot_cache:
        tiles_x = -(-width // _BLK)
        py, px = np.mgrid[0:height, 0:width]
        slot = (((py // _BLK) * tiles_x + px // _BLK) * (_BLK * _BLK)
                + (py % _BLK) * _BLK + (px % _BLK))
        _slot_cache[key] = slot.reshape(-1).astype(np.int32)
    return jnp.asarray(_slot_cache[key])


def prepare_megakernel(scene: Scene, cam, *, width: int, height: int,
                       spp: int, max_depth: int, tile_rows: int = TILE_ROWS,
                       mis: bool = False, stratified: bool = False,
                       sqrt_spp: int = 0, interpret: bool | None = None,
                       segment: bool = False, respawn: bool = False,
                       unroll: int | None = None, b_unroll: int | None = None,
                       sphere_max_leaf: int | None = None,
                       box_max_leaf: int | None = None):
    """Host-side half of a megakernel pass: SAH clustering + table packing.

    Returns ``(arrays, statics)`` — a dict of device arrays (replicable
    across a mesh; the scene tables are identical on every chip) and the
    static kwargs for :func:`_megakernel_raw`.  Split out so the spp-sharded
    multi-chip path (parallel/megakernel.py) can pack ONCE and ``shard_map``
    only the per-device (key, sample_offset) execution.
    """
    from ..config import BG_SKY

    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    # unroll routing: turbulence-heavy scenes want 1 (register/VMEM
    # pressure of the Perlin closures, round 3); so does the MIS kernel
    # (round-4 multi-second re-sweep, cornell_mis 600^2@1024 d50: unroll
    # 1 beat 4 at every tile size — 208/212/184 vs 198/206/171 Mpaths/s
    # at rows 16/32/64 — the NEE/MIS closures already saturate the
    # instruction budget); everything else wants SPHERE_UNROLL=4.
    if unroll is None:
        unroll = 1 if (noise_dominant(scene) or mis) else SPHERE_UNROLL
    if b_unroll is None:
        b_unroll = 1 if (noise_dominant(scene) or mis) else BOX_UNROLL
    if sphere_max_leaf is None:
        # see the SPHERE_MAX_LEAF sweep note: 64 wins/ties up to ~1k
        # spheres, 32 at 10k (cluster count vs per-cluster work balance)
        n_act_sph = int(float(jnp.sum(scene.sph_mask)))
        sphere_max_leaf = (SPHERE_MAX_LEAF_BIG if n_act_sph >= SPHERE_BIG_N
                           else SPHERE_MAX_LEAF)
    box_max_leaf = BOX_MAX_LEAF if box_max_leaf is None else box_max_leaf
    n_pix = width * height
    tiles_x = -(-width // _BLK)
    tiles_y = -(-height // _BLK)
    n_slots = tiles_x * tiles_y * _BLK * _BLK
    tile_r = tile_rows * TILE_LANES
    rows = (-(-n_slots // tile_r)) * tile_rows

    tab = pack_joined_table(scene)
    qtab, n_quads, n_qclusters = cluster_quad_table(
        scene, pack_quad_table(scene))

    import numpy as np

    # -- axis-aligned box primitives: SAH-clustered slab table + winner-
    #    attribute gather slabs (mirrors the sphere atab machinery)
    if "boxes" in scene.features:
        btab_np, border, bcls_np, bclb_np = pack_box_tables(
            scene, max_leaf=box_max_leaf, pad_to=b_unroll)
        n_boxes = btab_np.shape[0]
        n_bclusters = bcls_np.shape[0] - 1
        bmask = np.asarray(scene.box_mask) > 0
        # padded rows (border < 0) borrow row-0 attributes; they can never
        # win the slab test, so the values are never fetched
        bmat = np.asarray(scene.box_mat)[bmask][np.maximum(border, 0)]
        bkind = np.asarray(scene.mat_kind)[bmat].astype(np.float32)
        bmtex = np.asarray(scene.mat_tex)[bmat]
        balb = np.asarray(scene.tex_color1)[bmtex].astype(np.float32)
        bfuzz = np.asarray(scene.mat_fuzz)[bmat].astype(np.float32)
        bior = np.asarray(scene.mat_ior)[bmat].astype(np.float32)
        battrs = [bkind, balb[:, 0], balb[:, 1], balb[:, 2], bfuzz, bior,
                  btab_np[:, B_LOX], btab_np[:, B_LOY], btab_np[:, B_LOZ],
                  btab_np[:, B_HIX], btab_np[:, B_HIY], btab_np[:, B_HIZ]]
        # must match the kernel's has_tex predicate (checker OR noise OR
        # image -> 17 batab rows): an image-textured scene without
        # checker/noise still makes the kernel fetch rows 12-16
        if (("checker" in scene.features) or ("noise" in scene.features)
                or (segment and "image" in scene.features)):
            btk = np.asarray(scene.tex_kind)[bmtex]
            bc2 = np.asarray(scene.tex_color2)[bmtex].astype(np.float32)
            bivs = np.where(btk == 3,
                            np.asarray(scene.tex_noise_scale)[bmtex],
                            np.asarray(scene.tex_inv_scale)[bmtex])
            battrs += [btk.astype(np.float32), bc2[:, 0], bc2[:, 1],
                       bc2[:, 2], bivs.astype(np.float32)]
        b_slabs = max(1, -(-n_boxes // TILE_LANES))
        batab_np = np.zeros((len(battrs), b_slabs * TILE_LANES), np.float32)
        for i, col in enumerate(battrs):
            batab_np[i, :n_boxes] = col
        batab = jnp.asarray(
            batab_np.reshape(len(battrs) * b_slabs, TILE_LANES))
        btab = jnp.asarray(btab_np)
        bclb = jnp.asarray(bclb_np)
        # pre-divided starts: the kernel's unrolled box loop iterates in
        # b_unroll-sized steps (ranges are padded to multiples of b_unroll)
        bcls = jnp.asarray(bcls_np // b_unroll, dtype=jnp.int32)
    else:
        n_boxes = 0
        n_bclusters = 0
        b_slabs = 1
        btab = jnp.zeros((1, B_COLS), _F32)
        bclb = jnp.zeros((1, 8), _F32)
        bcls = jnp.zeros(2, jnp.int32)
        batab = jnp.zeros((_BOX_ATTRS_BASE, TILE_LANES), _F32)

    # SAH cluster culling (native C++ builder with NumPy fallback) pays off
    # once the sphere loop dominates; swept bounds cover motion blur.
    moving = "motion" in scene.features
    n_ssc_static = 0
    n_spheres = tab.shape[0]
    if n_spheres >= 64:
        import numpy as np

        from ..native import build_sphere_clusters

        cen = np.asarray(scene.sph_center, np.float32)
        vel = np.asarray(scene.sph_cvel, np.float32)
        rad = np.abs(np.asarray(scene.sph_radius, np.float32))
        rad = np.where(np.asarray(scene.sph_mask) > 0, rad, 0.0)
        cmid = cen + 0.5 * vel
        rswept = rad + 0.5 * np.linalg.norm(vel, axis=-1)

        def _supers(order, cl_start, cl_min, cl_max, force: bool):
            """2-level hierarchy: once the flat cluster scan itself gets
            long (10k spheres -> ~320 clusters), SAH-cluster the CLUSTER
            AABBs and scan super-clusters first; clusters (and the sphere
            order beneath them) are permuted super-cluster-contiguous so
            the kernel descends with the same contiguous-range fori_loop at
            both levels.  Threshold 16 re-measured round 2: neutral-to-+1M
            on the flagship (489 spheres -> 16 clusters) and required for
            the 10k scaling scene.  ``force`` (the static/moving split
            path) returns identity super-clusters below the threshold so
            the kernel can always take the split 2-level loop."""
            n_cl = cl_start.shape[0] - 1
            if n_cl >= 16:
                from ..native import build_aabb_clusters

                sorder, s_start, s_min, s_max = build_aabb_clusters(
                    cl_min, cl_max, max_leaf=16)
                order = np.concatenate(
                    [order[cl_start[c]:cl_start[c + 1]] for c in sorder])
                sizes = (cl_start[1:] - cl_start[:-1])[sorder]
                cl_start = np.concatenate(
                    [[0], np.cumsum(sizes)]).astype(np.int32)
                cl_min, cl_max = cl_min[sorder], cl_max[sorder]
                return (order, cl_start, cl_min, cl_max,
                        np.asarray(s_start, np.int32), s_min, s_max)
            if force:
                return (order, cl_start, cl_min, cl_max,
                        np.arange(n_cl + 1, dtype=np.int32), cl_min, cl_max)
            return order, cl_start, cl_min, cl_max, None, None, None

        # static/moving split: when a moving scene has a static majority
        # (book2_final: 1 moving sphere vs the 1005-sphere rest), cluster
        # the groups separately (static first) so the kernel's hot loop
        # over the static clusters is compiled WITHOUT the per-sphere
        # motion reads/FMAs; the kernel splits its super-cluster fori at
        # n_ssc_static.  Sub-64 static groups aren't worth the extra
        # hierarchy level (bouncing_spheres: 4 static of 489).
        movingp = ((np.abs(vel).max(axis=-1) > 0)
                   & (np.asarray(scene.sph_mask) > 0))
        n_mv = int(movingp.sum())
        # gate on the ACTIVE static count, not table rows: sph_mask==0
        # padding rows are static too, and counting them would take the
        # split + forced identity super-cluster level for a scene whose
        # real static group is below the worthwhile threshold
        n_static = int(((~movingp) & (np.asarray(scene.sph_mask) > 0)).sum())
        split = (moving and n_mv > 0 and n_static >= 64
                 and not os.environ.get("RTT_NO_MOTION_SPLIT"))

        from .bvh import cluster_spheres_spatial

        def _cluster(c, r):
            # SAH treelet cut, upgraded to spatial-split grid binning when
            # the SAH clusters overlap pathologically (book2_final's cloud);
            # the C++ SAH builder stays the fast path inside the dispatch
            return cluster_spheres_spatial(
                c, r, max_leaf=sphere_max_leaf,
                build_sah=lambda cc, rr, ml: build_sphere_clusters(
                    cc, rr, max_leaf=ml))

        if split:
            def _group(idx):
                o, cs, mn, mx = _cluster(cmid[idx], rswept[idx])
                return idx[np.asarray(o)], np.asarray(cs, np.int32), mn, mx

            parts = [_supers(*_group(np.where(~movingp)[0]), force=True),
                     _supers(*_group(np.where(movingp)[0]), force=True)]
            (o1, cs1, mn1, mx1, ss1, smn1, smx1) = parts[0]
            (o2, cs2, mn2, mx2, ss2, smn2, smx2) = parts[1]
            order = np.concatenate([o1, o2]).astype(np.int32)
            cl_start = np.concatenate(
                [cs1, cs2[1:] + cs1[-1]]).astype(np.int32)
            cl_min = np.concatenate([mn1, mn2])
            cl_max = np.concatenate([mx1, mx2])
            s_start = np.concatenate(
                [ss1, ss2[1:] + (cs1.shape[0] - 1)]).astype(np.int32)
            s_min = np.concatenate([smn1, smn2])
            s_max = np.concatenate([smx1, smx2])
            n_ssc_static = ss1.shape[0] - 1
        else:
            order, cl_start, cl_min, cl_max = _cluster(cmid, rswept)
            # max_leaf default 32: measured optimum on the 489-sphere
            # flagship: 8 -> 9.8, 16 -> 12.9, 32 -> 13.7, 64 -> 12.8 Mpaths/s
            (order, cl_start, cl_min, cl_max,
             s_start, s_min, s_max) = _supers(
                order, cl_start, cl_min, cl_max, force=False)

        n_clusters = cl_start.shape[0] - 1
        if s_start is not None:
            n_sclusters = s_start.shape[0] - 1
            sclb = jnp.asarray(np.concatenate(
                [s_min, s_max, np.zeros((n_sclusters, 2), np.float32)],
                axis=1))
            scls = jnp.asarray(s_start, dtype=jnp.int32)
        else:
            n_sclusters = 0
            sclb = jnp.zeros((1, 8), _F32)
            scls = jnp.zeros(2, jnp.int32)

        # pad cluster ranges to multiples of the kernel's sphere-loop unroll
        # with unhittable sentinel rows (r2 = -BIG => disc < 0 always), then
        # pre-divide the starts to body-iteration units
        order, cl_start = _pad_cluster_ranges(order, cl_start, unroll)
        dead = order < 0
        tab = tab[jnp.asarray(np.maximum(order, 0))]
        if dead.any():
            tab = tab.at[:, J_R2].set(
                jnp.where(jnp.asarray(dead), -_BIG, tab[:, J_R2]))
        clb = jnp.asarray(
            np.concatenate(
                [cl_min, cl_max, np.zeros((n_clusters, 2), np.float32)],
                axis=1))
        cls = jnp.asarray(cl_start // unroll, dtype=jnp.int32)
    else:
        n_clusters = 0
        n_sclusters = 0
        clb = jnp.zeros((1, 8), _F32)
        cls = jnp.zeros(2, jnp.int32)
        sclb = jnp.zeros((1, 8), _F32)
        scls = jnp.zeros(2, jnp.int32)
        if unroll > 1 and tab.shape[0] % unroll:
            # flat-scan path: pad the table itself to a multiple of unroll
            padrow = tab[:1].at[:, J_R2].set(-_BIG)
            tab = jnp.concatenate(
                [tab] + [padrow] * ((-tab.shape[0]) % unroll))

    # winner-attribute gather table: selected columns of the (cluster-
    # reordered) sphere table, laid out as [n_attrs * n_slabs, 128] so each
    # row is one lane-confined gather slab
    has_image = segment and ("image" in scene.features)
    has_tex = (("checker" in scene.features) or ("noise" in scene.features)
               or has_image)
    acols = [J_KIND, J_AR, J_AG, J_AB, J_FUZZ, J_IOR, J_CX, J_CY, J_CZ,
             J_INVR]
    if moving:
        acols += [J_VX, J_VY, J_VZ]
    if has_tex:
        acols += [J_TEXK, J_C2R, J_C2G, J_C2B, J_INVS]
    if has_image:
        acols += [J_IMG]
    n_sph = tab.shape[0]
    n_slabs = max(1, -(-n_sph // TILE_LANES))
    tab_pad = jnp.pad(tab, ((0, n_slabs * TILE_LANES - n_sph), (0, 0)))
    atab = tab_pad[:, jnp.asarray(acols)].T.reshape(
        len(acols) * n_slabs, TILE_LANES)

    cam_u = jnp.concatenate([
        cam.center, cam.pixel00, cam.pixel_delta_u, cam.pixel_delta_v,
        cam.defocus_disk_u, cam.defocus_disk_v, jnp.zeros(2, _F32),
    ]).astype(_F32)
    import numpy as np

    if mis:
        ltab_np, n_lights = pack_light_table(scene)
        ltab = jnp.asarray(ltab_np)
    else:
        n_lights = 0
        ltab = jnp.zeros((1, L_COLS), _F32)

    if "media" in scene.features:
        mtab_np, n_media = pack_media_table(scene)
        mtab = jnp.asarray(mtab_np)
        # static per-medium kinds (0 sphere / 1 box): each medium compiles
        # only its own boundary test in-kernel
        media_kinds = tuple(
            int(v) for v in np.asarray(mtab_np)[:n_media, M_KIND])
    else:
        n_media = 0
        mtab = jnp.zeros((1, M_COLS), _F32)
        media_kinds = ()

    has_noise = "noise" in scene.features
    if has_noise:
        ptab_np, vtab_np = pack_perlin_tables(scene)
        ptab = jnp.asarray(ptab_np)
        vtab = jnp.asarray(vtab_np)
    else:
        ptab = jnp.zeros((6, TILE_LANES), jnp.int32)
        vtab = jnp.zeros((6, TILE_LANES), _F32)

    bg = jnp.concatenate([cam.background.astype(_F32), jnp.zeros(1, _F32)])

    # device-side sphere table: geometry-only (see kernel body); the full
    # 24-col table stays host-side to source the atab attribute slabs.
    # COLUMN-major [cols, N]: Mosaic pads an SMEM window's minor dim to 128
    # lanes, so the row-major [N, 4] layout ballooned 32x (a 10k-sphere
    # scene asked for 5 MB of the 1 MB SMEM budget); [cols, N] already has
    # a >=128 minor dim at any real N and stays at true size.
    gcols = [J_CX, J_CY, J_CZ, J_R2] + ([J_VX, J_VY, J_VZ] if moving else [])
    gtab = tab[:, jnp.asarray(gcols)].T
    arrays = dict(tab=gtab, qtab=qtab, clb=clb, cls=cls, sclb=sclb,
                  scls=scls, btab=btab,
                  bclb=bclb, bcls=bcls, batab=batab, ltab=ltab, mtab=mtab,
                  ptab=ptab, vtab=vtab, atab=atab, cam_u=cam_u, bg=bg)
    statics = dict(
        n_quads=n_quads, n_qclusters=n_qclusters,
        n_clusters=n_clusters, n_sclusters=n_sclusters,
        n_ssc_static=n_ssc_static,
        n_media=n_media, media_kinds=media_kinds,
        unroll=unroll, b_unroll=b_unroll,
        has_noise=has_noise, n_slabs=n_slabs, has_image=has_image,
        n_boxes=n_boxes, n_bclusters=n_bclusters, b_slabs=b_slabs,
        moving=moving, max_depth=max_depth,
        sky_bg=cam.bg_mode == BG_SKY, spp=spp, width=width, height=height,
        defocus=cam.lens_radius_gt0, rows=rows, tile_rows=tile_rows,
        has_checker="checker" in scene.features, mis=mis, n_lights=n_lights,
        stratified=stratified, sqrt_spp=sqrt_spp, interpret=interpret,
    )
    if not segment:
        statics["respawn"] = respawn
    else:
        # in-kernel texel-DMA table (persist mode; zeros when no image)
        if has_image:
            img_dma_np, dma_meta = pack_image_dma(scene)
            arrays["img_dma"] = jnp.asarray(img_dma_np)
            statics["dma_meta"] = dma_meta
        else:
            arrays["img_dma"] = jnp.zeros((8, TILE_LANES), _F32)
            statics["dma_meta"] = ()
    return arrays, statics


_PREP_CACHE: list = []  # [(scene, cam, kw_tuple, arrays, statics)]
_PREP_CACHE_MAX = 4


def prepare_megakernel_cached(scene: Scene, cam, **kw):
    """prepare_megakernel with a tiny identity-keyed cache: the host-side
    SAH clustering + table packing + device transfer is identical across
    the passes of one render (and across bench repeats), but used to be
    re-done per pass — at 64 spp/pass it cost small scenes up to ~40% of
    wall time (earth via render_pass: 49 vs 78 Mpaths/s prepared-once).
    Entries hold STRONG references and are checked with ``is`` on both
    scene and camera, so id() reuse after GC can never alias a stale
    entry; the cache keeps the last few (scene, cam, kwargs) combos.
    Prep output also depends on the RTT_NO_MOTION_SPLIT env knob (the
    static/moving cluster split), so it is part of the key — toggling it
    mid-process must not return a stale split layout.  Same for the
    sphere-grid knobs (spatial-split binning, ops/bvh.py)."""
    kw_t = (tuple(sorted(kw.items())),
            bool(os.environ.get("RTT_NO_MOTION_SPLIT")),
            bool(os.environ.get("RTT_SPHERE_GRID")),
            os.environ.get("RTT_GRID_RES"),
            os.environ.get("RTT_GRID_FILL"),
            bool(os.environ.get("RTT_NO_QUAD_CLUSTER")))
    for ent in _PREP_CACHE:
        if ent[0] is scene and ent[1] is cam and ent[2] == kw_t:
            return ent[3], ent[4]
    arrays, statics = prepare_megakernel(scene, cam, **kw)
    _PREP_CACHE.append((scene, cam, kw_t, arrays, statics))
    if len(_PREP_CACHE) > _PREP_CACHE_MAX:
        _PREP_CACHE.pop(0)
    return arrays, statics


def megakernel_pass_from_prepared(arrays: dict, statics: dict, key,
                                  sample_offset) -> jnp.ndarray:
    """Device half of a megakernel pass: seed derivation + kernel launch +
    unswizzle.  ``sample_offset`` may be a traced int32 (per-device offsets
    under shard_map).  Returns the radiance SUM [H, W, 3]."""
    key = jax.random.fold_in(key, sample_offset)
    seed = jnp.concatenate([
        jax.random.key_data(key).astype(jnp.int32).reshape(-1)[:1],
        jnp.asarray(sample_offset, jnp.int32).reshape(1),
    ])
    rx, ry, rz = _megakernel_raw(
        arrays["tab"], arrays["qtab"], arrays["clb"], arrays["cls"],
        arrays["sclb"], arrays["scls"],
        arrays["btab"], arrays["bclb"], arrays["bcls"], arrays["batab"],
        arrays["ltab"], arrays["mtab"], arrays["ptab"], arrays["vtab"],
        arrays["atab"], arrays["cam_u"], seed, arrays["bg"], **statics)
    img = jnp.stack([rx.reshape(-1), ry.reshape(-1), rz.reshape(-1)], axis=-1)
    width, height = statics["width"], statics["height"]
    return img[_unswizzle_index(width, height)].reshape(height, width, 3)


def render_pass_megakernel(scene: Scene, cam, key, *, width: int, height: int,
                           spp: int, max_depth: int,
                           sample_offset=0, tile_rows: int = TILE_ROWS,
                           mis: bool = False, stratified: bool = False,
                           sqrt_spp: int = 0,
                           interpret: bool | None = None,
                           respawn: bool = False,
                           unroll: int | None = None,
                           b_unroll: int | None = None,
                           sphere_max_leaf: int | None = None,
                           box_max_leaf: int | None = None) -> jnp.ndarray:
    """Whole-image render pass in ONE kernel launch: in-kernel ray
    generation, spp loop, and bounce loop.  Returns the radiance SUM
    [H, W, 3] — the same contract as render.render_pass.

    The spp loop lives in-kernel (not a lax.fori over launches) both for
    speed (no per-sample XLA raygen/accumulate round-trips) and because the
    axon runtime intermittently stalls multi-minute on the first execution
    of an executable with many queued pallas launches.
    """
    arrays, statics = prepare_megakernel_cached(
        scene, cam, width=width, height=height, spp=spp, max_depth=max_depth,
        tile_rows=tile_rows, mis=mis, stratified=stratified,
        sqrt_spp=sqrt_spp, interpret=interpret, respawn=respawn,
        unroll=unroll, b_unroll=b_unroll, sphere_max_leaf=sphere_max_leaf,
        box_max_leaf=box_max_leaf)
    return megakernel_pass_from_prepared(arrays, statics, key, sample_offset)
