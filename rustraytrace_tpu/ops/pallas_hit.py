"""Pallas TPU closest-hit kernel for sphere scenes (the hot path).

Why: XLA materializes every [R, N] ray-x-sphere intermediate in HBM (measured
five 128 MB arrays per bounce at R=64k, N=487 — ~3.4 ms while the VPU floor
is ~0.8 ms), and a matmul (MXU) formulation of the quadric needs the
catastrophically-cancelling expanded form |c|^2 - 2 o.c + |o|^2 (f32 artifacts
on the r=1000 ground sphere unless run at Precision.HIGHEST, which costs 6
bf16 passes and measured slower than the VPU loop).

So the kernel mirrors the reference GPU megakernel's structure
(``hit_spheres``, src/gpu/renderer.wgsl:108-155): a scalar loop over spheres
with the numerically-stable direct form (oc = c - o subtracted FIRST, then
products), vectorized over a (8, 128)-ray tile on the VPU, carrying the
running (best_t, best_idx).  Sphere data lives in SMEM and is read as scalars
per iteration; ~25 VPU ops per sphere per 1024-ray tile ≈ 12 cycles/ray for
~500 spheres — within 2x of the elementwise roofline.

Quadric semantics identical to the reference (half-b form, near-root-else-far,
t in (1e-3, 1e9): sphere.rs:25-51, renderer.wgsl:122-142); motion blur
cc = c + time*v per the_next_week/sphere.rs:9-44 (a separate kernel variant so
static scenes don't pay for it).

The winner's hit/material record is built OUTSIDE the kernel with XLA gathers
from the winning index (small-table gathers measured cheap when fused).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..scene import Scene
from .intersect import HitRecord, T_MIN, T_MAX, sphere_uv

_BIG = 1.0e30
_F32 = jnp.float32
TILE_ROWS = 64  # (64, 128) ray tile per grid step: 8192 rays amortize the
# per-sphere scalar SMEM reads (measured 12.5 cycles/ray vs 24 at 8 rows)
TILE_LANES = 128
TILE_R = TILE_ROWS * TILE_LANES

# sphere SMEM table columns
S_CX, S_CY, S_CZ = 0, 1, 2
S_R2 = 3
S_VX, S_VY, S_VZ = 4, 5, 6
S_COLS = 8


def pack_sphere_table(scene: Scene) -> jnp.ndarray:
    """[N, 8] f32 scalar table; padding rows get r^2 = -BIG (can never hit:
    c = |oc|^2 - r^2 becomes +BIG => disc < 0 for every ray)."""
    C = scene.sph_center
    V = scene.sph_cvel
    r = scene.sph_radius
    N = C.shape[0]
    tab = jnp.zeros((N, S_COLS), _F32)
    tab = tab.at[:, S_CX:S_CZ + 1].set(C)
    r2 = jnp.where(scene.sph_mask > 0, r * r, -_BIG)
    tab = tab.at[:, S_R2].set(r2)
    tab = tab.at[:, S_VX:S_VZ + 1].set(V)
    return tab


def _make_kernel(n_spheres: int, moving: bool):
    def kernel(sph_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
               tm_ref, t_ref, idx_ref):
        ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
        dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
        a = dx * dx + dy * dy + dz * dz
        inv_a = 1.0 / a
        tm = tm_ref[:] if moving else None

        def body(s, carry):
            best_t, best_i = carry
            cx = sph_ref[s, S_CX]
            cy = sph_ref[s, S_CY]
            cz = sph_ref[s, S_CZ]
            r2 = sph_ref[s, S_R2]
            if moving:
                cx = cx + tm * sph_ref[s, S_VX]
                cy = cy + tm * sph_ref[s, S_VY]
                cz = cz + tm * sph_ref[s, S_VZ]
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
            take = (
                (disc > 0.0) & (root > T_MIN) & (root < T_MAX)
                & (root < best_t)
            )
            best_t = jnp.where(take, root, best_t)
            best_i = jnp.where(take, s, best_i)
            return best_t, best_i

        init = (
            jnp.full((TILE_ROWS, TILE_LANES), _BIG, _F32),
            jnp.full((TILE_ROWS, TILE_LANES), -1, jnp.int32),
        )
        best_t, best_i = jax.lax.fori_loop(0, n_spheres, body, init)
        t_ref[:] = jnp.where(best_i >= 0, best_t, T_MAX)
        idx_ref[:] = best_i

    return kernel


@functools.partial(jax.jit, static_argnames=("moving", "interpret"))
def _sphere_hit_raw(sph_tab, ox, oy, oz, dx, dy, dz, tm, *,
                    moving: bool, interpret: bool):
    """All ray components are [R//128, 128]; returns (t, idx) same shape."""
    rows = ox.shape[0]
    grid = (rows // TILE_ROWS,)
    ray_spec = pl.BlockSpec((TILE_ROWS, TILE_LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _make_kernel(sph_tab.shape[0], moving),
        out_shape=(
            jax.ShapeDtypeStruct(ox.shape, _F32),
            jax.ShapeDtypeStruct(ox.shape, jnp.int32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((sph_tab.shape[0], S_COLS), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            ray_spec, ray_spec, ray_spec, ray_spec, ray_spec, ray_spec,
            ray_spec,
        ],
        out_specs=(ray_spec, ray_spec),
        interpret=interpret,
    )(sph_tab, ox, oy, oz, dx, dy, dz, tm)


def sphere_kernel_eligible(scene: Scene) -> bool:
    """Kernel fast path covers sphere-only scenes (any texture kind — albedo
    is evaluated outside the kernel); quads/media fall back to XLA."""
    feats = set(scene.features)
    return not feats & {"quads", "media"}


def closest_hit_spheres_pallas(o, d, time, scene: Scene, *,
                               interpret: bool | None = None):
    """Full closest-hit + material attributes for sphere-only scenes.

    Returns (HitRecord, MatRecord).  The kernel produces (t, winner index);
    the record is assembled with fused XLA gathers.
    """
    from .materials import MatRecord
    from .textures import texture_value

    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    R = o.shape[0]
    Rpad = -(-R // TILE_R) * TILE_R
    rows = Rpad // TILE_LANES

    def plane(x):
        if Rpad != R:
            x = jnp.pad(x, (0, Rpad - R))
        return x.reshape(rows, TILE_LANES)

    moving = "motion" in scene.features

    tab = pack_sphere_table(scene)
    t2, idx2 = _sphere_hit_raw(
        tab, plane(o[:, 0]), plane(o[:, 1]), plane(o[:, 2]),
        plane(d[:, 0]), plane(d[:, 1]), plane(d[:, 2]), plane(time),
        moving=moving, interpret=interpret,
    )
    t = t2.reshape(-1)[:R]
    idx = idx2.reshape(-1)[:R]
    hit = idx >= 0
    iw = jnp.maximum(idx, 0)

    t_safe = jnp.where(hit, t, 1.0)
    p = o + t_safe[:, None] * d
    ctr = scene.sph_center[iw] + time[:, None] * scene.sph_cvel[iw]
    rad = scene.sph_radius[iw]
    outward = (p - ctr) / jnp.maximum(rad, 1e-30)[:, None]
    front = jnp.sum(d * outward, axis=-1) < 0.0
    normal = jnp.where(front[:, None], outward, -outward)
    u, v = sphere_uv(outward)

    mat_id = scene.sph_mat[iw]
    rec = HitRecord(
        valid=hit, t=jnp.where(hit, t, T_MAX), p=p, normal=normal,
        front_face=front, mat=mat_id, u=u, v=v,
    )
    mat = MatRecord(
        kind=scene.mat_kind[mat_id],
        albedo=texture_value(scene.mat_tex[mat_id], u, v, p, scene),
        fuzz=scene.mat_fuzz[mat_id],
        ior=scene.mat_ior[mat_id],
    )
    return rec, mat
