"""Warped-area reparameterization: silhouette (visibility) gradients.

Interior autodiff differentiates radiance through hit points, normals, and
attenuations, but the MOVEMENT of sphere silhouettes under parameter change
(the boundary term of the pixel integral) has zero interior gradient — a
sphere's center/radius cannot be recovered from coverage by plain AD.  This
module implements the warped-area / reparameterized-sampling estimator
(Loubet et al. 2019, Bangaru et al. 2020) specialized to sphere silhouettes:

The sub-pixel jitter u is replaced by a warp  T(u, θ) = u + W(u, θ)  with

    W = - Σ_i  k(φ̂ᵈ_i) · (φ̂_i(θ) - φ̂_i(θᵈ)) · n̂ᵈ_i ,

where φ_i(u, θ) = h² - a·c is sphere i's ray-quadric DISCRIMINANT (whose
zero set in u-space IS the silhouette), φ̂ = φ/|∇_u φ| its unit-normalized
form, n̂ = ∇_u φ/|∇_u φ| the u-space silhouette normal, k a smooth bump that
is exactly 1 on the silhouette, and superscript ᵈ marks evaluation with
stop_gradient'ed SCENE ARRAYS (u stays attached — the divergence of the warp
field needs full u-dependence).  Properties:

* value:  W ≡ 0, det(∂T/∂u) ≡ 1 — the forward render is BIT-IDENTICAL;
* derivative: at a silhouette, ∂θT equals the boundary's u-velocity
  (implicit-function theorem on φ=0), so the discontinuity of the integrand
  f(T(u)) is stationary in u and the exact change of variables
  ∫ f(T)|det ∂T/∂u| du = ∫ f du differentiates to the full gradient,
  boundary term included.  Warps at "phantom" boundaries (occluded or
  back-facing silhouettes, where f is continuous) are harmless: the change
  of variables is exact for any smooth warp.

Scope: sphere silhouettes (the parameters BASELINE config 4 asks to
recover), on PRIMARY rays (``warped_primary_rays``, analytic u-gradients)
and — round 3 — on SECONDARY lambertian bounce rays
(``warped_scatter_dirs``, the per-bounce reparameterization of the
scattering direction from Bangaru et al. 2020 §5, with jvp-derived
u-gradients): the sub-pixel warp construction is reused verbatim in the
2-D scatter-draw space, where the occluder silhouette seen from the hit
point is the zero set of the same ray-sphere discriminant.  This carries
SHADOW boundary terms (an occluder visible only through its shadow gets a
usable gradient — tests/test_silhouette.py::test_secondary_silhouette_warp_fd_vs_ad).
Remaining interior-only couplings: specular/isotropic bounce directions,
MIS light-sample visibility, and receiver-geometry-driven shadow motion
(the warp field detaches the bounce origin/normal, matching the primary
warp's detached-origin convention).
The reference has no gradients of any kind (it is a forward renderer).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..scene import Scene

_SIGMA = 0.5  # bump width in sub-pixel (jitter) units


def _disc_terms(u, base, du, dv, o, time, C, V, r):
    """Discriminant and its analytic u-gradient for every (ray, sphere).

    u: [R,2] jitter; base/du/dv: ray-direction affine frame ([R,3]/[3]/[3]);
    o: [R,3] origins; time: [R]; C/V/r: sphere arrays.
    Returns (disc [R,N], gx [R,N], gy [R,N]).
    """
    hi = jax.lax.Precision.HIGHEST
    d = base + u[:, 0:1] * du[None, :] + u[:, 1:2] * dv[None, :]  # [R,3]
    tcol = time[:, None]

    d_C = jnp.dot(d, C.T, precision=hi)  # [R,N]
    d_V = jnp.dot(d, V.T, precision=hi)
    o_C = jnp.dot(o, C.T, precision=hi)
    o_V = jnp.dot(o, V.T, precision=hi)
    C2 = jnp.sum(C * C, axis=-1)
    CV = jnp.sum(C * V, axis=-1)
    V2 = jnp.sum(V * V, axis=-1)
    o2 = jnp.sum(o * o, axis=-1)
    d_o = jnp.sum(d * o, axis=-1)
    a = jnp.sum(d * d, axis=-1)

    h = d_C + tcol * d_V - d_o[:, None]  # [R,N]
    cc2 = C2[None, :] + 2.0 * tcol * CV[None, :] + (tcol * tcol) * V2[None, :]
    c0 = cc2 - 2.0 * (o_C + tcol * o_V) + o2[:, None] - (r * r)[None, :]
    disc = h * h - a[:, None] * c0

    # analytic u-gradients: ∂d/∂u_x = du, ∂h/∂u_x = du·cc - du·o,
    # ∂a/∂u_x = 2 d·du, c0 independent of u.
    du_C = jnp.dot(du, C.T)  # [N]
    du_V = jnp.dot(du, V.T)
    dv_C = jnp.dot(dv, C.T)
    dv_V = jnp.dot(dv, V.T)
    du_o = jnp.dot(o, du)  # [R]
    dv_o = jnp.dot(o, dv)
    h_x = du_C[None, :] + tcol * du_V[None, :] - du_o[:, None]
    h_y = dv_C[None, :] + tcol * dv_V[None, :] - dv_o[:, None]
    a_x = 2.0 * jnp.dot(d, du)  # [R]
    a_y = 2.0 * jnp.dot(d, dv)
    gx = 2.0 * h * h_x - a_x[:, None] * c0
    gy = 2.0 * h * h_y - a_y[:, None] * c0
    return disc, gx, gy


def _warp_field(u, base, du, dv, o, time, scene: Scene, scene_d: Scene):
    """W(u) [R,2]: zero-valued warp carrying the silhouette θ-derivative."""
    # attached-θ and detached-θ normalized discriminants; the DETACHED pass
    # defines the geometry of the warp field (normals, bump weights) while
    # staying fully differentiable in u
    disc_a, _, _ = _disc_terms(u, base, du, dv, o, time,
                               scene.sph_center, scene.sph_cvel,
                               scene.sph_radius)
    disc_det, gx, gy = _disc_terms(u, base, du, dv, o, time,
                                   scene_d.sph_center, scene_d.sph_cvel,
                                   scene_d.sph_radius)
    # +1e-30 keeps sqrt differentiable when the u-gradient vanishes exactly
    # (e.g. the zero-radius PADDING sphere with the camera at the origin:
    # disc == gx == gy == 0 there, and sqrt'(0)=inf would poison every
    # gradient through 0*NaN even though the mask zeroes the term's value)
    gnorm = jnp.sqrt(gx * gx + gy * gy + 1e-30)
    # normalize by the silhouette scale; soft floor keeps T smooth where the
    # u-gradient degenerates (ray through sphere center / grazing setups)
    scale = jnp.maximum(gnorm, 1e-3 * (jnp.abs(disc_det) + 1e-12))
    phi_a = disc_a / scale
    phi_d = disc_det / scale
    delta = phi_a - phi_d  # == 0 in value; ∂θ delta = ∂θ φ̂
    k = jnp.exp(-(phi_d / _SIGMA) ** 2) * scene.sph_mask[None, :]
    nx = gx / scale
    ny = gy / scale
    wx = -jnp.sum(k * delta * nx, axis=-1)  # [R]
    wy = -jnp.sum(k * delta * ny, axis=-1)
    return jnp.stack([wx, wy], axis=-1)


def warped_primary_rays(scene: Scene, cam, px, py, draws, strat=None):
    """Drop-in replacement for camera.generate_rays with the silhouette
    warp applied to the sub-pixel jitter.

    Returns (origin [R,3], direction [R,3], time [R], weight [R]) where
    weight = det(∂T/∂u) (≡ 1 in value) multiplies the sample's radiance.
    Forward renders are bit-identical to the unwarped path (same draw
    layout as camera.generate_rays)."""
    from .rng import in_unit_disk

    dt = draws.dtype
    if strat is None:
        ox = draws[:, 0] - 0.5
        oy = draws[:, 1] - 0.5
    else:
        s_i, s_j, sqrt_spp = strat
        recip = 1.0 / sqrt_spp
        ox = (s_i + draws[:, 0]) * recip - 0.5
        oy = (s_j + draws[:, 1]) * recip - 0.5
    u = jnp.stack([ox, oy], axis=-1)  # [R,2]

    if cam.lens_radius_gt0:
        disk = in_unit_disk(draws[:, 2], draws[:, 3])
        origin = (cam.center[None, :]
                  + disk[:, 0:1] * cam.defocus_disk_u[None, :]
                  + disk[:, 1:2] * cam.defocus_disk_v[None, :])
    else:
        origin = jnp.broadcast_to(cam.center[None, :],
                                  (px.shape[0], 3)).astype(dt)
    time = draws[:, 4]
    base = (cam.pixel00[None, :]
            + px[:, None] * cam.pixel_delta_u[None, :]
            + py[:, None] * cam.pixel_delta_v[None, :]
            - origin)

    sg = jax.lax.stop_gradient
    import dataclasses

    scene_d = dataclasses.replace(
        scene, sph_center=sg(scene.sph_center), sph_cvel=sg(scene.sph_cvel),
        sph_radius=sg(scene.sph_radius))

    def W(uu):
        return _warp_field(uu, base, cam.pixel_delta_u, cam.pixel_delta_v,
                           sg(origin), sg(time), scene, scene_d)

    e1 = jnp.broadcast_to(jnp.asarray([1.0, 0.0], dt), u.shape)
    e2 = jnp.broadcast_to(jnp.asarray([0.0, 1.0], dt), u.shape)
    w_val, j1 = jax.jvp(W, (u,), (e1,))  # ∂W/∂u_x [R,2]
    _, j2 = jax.jvp(W, (u,), (e2,))
    det = ((1.0 + j1[:, 0]) * (1.0 + j2[:, 1]) - j1[:, 1] * j2[:, 0])

    u_w = u + w_val  # value-identical; derivative tracks the silhouette
    pixel_sample = (cam.pixel00[None, :]
                    + (px + u_w[:, 0])[:, None] * cam.pixel_delta_u[None, :]
                    + (py + u_w[:, 1])[:, None] * cam.pixel_delta_v[None, :])
    direction = pixel_sample - origin
    return origin, direction, time, det


# ---------------------------------------------------------------------------
# Secondary bounces: per-bounce scatter-direction reparameterization
# ---------------------------------------------------------------------------


def _sphere_disc(o, d, time, C, V, r):
    """Ray-quadric discriminant [R,N] of rays (o, d(+time motion)) against
    every sphere — the same expansion as :func:`_disc_terms` without the
    analytic u-gradients (the secondary warp derives those by jvp through
    the draws->direction map instead)."""
    hi = jax.lax.Precision.HIGHEST
    tcol = time[:, None]
    d_C = jnp.dot(d, C.T, precision=hi)
    d_V = jnp.dot(d, V.T, precision=hi)
    o_C = jnp.dot(o, C.T, precision=hi)
    o_V = jnp.dot(o, V.T, precision=hi)
    C2 = jnp.sum(C * C, axis=-1)
    CV = jnp.sum(C * V, axis=-1)
    V2 = jnp.sum(V * V, axis=-1)
    o2 = jnp.sum(o * o, axis=-1)
    d_o = jnp.sum(d * o, axis=-1)
    a = jnp.sum(d * d, axis=-1)
    h = d_C + tcol * d_V - d_o[:, None]
    cc2 = (C2[None, :] + 2.0 * tcol * CV[None, :]
           + (tcol * tcol) * V2[None, :])
    c0 = cc2 - 2.0 * (o_C + tcol * o_V) + o2[:, None] - (r * r)[None, :]
    return h * h - a[:, None] * c0


def warped_scatter_dirs(u, origin, normal, time, scene: Scene):
    """Warp the 2 lambertian scatter uniforms so sphere silhouettes seen
    from the bounce origin are θ-stationary (Bangaru et al. 2020 §5 applied
    to ``dir(u) = normal + unit_vector(u)``).

    u: [R,2] scatter draws; origin/normal: [R,3] hit point + shading
    normal; time: [R].  Returns (direction [R,3], det [R]) — the direction
    is bit-identical in value to materials.scatter's lambertian branch
    (same near-zero guard), det ≡ 1 in value; both carry the visibility
    boundary derivative w.r.t. the SCENE SPHERE arrays.  The warp-field
    geometry uses the detached origin/normal (primary-warp convention)."""
    from .rng import unit_vector

    sg = jax.lax.stop_gradient
    o_d = sg(origin)
    n_d = sg(normal)
    t_d = sg(time)
    C_a, V_a, r_a = scene.sph_center, scene.sph_cvel, scene.sph_radius
    C_d, V_d, r_d = sg(C_a), sg(V_a), sg(r_a)
    mask = sg(scene.sph_mask)

    def dir_of(uu):
        # the WARP-FIELD direction map only: sqrt floor keeps the jvp at
        # the z = ±1 poles (u2 drawn exactly 0) finite; the FINAL returned
        # direction below uses the exact unit_vector so the value path
        # stays bit-identical to materials.scatter
        from .rng import TWO_PI

        a = uu[:, 0] * TWO_PI
        z = uu[:, 1] * 2.0 - 1.0
        rr = jnp.sqrt(jnp.maximum(1e-12, 1.0 - z * z))
        return n_d + jnp.stack(
            [rr * jnp.cos(a), rr * jnp.sin(a), z], axis=-1)

    def disc_attached(uu):
        return _sphere_disc(o_d, dir_of(uu), t_d, C_a, V_a, r_a)

    def disc_detached(uu):
        return _sphere_disc(o_d, dir_of(uu), t_d, C_d, V_d, r_d)

    dt = u.dtype
    e1 = jnp.broadcast_to(jnp.asarray([1.0, 0.0], dt), u.shape)
    e2 = jnp.broadcast_to(jnp.asarray([0.0, 1.0], dt), u.shape)

    def W(uu):
        disc_det, gx = jax.jvp(disc_detached, (uu,), (e1,))
        _, gy = jax.jvp(disc_detached, (uu,), (e2,))
        disc_a = disc_attached(uu)
        # same normalization/bump/floor construction as _warp_field
        gnorm = jnp.sqrt(gx * gx + gy * gy + 1e-30)
        scale = jnp.maximum(gnorm, 1e-3 * (jnp.abs(disc_det) + 1e-12))
        delta = (disc_a - disc_det) / scale  # == 0 in value; ∂θ = ∂θ φ̂
        k = jnp.exp(-(disc_det / scale / _SIGMA) ** 2) * mask[None, :]
        wx = -jnp.sum(k * delta * (gx / scale), axis=-1)
        wy = -jnp.sum(k * delta * (gy / scale), axis=-1)
        return jnp.stack([wx, wy], axis=-1)

    w_val, j1 = jax.jvp(W, (u,), (e1,))
    _, j2 = jax.jvp(W, (u,), (e2,))
    det = ((1.0 + j1[:, 0]) * (1.0 + j2[:, 1]) - j1[:, 1] * j2[:, 0])

    u_w = u + w_val  # value-identical
    # final direction uses the ATTACHED normal (the interior/reparameterized
    # normal gradient) — exactly materials.scatter's lambertian form,
    # near-zero guard included
    lam = normal + unit_vector(u_w[:, 0], u_w[:, 1])
    near_zero = jnp.sum(lam * lam, axis=-1) < 1e-16
    lam = jnp.where(near_zero[:, None], normal, lam)
    return lam, det
