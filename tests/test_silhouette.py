"""Silhouette (visibility) gradient tests for the warped-area
reparameterization (ops/warp.py).

A diffuse sphere against the sky: moving its center laterally changes pixel
COVERAGE — a boundary term invisible to interior autodiff.  With the warp,
reverse-mode AD of the image loss must match central finite differences
computed with common random numbers; without it, AD misses most of the
gradient.  The warp is value-transparent: forward renders are bit-identical.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from rustraytrace_tpu.config import RenderConfig, derive_camera
from rustraytrace_tpu.diff import render_mean
from rustraytrace_tpu.parallel import make_mesh
from rustraytrace_tpu.scene import SceneBuilder

CFG = RenderConfig(aspect_ratio=1.0, image_width=24, samples_per_pixel=64,
                   max_depth=3, vfov=45.0, lookfrom=(0.0, 0.0, 0.0),
                   lookat=(0.0, 0.0, -1.0), focus_dist=1.0)


def _scene(cx: float = 0.0):
    b = SceneBuilder()
    b.add_sphere((cx, 0.0, -2.0), 0.5, b.lambertian((0.8, 0.2, 0.1)))
    return b.build()


def _loss(scene, key, spp, warp=True):
    cam = derive_camera(CFG)
    mesh = make_mesh(jax.devices()[:1])
    img = render_mean(scene, cam, key, width=24, height=24, spp=spp,
                      max_depth=3, mesh=mesh, chunk=576, warp_primary=warp)
    return jnp.sum(img)


def test_warp_forward_values_bit_identical():
    """The warp machinery is value-transparent: warp=True and the plain
    tent-filtered forward (warp="tent") are bit-identical.  (Round 5: the
    differentiable path samples pixels through a TENT filter — see the
    pixel-edge-flux note in ops/warp.py — so the comparison point is the
    tent forward, not the production box filter.)"""
    scene = _scene()
    key = jax.random.key(3)
    a = float(_loss(scene, key, 8, warp=True))
    b = float(_loss(scene, key, 8, warp="tent"))
    assert a == b


def test_splat_weights_partition_of_unity():
    """The tent-splat weights over the 2x2 neighborhood sum to exactly 1
    (partition of unity — what makes the cell-edge flux cancel for any
    loss cotangent), are bilinear in the jitter, and pick the neighbor on
    the jitter's side."""
    from rustraytrace_tpu.ops.warp import splat_weights

    rng = np.random.default_rng(5)
    u = jnp.asarray(rng.uniform(-0.5, 0.5, (257, 2)), jnp.float32)
    dx, dy, w00, w10, w01, w11 = splat_weights(u)
    total = np.asarray(w00 + w10 + w01 + w11)
    np.testing.assert_allclose(total, 1.0, atol=1e-6)
    assert np.all(np.asarray(w00) >= 0) and np.all(np.asarray(w11) >= 0)
    np.testing.assert_array_equal(
        np.asarray(dx), np.where(np.asarray(u[:, 0]) >= 0, 1, -1))
    # centered sample: all weight on its own pixel
    _, _, c00, c10, c01, c11 = splat_weights(jnp.zeros((1, 2)))
    assert float(c00[0]) == 1.0 and float(c10[0] + c01[0] + c11[0]) == 0.0


def test_silhouette_center_fd_vs_ad():
    key = jax.random.key(3)
    spp = 256
    base = _scene()

    def loss_of_cx(cx):
        s = dataclasses.replace(
            base, sph_center=base.sph_center.at[0, 0].set(cx))
        return _loss(s, key, spp, warp=True)

    ad = float(jax.grad(loss_of_cx)(jnp.asarray(0.0)))
    eps = 0.02
    fd = (float(loss_of_cx(jnp.asarray(eps)))
          - float(loss_of_cx(jnp.asarray(-eps)))) / (2 * eps)
    assert abs(fd) > 1e-3  # the coverage term is real on this setup
    assert abs(ad - fd) <= 0.15 * abs(fd), (ad, fd)

    # interior-only AD misses most of the boundary term
    def loss_nowarp(cx):
        s = dataclasses.replace(
            base, sph_center=base.sph_center.at[0, 0].set(cx))
        return _loss(s, key, spp, warp=False)

    ad_interior = float(jax.grad(loss_nowarp)(jnp.asarray(0.0)))
    assert abs(ad_interior - fd) > 2.0 * abs(ad - fd), (ad_interior, ad, fd)


def test_silhouette_radius_fd_vs_ad():
    """Radius growth = pure coverage change (the classic silhouette dof)."""
    key = jax.random.key(9)
    spp = 256
    base = _scene()

    def loss_of_r(r):
        s = dataclasses.replace(
            base, sph_radius=base.sph_radius.at[0].set(r))
        return _loss(s, key, spp, warp=True)

    ad = float(jax.grad(loss_of_r)(jnp.asarray(0.5)))
    eps = 0.01
    fd = (float(loss_of_r(jnp.asarray(0.5 + eps)))
          - float(loss_of_r(jnp.asarray(0.5 - eps)))) / (2 * eps)
    assert abs(fd) > 1e-3
    assert abs(ad - fd) <= 0.15 * abs(fd), (ad, fd)


def test_mse_offset_state_fd_vs_ad():
    """REGRESSION PIN for the round-5 pixel-edge-flux fix (ops/warp.py):
    with a per-pixel (MSE) loss at an OFFSET state, the box-filter warp's
    AD gradient carried a spurious pixel-edge flux term — it captured only
    60-77% of the lateral FD gradient and got DEPTH (cz) backwards
    (measured: ad=-0.054 vs fd=+0.061), which made the BASELINE-config-4
    fit diverge after nearly converging.  Under the tent filter the flux
    term vanishes; this pins sign+magnitude for cx and SIGN for cz (the
    ~15% residual is the documented secondary scope bias + MC noise)."""
    spp = 64
    target = render_mean(_scene(), derive_camera(CFG), jax.random.key(42),
                         width=24, height=24, spp=spp, max_depth=3,
                         mesh=make_mesh(jax.devices()[:1]), chunk=576)
    base = dataclasses.replace(
        _scene(), sph_center=jnp.asarray([[0.08, -0.05, -1.9]], jnp.float32))
    cam = derive_camera(CFG)
    mesh = make_mesh(jax.devices()[:1])

    def loss_with(delta3, key):
        s = dataclasses.replace(
            base, sph_center=base.sph_center.at[0].add(delta3))
        img = render_mean(s, cam, key, width=24, height=24, spp=spp,
                          max_depth=3, mesh=mesh, chunk=576,
                          warp_primary=True)
        return jnp.mean((img - target) ** 2)

    for axis, rel_band in [(0, 0.35), (2, None)]:
        ads, fds = [], []
        eps = 0.02
        for k in range(8):
            key = jax.random.key(100 + k)
            g = jax.grad(lambda d: loss_with(
                jnp.zeros(3).at[axis].set(d), key))(jnp.asarray(0.0))
            ads.append(float(g))
            lp = float(loss_with(jnp.zeros(3).at[axis].set(eps), key))
            lm = float(loss_with(jnp.zeros(3).at[axis].set(-eps), key))
            fds.append((lp - lm) / (2 * eps))
        ad, fd = np.mean(ads), np.mean(fds)
        assert ad * fd > 0, (axis, ad, fd)  # matching sign
        if rel_band is not None:
            assert abs(ad - fd) <= rel_band * abs(fd), (axis, ad, fd)


def test_secondary_silhouette_residual_bias_quantified():
    """SCOPE DOCUMENTATION (round 3): the warp covers PRIMARY silhouettes
    only (ops/warp.py scope note).  This test pins the residual bias
    through a SECONDARY (shadow) silhouette: a sphere occluder floats
    between an emissive quad and a diffuse floor, outside the camera
    frustum — moving it laterally only moves the shadow, a visibility
    boundary crossed by BOUNCE rays.  Central finite differences see the
    full gradient; AD (warp on) must miss most of it, because the
    boundary term lives on secondary rays the warp does not cover.

    If this test ever FAILS on the `ad/fd` bound because AD caught up, the
    warp gained secondary coverage — move the bound, and delete the scope
    note.  (Round 4 tried exactly that — a per-bounce scatter-draw warp —
    and removed it after FD-vs-AD validation failed; the measured post-
    mortem is in ops/warp.py's module docstring.  This test remains the
    pinned statement of the primary-only scope.)"""
    key = jax.random.key(7)
    spp = 512

    def build(ox: float):
        b = SceneBuilder()
        # diffuse floor filling the view
        b.add_quad((-4.0, -1.0, -6.0), (8.0, 0.0, 0.0), (0.0, 0.0, 6.0),
                   b.lambertian((0.7, 0.7, 0.7)))
        # overhead emissive quad
        b.add_quad((-1.0, 3.0, -4.0), (2.0, 0.0, 0.0), (0.0, 0.0, 2.0),
                   b.diffuse_light((12.0, 12.0, 12.0)))
        # occluder ABOVE the camera frustum: visible only to bounce rays
        b.add_sphere((ox, 1.5, -3.0), 0.6, b.lambertian((0.1, 0.1, 0.1)))
        return b.build()

    cfg = RenderConfig(aspect_ratio=1.0, image_width=20,
                       samples_per_pixel=spp, max_depth=3, vfov=35.0,
                       lookfrom=(0.0, 0.0, 0.0), lookat=(0.0, -0.8, -3.0),
                       background=(0.0, 0.0, 0.0), focus_dist=1.0)
    cam = derive_camera(cfg)
    mesh = make_mesh(jax.devices()[:1])

    def loss_of_ox(ox):
        s = build(0.0)
        s = dataclasses.replace(
            s, sph_center=s.sph_center.at[0, 0].add(ox))
        img = render_mean(s, cam, key, width=20, height=20, spp=spp,
                          max_depth=3, mesh=mesh, chunk=400,
                          warp_primary=True)
        return jnp.sum(img)

    ad = float(jax.grad(loss_of_ox)(jnp.asarray(0.0)))
    eps = 0.05
    fd = (float(loss_of_ox(jnp.asarray(eps)))
          - float(loss_of_ox(jnp.asarray(-eps)))) / (2 * eps)
    # the shadow boundary term is real and significant
    assert abs(fd) > 1e-2, fd
    # and AD misses most of it: the quantified residual bias of the
    # primary-only warp (measured on this setup: fd = 9.0, ad = 0.0 —
    # the occluder couples to the image ONLY through the shadow boundary,
    # so interior AD carries exactly none of it)
    assert abs(ad) < 0.5 * abs(fd), (ad, fd)


def test_splat_energy_conserved_flat_background():
    """Partition-of-unity + border clamping conserve energy EXACTLY at
    the image level: on a flat-background scene every sample carries the
    same radiance, and since the four splat weights sum to 1 and
    out-of-image weights clamp back inside, the IMAGE MEAN equals the
    background exactly per realization (any leak at borders would show
    up as a deficit).  Per-pixel values fluctuate around it — the
    unnormalized splat estimator is unbiased with per-pixel WEIGHT noise
    (a pixel's realized weight sum varies around spp), which is the
    price of the partition-of-unity filter; pin a loose per-pixel band
    too so a gross per-pixel bug cannot hide behind the exact mean."""
    from rustraytrace_tpu import RenderConfig, SceneBuilder

    b = SceneBuilder()
    # one sphere far behind the camera: scene non-empty, never hit
    b.add_sphere((0.0, 0.0, 50.0), 0.5, b.lambertian((0.5, 0.5, 0.5)))
    scene = b.build()
    cfg = RenderConfig(aspect_ratio=1.0, image_width=16,
                       samples_per_pixel=8, max_depth=3, vfov=40.0,
                       lookfrom=(0, 0, 0), lookat=(0, 0, -1),
                       background=(0.3, 0.5, 0.7), focus_dist=1.0)
    cam = derive_camera(cfg)
    mesh = make_mesh(jax.devices()[:1])
    for warp in (True, "tent"):
        img = np.asarray(render_mean(
            scene, cam, jax.random.key(2), width=16, height=16, spp=8,
            max_depth=3, mesh=mesh, chunk=256, warp_primary=warp))
        np.testing.assert_allclose(
            img.mean(axis=(0, 1)), [0.3, 0.5, 0.7], rtol=1e-6)
        ratio = img / np.asarray([0.3, 0.5, 0.7])
        assert ratio.min() > 0.5 and ratio.max() < 1.6, (
            ratio.min(), ratio.max())
