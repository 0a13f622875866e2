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
    scene = _scene()
    key = jax.random.key(3)
    a = float(_loss(scene, key, 8, warp=True))
    b = float(_loss(scene, key, 8, warp=False))
    assert a == b


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
