#!/usr/bin/env python
"""FD-vs-AD per center axis on the minimal silhouette scene, at several
offsets — isolates which motion directions the warp gets wrong."""

import dataclasses
import sys

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from rustraytrace_tpu.config import RenderConfig, derive_camera
from rustraytrace_tpu.diff import render_mean
from rustraytrace_tpu.parallel import make_mesh
from rustraytrace_tpu.scene import SceneBuilder

CFG = RenderConfig(aspect_ratio=1.0, image_width=24, samples_per_pixel=64,
                   max_depth=3, vfov=45.0, lookfrom=(0.0, 0.0, 0.0),
                   lookat=(0.0, 0.0, -1.0), focus_dist=1.0)


def _scene(extra=False):
    b = SceneBuilder()
    b.add_sphere((0.0, 0.0, -2.0), 0.5, b.lambertian((0.8, 0.2, 0.1)))
    if extra:
        b.add_sphere((0.0, -100.5, -1.0), 100.0,
                     b.lambertian((0.6, 0.6, 0.6)))
    return b.build()


def main():
    extra = "ground" in sys.argv
    key = jax.random.key(3)
    spp = 256
    base = _scene(extra)
    cam = derive_camera(CFG)
    mesh = make_mesh(jax.devices()[:1])

    def loss_with(delta3):
        s = dataclasses.replace(
            base, sph_center=base.sph_center.at[0].add(jnp.asarray(delta3)))
        img = render_mean(s, cam, key, width=24, height=24, spp=spp,
                          max_depth=3, mesh=mesh, chunk=576,
                          warp_primary=True)
        return jnp.sum(img)

    for axis, name in [(0, "cx"), (1, "cy"), (2, "cz")]:
        g = jax.grad(lambda d: loss_with(
            jnp.zeros(3).at[axis].set(d)))(jnp.asarray(0.0))
        eps = 0.02
        fd = (float(loss_with(jnp.zeros(3).at[axis].set(eps)))
              - float(loss_with(jnp.zeros(3).at[axis].set(-eps)))) / (2 * eps)
        print(f"{name}: ad={float(g):+.4f}  fd={fd:+.4f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
