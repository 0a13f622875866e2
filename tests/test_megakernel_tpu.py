"""Megakernel-vs-XLA validation across every kernel variant — TPU only.

The megakernel's on-core PRNG (pltpu.prng_seed) has no CPU lowering, so
these tests skip on the CPU CI mesh and run when the suite executes on a
real TPU (they reproduce the validation performed on hardware during
development: radiance means match the XLA integrator to ~2e-3 despite
different RNG streams).
"""

import jax
import numpy as np
import pytest

from rustraytrace_tpu import models
from rustraytrace_tpu.config import derive_camera
from rustraytrace_tpu.render import render_pass

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="megakernel PRNG is TPU-only (no CPU/interpret lowering)",
)

CASES = [
    # (scene fn, width, height, spp, depth, integrator) — each exercises a
    # distinct kernel variant
    ("book1_three_spheres", 96, 54, 64, 8, "path"),      # solid spheres
    ("book2_bouncing_spheres", 96, 54, 64, 8, "path"),   # motion + checker
    ("book2_perlin_spheres", 96, 54, 64, 8, "path"),     # in-kernel Perlin
    ("book2_cornell_box", 96, 96, 64, 10, "path"),       # quads
    ("book2_cornell_smoke", 96, 96, 64, 10, "path"),     # constant media
    ("book3_cornell_box", 96, 96, 64, 10, "mis"),        # NEE/MIS + lights
]


@pytest.mark.parametrize("name,w,h,spp,depth,integ", CASES)
def test_megakernel_matches_xla_mean(name, w, h, spp, depth, integ):
    scene, cfg, _ = getattr(models, name)(dict(image_width=w))
    cam = derive_camera(cfg)
    kw = dict(width=w, height=h, spp=spp, max_depth=depth,
              integrator=integ, chunk=w * h, stratified=False)
    img_m = np.asarray(render_pass(scene, cam, jax.random.key(1),
                                   backend="megakernel", **kw)) / spp
    img_x = np.asarray(render_pass(scene, cam, jax.random.key(2),
                                   backend="xla", **kw)) / spp
    assert np.all(np.isfinite(img_m))
    m_m, m_x = img_m.mean(), img_x.mean()
    assert abs(m_m - m_x) < 0.01 + 0.02 * m_x, (name, m_m, m_x)
