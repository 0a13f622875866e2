"""Golden-render regression tests.

Tiny XLA-path renders with a fixed key are fully deterministic (threefry
streams + fixed summation order), so they pin the INTEGRATOR SEMANTICS: any
unintended change to intersection, shading, textures, RR, NEE/MIS, media
sampling, or RNG layout shifts these images far beyond the tolerance.
Regenerate deliberately when semantics change on purpose:

    python scripts/regen_goldens.py
"""

import os

import jax
import numpy as np
import pytest

from rustraytrace_tpu import models
from rustraytrace_tpu.config import derive_camera
from rustraytrace_tpu.render import render_pass

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")

# name -> (scene builder attr, integrator, width, spp, depth)
CASES = {
    "book1_trio": ("book1_three_spheres", "path", 24, 64, 6),
    "cornell_mis": ("book3_cornell_box", "mis", 24, 64, 6),
    "smoke": ("book2_cornell_smoke", "path", 24, 64, 6),
    "bouncing": ("book2_bouncing_spheres", "path", 24, 64, 6),
    # round-2 additions: image-texture path (earth), Perlin marble, quads,
    # and a tiny book2_final (boxes + media + noise + image + motion)
    "earth": ("book2_earth", "path", 24, 64, 6),
    "perlin": ("book2_perlin_spheres", "path", 24, 64, 6),
    "quads": ("book2_quads", "path", 24, 64, 6),
    "final_tiny": ("book2_final_scene", "path", 24, 16, 5),
    # 10k-sphere scaling scene: pins the wide-field builder + seeded layout
    "field10k_tiny": ("sphere_field_10k", "path", 24, 8, 4),
}


def _render(scene_name, integ, w, spp, depth):
    scene, cfg, _ = getattr(models, scene_name)(dict(image_width=w))
    cam = derive_camera(cfg)
    h = cfg.image_height
    return np.asarray(render_pass(
        scene, cam, jax.random.key(77), backend="xla", integrator=integ,
        width=w, height=h, spp=spp, max_depth=depth, chunk=w * h,
        stratified=False)) / spp


@pytest.mark.parametrize("name", sorted(CASES))
def test_golden(name):
    with np.load(os.path.join(GOLDEN_DIR, f"{name}.npz")) as z:
        golden = z["img"]
    img = _render(*CASES[name])
    # identical platform/key => near-bitwise; cross-platform fp drift margin
    np.testing.assert_allclose(img, golden, rtol=2e-4, atol=2e-4)
