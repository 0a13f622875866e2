"""Round-4 TPU tests: spatial-split grid binning in the live kernel.

The grid layout changes ONLY the cluster decomposition (cells + duplicated
slots + clipped AABBs); every admitted sphere is tested with the identical
quadric and identical attributes, and the PRNG streams don't depend on the
table layout — so the radiance must be BIT-IDENTICAL to the SAH layout, not
merely statistically equal.  That is the strongest possible correctness
statement for the representation change (tests/test_sphere_grid.py pins the
host-side logic on CPU).
"""

import os

import jax
import numpy as np
import pytest

from rustraytrace_tpu import models
from rustraytrace_tpu.config import derive_camera

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="megakernel PRNG is TPU-only (no CPU/interpret lowering)",
)


def _render(scene, cfg, monkeypatch, no_grid: bool):
    from rustraytrace_tpu.ops.pallas_megakernel import render_pass_megakernel

    if no_grid:
        monkeypatch.setenv("RTT_NO_SPHERE_GRID", "1")
    else:
        monkeypatch.delenv("RTT_NO_SPHERE_GRID", raising=False)
    cam = derive_camera(cfg)
    return np.asarray(render_pass_megakernel(
        scene, cam, jax.random.key(5), width=cfg.image_width,
        height=cfg.image_height, spp=4, max_depth=8, respawn=True))


def test_grid_layout_bit_identical_dense_cloud(monkeypatch):
    """A dense synthetic cloud (fill > threshold -> grid-binned) renders
    bit-identically to its SAH layout."""
    from rustraytrace_tpu.scene import SceneBuilder

    rng = np.random.default_rng(11)
    b = SceneBuilder()
    b.add_sphere((0.0, -1000.0, 0.0), 1000.0, b.lambertian((0.5, 0.5, 0.5)))
    for c in rng.uniform(0, 60, (200, 3)):
        b.add_sphere((float(c[0]) - 30.0, float(c[1]) + 5.0,
                      float(c[2]) - 90.0), 5.0,
                     b.lambertian((0.9, 0.9, 0.9)))
    scene = b.build()
    from rustraytrace_tpu.config import RenderConfig

    cfg = RenderConfig(aspect_ratio=1.0, image_width=64,
                       samples_per_pixel=4, max_depth=8, vfov=40.0,
                       lookfrom=(0.0, 10.0, 60.0), lookat=(0.0, 5.0, -60.0),
                       focus_dist=10.0)
    img_sah = _render(scene, cfg, monkeypatch, no_grid=True)
    img_grid = _render(scene, cfg, monkeypatch, no_grid=False)
    np.testing.assert_array_equal(img_sah, img_grid)


def test_grid_layout_bit_identical_book2_final_wavefront(monkeypatch):
    """book2_final through its real dispatcher (segmented wavefront with
    texel resolve): grid vs SAH layouts stay bit-identical end-to-end."""
    from rustraytrace_tpu.render import render_pass

    scene, cfg, _ = models.book2_final_scene(
        dict(image_width=80, samples_per_pixel=4, max_depth=8))
    cam = derive_camera(cfg)

    def go():
        return np.asarray(render_pass(
            scene, cam, jax.random.key(3), width=cfg.image_width,
            height=cfg.image_height, spp=4, max_depth=8,
            backend="wavefront"))

    monkeypatch.setenv("RTT_NO_SPHERE_GRID", "1")
    img_sah = go()
    monkeypatch.delenv("RTT_NO_SPHERE_GRID")
    img_grid = go()
    np.testing.assert_array_equal(img_sah, img_grid)
