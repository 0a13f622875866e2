"""Round-5 TPU tests: the SEGMENTED between-launch lane sort in the live
persist kernel.

Sorting (global or segmented) permutes which PRNG tile a lane occupies, so
cross-variant agreement is STATISTICAL (same estimator, different streams)
— the same contract test_round4_tpu pins for sorted-vs-unsorted.  The
segment-local permutation/restore algebra is pinned exactly on CPU in
tests/test_ray_sort.py; here the whole render must agree through it.
"""

import jax
import numpy as np
import pytest

from rustraytrace_tpu import models
from rustraytrace_tpu.config import derive_camera

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="megakernel PRNG is TPU-only (no CPU/interpret lowering)",
)


def test_segmented_sort_matches_global_sort_mean(monkeypatch):
    import rustraytrace_tpu.ops.pallas_wavefront as wf
    from rustraytrace_tpu.render import render_pass

    scene, cfg, _ = models.book1_random_spheres(
        dict(image_width=400, samples_per_pixel=32, max_depth=12))
    cam = derive_camera(cfg)
    w, h = cfg.image_width, cfg.image_height

    def go(seg_lanes):
        monkeypatch.setattr(wf, "SORT_SEG_LANES", seg_lanes)
        # SORT_SEG_LANES is read at trace time; identical statics would
        # otherwise hit the jit cache and reuse the other variant's trace
        wf._wavefront_pass_persist.clear_cache()
        acc = np.asarray(render_pass(
            scene, cam, jax.random.key(3), width=w, height=h, spp=32,
            max_depth=12, integrator="path", backend="wavefront"))
        return acc / 32

    # small segments => ~13 segments at this frame; huge => 1 (global)
    seg = go(16384)
    glob = go(1 << 62)
    assert np.isfinite(seg).all() and np.isfinite(glob).all()
    # same estimator, independent streams: means agree statistically
    np.testing.assert_allclose(seg.mean(), glob.mean(), rtol=2e-3)
    np.testing.assert_allclose(seg.mean(axis=(0, 1)), glob.mean(axis=(0, 1)),
                               rtol=5e-3)
