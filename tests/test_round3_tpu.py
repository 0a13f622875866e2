"""Round-3 TPU tests: unroll correctness, image-on-quad (u,v) emission, and
the MIS-enabled segmented wavefront, each validated against the XLA
integrator's radiance mean (same estimator, different RNG streams)."""

import jax
import numpy as np
import pytest

from rustraytrace_tpu import models
from rustraytrace_tpu.config import derive_camera
from rustraytrace_tpu.render import render_pass

from test_round3 import _image_quad_scene

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="megakernel PRNG is TPU-only (no CPU/interpret lowering)",
)


def test_unroll_is_bit_invariant():
    """The loop unroll tests the SAME spheres in the same order with the
    same RNG draws — radiance must be bit-identical across unroll factors
    at fixed max_leaf (measured in scripts/bench_kernel_knobs.py; pinned
    here)."""
    from rustraytrace_tpu.ops.pallas_megakernel import render_pass_megakernel

    scene, cfg, _ = models.book1_random_spheres(dict(image_width=96))
    cam = derive_camera(cfg)
    kw = dict(width=96, height=54, spp=8, max_depth=8, respawn=True)
    imgs = [np.asarray(render_pass_megakernel(
        scene, cam, jax.random.key(1), unroll=u, b_unroll=u, **kw))
        for u in (1, 4)]
    np.testing.assert_array_equal(imgs[0], imgs[1])


def test_image_on_quad_matches_xla_mean():
    """Round-3 (u,v) emission: an image-textured QUAD rides the segmented
    wavefront kernel (direct planar UV in the pend record) and must match
    the XLA mean (texture.rs:89-109 semantics)."""
    from rustraytrace_tpu.render import resolve_backend

    scene, cfg, _ = _image_quad_scene()
    assert resolve_backend(scene, "path") == "wavefront"
    cam = derive_camera(cfg)
    w, h, spp = cfg.image_width, cfg.image_height, 64
    kw = dict(width=w, height=h, spp=spp, max_depth=6, integrator="path",
              chunk=w * h, stratified=False)
    img_w = np.asarray(render_pass(scene, cam, jax.random.key(1),
                                   backend="wavefront", **kw)) / spp
    img_x = np.asarray(render_pass(scene, cam, jax.random.key(2),
                                   backend="xla", **kw)) / spp
    assert np.all(np.isfinite(img_w))
    m_w, m_x = img_w.mean(), img_x.mean()
    assert abs(m_w - m_x) < 0.01 + 0.03 * m_x, (m_w, m_x)
    # the texel pattern itself must appear (not just the mean): the images
    # must correlate strongly pixel-for-pixel at 64 spp
    c = np.corrcoef(img_w.reshape(-1), img_x.reshape(-1))[0, 1]
    assert c > 0.98, c


def test_persist_exact_sample_accounting():
    """PERSIST-mode bookkeeping exactness (image analog of
    test_wavefront_respawn_sample_accounting_exact): an image-textured
    sphere far behind the camera makes the scene take the persist path
    while every camera ray misses — each pixel's radiance SUM must equal
    spp * bg bit-exactly (no lost/double-banked samples across launches)."""
    import numpy as np

    from rustraytrace_tpu import RenderConfig, SceneBuilder
    from rustraytrace_tpu.models.scenes import _finish
    from rustraytrace_tpu.ops.pallas_wavefront import render_pass_wavefront

    b = SceneBuilder()
    img = np.full((4, 8, 3), 0.5, np.float32)
    b.add_sphere((0.0, 0.0, 1000.0), 1.0,
                 b.lambertian(tex=b.image_texture(img)))
    cfg = RenderConfig(image_width=64, samples_per_pixel=32, max_depth=8,
                       background=(0.25, 0.5, 0.75),
                       lookfrom=(0.0, 0.0, 0.0), lookat=(0.0, 0.0, -1.0))
    scene, cfg, _ = _finish(b, cfg, "path", None)
    cam = derive_camera(cfg)
    h, w, spp = cfg.image_height, cfg.image_width, 32
    acc = np.asarray(render_pass_wavefront(
        scene, cam, jax.random.key(3), width=w, height=h, spp=spp,
        max_depth=8))
    expect = np.broadcast_to(
        np.float32(spp) * np.asarray([0.25, 0.5, 0.75], np.float32),
        (h, w, 3))
    np.testing.assert_array_equal(acc, expect)


def test_persist_matches_per_bounce_segments_mean():
    """The persist kernel and the per-bounce segment loop are the same
    estimator with different launch partitioning — their radiance means on
    the earth globe must agree (streams differ; 64 spp statistics)."""
    from rustraytrace_tpu.ops.pallas_wavefront import render_pass_wavefront

    scene, cfg, _ = models.book2_earth(dict(image_width=96))
    cam = derive_camera(cfg)
    kw = dict(width=96, height=54, spp=64, max_depth=8)
    a = np.asarray(render_pass_wavefront(
        scene, cam, jax.random.key(1), **kw)) / 64
    b = np.asarray(render_pass_wavefront(
        scene, cam, jax.random.key(2), per_bounce_segments=True, **kw)) / 64
    assert np.all(np.isfinite(a))
    assert abs(a.mean() - b.mean()) < 0.01 + 0.03 * b.mean(), (
        a.mean(), b.mean())


def test_wavefront_mis_image_matches_xla_mean():
    """Round-3 wavefront MIS: an image+MIS scene runs the segmented kernel
    with the in-kernel NEE/MIS closures and must match the XLA MIS mean."""
    from rustraytrace_tpu.render import resolve_backend

    scene, cfg, integ = _image_quad_scene(mis=True)
    assert integ == "mis"
    assert resolve_backend(scene, "mis") == "wavefront"
    cam = derive_camera(cfg)
    w, h, spp = cfg.image_width, cfg.image_height, 64
    kw = dict(width=w, height=h, spp=spp, max_depth=8, integrator="mis",
              chunk=w * h, stratified=False)
    img_w = np.asarray(render_pass(scene, cam, jax.random.key(1),
                                   backend="wavefront", **kw)) / spp
    img_x = np.asarray(render_pass(scene, cam, jax.random.key(2),
                                   backend="xla", **kw)) / spp
    assert np.all(np.isfinite(img_w))
    m_w, m_x = img_w.mean(), img_x.mean()
    assert abs(m_w - m_x) < 0.01 + 0.03 * m_x, (m_w, m_x)


def test_motion_split_is_bit_invariant():
    """The static/moving split only re-partitions the intersect loop (and
    reorders clusters); every sphere test computes identical f32 values and
    the RNG streams don't depend on cluster order, so the radiance must be
    bit-identical with the split disabled (RTT_NO_MOTION_SPLIT=1).  Fresh
    scene objects per variant: the prep cache is identity-keyed."""
    import os

    from rustraytrace_tpu.ops.pallas_megakernel import render_pass_megakernel

    def render(nosplit):
        if nosplit:
            os.environ["RTT_NO_MOTION_SPLIT"] = "1"
        else:
            os.environ.pop("RTT_NO_MOTION_SPLIT", None)
        try:
            scene, cfg, _ = models.book2_bouncing_spheres(
                dict(image_width=96))
            cam = derive_camera(cfg)
            return np.asarray(render_pass_megakernel(
                scene, cam, jax.random.key(5), width=96, height=54, spp=8,
                max_depth=8, respawn=True))
        finally:
            os.environ.pop("RTT_NO_MOTION_SPLIT", None)

    np.testing.assert_array_equal(render(False), render(True))
