"""Axis-aligned box primitives must be indistinguishable from the reference's
six-quad make_box expansion (quad.rs:90-113) — same t, normals, face
orientation, materials, and identical renders (the RNG draw layout is
geometry-independent, so box and quad compilations of the same scene consume
identical streams)."""

import jax
import jax.numpy as jnp
import numpy as np

from rustraytrace_tpu.config import RenderConfig, derive_camera
from rustraytrace_tpu.ops.intersect import closest_hit
from rustraytrace_tpu.render import render_pass
from rustraytrace_tpu.scene import SceneBuilder


def _box_scene(as_quads: bool):
    b = SceneBuilder()
    green = b.lambertian((0.48, 0.83, 0.53))
    red = b.metal((0.8, 0.4, 0.3), 0.1)
    b.add_box((-2, 0, -3), (-0.5, 1.2, -1.5), green, as_quads=as_quads)
    b.add_box((0.5, 0, -3), (2.0, 0.7, -1.5), red, as_quads=as_quads)
    b.add_box((-0.4, 0, -2.6), (0.4, 0.4, -1.9), green, as_quads=as_quads)
    b.add_sphere((0.0, -100.0, -2.0), 99.5, b.lambertian((0.5, 0.5, 0.5)))
    return b


def _rays(n=256, seed=3):
    k = jax.random.key(seed)
    k1, k2 = jax.random.split(k)
    o = jax.random.uniform(k1, (n, 3), minval=-1.0, maxval=1.0)
    o = o.at[:, 2].add(1.0)  # origins in front of / inside the boxes
    d = jax.random.normal(k2, (n, 3))
    d = d.at[:, 2].add(-1.5)  # bias toward the boxes
    t = jnp.zeros(n)
    return o, d, t


def test_box_features_and_baking():
    scene = _box_scene(False).build()
    assert "boxes" in scene.features and "quads" not in scene.features
    assert int(np.sum(np.asarray(scene.box_mask))) == 3
    scene_q = _box_scene(True).build()
    assert "boxes" not in scene_q.features
    assert int(np.sum(np.asarray(scene_q.quad_mask))) == 18


def test_box_hit_matches_quad_expansion():
    scene_b = _box_scene(False).build()
    scene_q = _box_scene(True).build()
    o, d, tm = _rays()
    um = jnp.zeros((o.shape[0], 2))
    rb = closest_hit(o, d, tm, scene_b, um)
    rq = closest_hit(o, d, tm, scene_q, um)
    np.testing.assert_array_equal(np.asarray(rb.valid), np.asarray(rq.valid))
    hit = np.asarray(rb.valid)
    np.testing.assert_allclose(np.asarray(rb.t)[hit], np.asarray(rq.t)[hit],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(rb.normal)[hit],
                               np.asarray(rq.normal)[hit], atol=1e-4)
    np.testing.assert_array_equal(np.asarray(rb.front_face)[hit],
                                  np.asarray(rq.front_face)[hit])
    # material ids differ in numbering only if builders diverge — they don't
    np.testing.assert_array_equal(np.asarray(rb.mat)[hit],
                                  np.asarray(rq.mat)[hit])


def test_box_inside_hits_exit_face():
    """A ray starting inside a box must hit the exit face with the normal
    flipped inward (front_face=False), like the quad version."""
    b = SceneBuilder()
    m = b.lambertian((0.7, 0.7, 0.7))
    b.add_box((-1, -1, -1), (1, 1, 1), m)
    scene = b.build()
    o = jnp.asarray([[0.0, 0.0, 0.0]])
    d = jnp.asarray([[1.0, 0.0, 0.0]])
    rec = closest_hit(o, d, jnp.zeros(1), scene, jnp.zeros((1, 2)))
    assert bool(rec.valid[0])
    np.testing.assert_allclose(float(rec.t[0]), 1.0, atol=1e-5)
    assert not bool(rec.front_face[0])
    np.testing.assert_allclose(np.asarray(rec.normal[0]), [-1.0, 0.0, 0.0],
                               atol=1e-6)


def test_box_render_matches_quad_render():
    cfg = RenderConfig(aspect_ratio=2.0, image_width=64, samples_per_pixel=8,
                       max_depth=8, vfov=60.0, lookfrom=(0.0, 1.0, 2.0),
                       lookat=(0.0, 0.5, -2.0))
    cam = derive_camera(cfg)
    key = jax.random.key(11)
    kw = dict(width=64, height=32, spp=8, max_depth=8, chunk=2048,
              backend="xla")
    img_b = render_pass(_box_scene(False).build(), cam, key, **kw)
    img_q = render_pass(_box_scene(True).build(), cam, key, **kw)
    np.testing.assert_allclose(np.asarray(img_b), np.asarray(img_q),
                               rtol=1e-4, atol=1e-4)


def test_box_gradients_finite():
    """box_lo/box_hi are differentiable scene parameters; the slab/argmax
    normal selection must not leak NaN."""
    scene = _box_scene(False).build()
    o, d, tm = _rays(64)
    um = jnp.zeros((64, 2))

    def loss(lo, hi):
        import dataclasses

        s = dataclasses.replace(scene, box_lo=lo, box_hi=hi)
        rec = closest_hit(o, d, tm, s, um)
        return jnp.sum(jnp.where(rec.valid, rec.t, 0.0))

    g_lo, g_hi = jax.grad(loss, argnums=(0, 1))(scene.box_lo, scene.box_hi)
    assert np.isfinite(np.asarray(g_lo)).all()
    assert np.isfinite(np.asarray(g_hi)).all()
