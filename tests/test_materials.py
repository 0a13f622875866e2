"""Material scatter math vs reference formulas (material.rs, vec3.rs)."""

import jax
import jax.numpy as jnp
import numpy as np

from rustraytrace_tpu.ops import rng as rng_ops
from rustraytrace_tpu.ops.materials import gather_mat, reflect, refract, scatter, schlick
from rustraytrace_tpu.ops.intersect import closest_hit
from rustraytrace_tpu.scene import SceneBuilder


def test_reflect():
    v = jnp.asarray([[1.0, -1.0, 0.0]])
    n = jnp.asarray([[0.0, 1.0, 0.0]])
    np.testing.assert_allclose(np.asarray(reflect(v, n))[0], [1.0, 1.0, 0.0], atol=1e-6)


def test_refract_snell():
    # incidence 45deg from vacuum into n=1.5
    uv = jnp.asarray([[np.sin(np.pi / 4), -np.cos(np.pi / 4), 0.0]])
    n = jnp.asarray([[0.0, 1.0, 0.0]])
    out = np.asarray(refract(uv, n, 1.0 / 1.5))[0]
    sin_out = out[0] / np.linalg.norm(out)
    np.testing.assert_allclose(sin_out, np.sin(np.pi / 4) / 1.5, rtol=1e-5)


def test_schlick_limits():
    # normal incidence: r0 = ((1-n)/(1+n))^2; grazing: -> 1
    np.testing.assert_allclose(
        float(schlick(jnp.asarray(1.0), jnp.asarray(1.5))),
        ((1 - 1.5) / (1 + 1.5)) ** 2, rtol=1e-5,
    )
    np.testing.assert_allclose(float(schlick(jnp.asarray(0.0), jnp.asarray(1.5))), 1.0, rtol=1e-5)


def test_random_unit_vector_statistics():
    u = jax.random.uniform(jax.random.key(0), (20000, 2))
    v = np.asarray(rng_ops.unit_vector(u[:, 0], u[:, 1]))
    np.testing.assert_allclose(np.linalg.norm(v, axis=-1), 1.0, atol=1e-5)
    assert np.abs(v.mean(axis=0)).max() < 0.02  # isotropy


def test_cosine_direction_statistics():
    """E[z] for cosine-weighted hemisphere = 2/3 (vec3.rs:212-221)."""
    u = jax.random.uniform(jax.random.key(1), (40000, 2))
    v = np.asarray(rng_ops.cosine_direction(u[:, 0], u[:, 1]))
    assert abs(v[:, 2].mean() - 2.0 / 3.0) < 0.01
    assert v[:, 2].min() >= 0.0


def test_onb_orthonormal():
    n = jax.random.normal(jax.random.key(2), (1000, 3))
    u, v, w = rng_ops.onb_from_w(n)
    u, v, w = map(np.asarray, (u, v, w))
    np.testing.assert_allclose(np.sum(u * v, -1), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.sum(u * w, -1), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.sum(v * w, -1), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(u, axis=-1), 1.0, atol=1e-4)


def _hit_scene(builder_fn):
    b = SceneBuilder()
    mat = builder_fn(b)
    b.add_sphere((0, 0, -2), 1.0, mat)
    s = b.build()
    o = jnp.asarray([[0.0, 0.0, 0.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    rec = closest_hit(o, d, jnp.zeros(1), s, jnp.zeros((1, 2)))
    return s, d, rec


def test_lambertian_scatter_distribution():
    s, d, rec = _hit_scene(lambda b: b.lambertian((0.3, 0.5, 0.7)))
    n = 20000
    rec_n = jax.tree_util.tree_map(lambda a: jnp.repeat(a, n, axis=0), rec)
    d_n = jnp.repeat(d, n, axis=0)
    draws = jax.random.uniform(jax.random.key(3), (n, 3))
    sc = scatter(d_n, rec_n, gather_mat(s, rec_n), draws, emit_front_only=False)
    dirs = np.array(sc.direction)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    # cosine-weighted: E[cos theta] = 2/3 around normal +z
    assert abs(dirs[:, 2].mean() - 2.0 / 3.0) < 0.02
    np.testing.assert_allclose(np.asarray(sc.attenuation)[0], [0.3, 0.5, 0.7], rtol=1e-6)
    assert bool(sc.scattered[0])
    assert not bool(sc.specular[0])


def test_metal_mirror_exact():
    s, d, rec = _hit_scene(lambda b: b.metal((0.9, 0.8, 0.7), 0.0))
    draws = jnp.full((1, 3), 0.5)
    sc = scatter(d, rec, gather_mat(s, rec), draws, emit_front_only=False)
    got = np.asarray(sc.direction)[0]
    np.testing.assert_allclose(got / np.linalg.norm(got), [0, 0, 1.0], atol=1e-5)
    assert bool(sc.specular[0])


def test_dielectric_tir():
    """Ray inside glass at grazing angle must totally internally reflect."""
    b = SceneBuilder()
    b.add_sphere((0, 0, 0), 1.0, b.dielectric(1.5))
    s = b.build()
    # ray from inside, hitting the surface at a shallow angle
    o = jnp.asarray([[0.0, 0.9, 0.0]])
    d = jnp.asarray([[1.0, 0.05, 0.0]])
    rec = closest_hit(o, d, jnp.zeros(1), s, jnp.zeros((1, 2)))
    assert not bool(rec.front_face[0])  # exiting: back face
    sc = scatter(d, rec, gather_mat(s, rec), jnp.full((1, 3), 0.999), emit_front_only=False)
    out = np.asarray(sc.direction)[0]
    n = np.asarray(rec.normal)[0]
    ud = np.asarray(d[0] / np.linalg.norm(d[0]))
    # exact mirror reflection about the face normal (TIR: no refraction)
    np.testing.assert_allclose(out, ud - 2 * (ud @ n) * n, atol=1e-5)
    # reflected ray heads back into the incoming half-space
    assert out @ n > 0


def test_diffuse_light_emits_and_dies():
    s, d, rec = _hit_scene(lambda b: b.diffuse_light((4.0, 4.0, 4.0)))
    sc = scatter(d, rec, gather_mat(s, rec), jnp.full((1, 3), 0.5), emit_front_only=False)
    np.testing.assert_allclose(np.asarray(sc.emitted)[0], [4.0, 4.0, 4.0], rtol=1e-6)
    assert not bool(sc.scattered[0])


def test_emit_front_only_gate():
    """Book 3: back-face hits of lights emit nothing (material.rs:154-161)."""
    b = SceneBuilder()
    b.add_sphere((0, 0, 0), 2.0, b.diffuse_light((4.0,) * 3))
    s = b.build()
    o = jnp.asarray([[0.0, 0.0, 0.0]])  # inside: back-face hit
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    rec = closest_hit(o, d, jnp.zeros(1), s, jnp.zeros((1, 2)))
    assert not bool(rec.front_face[0])
    sc_gated = scatter(d, rec, gather_mat(s, rec), jnp.full((1, 3), 0.5), emit_front_only=True)
    sc_open = scatter(d, rec, gather_mat(s, rec), jnp.full((1, 3), 0.5), emit_front_only=False)
    np.testing.assert_allclose(np.asarray(sc_gated.emitted)[0], 0.0, atol=1e-7)
    np.testing.assert_allclose(np.asarray(sc_open.emitted)[0], 4.0, rtol=1e-6)
