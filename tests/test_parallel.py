"""Multi-chip sharding tests on the 8-virtual-device CPU mesh (SURVEY.md §4.4).

The key invariant: sharding is an EXECUTION choice, not a semantics choice.
Pixel-sharded renders must be bit-identical to single-chip renders (same key
derivation per (sample, chunk) unit); spp-sharded renders agree up to f32
summation order.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from rustraytrace_tpu import models
from rustraytrace_tpu.config import derive_camera
from rustraytrace_tpu.parallel import make_mesh, render_pass_sharded, render_image_sharded
from rustraytrace_tpu.parallel.render import spp_traced
from rustraytrace_tpu.render import render_image, render_pass


CHUNK = 256  # shared by both paths so (sample, chunk) keys coincide


@pytest.fixture(scope="module")
def small_scene():
    scene, cfg, integ = models.book1_three_spheres(
        dict(image_width=32, samples_per_pixel=4, max_depth=5, spp_per_pass=4)
    )
    cfg = cfg.replace(aspect_ratio=2.0)  # 32x16
    return scene, cfg, integ


def test_pixel_sharded_bit_identical(small_scene):
    scene, cfg, _ = small_scene
    cam = derive_camera(cfg)
    key = jax.random.key(7)
    kw = dict(width=cfg.image_width, height=cfg.image_height, spp=4,
              max_depth=5, chunk=CHUNK)

    single = render_pass(scene, cam, key, **kw)
    mesh = make_mesh(jax.devices())  # (8, 1): all pixel-sharded
    assert mesh.shape == {"px": 8, "spp": 1}
    sharded = render_pass_sharded(scene, cam, key, mesh=mesh, **kw)

    np.testing.assert_array_equal(np.asarray(single), np.asarray(sharded))


def test_spp_sharded_allclose(small_scene):
    scene, cfg, _ = small_scene
    cam = derive_camera(cfg)
    key = jax.random.key(7)
    kw = dict(width=cfg.image_width, height=cfg.image_height, spp=4,
              max_depth=5, chunk=CHUNK)

    single = render_pass(scene, cam, key, **kw)
    mesh = make_mesh(jax.devices(), spp_shards=2)  # (4, 2)
    assert spp_traced(4, mesh) == 4
    sharded = render_pass_sharded(scene, cam, key, mesh=mesh, **kw)

    np.testing.assert_allclose(
        np.asarray(single), np.asarray(sharded), rtol=1e-5, atol=1e-5
    )


def test_spp_round_up():
    mesh = make_mesh(jax.devices(), spp_shards=2)
    assert spp_traced(5, mesh) == 6


def test_render_image_sharded_matches_single(small_scene):
    scene, cfg, integ = small_scene
    # pin the single-chip render to the XLA backend: the sharded path is the
    # differentiable XLA one, and the kernel backends use different RNG
    # consumption so images would differ by MC realization
    img1, st1 = render_image(scene, cfg, integrator=integ, chunk=CHUNK,
                             backend="xla")
    mesh = make_mesh(jax.devices())
    img8, st8 = render_image_sharded(
        scene, cfg, mesh=mesh, integrator=integ, chunk=CHUNK
    )
    assert st1["spp_done"] == st8["spp_done"]
    np.testing.assert_array_equal(img1, img8)


def test_sharded_routing_decision_table(small_scene):
    """Mesh-free pin of the sharded routing/guard table (round-3 regression:
    a stale guard raised on wavefront+MIS — the very combination the
    auto-router selects for image+MIS scenes on TPU meshes).  Eligibility
    predicates are injected so the table is exercised without TPU devices."""
    from rustraytrace_tpu.parallel.render import resolve_sharded_backend

    scene, _, _ = small_scene
    mesh = make_mesh(jax.devices())
    yes = lambda s, i, m: True
    no = lambda s, i, m: False

    # auto-routing, megakernel-eligible (plain TPU scene)
    assert resolve_sharded_backend(scene, "path", mesh, "auto",
                                   _mk_eligible=yes) == "wavefront"
    assert resolve_sharded_backend(scene, "mis", mesh, "auto",
                                   _mk_eligible=yes) == "megakernel"
    # auto-routing, wavefront-only-eligible (image scenes) — BOTH integrators
    # must route without raising (the round-3 bug raised on 'mis' here)
    for integ in ("path", "mis"):
        assert resolve_sharded_backend(
            scene, integ, mesh, "auto", _mk_eligible=no,
            _wf_eligible=yes) == "wavefront"
    # nothing eligible -> xla
    assert resolve_sharded_backend(scene, "mis", mesh, "auto",
                                   _mk_eligible=no, _wf_eligible=no) == "xla"
    # explicit backends: every auto-selectable (backend, integrator) pair is
    # accepted explicitly too
    for be in ("megakernel", "wavefront"):
        for integ in ("path", "mis"):
            assert resolve_sharded_backend(scene, integ, mesh, be) == be
    # the guard still rejects integrators no kernel implements
    with pytest.raises(ValueError):
        resolve_sharded_backend(scene, "nonsense", mesh, "wavefront")
    with pytest.raises(ValueError):
        resolve_sharded_backend(scene, "path", mesh, "bogus-backend")


def test_mis_integrator_sharded(small_scene):
    """The book-3 MIS estimator also runs under shard_map."""
    scene, cfg, _ = models.book3_cornell_box(
        dict(image_width=16, samples_per_pixel=4, max_depth=4)
    )
    cam = derive_camera(cfg)
    key = jax.random.key(3)
    kw = dict(width=cfg.image_width, height=cfg.image_height, spp=4,
              max_depth=4, chunk=CHUNK, integrator="mis")
    single = render_pass(scene, cam, key, **kw)
    mesh = make_mesh(jax.devices())
    sharded = render_pass_sharded(scene, cam, key, mesh=mesh, **kw)
    np.testing.assert_array_equal(np.asarray(single), np.asarray(sharded))
