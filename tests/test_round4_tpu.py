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
        monkeypatch.delenv("RTT_SPHERE_GRID", raising=False)
    else:
        monkeypatch.setenv("RTT_SPHERE_GRID", "1")
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


def _smoke_mis_scene():
    """Cornell box + smoke medium box + NEE light: the volumetric-MIS
    combination excluded from the kernel through round 3 (mis_lights_ok
    rejected isotropic materials -> ~0.25 M on XLA)."""
    from rustraytrace_tpu.config import RenderConfig
    from rustraytrace_tpu.scene import SceneBuilder

    b = SceneBuilder()
    red = b.lambertian((0.65, 0.05, 0.05))
    white = b.lambertian((0.73, 0.73, 0.73))
    green = b.lambertian((0.12, 0.45, 0.15))
    light = b.diffuse_light((15.0, 15.0, 15.0))
    b.add_quad((555, 0, 0), (0, 0, 555), (0, 555, 0), green)
    b.add_quad((0, 0, 555), (0, 0, -555), (0, 555, 0), red)
    b.add_quad((0, 555, 0), (555, 0, 0), (0, 0, 555), white)
    b.add_quad((0, 0, 555), (555, 0, 0), (0, 0, -555), white)
    b.add_quad((555, 0, 555), (-555, 0, 0), (0, 555, 0), white)
    b.add_quad((213, 554, 227), (130, 0, 0), (0, 0, 105), light)
    b.add_medium_box((0, 0, 0), (165, 330, 165), 0.01,
                     b.isotropic((0.0, 0.0, 0.0)), rotate_y_deg=15.0,
                     translate=(265, 0, 295))
    b.add_sphere((190, 90, 190), 90.0, b.dielectric(1.5))
    b.add_light_quad((343, 554, 332), (-130, 0, 0), (0, 0, -105))
    cfg = RenderConfig(
        aspect_ratio=1.0, image_width=96, samples_per_pixel=64,
        max_depth=12, background=(0.0, 0.0, 0.0), vfov=40.0,
        lookfrom=(278.0, 278.0, -800.0), lookat=(278.0, 278.0, 0.0))
    return b.build(), cfg


def test_isotropic_mis_in_kernel_matches_xla_mean():
    """Round 4: volumetric scenes stay on the fast path under MIS — the
    kernel's is_iso lanes draw SpherePdf directions with 1/4π pdfs
    (material.rs:177-190) and must match the XLA trace_mis radiance mean
    (same estimator, different RNG streams)."""
    from rustraytrace_tpu.ops.pallas_megakernel import (
        megakernel_mis_eligible, render_pass_megakernel)
    from rustraytrace_tpu.render import render_pass

    scene, cfg = _smoke_mis_scene()
    assert megakernel_mis_eligible(scene), "exclusion should be lifted"
    cam = derive_camera(cfg)
    w, h = cfg.image_width, cfg.image_height
    spp = 64
    img_k = np.asarray(render_pass_megakernel(
        scene, cam, jax.random.key(2), width=w, height=h, spp=spp,
        max_depth=cfg.max_depth, mis=True, respawn=True)) / spp
    img_x = np.asarray(render_pass(
        scene, cam, jax.random.key(9), width=w, height=h, spp=spp,
        max_depth=cfg.max_depth, integrator="mis", backend="xla")) / spp
    assert np.all(np.isfinite(img_k))
    m_k, m_x = float(img_k.mean()), float(img_x.mean())
    assert abs(m_k - m_x) < 0.01 + 0.03 * m_x, (m_k, m_x)


def test_cornell_mis_no_regression():
    """Lifting the isotropic exclusion must not disturb the media-free MIS
    path: book3 cornell mean still matches XLA."""
    from rustraytrace_tpu.ops.pallas_megakernel import render_pass_megakernel
    from rustraytrace_tpu.render import render_pass

    scene, cfg, integ = models.book3_cornell_box(
        dict(image_width=96, samples_per_pixel=64, max_depth=10))
    assert integ == "mis"
    cam = derive_camera(cfg)
    w, h, spp = 96, 96, 64
    img_k = np.asarray(render_pass_megakernel(
        scene, cam, jax.random.key(4), width=w, height=h, spp=spp,
        max_depth=10, mis=True, respawn=True)) / spp
    img_x = np.asarray(render_pass(
        scene, cam, jax.random.key(8), width=w, height=h, spp=spp,
        max_depth=10, integrator="mis", backend="xla")) / spp
    m_k, m_x = float(img_k.mean()), float(img_x.mean())
    assert abs(m_k - m_x) < 0.01 + 0.03 * m_x, (m_k, m_x)


def test_quad_cluster_bit_identical(monkeypatch):
    """A 96-quad field renders bit-identically with the SAH quad cull on
    vs the linear scan (cluster_quad_table permutes rows and gates the
    qbody fori behind slab tests; winners and attributes are unchanged)."""
    from rustraytrace_tpu.ops.pallas_megakernel import render_pass_megakernel

    import sys
    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
    from test_quad_cluster import _quad_field

    scene = _quad_field(96)
    from rustraytrace_tpu.config import RenderConfig

    cfg = RenderConfig(aspect_ratio=1.0, image_width=64,
                       samples_per_pixel=4, max_depth=6, vfov=60.0,
                       lookfrom=(0.0, 0.0, 60.0), lookat=(0.0, 0.0, 0.0),
                       focus_dist=10.0)
    cam = derive_camera(cfg)

    def go():
        return np.asarray(render_pass_megakernel(
            scene, cam, jax.random.key(6), width=64, height=64, spp=4,
            max_depth=6, respawn=True))

    monkeypatch.setenv("RTT_NO_QUAD_CLUSTER", "1")
    img_lin = go()
    monkeypatch.delenv("RTT_NO_QUAD_CLUSTER")
    img_cl = go()
    np.testing.assert_array_equal(img_lin, img_cl)


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

    monkeypatch.delenv("RTT_SPHERE_GRID", raising=False)
    img_sah = go()
    monkeypatch.setenv("RTT_SPHERE_GRID", "1")
    img_grid = go()
    np.testing.assert_array_equal(img_sah, img_grid)


def test_ray_sorted_persist_matches_unsorted_mean(monkeypatch):
    """Between-launch ray sorting (round 4): the persist kernel with
    sort_rays=True must agree with the unsorted estimator statistically.
    Sorting only re-maps lanes to tiles (slot identity travels in state
    row 20), so per-slot sample counts are exactly spp either way; the
    PRNG pairing differs, hence a mean comparison, not bit-equality."""
    from rustraytrace_tpu.render import render_pass

    scene, cfg, _ = models.book2_final_scene(
        dict(image_width=96, samples_per_pixel=32, max_depth=6))
    cam = derive_camera(cfg)
    w, h, spp = 96, 96, 32

    def go(sort: str):
        monkeypatch.setenv("RTT_SORT_RAYS", sort)
        return np.asarray(render_pass(
            scene, cam, jax.random.key(9), width=w, height=h, spp=spp,
            max_depth=6, backend="wavefront")) / spp

    img_u = go("0")
    img_s = go("1")
    assert np.all(np.isfinite(img_s))
    m_u, m_s = img_u.mean(), img_s.mean()
    assert abs(m_s - m_u) < 0.01 + 0.03 * m_u, (m_s, m_u)


def test_plain_scene_ray_sorted_persist_matches_xla_mean():
    """Non-image scenes with enough primitives route to the RAY-SORTED
    persist kernel under backend='wavefront' (round 4); pin the estimator
    against the XLA mean through the real dispatcher."""
    from rustraytrace_tpu.ops.pallas_wavefront import ray_sort_heuristic
    from rustraytrace_tpu.render import render_pass

    scene, cfg, _ = models.book1_random_spheres(dict(image_width=96))
    assert ray_sort_heuristic(scene)  # 489 spheres -> sorted persist
    cam = derive_camera(cfg)
    w, h, spp = 96, 54, 64
    kw = dict(width=w, height=h, spp=spp, max_depth=8,
              integrator="path", chunk=w * h, stratified=False)
    img_p = np.asarray(render_pass(scene, cam, jax.random.key(3),
                                   backend="wavefront", **kw)) / spp
    img_x = np.asarray(render_pass(scene, cam, jax.random.key(4),
                                   backend="xla", **kw)) / spp
    assert np.all(np.isfinite(img_p))
    m_p, m_x = img_p.mean(), img_x.mean()
    assert abs(m_p - m_x) < 0.01 + 0.02 * m_x, (m_p, m_x)


def test_sharded_plain_persist_matches_single_chip_mean():
    """The spp-sharded wavefront dispatcher routes non-image scenes with
    >= 256 primitives to the RAY-SORTED persist kernel too (round 4);
    1-chip mesh vs single-chip render must agree statistically."""
    from jax.sharding import Mesh

    from rustraytrace_tpu.parallel.megakernel import (
        render_pass_wavefront_sharded)
    from rustraytrace_tpu.render import render_pass

    scene, cfg, _ = models.book1_random_spheres(dict(image_width=96))
    cfg_cam = derive_camera(cfg)
    w, h, spp = 96, 54, 64
    mesh = Mesh(np.array(jax.devices("tpu")[:1]).reshape(1, 1),
                ("px", "spp"))
    img_s = np.asarray(render_pass_wavefront_sharded(
        scene, cfg_cam, jax.random.key(5), width=w, height=h, spp=spp,
        max_depth=8, mesh=mesh)) / spp
    img_1 = np.asarray(render_pass(
        scene, cfg_cam, jax.random.key(6), width=w, height=h, spp=spp,
        max_depth=8, integrator="path", chunk=w * h,
        backend="wavefront")) / spp
    assert np.all(np.isfinite(img_s))
    m_s, m_1 = img_s.mean(), img_1.mean()
    assert abs(m_s - m_1) < 0.01 + 0.02 * m_1, (m_s, m_1)


def test_forced_sort_media_scene_matches_unsorted_mean(monkeypatch):
    """RTT_SORT_RAYS=1 forces sorting on scenes the heuristic skips;
    media + quads (cornell_smoke) must stay statistically identical —
    pins that the permutation carries every state row a medium/quad
    bounce depends on."""
    from rustraytrace_tpu.render import render_pass

    scene, cfg, _ = models.book2_cornell_smoke(dict(image_width=96))
    cam = derive_camera(cfg)
    w, h, spp = 96, 96, 64

    def go(sort: str):
        monkeypatch.setenv("RTT_SORT_RAYS", sort)
        return np.asarray(render_pass(
            scene, cam, jax.random.key(11), width=w, height=h, spp=spp,
            max_depth=10, backend="wavefront")) / spp

    img_u = go("0")
    img_s = go("1")
    assert np.all(np.isfinite(img_s))
    m_u, m_s = img_u.mean(), img_s.mean()
    assert abs(m_s - m_u) < 0.01 + 0.03 * m_u, (m_s, m_u)


def test_big_mis_scene_routes_sorted_persist_and_matches_xla():
    """Non-image MIS scenes with >=256 primitives route through the
    ray-sorted persist loop (render.py 'megakernel' branch, round 4);
    validate the estimator against the XLA mean on a synthetic
    300-sphere Cornell variant (no reference scene is both MIS and
    primitive-heavy)."""
    from rustraytrace_tpu.config import RenderConfig
    from rustraytrace_tpu.ops.pallas_megakernel import (
        megakernel_mis_eligible)
    from rustraytrace_tpu.ops.pallas_wavefront import ray_sort_heuristic
    from rustraytrace_tpu.render import render_pass
    from rustraytrace_tpu.scene import SceneBuilder

    rng = np.random.default_rng(21)
    b = SceneBuilder()
    white = b.lambertian((0.73, 0.73, 0.73))
    green = b.lambertian((0.12, 0.45, 0.15))
    red = b.lambertian((0.65, 0.05, 0.05))
    light = b.diffuse_light((15.0, 15.0, 15.0))
    b.add_quad((555, 0, 0), (0, 555, 0), (0, 0, 555), green)
    b.add_quad((0, 0, 0), (0, 555, 0), (0, 0, 555), red)
    b.add_quad((343, 554, 332), (-130, 0, 0), (0, 0, -105), light)
    b.add_light_quad((343, 554, 332), (-130, 0, 0), (0, 0, -105))
    b.add_quad((0, 0, 0), (555, 0, 0), (0, 0, 555), white)
    b.add_quad((555, 555, 555), (-555, 0, 0), (0, 0, -555), white)
    b.add_quad((0, 0, 555), (555, 0, 0), (0, 555, 0), white)
    for c in rng.uniform(60, 500, (300, 3)):
        b.add_sphere(tuple(float(v) for v in c), 12.0, white)
    scene = b.build()
    assert megakernel_mis_eligible(scene)
    assert ray_sort_heuristic(scene)

    cfg = RenderConfig(aspect_ratio=1.0, image_width=96,
                       samples_per_pixel=64, max_depth=8, vfov=40.0,
                       lookfrom=(278.0, 278.0, -800.0),
                       lookat=(278.0, 278.0, 0.0), focus_dist=10.0,
                       background=(0.0, 0.0, 0.0))
    cam = derive_camera(cfg)
    w, h, spp = 96, 96, 64
    kw = dict(width=w, height=h, spp=spp, max_depth=8, integrator="mis",
              chunk=w * h, stratified=False)
    img_m = np.asarray(render_pass(scene, cam, jax.random.key(7),
                                   backend="megakernel", **kw)) / spp
    img_x = np.asarray(render_pass(scene, cam, jax.random.key(8),
                                   backend="xla", **kw)) / spp
    assert np.all(np.isfinite(img_m))
    m_m, m_x = img_m.mean(), img_x.mean()
    assert abs(m_m - m_x) < 0.01 + 0.03 * m_x, (m_m, m_x)


def test_sharded_mis_reroutes_to_sorted_persist_and_matches_mean():
    """The sharded pass loop reroutes primitive-heavy non-image MIS scenes
    to the ray-sorted persist dispatcher even under the 'megakernel'
    backend label (code-review fix) — pin it end-to-end on a 1-chip mesh
    against the single-chip mean (CLAUDE.md: estimator semantics must
    stay identical across backends)."""
    from jax.sharding import Mesh

    from rustraytrace_tpu.config import RenderConfig
    from rustraytrace_tpu.ops.pallas_wavefront import sorted_persist_route
    from rustraytrace_tpu.parallel.megakernel import (
        render_image_sharded_megakernel)
    from rustraytrace_tpu.render import render_pass
    from rustraytrace_tpu.scene import SceneBuilder

    rng = np.random.default_rng(21)
    b = SceneBuilder()
    white = b.lambertian((0.73, 0.73, 0.73))
    light = b.diffuse_light((15.0, 15.0, 15.0))
    b.add_quad((555, 0, 0), (0, 555, 0), (0, 0, 555),
               b.lambertian((0.12, 0.45, 0.15)))
    b.add_quad((0, 0, 0), (0, 555, 0), (0, 0, 555),
               b.lambertian((0.65, 0.05, 0.05)))
    b.add_quad((343, 554, 332), (-130, 0, 0), (0, 0, -105), light)
    b.add_light_quad((343, 554, 332), (-130, 0, 0), (0, 0, -105))
    b.add_quad((0, 0, 0), (555, 0, 0), (0, 0, 555), white)
    b.add_quad((555, 555, 555), (-555, 0, 0), (0, 0, -555), white)
    b.add_quad((0, 0, 555), (555, 0, 0), (0, 555, 0), white)
    for c in rng.uniform(60, 500, (300, 3)):
        b.add_sphere(tuple(float(v) for v in c), 12.0, white)
    scene = b.build()
    w, h, spp = 96, 96, 64
    assert sorted_persist_route(scene, w, h)

    cfg = RenderConfig(aspect_ratio=1.0, image_width=w,
                       samples_per_pixel=spp, max_depth=8, vfov=40.0,
                       lookfrom=(278.0, 278.0, -800.0),
                       lookat=(278.0, 278.0, 0.0), focus_dist=10.0,
                       background=(0.0, 0.0, 0.0))
    mesh = Mesh(np.array(jax.devices("tpu")[:1]).reshape(1, 1),
                ("px", "spp"))
    img_s, st = render_image_sharded_megakernel(
        scene, cfg, mesh=mesh, integrator="mis", backend="megakernel")
    assert st["spp_done"] == spp
    acc_1 = np.asarray(render_pass(
        scene, derive_camera(cfg), jax.random.key(3), width=w, height=h,
        spp=spp, max_depth=8, integrator="mis", chunk=w * h,
        backend="megakernel")) / spp
    m_s = np.asarray(st["accum"]).mean() / spp
    m_1 = acc_1.mean()
    assert np.isfinite(m_s)
    assert abs(m_s - m_1) < 0.01 + 0.03 * m_1, (m_s, m_1)
