"""Camera derivation + ray-gen tests (the DEBUG_GRADIENT strategy of the
reference GPU kernel, renderer.wgsl:258-269: sky-only render validates camera
uniforms and ray generation end to end)."""

import jax.numpy as jnp
import numpy as np

from rustraytrace_tpu.camera import generate_rays
from rustraytrace_tpu.config import RenderConfig, derive_camera
from rustraytrace_tpu.ops.integrator import sky_color


def test_camera_derivation_matches_reference_formulas():
    cfg = RenderConfig(
        aspect_ratio=16.0 / 9.0, image_width=1200, vfov=20.0,
        lookfrom=(13.0, 2.0, 3.0), lookat=(0.0, 0.0, 0.0),
        defocus_angle=0.6, focus_dist=10.0,
    )
    cam = derive_camera(cfg)
    assert cam.image_height == 675

    # independent recomputation
    lookfrom = np.array([13.0, 2.0, 3.0])
    w = lookfrom / np.linalg.norm(lookfrom)
    u = np.cross([0, 1, 0], w)
    u /= np.linalg.norm(u)
    v = np.cross(w, u)
    h = np.tan(np.radians(20.0) / 2)
    vh = 2 * h * 10.0
    vw = vh * 1200 / 675
    du = vw * u / 1200
    dv = -vh * v / 675
    p00 = lookfrom - 10.0 * w - vw * u / 2 + vh * v / 2 + 0.5 * (du + dv)
    np.testing.assert_allclose(cam.pixel00, p00, rtol=1e-5)
    np.testing.assert_allclose(cam.pixel_delta_u, du, rtol=1e-5)
    np.testing.assert_allclose(cam.pixel_delta_v, dv, rtol=1e-5)
    defocus_radius = 10.0 * np.tan(np.radians(0.3))
    np.testing.assert_allclose(
        np.linalg.norm(cam.defocus_disk_u), defocus_radius, rtol=1e-5
    )


def test_center_ray_hits_lookat_direction():
    cfg = RenderConfig(image_width=101, aspect_ratio=101.0 / 101.0, vfov=90.0,
                       lookfrom=(1.0, 2.0, 3.0), lookat=(4.0, 5.0, 6.0))
    cam = derive_camera(cfg)
    px = jnp.asarray([50.0])
    py = jnp.asarray([50.0])
    draws = jnp.full((1, 5), 0.5)  # offset 0 => pixel center
    o, d, _ = generate_rays(cam, px, py, draws)
    want = np.array([1.0, 1.0, 1.0]) / np.sqrt(3)
    got = np.asarray(d[0] / jnp.linalg.norm(d[0]))
    np.testing.assert_allclose(got, want, atol=1e-5)
    np.testing.assert_allclose(np.asarray(o[0]), [1.0, 2.0, 3.0], atol=1e-6)


def test_sky_gradient_closed_form():
    d = jnp.asarray([[0.0, 1.0, 0.0], [0.0, -1.0, 0.0], [1.0, 0.0, 0.0]])
    sky = np.asarray(sky_color(d))
    np.testing.assert_allclose(sky[0], [0.5, 0.7, 1.0], atol=1e-6)  # up
    np.testing.assert_allclose(sky[1], [1.0, 1.0, 1.0], atol=1e-6)  # down
    np.testing.assert_allclose(sky[2], [0.75, 0.85, 1.0], atol=1e-6)  # horizon


def test_defocus_disk_origins_on_disk():
    cfg = RenderConfig(image_width=64, defocus_angle=10.0, focus_dist=3.4,
                       lookfrom=(0.0, 0.0, 5.0), lookat=(0.0, 0.0, 0.0))
    cam = derive_camera(cfg)
    n = 512
    import jax

    draws = jax.random.uniform(jax.random.key(0), (n, 5))
    o, _, _ = generate_rays(cam, jnp.zeros(n), jnp.zeros(n), draws)
    r = np.linalg.norm(np.asarray(o) - np.array([0, 0, 5.0]), axis=-1)
    defocus_radius = 3.4 * np.tan(np.radians(5.0))
    assert r.max() <= defocus_radius + 1e-5
    assert r.mean() > 0.3 * defocus_radius  # actually spread over the disk
