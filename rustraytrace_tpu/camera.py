"""Ray generation from camera uniforms.

Reproduces ``Camera::get_ray`` (src/books/in_one_weekend/camera.rs:152-180):
jittered sub-pixel sample + optional defocus-disk origin, direction NOT
normalized (the intersectors use the |d|^2 quadric form, so this matches the
reference bit-for-bit in structure).  Book 3's stratified sub-pixel grid
(the_rest_of_your_life/camera.rs:156-177) is supported via (s_i, s_j) indices.
Ray time is uniform in [0,1) for motion blur (the_next_week/camera.rs:160-162).
"""

from __future__ import annotations

import jax.numpy as jnp

from .config import CameraParams
from .ops import rng


def generate_rays(cam: CameraParams, px: jnp.ndarray, py: jnp.ndarray,
                  draws: jnp.ndarray, strat=None):
    """Make camera rays.

    px, py: [R] pixel integer coords (x = column i, y = row j).
    draws: [R, 5] uniforms — (jit_x, jit_y, disk_u1, disk_u2, time).
    strat: optional (s_i, s_j, sqrt_spp) for stratified sampling.
    Returns (origin [R,3], direction [R,3], time [R]).
    """
    if strat is None:
        ox = draws[:, 0] - 0.5
        oy = draws[:, 1] - 0.5
    else:
        s_i, s_j, sqrt_spp = strat
        recip = 1.0 / sqrt_spp
        ox = (s_i + draws[:, 0]) * recip - 0.5
        oy = (s_j + draws[:, 1]) * recip - 0.5

    pixel_sample = (
        cam.pixel00[None, :]
        + (px + ox)[:, None] * cam.pixel_delta_u[None, :]
        + (py + oy)[:, None] * cam.pixel_delta_v[None, :]
    )

    if cam.lens_radius_gt0:
        disk = rng.in_unit_disk(draws[:, 2], draws[:, 3])  # [R,2]
        origin = (
            cam.center[None, :]
            + disk[:, 0:1] * cam.defocus_disk_u[None, :]
            + disk[:, 1:2] * cam.defocus_disk_v[None, :]
        )
    else:
        origin = jnp.broadcast_to(cam.center[None, :], pixel_sample.shape)

    direction = pixel_sample - origin
    time = draws[:, 4]
    return origin, direction, time
