"""Device-mesh construction for the ('px', 'spp') sharding layout."""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
from jax.sharding import Mesh


def mesh_axis_sizes(n_devices: int, spp_shards: Optional[int] = None) -> Tuple[int, int]:
    """Factor ``n_devices`` into (px_shards, spp_shards).

    Default policy: put everything on the pixel axis (framebuffer-parallel,
    zero communication except the final gather) unless an explicit spp split
    is requested; spp sharding buys parallelism when the image is small but
    costs a psum per pass.
    """
    if spp_shards is None:
        return n_devices, 1
    if n_devices % spp_shards != 0:
        raise ValueError(f"{n_devices} devices not divisible by spp_shards={spp_shards}")
    return n_devices // spp_shards, spp_shards


def make_mesh(devices: Optional[Sequence] = None,
              spp_shards: Optional[int] = None) -> Mesh:
    """Build a 2-D ('px', 'spp') mesh over the given (default: all) devices."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    n_px, n_spp = mesh_axis_sizes(n, spp_shards)
    import numpy as np

    dev_grid = np.asarray(devices).reshape(n_px, n_spp)
    return Mesh(dev_grid, axis_names=("px", "spp"))
