"""Metrics / multihost scaffolding tests."""

import json

import jax
import numpy as np

from rustraytrace_tpu import models
from rustraytrace_tpu.parallel.multihost import (
    global_mesh,
    initialize,
    render_image_multihost,
)
from rustraytrace_tpu.utils.metrics import RenderMeter, device_fence


def test_render_meter():
    m = RenderMeter(n_pixels=100).start()
    m.lap(4)
    m.lap(4)
    assert m.total_paths == 800
    line = json.loads(m.json_line(scene="x"))
    assert line["passes"] == 2 and line["scene"] == "x"
    assert line["paths_per_sec"] > 0


def test_device_fence():
    x = jax.numpy.ones((4, 4))
    out = device_fence(x * 2)
    np.testing.assert_array_equal(out, np.full((4, 4), 2.0))


def test_multihost_single_process_path():
    """initialize() is a no-op single-process; the multihost render runs on
    the 8-virtual-device mesh and matches the plain sharded render."""
    initialize(num_processes=1)
    mesh = global_mesh()
    assert mesh.shape["px"] * mesh.shape["spp"] == len(jax.devices())
    scene, cfg, integ = models.book1_three_spheres(
        dict(image_width=16, samples_per_pixel=2, max_depth=2)
    )
    img, state = render_image_multihost(scene, cfg, integrator=integ,
                                        chunk=256)
    assert img.shape[1] == 16
    assert state["spp_done"] == 2


def test_warmup_retries_fault_injection():
    """Failure-detection/recovery (SURVEY §5): the bench warmup must absorb
    transient device-layer crashes (the axon tunnel's first execution
    sometimes dies and recovers) and re-raise only after exhausting its
    attempts.  Injected faults, no real device involved."""
    import pytest

    from bench import warmup_with_retries

    calls = {"n": 0}
    sleeps = []

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("injected worker crash")
        return "ok"

    assert warmup_with_retries(flaky, attempts=3, sleep_s=5.0,
                               _sleep=sleeps.append) == "ok"
    assert calls["n"] == 3 and sleeps == [5.0, 5.0]

    def always_dead():
        raise RuntimeError("permanent failure")

    with pytest.raises(RuntimeError, match="permanent failure"):
        warmup_with_retries(always_dead, attempts=2, sleep_s=1.0,
                            _sleep=sleeps.append)
