"""CLI + checkpoint/resume tests (CPU backend, tiny renders)."""

import os
import subprocess
import sys

import numpy as np
import pytest

from rustraytrace_tpu import models
from rustraytrace_tpu.cli import main
from rustraytrace_tpu.render import render_image
from rustraytrace_tpu.utils.checkpoint import load_checkpoint, save_checkpoint
from rustraytrace_tpu.utils.image_io import read_ppm


def test_cli_renders_ppm(tmp_path, capsys):
    out = tmp_path / "img.ppm"
    rc = main([
        "book1_three_spheres", "--width", "24", "--spp", "2", "--depth", "3",
        "--backend", "xla", "-o", str(out), "--quiet",
    ])
    assert rc == 0
    img = read_ppm(str(out))
    assert img.shape == (int(24 / (16 / 9)), 24, 3)
    assert img.max() > 50  # sky is bright


def test_cli_unknown_scene():
    assert main(["no_such_scene", "--quiet"]) == 2


def test_cli_book2_dispatch(tmp_path):
    out = tmp_path / "q.ppm"
    rc = main([
        "the_next_week", "5", "--width", "16", "--spp", "1", "--depth", "2",
        "--backend", "xla", "-o", str(out), "--quiet",
    ])
    assert rc == 0
    assert read_ppm(str(out)).shape[1] == 16


def test_cli_sharded(tmp_path):
    out = tmp_path / "s.ppm"
    rc = main([
        "book1_three_spheres", "--width", "16", "--spp", "2", "--depth", "2",
        "--sharded", "-o", str(out), "--quiet", "--chunk", "256",
    ])
    assert rc == 0
    assert read_ppm(str(out)).shape[1] == 16


def test_checkpoint_resume_identity(tmp_path):
    """render(N spp) == render(N/2 spp) -> checkpoint -> resume(N/2 more)."""
    scene, cfg, integ = models.book1_three_spheres(
        dict(image_width=24, samples_per_pixel=8, max_depth=3, spp_per_pass=4)
    )
    cfg = cfg.replace(aspect_ratio=2.0)
    full, st_full = render_image(scene, cfg, integrator=integ, chunk=256,
                                 backend="xla")

    cfg_half = cfg.replace(samples_per_pixel=4)
    _, st_half = render_image(scene, cfg_half, integrator=integ, chunk=256,
                              backend="xla")
    ck = tmp_path / "ck.npz"
    save_checkpoint(str(ck), st_half, cfg, scene)

    resumed_state = load_checkpoint(str(ck), cfg, scene)
    img2, st2 = render_image(scene, cfg, integrator=integ, chunk=256,
                             backend="xla", accum_state=resumed_state)
    assert st2["spp_done"] == st_full["spp_done"] == 8
    np.testing.assert_array_equal(full, img2)


def test_checkpoint_fingerprint_mismatch(tmp_path):
    scene, cfg, integ = models.book1_three_spheres(
        dict(image_width=16, samples_per_pixel=2, max_depth=2)
    )
    _, st = render_image(scene, cfg, integrator=integ, chunk=256, backend="xla")
    ck = tmp_path / "ck.npz"
    save_checkpoint(str(ck), st, cfg, scene)
    other_cfg = cfg.replace(samples_per_pixel=4)
    with pytest.raises(ValueError, match="fingerprint"):
        load_checkpoint(str(ck), other_cfg, scene)


def test_debug_modes(tmp_path):
    """--debug-mode matches the reference's WGSL DEBUG_GRADIENT /
    DEBUG_PARAM sanity renders (gpu/renderer.wgsl:48-49,258-278)."""
    import numpy as np

    from rustraytrace_tpu.cli import main

    out = tmp_path / "dbg.png"
    assert main(["book1_three_spheres", "--width", "64", "--debug-mode",
                 "param", "-o", str(out), "--quiet"]) == 0
    from PIL import Image
    a = np.asarray(Image.open(out))
    # flat (width/1024, height/1024, 0) fill
    assert (a == a[0, 0]).all() and a[0, 0, 2] == 0
    assert abs(int(a[0, 0, 0]) - int(64 / 1024.0 * 256)) <= 1

    assert main(["book1_three_spheres", "--width", "64", "--debug-mode",
                 "gradient", "-o", str(out), "--quiet"]) == 0
    g = np.asarray(Image.open(out)).astype(np.int32)
    # sky gradient: blue channel dominates everywhere, brighter at bottom
    assert (g[..., 2] >= g[..., 0]).all()
    assert g[-1].mean() > g[0].mean()
