#!/usr/bin/env python
"""Per-scene throughput sweep on the real TPU — the measurement tool behind
ROADMAP.md's backend coverage table and the round-N tuning notes.

Usage:
    python scripts/bench_scenes.py [case ...]

Round-4 change: every case's spp is sized so the timed kernel runs
MULTI-SECOND.  Sub-second kernels jitter +-50% through the tunnel even
within one process (dispatch noise dominates; CLAUDE.md), which is how the
round-3 matrix ended up quoting 2x spans like "37-93 M" — and how two
tuning knobs got tuned on noise.  Multi-second runs hold +-15%.

Each case prints one JSON line {case, backend, paths_per_s, elapsed_s,
shape}.  Timing: best of 2 after a warmup that absorbs the tunnel's
first-execution stall; fenced with a device->host copy
(jax.block_until_ready does not block on this rig — see CLAUDE.md).
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# case -> (model, overrides dict, integrator, spp, depth, backend)
# spp chosen for >= ~2 s at round-4 rates (rate M -> spp ~ 2s * rate / npix)
CASES = {
    "flagship": ("book1_random_spheres",
                 dict(image_width=1200, samples_per_pixel=128, max_depth=50),
                 "path", 128, 50, "auto"),
    "flagship_wf": ("book1_random_spheres",
                    dict(image_width=1200, samples_per_pixel=128,
                         max_depth=50),
                    "path", 128, 50, "wavefront"),
    "final": ("book2_final_scene",
              dict(image_width=800, samples_per_pixel=64, max_depth=40),
              "path", 64, 40, "auto"),
    "earth": ("book2_earth",
              dict(image_width=800, samples_per_pixel=1024, max_depth=50),
              "path", 1024, 50, "auto"),
    "bouncing": ("book2_bouncing_spheres",
                 dict(image_width=400, samples_per_pixel=1024, max_depth=50),
                 "path", 1024, 50, "auto"),
    "quads": ("book2_quads",
              dict(image_width=400, samples_per_pixel=8192, max_depth=10),
              "path", 8192, 10, "auto"),
    "cornell": ("book2_cornell_box",
                dict(image_width=400, samples_per_pixel=4096, max_depth=20),
                "path", 4096, 20, "auto"),
    "smoke": ("book2_cornell_smoke",
              dict(image_width=400, samples_per_pixel=4096, max_depth=50),
              "path", 4096, 50, "auto"),
    "perlin": ("book2_perlin_spheres",
               dict(image_width=400, samples_per_pixel=4096, max_depth=50),
               "path", 4096, 50, "auto"),
    "cornell_mis": ("book3_cornell_box",
                    dict(image_width=600, samples_per_pixel=1024,
                         max_depth=50),
                    "mis", 1024, 50, "auto"),
    "field10k": ("sphere_field_10k",
                 dict(image_width=1200, samples_per_pixel=64, max_depth=50),
                 "path", 64, 50, "auto"),
}


def run_case(name: str) -> dict:
    import jax
    import numpy as np

    from rustraytrace_tpu import models
    from rustraytrace_tpu.config import derive_camera
    from rustraytrace_tpu.render import render_pass, resolve_backend

    model, ov, integ, spp, depth, backend = CASES[name]
    scene, cfg, _ = getattr(models, model)(ov)

    cam = derive_camera(cfg)
    w, h = cfg.image_width, cfg.image_height
    if backend == "auto":
        backend = resolve_backend(scene, integ)
    key = jax.random.key(0)

    def go():
        return render_pass(
            scene, cam, key, width=w, height=h, spp=spp,
            max_depth=depth, integrator=integ, chunk=min(131072, w * h),
            backend=backend)

    from bench import warmup_with_retries

    warmup_with_retries(lambda: np.asarray(go()))

    from rustraytrace_tpu.utils.metrics import time_best

    elapsed = time_best(go)

    pps = w * h * spp / elapsed
    rec = {"case": name, "backend": backend,
           "paths_per_s": round(pps, 1), "elapsed_s": round(elapsed, 3),
           "shape": f"{w}x{h}@{spp}spp d{depth}"}
    print(json.dumps(rec), flush=True)
    return rec


def main():
    cases = sys.argv[1:] or list(CASES)
    for c in cases:
        run_case(c)


if __name__ == "__main__":
    main()
