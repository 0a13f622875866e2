#!/usr/bin/env python
"""Per-scene throughput sweep on the real TPU — the measurement tool behind
ROADMAP.md's backend coverage table and the round-N tuning notes.

Usage:
    python scripts/bench_scenes.py [case ...]

Cases (default: all):
    flagship         book1_random_spheres 1200x675 @64spp d50, auto backend
    flagship_wf      same scene forced through the respawn wavefront path
    final            book2_final_scene 800x800 @64spp d40 (reference
                     flagship; round 3: ~8M via the persist texel-freeze
                     kernel — see ROADMAP.md's ablation for the ceiling)
    earth            book2_earth 800x450 @64spp d50
    cornell_mis      book3_cornell_box 600x600 @64spp d50 (MIS megakernel)
    field10k         sphere_field_10k 1200x675 @64spp d50 (~10k spheres)

Each case prints one JSON line {case, backend, paths_per_s, elapsed_s, shape}.
Timing: best of 2 after a warmup that absorbs the tunnel's first-execution
stall; fenced with a device->host copy (jax.block_until_ready does not block
on this rig — see CLAUDE.md).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def run_case(name: str) -> dict:
    import jax
    import numpy as np

    from rustraytrace_tpu import models
    from rustraytrace_tpu.config import derive_camera
    from rustraytrace_tpu.render import render_pass, resolve_backend

    if name.startswith("flagship"):
        scene, cfg, _ = models.book1_random_spheres(
            dict(image_width=1200, samples_per_pixel=64, max_depth=50))
        integ, spp, depth = "path", 64, 50
        backend = "auto"
        if name == "flagship_wf":
            backend = "wavefront"
    elif name == "final":
        scene, cfg, _ = models.book2_final_scene(
            dict(image_width=800, samples_per_pixel=64, max_depth=40))
        integ, spp, depth, backend = "path", 64, 40, "auto"
    elif name == "earth":
        scene, cfg, _ = models.book2_earth(
            dict(image_width=800, samples_per_pixel=64, max_depth=50))
        integ, spp, depth, backend = "path", 64, 50, "auto"
    elif name == "field10k":
        scene, cfg, _ = models.sphere_field_10k(
            dict(image_width=1200, samples_per_pixel=64, max_depth=50))
        integ, spp, depth, backend = "path", 64, 50, "auto"
    elif name == "cornell_mis":
        scene, cfg, _ = models.book3_cornell_box(
            dict(image_width=600, samples_per_pixel=64, max_depth=50))
        integ, spp, depth, backend = "mis", 64, 50, "auto"
    else:
        raise SystemExit(f"unknown case {name!r}")

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
    cases = sys.argv[1:] or ["flagship", "flagship_wf",
                             "final", "earth", "cornell_mis", "field10k"]
    for c in cases:
        run_case(c)


if __name__ == "__main__":
    main()
