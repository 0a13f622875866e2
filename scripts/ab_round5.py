#!/usr/bin/env python
"""Round-5 same-process A/B for the two round-4 matrix rows that regressed
(VERDICT r4 #4): book3 cornell_mis 205.6 -> 180.3 and quads 960 -> 886.8.

What actually changed round 4 for these sub-256-primitive scenes: the MIS
kernel's unroll default moved 4 -> 1 (pallas_megakernel.py:2196); quads'
routing/knobs did not change at all.  So:
  - cornell_mis: in-process A/B of unroll=1 (r4 default) vs unroll=4,
    interleaved reps.
  - quads: repeated same-config reps to bound process noise.

Multi-second shapes per bench_scenes.py; one process, interleaved order so
slow-tail drift can't masquerade as a knob effect.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

from rustraytrace_tpu import models
from rustraytrace_tpu.config import derive_camera
from rustraytrace_tpu.ops.pallas_megakernel import (render_pass_megakernel,
                                                    respawn_tile_rows)


def bench(label, fn, paths, reps=2):
    np.asarray(fn())  # warmup/compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn())
        best = min(best, time.perf_counter() - t0)
    print(f"{label}: {best:.3f}s = {paths / best / 1e6:.1f} Mpaths/s",
          flush=True)
    return paths / best


def main():
    which = set(sys.argv[1:]) or {"mis", "quads"}

    if "mis" in which:
        scene, cfg, _ = models.book3_cornell_box(
            dict(image_width=600, samples_per_pixel=1024, max_depth=50))
        cam = derive_camera(cfg)
        w, h = cfg.image_width, cfg.image_height
        paths = w * h * 1024
        key = jax.random.key(0)
        tr = respawn_tile_rows(scene, mis=True)

        def go(unroll):
            # unstratified, matching bench_scenes.py's matrix measurement
            return render_pass_megakernel(
                scene, cam, key, width=w, height=h, spp=1024, max_depth=50,
                mis=True, respawn=True, tile_rows=tr, unroll=unroll,
                b_unroll=unroll)

        # interleaved: u1, u4, u1, u4
        for rnd in range(2):
            bench(f"cornell_mis unroll=1 (r4 default) rep{rnd}",
                  lambda: go(1), paths)
            bench(f"cornell_mis unroll=4 (pre-r4)     rep{rnd}",
                  lambda: go(4), paths)

    if "quads" in which:
        scene, cfg, _ = models.book2_quads(
            dict(image_width=400, samples_per_pixel=8192, max_depth=10))
        cam = derive_camera(cfg)
        w, h = cfg.image_width, cfg.image_height
        paths = w * h * 8192
        key = jax.random.key(0)
        tr = respawn_tile_rows(scene, mis=False)

        def goq():
            return render_pass_megakernel(
                scene, cam, key, width=w, height=h, spp=8192, max_depth=10,
                respawn=True, tile_rows=tr)

        for rnd in range(4):
            bench(f"quads same-config rep{rnd}", goq, paths)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
