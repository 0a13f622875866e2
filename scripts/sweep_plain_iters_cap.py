"""A/B the persist_plain_iters CAP on the flagship at 1024 spp/launch.

Round-5 follow-up to the bench-default change: at 1024 spp the launch
bound hits the 128 cap (spp/4 = 256), so each pass still pays
ceil(path-work / 128-iter launches) sort+permute boundaries.  The round-4
sweep saw bouncing_spheres still rising AT the cap, so measure 128 (the
default) against 192/256 interleaved in ONE process.

Run:  PYTHONPATH=.:/root/.axon_site python scripts/sweep_plain_iters_cap.py
"""

import sys
import time

import jax
import numpy as np


def main():
    import rustraytrace_tpu.ops.pallas_wavefront as wf
    from rustraytrace_tpu import models
    from rustraytrace_tpu.config import derive_camera
    from rustraytrace_tpu.render import render_pass

    spp, depth = 1024, 50
    scene, cfg, _ = models.book1_random_spheres(
        dict(image_width=1200, samples_per_pixel=spp, max_depth=depth))
    cam = derive_camera(cfg)
    w, h = cfg.image_width, cfg.image_height
    paths = w * h * spp
    key = jax.random.key(0)
    orig = wf.persist_plain_iters

    def run():
        acc = render_pass(scene, cam, key, width=w, height=h, spp=spp,
                          max_depth=depth, integrator="path",
                          backend="wavefront")
        np.asarray(acc[0, 0, 0])  # scalar-slice fence (CLAUDE.md)

    caps = (128, 192, 256)
    for cap in caps:  # compile + absorb the first-execution stall
        wf.persist_plain_iters = lambda s, c=cap: min(max(16, s // 4), c)
        run()
    print("# warm; interleaved reps", file=sys.stderr, flush=True)

    best = {c: float("inf") for c in caps}
    for rep in range(3):
        for cap in caps:
            wf.persist_plain_iters = lambda s, c=cap: min(max(16, s // 4), c)
            t0 = time.perf_counter()
            run()
            dt = time.perf_counter() - t0
            best[cap] = min(best[cap], dt)
            print(f"# rep {rep} cap {cap:3d}: {dt:.3f}s = "
                  f"{paths / dt / 1e6:.1f} M paths/s",
                  file=sys.stderr, flush=True)
    wf.persist_plain_iters = orig
    for cap in caps:
        print(f"cap {cap:3d}: best {best[cap]:.3f}s = "
              f"{paths / best[cap] / 1e6:.1f} M paths/s")


if __name__ == "__main__":
    main()
