"""On-chip sweep of the intersect-loop shape knobs (round 3).

Sweeps the sphere/box loop UNROLL factor and the SAH cluster leaf sizes on
the real TPU, per scene, printing one JSON line per (case, variant) with
paths/s and the radiance mean (cross-variant agreement to ~1e-3 = same
estimator, different PRNG stream order only when cluster ORDER changes;
unroll changes neither the stream nor the estimator, so means within a case
must match exactly across unroll values at fixed max_leaf).

Usage:
    PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_kernel_knobs.py [case ...]
"""

import json
import sys
import time


CASES = {
    # name: (scene fn, overrides, spp, depth, image?)
    "flagship": ("book1_random_spheres",
                 dict(image_width=1200, samples_per_pixel=64, max_depth=50),
                 64, 50, False),
    "cornell_d20": ("book2_cornell_box",
                    dict(image_width=400, samples_per_pixel=64, max_depth=20),
                    64, 20, False),
    "smoke": ("book2_cornell_smoke",
              dict(image_width=400, samples_per_pixel=64, max_depth=50),
              64, 50, False),
    "final": ("book2_final_scene",
              dict(image_width=800, samples_per_pixel=64, max_depth=40),
              64, 40, True),
    "earth": ("book2_earth",
              dict(image_width=800, samples_per_pixel=64, max_depth=50),
              64, 50, True),
    "field10k": ("sphere_field_10k",
                 dict(image_width=1200, samples_per_pixel=64, max_depth=50),
                 64, 50, False),
}

# (label, kwargs) — unroll sweep at default leaf, then leaf sweep at the
# best-guess unroll
VARIANTS = (
    ("u1", dict(unroll=1, b_unroll=1)),
    ("u2", dict(unroll=2, b_unroll=2)),
    ("u4", dict(unroll=4, b_unroll=4)),
    ("u8", dict(unroll=8, b_unroll=8)),
    ("u4_leaf16", dict(unroll=4, b_unroll=4, sphere_max_leaf=16,
                       box_max_leaf=16)),
    ("u4_leaf64", dict(unroll=4, b_unroll=4, sphere_max_leaf=64,
                       box_max_leaf=64)),
)


def main():
    import numpy as np
    import jax

    from rustraytrace_tpu import models
    from rustraytrace_tpu.config import derive_camera
    from rustraytrace_tpu.ops.pallas_megakernel import render_pass_megakernel
    from rustraytrace_tpu.ops.pallas_wavefront import render_pass_wavefront
    from rustraytrace_tpu.utils.metrics import time_best

    names = sys.argv[1:] or list(CASES)
    for name in names:
        sc, ov, spp, depth, image = CASES[name]
        scene, cfg, _ = getattr(models, sc)(ov)
        cam = derive_camera(cfg)
        w, h = cfg.image_width, cfg.image_height
        for label, kw in VARIANTS:
            key = jax.random.key(0)

            def go():
                if image:
                    return render_pass_wavefront(
                        scene, cam, key, width=w, height=h, spp=spp,
                        max_depth=depth, **kw)
                return render_pass_megakernel(
                    scene, cam, key, width=w, height=h, spp=spp,
                    max_depth=depth, respawn=True, **kw)

            try:
                t0 = time.perf_counter()
                r = np.asarray(go())  # warmup + compile, fenced
                warm = time.perf_counter() - t0
                el = time_best(go)
                print(json.dumps({
                    "case": name, "variant": label,
                    "paths_per_s": round(w * h * spp / el, 1),
                    "mean": round(float(r.mean() / spp), 5),
                    "warm_s": round(warm, 1),
                }), flush=True)
            except Exception as e:  # pragma: no cover - device variance
                print(json.dumps({"case": name, "variant": label,
                                  "error": str(e)[:160]}), flush=True)


if __name__ == "__main__":
    main()
