"""book2_final knob sweep under the persist kernel (round 3).

Sweeps tile_rows, sphere/box SAH leaf sizes, and box 2-level clustering for
the flagship book-2 scene, all through render_pass_wavefront's persist path.

Usage:
    PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_final_knobs.py
"""

import json
import sys
import time

import numpy as np

VARIANTS = [
    ("base", dict()),
    ("t64", dict(tile_rows=64)),
    ("t128", dict(tile_rows=128)),
    ("leaf16", dict(sphere_max_leaf=16, box_max_leaf=16)),
    ("leaf64", dict(sphere_max_leaf=64, box_max_leaf=64)),
    ("sleaf16", dict(sphere_max_leaf=16)),
    ("sleaf64", dict(sphere_max_leaf=64)),
    ("bleaf16", dict(box_max_leaf=16)),
    ("u8", dict(unroll=8, b_unroll=8)),
]


def main():
    import jax

    from rustraytrace_tpu import models
    from rustraytrace_tpu.config import derive_camera
    from rustraytrace_tpu.ops.pallas_wavefront import render_pass_wavefront
    from rustraytrace_tpu.utils.metrics import time_best

    spp, depth = 64, 40
    scene, cfg, _ = models.book2_final_scene(
        dict(image_width=800, samples_per_pixel=spp, max_depth=depth))
    cam = derive_camera(cfg)
    w, h = cfg.image_width, cfg.image_height
    names = sys.argv[1:] or [v[0] for v in VARIANTS]
    for label, kw in VARIANTS:
        if label not in names:
            continue
        key = jax.random.key(0)

        def go():
            return render_pass_wavefront(
                scene, cam, key, width=w, height=h, spp=spp,
                max_depth=depth, **kw)

        try:
            t0 = time.perf_counter()
            r = np.asarray(go())
            warm = time.perf_counter() - t0
            el = time_best(go)
            print(json.dumps({
                "variant": label,
                "paths_per_s": round(w * h * spp / el, 1),
                "mean": round(float(r.mean() / spp), 5),
                "warm_s": round(warm, 1),
            }), flush=True)
        except Exception as e:  # pragma: no cover
            print(json.dumps({"variant": label, "error": str(e)[:200]}),
                  flush=True)


if __name__ == "__main__":
    main()
