"""Static/moving sphere split A/B (round 3): within ONE process, render
motion scenes with the split on (default) and off (RTT_NO_MOTION_SPLIT=1)
and compare throughput + radiance means.  The split compiles the hot
intersect loop over the static-sphere clusters WITHOUT the per-sphere
motion reads/FMAs (sphere.rs:30-35 center-at-time, paid only where centers
move).

Usage:
    PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_motion_split.py [case ...]
"""

import json
import os
import sys
import time

import numpy as np

CASES = {
    # (model, overrides, spp, depth, path): 'persist' = image scene via the
    # wavefront driver; 'respawn' = monolithic respawn megakernel
    "final": ("book2_final_scene",
              dict(image_width=800, samples_per_pixel=64, max_depth=40),
              64, 40, "persist"),
    "bouncing": ("book2_bouncing_spheres",
                 dict(image_width=800, samples_per_pixel=64, max_depth=50),
                 64, 50, "respawn"),
}


def main():
    import jax

    from rustraytrace_tpu import models
    from rustraytrace_tpu.config import derive_camera
    from rustraytrace_tpu.ops.pallas_megakernel import render_pass_megakernel
    from rustraytrace_tpu.ops.pallas_wavefront import render_pass_wavefront
    from rustraytrace_tpu.utils.metrics import time_best

    names = sys.argv[1:] or list(CASES)
    for name in names:
        model, ov, spp, depth, path = CASES[name]
        for variant in ("split", "nosplit"):
            if variant == "nosplit":
                os.environ["RTT_NO_MOTION_SPLIT"] = "1"
            else:
                os.environ.pop("RTT_NO_MOTION_SPLIT", None)
            # fresh scene per variant: the prep cache is identity-keyed on
            # the scene object, so env toggles can never alias a stale prep
            scene, cfg, _ = getattr(models, model)(ov)
            cam = derive_camera(cfg)
            w, h = cfg.image_width, cfg.image_height
            key = jax.random.key(7)

            def go():
                fn = (render_pass_wavefront if path == "persist"
                      else render_pass_megakernel)
                kw = dict(width=w, height=h, spp=spp, max_depth=depth)
                if path == "respawn":
                    kw["respawn"] = True
                return fn(scene, cam, key, **kw)

            try:
                t0 = time.perf_counter()
                r = np.asarray(go())
                warm = time.perf_counter() - t0
                el = time_best(go)
                print(json.dumps({
                    "case": name, "variant": variant,
                    "paths_per_s": round(w * h * spp / el, 1),
                    "mpaths_per_s": round(w * h * spp / el / 1e6, 2),
                    "mean": round(float(r.mean() / spp), 5),
                    "warm_s": round(warm, 1),
                }), flush=True)
            except Exception as e:  # pragma: no cover
                print(json.dumps({"case": name, "variant": variant,
                                  "error": str(e)[:300]}), flush=True)
    os.environ.pop("RTT_NO_MOTION_SPLIT", None)


if __name__ == "__main__":
    main()
