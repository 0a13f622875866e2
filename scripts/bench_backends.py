"""Backend head-to-head on the real TPU: monolithic megakernel vs the
persistent-respawn megakernel (vs the segmented wavefront where relevant).

Usage:
    PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_backends.py [case ...]

Each line: {case, variant, paths_per_s, mean} — radiance means should agree
to ~1e-3 across variants (different PRNG stream orders, same estimator).
Used to (re)measure the routing table in render.resolve_backend; see
ROADMAP.md for the recorded numbers.
"""

import json
import sys
import time


CASES = {
    "flagship": ("book1_random_spheres",
                 dict(image_width=1200, samples_per_pixel=64, max_depth=50),
                 64, 50, False),
    "cornell_d20": ("book2_cornell_box",
                    dict(image_width=400, samples_per_pixel=64, max_depth=20),
                    64, 20, False),
    "smoke": ("book2_cornell_smoke",
              dict(image_width=400, samples_per_pixel=64, max_depth=50),
              64, 50, False),
    "bouncing": ("book2_bouncing_spheres",
                 dict(image_width=400, samples_per_pixel=64, max_depth=50),
                 64, 50, False),
    "perlin": ("book2_perlin_spheres",
               dict(image_width=400, samples_per_pixel=64, max_depth=50),
               64, 50, False),
    "quads_d10": ("book2_quads",
                  dict(image_width=400, samples_per_pixel=64, max_depth=10),
                  64, 10, False),
    "field10k": ("sphere_field_10k",
                 dict(image_width=1200, samples_per_pixel=64, max_depth=50),
                 64, 50, False),
    "cornell_mis": ("book3_cornell_box",
                    dict(image_width=600, samples_per_pixel=64, max_depth=50),
                    64, 50, True),
}

VARIANTS = (
    ("mono32", dict(respawn=False, tile_rows=32)),
    ("resp32", dict(respawn=True, tile_rows=32)),
    ("resp64", dict(respawn=True, tile_rows=64)),
)


def main():
    import numpy as np
    import jax

    from rustraytrace_tpu import models
    from rustraytrace_tpu.config import derive_camera
    from rustraytrace_tpu.ops.pallas_megakernel import render_pass_megakernel

    names = sys.argv[1:] or list(CASES)
    for name in names:
        sc, ov, spp, depth, mis = CASES[name]
        scene, cfg, _ = getattr(models, sc)(ov)
        cam = derive_camera(cfg)
        w, h = cfg.image_width, cfg.image_height
        for label, kw in VARIANTS:
            key = jax.random.key(0)

            def go():
                return render_pass_megakernel(
                    scene, cam, key, width=w, height=h, spp=spp,
                    max_depth=depth, mis=mis, **kw)

            try:
                r = go()
                np.asarray(r)  # warmup; fence via device->host copy
                from rustraytrace_tpu.utils.metrics import time_best

                el = time_best(go)
                print(json.dumps({
                    "case": name, "variant": label,
                    "paths_per_s": round(w * h * spp / el, 1),
                    "mean": round(float(np.asarray(r).mean() / spp), 5),
                }), flush=True)
            except Exception as e:  # pragma: no cover - device variance
                print(json.dumps({"case": name, "variant": label,
                                  "error": str(e)[:120]}), flush=True)


if __name__ == "__main__":
    main()
