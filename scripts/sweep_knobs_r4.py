"""Round-4 re-sweep of the respawn kernel knobs at MULTI-SECOND workloads.

Round 3 tuned ``tile_rows`` (32 everywhere) and ``unroll`` (4, noise
scenes 1) on sub-second runs whose ±50% jitter the round-3 verdict flagged;
this re-runs the two sweeps on the same scenes at spp sizes that hold ±15%,
all within one process.

Usage:
    PYTHONPATH=/root/repo:/root/.axon_site python scripts/sweep_knobs_r4.py
"""

import json
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import numpy as np

    from rustraytrace_tpu import models
    from rustraytrace_tpu.config import derive_camera
    from rustraytrace_tpu.ops.pallas_megakernel import render_pass_megakernel
    from rustraytrace_tpu.utils.metrics import time_best

    cases = [
        ("cornell", "book2_cornell_box", 400, 4096, 20, False),
        ("cornell_mis", "book3_cornell_box", 600, 1024, 50, True),
        ("flagship", "book1_random_spheres", 1200, 128, 50, False),
    ]
    for name, model, width, spp, depth, mis in cases:
        scene, cfg, _ = getattr(models, model)(
            dict(image_width=width, samples_per_pixel=spp, max_depth=depth))
        cam = derive_camera(cfg)
        w, h = cfg.image_width, cfg.image_height
        key = jax.random.key(0)
        for tile_rows in (16, 32, 64):
            for unroll in ((1, 4) if name == "cornell_mis" else (4,)):
                def go():
                    return render_pass_megakernel(
                        scene, cam, key, width=w, height=h, spp=spp,
                        max_depth=depth, mis=mis, respawn=True,
                        tile_rows=tile_rows, unroll=unroll, b_unroll=unroll)

                np.asarray(go())
                el = time_best(go)
                print(json.dumps({
                    "case": name, "tile_rows": tile_rows, "unroll": unroll,
                    "paths_per_s": round(w * h * spp / el, 1),
                    "best_s": round(el, 2)}), flush=True)


if __name__ == "__main__":
    main()
