"""Grid-binning ablation on book2_final (round 4): SAH vs spatial-split
grid at several resolutions, measured within ONE process (run-to-run
throughput varies ±15% between processes; see CLAUDE.md).

Usage:
    PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_grid.py \
        [width] [res ...]
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import jax

    from rustraytrace_tpu import models
    from rustraytrace_tpu.config import derive_camera
    from rustraytrace_tpu.render import render_pass
    from rustraytrace_tpu.utils.metrics import time_best

    width = int(sys.argv[1]) if len(sys.argv) > 1 else 800
    res_list = [int(a) for a in sys.argv[2:]] or [4, 6, 8, 12]

    scene, cfg, _ = models.book2_final_scene(
        dict(image_width=width, samples_per_pixel=64, max_depth=40))
    cam = derive_camera(cfg)
    w, h, spp, depth = cfg.image_width, cfg.image_height, 64, 40
    key = jax.random.key(0)

    from rustraytrace_tpu.ops.pallas_wavefront import render_pass_wavefront

    tile_rows = int(os.environ.get("BENCH_TILE_ROWS", "0")) or None

    def go():
        return render_pass_wavefront(
            scene, cam, key, width=w, height=h, spp=spp, max_depth=depth,
            tile_rows=tile_rows)

    cases = [("sah", {})]
    cases += [(f"grid_res{r}", {"RTT_SPHERE_GRID": "1", "RTT_GRID_RES": str(r)})
              for r in res_list]

    ref_mean = None
    for name, env in cases:
        for k in ("RTT_SPHERE_GRID", "RTT_GRID_RES"):
            os.environ.pop(k, None)
        os.environ.update(env)
        t0 = time.perf_counter()
        r = np.asarray(go())
        warm = time.perf_counter() - t0
        el = time_best(go)
        mean = float(r.mean() / spp)
        if ref_mean is None:
            ref_mean = mean
        print(json.dumps({
            "case": name,
            "paths_per_s": round(w * h * spp / el, 1),
            "mean": round(mean, 5),
            "mean_matches_sah": bool(abs(mean - ref_mean) < 1e-6),
            "warm_s": round(warm, 1), "best_s": round(el, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
