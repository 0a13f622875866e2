"""Ray-sort knob sweep on book2_final (one process; see bench_sort.py).

Sweeps tile_rows x persist_iters with sort on, plus sort+grid layout.

Usage:
    PYTHONPATH=/root/repo:/root/.axon_site python scripts/sweep_sort.py
"""

import json
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from rustraytrace_tpu import models
    from rustraytrace_tpu.config import derive_camera
    from rustraytrace_tpu.ops.pallas_megakernel import prepare_megakernel
    from rustraytrace_tpu.ops.pallas_wavefront import (
        DMA_TEXELS_SPARSE, DMA_THRESH, _unswizzle_index,
        _wavefront_pass_persist, persist_statics_tuple,
        texel_gate_heuristic, wavefront_tile_rows)
    from rustraytrace_tpu.utils.metrics import time_best

    spp, depth = 64, 40
    scene, cfg, _ = models.book2_final_scene(
        dict(image_width=800, samples_per_pixel=spp, max_depth=depth))
    cam = derive_camera(cfg)
    w, h = cfg.image_width, cfg.image_height
    gate = texel_gate_heuristic(scene)

    def run(tile_rows, iters, sort, grid=False):
        if grid:
            os.environ["RTT_SPHERE_GRID"] = "1"
        else:
            os.environ.pop("RTT_SPHERE_GRID", None)
        arrays, statics = prepare_megakernel(
            scene, cam, width=w, height=h, spp=spp, max_depth=depth,
            tile_rows=tile_rows, interpret=False, segment=True)
        p_stat = persist_statics_tuple(statics)
        key = jax.random.key(0)

        def go():
            acc = _wavefront_pass_persist(
                scene, arrays, jax.random.fold_in(key, 0x5EED),
                jnp.asarray(0, jnp.int32), spp=spp, max_depth=depth,
                rows=statics["rows"], tile_rows=tile_rows,
                statics=p_stat, gate_texels=gate, persist_iters=iters,
                dma_texels=gate and DMA_TEXELS_SPARSE,
                dma_thresh=DMA_THRESH, sort_rays=sort)
            return acc[_unswizzle_index(w, h)].reshape(h, w, 3)

        try:
            t0 = time.perf_counter()
            r = np.asarray(go())
            warm = time.perf_counter() - t0
            el = time_best(go)
            print(json.dumps({
                "rows": tile_rows, "iters": iters, "sort": sort,
                "grid": grid,
                "paths_per_s": round(w * h * spp / el, 1),
                "mean": round(float(r.mean() / spp), 5),
                "warm_s": round(warm, 1)}), flush=True)
        except Exception as e:
            print(json.dumps({"rows": tile_rows, "iters": iters,
                              "sort": sort, "grid": grid,
                              "error": str(e)[:300]}), flush=True)

    run(32, 4, True)          # round-4 baseline w/ sort
    run(16, 4, True)
    run(8, 4, True)
    run(32, 2, True)
    run(16, 2, True)
    run(32, 8, True)
    run(32, 4, True, grid=True)
    run(16, 4, True, grid=True)


if __name__ == "__main__":
    main()
