"""Between-launch ray sorting A/B on the persist kernel (round 4).

Toggles ONLY ``sort_rays`` on _wavefront_pass_persist with the live
routing's other knobs (persist_iters, texel gate, DMA) held fixed, within
one process (tunnel throughput varies +-15% across processes).  Workloads
are multi-second so dispatch noise stays ~+-15%.

Usage:
    PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_sort.py [case ...]
"""

import json
import sys
import time

import numpy as np

CASES = {
    "final": ("book2_final_scene",
              dict(image_width=800, samples_per_pixel=64, max_depth=40),
              64, 40),
    "earth": ("book2_earth",
              dict(image_width=800, samples_per_pixel=1024, max_depth=50),
              1024, 50),
}


def main():
    import jax
    import jax.numpy as jnp

    from rustraytrace_tpu import models
    from rustraytrace_tpu.config import derive_camera
    from rustraytrace_tpu.ops.pallas_megakernel import prepare_megakernel
    from rustraytrace_tpu.ops.pallas_wavefront import (
        DMA_TEXELS_SPARSE, DMA_THRESH, PERSIST_DENSE_ITERS,
        PERSIST_SPARSE_ITERS, _unswizzle_index, _wavefront_pass_persist,
        persist_statics_tuple, texel_gate_heuristic, wavefront_tile_rows)
    from rustraytrace_tpu.utils.metrics import time_best

    names = sys.argv[1:] or list(CASES)
    for name in names:
        sc, ov, spp, depth = CASES[name]
        scene, cfg, _ = getattr(models, sc)(ov)
        cam = derive_camera(cfg)
        w, h = cfg.image_width, cfg.image_height
        tile_rows = wavefront_tile_rows(scene)
        arrays, statics = prepare_megakernel(
            scene, cam, width=w, height=h, spp=spp, max_depth=depth,
            tile_rows=tile_rows, interpret=False, segment=True)
        p_stat = persist_statics_tuple(statics)
        gate = texel_gate_heuristic(scene)
        iters = PERSIST_SPARSE_ITERS if gate else PERSIST_DENSE_ITERS
        for label, sort in (("nosort", False), ("sort", True)):
            key = jax.random.key(0)

            def go():
                acc = _wavefront_pass_persist(
                    scene, arrays, jax.random.fold_in(key, 0x5EED),
                    jnp.asarray(0, jnp.int32), spp=spp, max_depth=depth,
                    rows=statics["rows"], tile_rows=tile_rows,
                    statics=p_stat, gate_texels=gate,
                    persist_iters=iters,
                    dma_texels=gate and DMA_TEXELS_SPARSE,
                    dma_thresh=DMA_THRESH, sort_rays=sort)
                return acc[_unswizzle_index(w, h)].reshape(h, w, 3)

            try:
                t0 = time.perf_counter()
                r = np.asarray(go())
                warm = time.perf_counter() - t0
                el = time_best(go)
                print(json.dumps({
                    "case": name, "variant": label,
                    "paths_per_s": round(w * h * spp / el, 1),
                    "mean": round(float(r.mean() / spp), 5),
                    "warm_s": round(warm, 1),
                }), flush=True)
            except Exception as e:  # pragma: no cover
                print(json.dumps({"case": name, "variant": label,
                                  "error": str(e)[:300]}), flush=True)


if __name__ == "__main__":
    main()
