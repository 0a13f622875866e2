#!/usr/bin/env python
"""Round-5 redistribution spike (VERDICT r4 #6): per-TILE launch bounds.

The sorted persist loop's residual book2_final gap (11.5 vs no_cloud
~15 M) is WITHIN-launch decoherence.  This experiment gives each tile its
own iteration budget: tiles whose active lanes have spread over a large
fraction of the scene get a SHORT bound (return to the driver's sort
sooner), tight tiles keep a LONG one.  In-process A/B vs the shipped
uniform-bound + sort-cadence default.

    PYTHONPATH=... python scripts/spike_tile_bounds.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from rustraytrace_tpu import models
from rustraytrace_tpu.config import derive_camera
from rustraytrace_tpu.ops.pallas_megakernel import (_unswizzle_index,
                                                    prepare_megakernel_cached)
import rustraytrace_tpu.ops.pallas_wavefront as wf


def main():
    scene, cfg, _ = models.book2_final_scene(
        dict(image_width=800, samples_per_pixel=64, max_depth=40))
    cam = derive_camera(cfg)
    w, h = cfg.image_width, cfg.image_height
    spp, depth = 64, 40
    paths = w * h * spp
    key0 = jax.random.fold_in(jax.random.key(0), 0x5EED)

    tile_rows = wf.wavefront_tile_rows(scene)
    arrays, statics = prepare_megakernel_cached(
        scene, cam, width=w, height=h, spp=spp, max_depth=depth,
        tile_rows=tile_rows, interpret=False, segment=True, mis=False,
        stratified=False, sqrt_spp=0)
    gate = wf.texel_gate_heuristic(scene)
    p_statics = wf.persist_statics_tuple(statics)
    rows = statics["rows"]

    def measure(label, persist_iters, sort_every, adaptive):
        def go():
            acc = wf._wavefront_pass_persist(
                scene, arrays, key0, jnp.asarray(0, jnp.int32),
                spp=spp, max_depth=depth, rows=rows, tile_rows=tile_rows,
                statics=p_statics, gate_texels=gate,
                persist_iters=persist_iters,
                dma_texels=gate and wf.DMA_TEXELS_SPARSE,
                dma_thresh=wf.DMA_THRESH, sort_rays=True,
                sort_every=sort_every, adaptive_bounds=adaptive)
            return acc[_unswizzle_index(w, h)].reshape(h, w, 3)

        img = np.asarray(go())
        mean = img.mean() / spp
        best = 1e9
        for _ in range(2):
            t0 = time.perf_counter()
            np.asarray(go()[0, 0, 0])
            best = min(best, time.perf_counter() - t0)
        print(f"{label}: {best:.3f}s = {paths/best/1e6:.2f} Mpaths/s "
              f"(mean {mean:.4f})", flush=True)

    import json
    cases = json.loads(os.environ.get("SPIKE_CASES", "null")) or [
        ["uniform i8 se4 (default)", 8, 4, []],
        ["adaptive (4,16,.25) se1 ", 16, 1, [4, 16, 0.25]],
        ["adaptive (2,8,.25) se1  ", 8, 1, [2, 8, 0.25]],
        ["adaptive (4,16,.5) se4  ", 16, 4, [4, 16, 0.5]],
    ]
    for rnd in range(2):
        for label, pi, se, ab in cases:
            measure(f"{label} rep{rnd}", pi, se, tuple(ab))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
