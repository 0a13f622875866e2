"""Non-image persist(+sort) vs respawn A/B (round 4).

The persist kernel with has_image=False is a bounded in-kernel respawn
step with cross-launch HBM state — the execution mode that lets plain
scenes ride between-launch ray sorting.  This times the live respawn
default against persist nosort/sort on the coherence-bound scenes.

Usage:
    PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_persist_plain.py [case ...]
"""

import json
import sys
import time

import numpy as np

CASES = {
    # name: (model, overrides, spp, depth)
    "flagship": ("book1_random_spheres",
                 dict(image_width=1200, samples_per_pixel=128, max_depth=50),
                 128, 50),
    "field10k": ("sphere_field_10k",
                 dict(image_width=1200, samples_per_pixel=64, max_depth=50),
                 64, 50),
    "bouncing": ("book2_bouncing_spheres",
                 dict(image_width=400, samples_per_pixel=1024, max_depth=50),
                 1024, 50),
}


def main():
    import jax
    import jax.numpy as jnp

    from rustraytrace_tpu import models
    from rustraytrace_tpu.config import derive_camera
    from rustraytrace_tpu.ops.pallas_megakernel import (
        prepare_megakernel, render_pass_megakernel, respawn_tile_rows)
    from rustraytrace_tpu.ops.pallas_wavefront import (
        _unswizzle_index, _wavefront_pass_persist, persist_statics_tuple)
    from rustraytrace_tpu.utils.metrics import time_best

    names = sys.argv[1:] or list(CASES)
    for name in names:
        sc, ov, spp, depth = CASES[name]
        scene, cfg, _ = getattr(models, sc)(ov)
        cam = derive_camera(cfg)
        w, h = cfg.image_width, cfg.image_height
        trows = respawn_tile_rows(scene)

        def report(label, go):
            try:
                t0 = time.perf_counter()
                r = np.asarray(go())
                warm = time.perf_counter() - t0
                el = time_best(go)
                print(json.dumps({
                    "case": name, "variant": label,
                    "paths_per_s": round(w * h * spp / el, 1),
                    "mean": round(float(r.mean() / spp), 5),
                    "warm_s": round(warm, 1)}), flush=True)
            except Exception as e:
                print(json.dumps({"case": name, "variant": label,
                                  "error": str(e)[:300]}), flush=True)

        key = jax.random.key(0)

        def respawn_go():
            return render_pass_megakernel(
                scene, cam, key, width=w, height=h, spp=spp,
                max_depth=depth, respawn=True, tile_rows=trows)

        report("respawn", respawn_go)

        for tile_rows in (32,):
            arrays, statics = prepare_megakernel(
                scene, cam, width=w, height=h, spp=spp, max_depth=depth,
                tile_rows=tile_rows, interpret=False, segment=True)
            p_stat = persist_statics_tuple(statics)
            for iters, sort in ((8, False), (8, True), (16, True)):
                def go(tile_rows=tile_rows, iters=iters, sort=sort,
                       arrays=arrays, statics=statics, p_stat=p_stat):
                    acc = _wavefront_pass_persist(
                        scene, arrays,
                        jax.random.fold_in(key, 0x5EED),
                        jnp.asarray(0, jnp.int32), spp=spp,
                        max_depth=depth, rows=statics["rows"],
                        tile_rows=tile_rows, statics=p_stat,
                        gate_texels=False, persist_iters=iters,
                        sort_rays=sort)
                    return acc[_unswizzle_index(w, h)].reshape(h, w, 3)

                report(f"persist_r{tile_rows}_i{iters}"
                       f"{'_sort' if sort else ''}", go)


if __name__ == "__main__":
    main()
