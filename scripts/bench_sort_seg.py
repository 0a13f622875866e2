#!/usr/bin/env python
"""Round-5 measurement for the segmented between-launch lane sort
(VERDICT r4 #5: "bucketed counting sort for large-R lane permutation").

Part 1 (--prim): primitive cost of sort-perm + 21-row permute + restore at
several lane counts, global argsort vs segmented batched argsort — shows
the segmented form is linear in R.

Part 2 (--e2e CASE): end-to-end in-process A/B on a real scene: the same
persist render timed under seg=global and seg=2^17, switching by module
knob + jit cache clear so both run in ONE process.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def fence(x):
    # scalar-slice fence: np.asarray of the WHOLE result measures the
    # tunnel's device->host transfer (~10 MB/s!), not the computation —
    # a 72 MB state fetch made the first version of this bench read
    # "2.4 s" for a 17 ms sort
    while hasattr(x, "ndim") and x.ndim > 0:
        x = x[0]
    return np.asarray(x)


def part_prim():
    import rustraytrace_tpu.ops.pallas_wavefront as wf

    for lanes in (856064, 2101248, 8355840):
        R = lanes
        rows = R // 128
        key = jax.random.randint(jax.random.key(0), (R,), 0, 1 << 27)
        st = jax.random.uniform(jax.random.key(1), (21, rows, 128))

        def run(seg):
            def go(st, key):
                if seg >= R:
                    perm = jnp.argsort(key, stable=True)
                else:
                    s = R // seg
                    local = jnp.argsort(key.reshape(s, seg), axis=-1,
                                        stable=True)
                    perm = (local + (jnp.arange(s) * seg)[:, None]
                            ).reshape(R)
                return st.reshape(21, R)[:, perm].reshape(21, rows, 128)

            f = jax.jit(go)
            fence(f(st, key))
            best = 1e9
            for _ in range(5):
                t0 = time.perf_counter()
                fence(f(st, key))
                best = min(best, time.perf_counter() - t0)
            return best

        # largest divisor of R <= 2^17 (multiple of 128)
        seg = wf._sort_seg(R)
        g = run(R)
        s = run(seg)
        print(f"R={R/1e6:.2f}M: global {g*1e3:.1f} ms | "
              f"seg={seg} {s*1e3:.1f} ms ({g/s:.1f}x)", flush=True)


def part_e2e(case):
    import rustraytrace_tpu.ops.pallas_wavefront as wf
    from rustraytrace_tpu import models
    from rustraytrace_tpu.config import derive_camera
    from rustraytrace_tpu.render import render_pass

    shapes = {
        "flagship": ("book1_random_spheres",
                     dict(image_width=1200, samples_per_pixel=128,
                          max_depth=50), 128, 50),
        "final": ("book2_final_scene",
                  dict(image_width=800, samples_per_pixel=64,
                       max_depth=40), 64, 40),
        "bouncing": ("book2_bouncing_spheres",
                     dict(image_width=400, samples_per_pixel=1024,
                          max_depth=50), 1024, 50),
        "field10k": ("sphere_field_10k",
                     dict(image_width=1200, samples_per_pixel=64,
                          max_depth=50), 64, 50),
    }
    model, ov, spp, depth = shapes[case]
    scene, cfg, _ = getattr(models, model)(ov)
    cam = derive_camera(cfg)
    w, h = cfg.image_width, cfg.image_height
    key = jax.random.key(0)
    paths = w * h * spp

    def measure(label):
        wf._wavefront_pass_persist.clear_cache()

        def go():
            return render_pass(scene, cam, key, width=w, height=h, spp=spp,
                               max_depth=depth, integrator="path",
                               chunk=131072, backend="wavefront")

        fence(go())
        best = 1e9
        for _ in range(2):
            t0 = time.perf_counter()
            fence(go())
            best = min(best, time.perf_counter() - t0)
        print(f"{case} {label}: {best:.3f}s = {paths/best/1e6:.1f} Mpaths/s",
              flush=True)
        return best

    # interleave: global, seg, global, seg
    for rnd in range(2):
        wf.SORT_SEG_LANES = 1 << 62
        measure(f"global rep{rnd}")
        wf.SORT_SEG_LANES = 1 << 17
        measure(f"seg2^17 rep{rnd}")


def main():
    if "--prim" in sys.argv:
        part_prim()
    for i, a in enumerate(sys.argv):
        if a == "--e2e":
            part_e2e(sys.argv[i + 1])
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
