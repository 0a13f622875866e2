"""Scaling-efficiency harness (BASELINE.md north star: >=85% at N devices).

Measures sharded render throughput vs device count over the ('px', 'spp')
mesh.  On real hardware run it on a pod slice (every host executes this
script under jax.distributed); without one, --virtual N runs the same
sharding logic on N virtual CPU devices — that validates the scaling CODE
PATH (collectives, key derivation, efficiency accounting), while absolute
CPU numbers are meaningless.

Prints one JSON line per device count:
  {"devices": n, "paths_per_s": ..., "efficiency": ...}
efficiency = throughput(n) / (n * throughput(1)).
"""

import argparse
import json
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--virtual", type=int, default=0,
                    help="force N virtual CPU devices (code-path validation)")
    ap.add_argument("--width", type=int, default=384)
    ap.add_argument("--spp", type=int, default=8)
    ap.add_argument("--depth", type=int, default=8)
    ap.add_argument("--spp-shards", type=int, default=None)
    args = ap.parse_args()

    import os

    if args.virtual:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.virtual}"
        )
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        import jax

    import numpy as np

    from rustraytrace_tpu import models
    from rustraytrace_tpu.config import derive_camera
    from rustraytrace_tpu.parallel import make_mesh, render_pass_sharded

    scene, cfg, _ = models.book1_random_spheres(
        dict(image_width=args.width, samples_per_pixel=args.spp,
             max_depth=args.depth)
    )
    cam = derive_camera(cfg)
    w, h = cfg.image_width, cfg.image_height
    kw = dict(width=w, height=h, spp=args.spp, max_depth=args.depth,
              chunk=16384, remat=False)
    devices = jax.devices()

    counts = []
    n = 1
    while n <= len(devices):
        counts.append(n)
        n *= 2

    base = None
    for n in counts:
        mesh = make_mesh(devices[:n], spp_shards=args.spp_shards
                         if args.spp_shards and n % args.spp_shards == 0
                         else None)
        key = jax.random.key(0)
        np.asarray(render_pass_sharded(scene, cam, key, mesh=mesh, **kw))
        t0 = time.perf_counter()
        np.asarray(render_pass_sharded(scene, cam, key, mesh=mesh, **kw))
        el = time.perf_counter() - t0
        pps = w * h * args.spp / el
        if base is None:
            base = pps
        eff = pps / (n * base)
        print(json.dumps({
            "devices": n, "paths_per_s": round(pps, 1),
            "seconds": round(el, 3), "efficiency": round(eff, 3),
        }))
        sys.stdout.flush()


if __name__ == "__main__":
    main()
