"""Scaling-efficiency harness (BASELINE.md north star: >=85% at N devices).

Measures sharded render throughput vs device count over the ('px', 'spp')
mesh.  On real hardware run it on a pod slice (every host executes this
script under jax.distributed); without one, --virtual N runs the same
sharding logic on N virtual CPU devices — that validates the scaling CODE
PATH (collectives, key derivation, efficiency accounting), while absolute
CPU numbers are meaningless.

Backends (--backend, round 3 extends past the XLA path):
  xla         pixel-sharded XLA render (render_pass_sharded) — bit-identical
              to the 1-chip render by construction
  megakernel  spp-sharded persistent-respawn Pallas kernel
              (parallel/megakernel.py) — TPU meshes only (Mosaic PRNG);
              the path a real 4K@1000spp multi-chip run would use
  wavefront   spp-sharded persist texel-freeze kernel on an image scene
              (book2_earth) — TPU meshes only
On a CPU/virtual mesh the Pallas backends still validate their dispatch
STRUCTURE via a substitute pass_fn (sharded_megakernel_wiring), reporting
wiring_only=true instead of fake throughput.

Prints one JSON line per device count:
  {"backend": ..., "devices": n, "paths_per_s": ..., "efficiency": ...}
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
    ap.add_argument("--backend", choices=["xla", "megakernel", "wavefront"],
                    default="xla")
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
    from rustraytrace_tpu.parallel.megakernel import (
        megakernel_shard_eligible, render_pass_megakernel_sharded,
        render_pass_wavefront_sharded, sharded_megakernel_wiring,
        wavefront_shard_eligible)

    scene_name = ("book2_earth" if args.backend == "wavefront"
                  else "book1_random_spheres")
    scene, cfg, _ = getattr(models, scene_name)(
        dict(image_width=args.width, samples_per_pixel=args.spp,
             max_depth=args.depth)
    )
    cam = derive_camera(cfg)
    w, h = cfg.image_width, cfg.image_height
    devices = jax.devices()

    counts = []
    n = 1
    while n <= len(devices):
        counts.append(n)
        n *= 2

    def run_pass(mesh, key):
        if args.backend == "xla":
            return render_pass_sharded(
                scene, cam, key, mesh=mesh, width=w, height=h, spp=args.spp,
                max_depth=args.depth, chunk=16384, remat=False)
        if args.backend == "megakernel":
            return render_pass_megakernel_sharded(
                scene, cam, key, mesh=mesh, width=w, height=h, spp=args.spp,
                max_depth=args.depth, respawn=True)
        return render_pass_wavefront_sharded(
            scene, cam, key, mesh=mesh, width=w, height=h, spp=args.spp,
            max_depth=args.depth)

    base = None
    for n in counts:
        mesh = make_mesh(devices[:n], spp_shards=args.spp_shards
                         if args.spp_shards and n % args.spp_shards == 0
                         else None)
        key = jax.random.key(0)
        if args.backend != "xla" and not (
                megakernel_shard_eligible(scene, "path", mesh)
                or wavefront_shard_eligible(scene, "path", mesh)):
            # non-TPU mesh: the Mosaic kernel can't run, but the shard_map
            # wiring that carries it multi-chip can — validate the structure
            import jax.numpy as jnp

            offsets = jnp.arange(n, dtype=jnp.int32) * args.spp

            def pass_fn(arrays, k, off):
                base_img = jax.random.uniform(
                    jax.random.fold_in(k, off), (8, 8, 3))
                return base_img + arrays["tab"].sum()

            out = sharded_megakernel_wiring(
                pass_fn, {"tab": jnp.ones((16,), jnp.float32)}, key,
                offsets, mesh)
            ok = bool(np.isfinite(np.asarray(out)).all())
            print(json.dumps({"backend": args.backend, "devices": n,
                              "wiring_only": True, "ok": ok}))
            sys.stdout.flush()
            continue
        np.asarray(run_pass(mesh, key))  # warmup/compile, fenced
        t0 = time.perf_counter()
        np.asarray(run_pass(mesh, key))
        el = time.perf_counter() - t0
        # spp-sharded Pallas backends trace ceil(spp/n)*n samples
        spp_traced = (args.spp if args.backend == "xla"
                      else -(-args.spp // n) * n)
        pps = w * h * spp_traced / el
        if base is None:
            base = pps
        eff = pps / (n * base)
        print(json.dumps({
            "backend": args.backend, "devices": n,
            "paths_per_s": round(pps, 1),
            "seconds": round(el, 3), "efficiency": round(eff, 3),
        }))
        sys.stdout.flush()


if __name__ == "__main__":
    main()
