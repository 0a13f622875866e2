"""A/B the diff-step forward options on the TPU (round 5).

``diff.value_and_grad_loss`` spends ~30-40% of each training step on the
XLA-trace forward that computes the loss and its cotangent; the
``forward="kernel"`` option replaces it with the fast Pallas render path
(decorrelated stream + box filter — see the docstring).  This script times
full (loss, grad) steps both ways at the ROADMAP scoping config (flagship
scene at 400 px, spp 16, depth 8, chunk 16k), interleaved in ONE process
(the tunnel's ±15% process noise makes cross-process A/Bs invalid —
CLAUDE.md).

Run:  PYTHONPATH=. python scripts/bench_diff_forward.py [--width 400]
"""

import argparse
import sys
import time

import jax
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=400)
    ap.add_argument("--spp", type=int, default=16)
    ap.add_argument("--depth", type=int, default=8)
    ap.add_argument("--chunk", type=int, default=16384)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from rustraytrace_tpu import models
    from rustraytrace_tpu.config import derive_camera
    from rustraytrace_tpu.diff import extract_params, value_and_grad_loss
    from rustraytrace_tpu.parallel import make_mesh

    scene, cfg, _ = models.book1_random_spheres(
        dict(image_width=args.width, samples_per_pixel=args.spp,
             max_depth=args.depth))
    cam = derive_camera(cfg)
    mesh = make_mesh()
    w, h = cfg.image_width, cfg.image_height
    target = np.zeros((h, w, 3), np.float32)
    params = extract_params(scene, ["sph_center", "tex_color1"])
    kw = dict(width=w, height=h, spp=args.spp, max_depth=args.depth,
              mesh=mesh, chunk=args.chunk)
    paths = w * h * args.spp

    def step(forward, key):
        loss, grads = value_and_grad_loss(
            scene, params, target, cam, key, forward=forward, **kw)
        # fence: scalar device->host copies (the tunnel's block_until_ready
        # does not block; whole-array fetches crawl at ~10 MB/s)
        np.asarray(loss)
        for g in jax.tree_util.tree_leaves(grads):
            np.asarray(g.ravel()[0])
        return float(loss)

    for fwd in ("trace", "kernel"):
        step(fwd, jax.random.key(0))  # compile + first-execution stall
    print("# warm; interleaved reps", file=sys.stderr, flush=True)

    results = {"trace": [], "kernel": []}
    for rep in range(args.reps):
        for fwd in ("trace", "kernel"):
            t0 = time.perf_counter()
            step(fwd, jax.random.key(rep + 1))
            dt = time.perf_counter() - t0
            results[fwd].append(dt)
            print(f"# rep {rep} {fwd:6s}: {dt:.3f}s = "
                  f"{paths / dt / 1e6:.3f} M paths/s (per step)",
                  file=sys.stderr, flush=True)

    best_t, best_k = min(results["trace"]), min(results["kernel"])
    print(f"trace  step: {best_t:.3f}s = {paths / best_t / 1e6:.3f} M paths/s")
    print(f"kernel step: {best_k:.3f}s = {paths / best_k / 1e6:.3f} M paths/s")
    print(f"speedup: {best_t / best_k:.2f}x")


if __name__ == "__main__":
    main()
