"""Headline benchmark: paths/sec on the Book-1 random-spheres flagship scene.

Scene: the reference's headline workload (~484-sphere random field,
``src/books/in_one_weekend/mod.rs:57-126``) at 1200x675 — BASELINE config 2.
Metric: completed pixel samples per second ("paths/s"; each sample is a full
camera path with Russian-roulette-truncated bounces, max depth 50).

The reference publishes no numbers (BASELINE.md), so ``vs_baseline`` is
against the self-defined anchor BASELINE_PATHS_PER_SEC — an order-of-magnitude
estimate of the reference's multi-core rayon CPU backend on this scene
(Book-1 final scene at 1200x675/10spp/depth20 takes minutes on desktop CPUs,
i.e. O(1e5..1e6) samples/s; anchor fixed at 1e6 so rounds are comparable).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Env knobs: BENCH_SPP (default 1024), BENCH_WIDTH (default 1200),
BENCH_DEPTH (default 50), BENCH_CHUNK (default 131072).
"""

import json
import os
import sys
import time


BASELINE_PATHS_PER_SEC = 1.0e6


def warmup_with_retries(fn, attempts: int = 3, sleep_s: float = 20.0,
                        _sleep=time.sleep):
    """Run ``fn`` until it succeeds, retrying device-layer crashes.

    The axon tunnel's first execution sometimes surfaces as a worker
    crash + recovery (see module notes); this absorbs up to
    ``attempts - 1`` failures, sleeping between tries, and re-raises the
    last error if every attempt fails.  Returns fn()'s value.  Tested by
    fault injection in tests/test_metrics.py."""
    last = None
    for attempt in range(attempts):
        try:
            return fn()
        except Exception as e:
            last = e
            print(f"# warmup attempt {attempt} failed: {e}", file=sys.stderr)
            if attempt < attempts - 1:
                _sleep(sleep_s)
    raise last


def main():
    import jax

    from rustraytrace_tpu import models
    from rustraytrace_tpu.config import derive_camera
    from rustraytrace_tpu.render import render_pass, resolve_backend

    # 1024 spp (round 5; was 256, round 4; 64 before): multi-second runs
    # hold ±15% through the tunnel where ~1 s runs jitter far more
    # (CLAUDE.md), and the sorted persist loop keeps amortizing its
    # per-launch sort+permute with launch length — one-process sweep spp
    # 256/512/1024/2048 = 64.3/70.1/72.9/74.7 M paths/s (reps within 1%
    # at >= 1024).  1024 balances the plateau against driver wall time
    # (~11 s/rep).  The metric (paths/s) is spp-invariant, so rounds stay
    # comparable.
    spp = int(os.environ.get("BENCH_SPP", "1024"))
    width = int(os.environ.get("BENCH_WIDTH", "1200"))
    depth = int(os.environ.get("BENCH_DEPTH", "50"))
    chunk = int(os.environ.get("BENCH_CHUNK", "131072"))

    scene, cfg, _ = models.book1_random_spheres(
        dict(image_width=width, samples_per_pixel=spp, max_depth=depth)
    )
    cam = derive_camera(cfg)
    w, h = cfg.image_width, cfg.image_height
    key = jax.random.key(0)

    backend = os.environ.get("BENCH_BACKEND") or resolve_backend(scene, "path")
    kw = dict(width=w, height=h, max_depth=depth, integrator="path",
              chunk=min(chunk, w * h), backend=backend)

    import numpy as np

    # Warmup compiles + runs the exact timed executable once.  NOTE on the
    # axon TPU tunnel: (a) block_until_ready returns immediately — np.asarray
    # (device->host copy) is the only reliable completion fence, so all
    # timing uses it; (b) a fresh process's FIRST device execution randomly
    # stalls 1-5 min in the claim/transfer layer (measured even for a plain
    # 256x256 matmul — content-independent), so the warmup absorbs that and
    # retries actual crashes.
    warmup_with_retries(
        lambda: np.asarray(render_pass(scene, cam, key, spp=spp, **kw)))

    from rustraytrace_tpu.utils.metrics import time_best

    paths = w * h * spp
    # repeats=4 (round 5; was 2): the round-4 driver run recorded 42.7 M
    # against a 52-64 M interactive span (fresh-process re-runs this round:
    # 62.8/64.5/63.5 M, all reps within 61-64) — best-of-2 can sample a
    # transiently degraded pair.  Per-rep times go to stderr so a recorded
    # number is auditable; if the rep spread exceeds 15% (the tunnel's
    # process-noise model) the bench takes a short breather and runs extra
    # reps, which rescues transient host-contention spikes (sustained
    # contention is outside any benchmark's control).
    repeats = int(os.environ.get("BENCH_REPEATS", "4"))
    reps: list = []

    def on_rep(i, dt):
        reps.append(dt)
        print(f"# rep {len(reps) - 1}: {dt:.3f}s = "
              f"{paths / dt / 1e6:.1f} Mpaths/s", file=sys.stderr, flush=True)

    go = lambda: render_pass(scene, cam, key, spp=spp, **kw)  # noqa: E731
    elapsed = time_best(go, repeats=repeats, on_rep=on_rep)
    if (max(reps) - min(reps)) / min(reps) > 0.15:
        print("# rep spread > 15%; extra reps after a 10 s breather",
              file=sys.stderr, flush=True)
        time.sleep(10.0)
        elapsed = min(elapsed, time_best(go, repeats=2, on_rep=on_rep))

    pps = paths / elapsed
    print(json.dumps({
        "metric": "paths_per_sec",
        "value": round(pps, 1),
        "unit": "paths/s",
        "vs_baseline": round(pps / BASELINE_PATHS_PER_SEC, 3),
    }))
    print(f"# {paths} paths in {elapsed:.2f}s on {jax.devices()[0].platform} "
          f"backend={backend} ({w}x{h} @ {spp}spp depth {depth})",
          file=sys.stderr)


if __name__ == "__main__":
    main()
