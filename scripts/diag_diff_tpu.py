#!/usr/bin/env python
"""Round-5 diagnosis: why does the TPU remote compiler SIGILL on the
differentiable render program (VERDICT r4 item 1)?

Runs ONE configuration per process (the failure kills the process, so a
driver loop in bash/python spawns this per config) and prints a single
result line.  Usage:

    python scripts/diag_diff_tpu.py WIDTH SPP DEPTH CHUNK FLAGS...

FLAGS: nowarp | nosharded | noremat | mis | policy=<name> | fit
"""

import sys
import time

import numpy as np


def main() -> int:
    width = int(sys.argv[1])
    spp = int(sys.argv[2])
    depth = int(sys.argv[3])
    chunk = int(sys.argv[4])
    flags = set(sys.argv[5:])

    import jax
    import jax.numpy as jnp

    from rustraytrace_tpu.config import RenderConfig, derive_camera
    from rustraytrace_tpu.parallel import make_mesh
    from rustraytrace_tpu.scene import SceneBuilder

    b = SceneBuilder()
    b.add_sphere((0.0, -100.5, -1.0), 100.0, b.lambertian((0.6, 0.6, 0.6)))
    b.add_sphere((-0.1, 0.05, -1.2), 0.5, b.lambertian((0.75, 0.25, 0.15)))
    b.add_sphere((1.2, 0.0, -1.4), 0.4, b.metal((0.8, 0.8, 0.8), 0.1))
    scene = b.build()

    cfg = RenderConfig(aspect_ratio=16 / 9, image_width=width,
                       samples_per_pixel=spp, max_depth=depth, vfov=60.0,
                       lookfrom=(0, 0.3, 0.6), lookat=(0, 0, -1), seed=3)
    cam = derive_camera(cfg)
    mesh = make_mesh()
    integ = "mis" if "mis" in flags else "path"
    warp = "nowarp" not in flags
    remat = "noremat" not in flags

    from rustraytrace_tpu.diff import apply_params, extract_params

    # NOTE (round-5 history): the sgdet/nojvp/xlawarp/contract flags below
    # were the bisect matrix that located the remote-compiler SIGILL
    # (answer: any program keeping the warp's forward trace live next to
    # its backward; fix: diff.value_and_grad_loss's grad-only contraction).
    # They were written against the round-4 box-filter warp API; the warp
    # now returns (o, d, time, det, u_w) and the diff path tent-splats, so
    # these historical probes are not all runnable verbatim anymore.
    if "nojvp" in flags:
        # remove the jvp entirely: W evaluated once, det := 1.  Keeps the
        # first-order silhouette shift; isolates whether the jvp ops (even
        # untransposed) are what SIGILLs the fusion pass.
        import dataclasses as _dc

        import rustraytrace_tpu.ops.warp as warp_mod

        def _nojvp(scene, cam, px, py, draws, strat=None):
            from rustraytrace_tpu.ops.rng import in_unit_disk

            dt = draws.dtype
            if strat is None:
                ox = draws[:, 0] - 0.5
                oy = draws[:, 1] - 0.5
            else:
                s_i, s_j, sqrt_spp = strat
                recip = 1.0 / sqrt_spp
                ox = (s_i + draws[:, 0]) * recip - 0.5
                oy = (s_j + draws[:, 1]) * recip - 0.5
            u = jnp.stack([ox, oy], axis=-1)
            if cam.lens_radius_gt0:
                disk = in_unit_disk(draws[:, 2], draws[:, 3])
                origin = (cam.center[None, :]
                          + disk[:, 0:1] * cam.defocus_disk_u[None, :]
                          + disk[:, 1:2] * cam.defocus_disk_v[None, :])
            else:
                origin = jnp.broadcast_to(
                    cam.center[None, :], (px.shape[0], 3)).astype(dt)
            time = draws[:, 4]
            base = (cam.pixel00[None, :]
                    + px[:, None] * cam.pixel_delta_u[None, :]
                    + py[:, None] * cam.pixel_delta_v[None, :] - origin)
            sg = jax.lax.stop_gradient
            scene_d = _dc.replace(
                scene, sph_center=sg(scene.sph_center),
                sph_cvel=sg(scene.sph_cvel),
                sph_radius=sg(scene.sph_radius))
            w_val = warp_mod._warp_field(
                u, base, cam.pixel_delta_u, cam.pixel_delta_v, sg(origin),
                sg(time), scene, scene_d)
            u_w = u + w_val
            pixel_sample = (
                cam.pixel00[None, :]
                + (px + u_w[:, 0])[:, None] * cam.pixel_delta_u[None, :]
                + (py + u_w[:, 1])[:, None] * cam.pixel_delta_v[None, :])
            direction = pixel_sample - origin
            return origin, direction, time, jnp.ones_like(time)

        warp_mod.warped_primary_rays = _nojvp

    if "sgdet" in flags:
        # stop-grad the warp's Jacobian determinant: keeps the first-order
        # silhouette shift (u_w) differentiable but removes the
        # second-order (jvp-inside-vjp) det term — isolates whether the
        # double-AD program is what SIGILLs the fusion pass
        import rustraytrace_tpu.ops.warp as warp_mod

        _orig = warp_mod.warped_primary_rays

        def _sg_det(*a, **k):
            o, d, t, det, u_w = _orig(*a, **k)
            return o, d, t, jax.lax.stop_gradient(det), u_w

        warp_mod.warped_primary_rays = _sg_det

    key = jax.random.key(0)
    params0 = extract_params(scene, ["sph_center", "tex_color1"])
    t0 = time.perf_counter()

    if "nosharded" in flags:
        # single-device grad through the plain pass (no shard_map wrapper)
        from rustraytrace_tpu.render import _render_pass_xla

        def loss(p):
            acc = _render_pass_xla(
                apply_params(scene, p), cam, key, width=width,
                height=cfg.image_height, spp=spp,
                max_depth=depth, integrator=integ, chunk=chunk,
                stratified=False, sqrt_spp=0, sample_offset=0, backend="xla")
            return jnp.mean(acc / spp)

    else:
        from rustraytrace_tpu.diff import render_mean

        def loss(p):
            img = render_mean(
                apply_params(scene, p), cam, key, width=width,
                height=cfg.image_height, spp=spp,
                max_depth=depth, mesh=mesh, integrator=integ, chunk=chunk,
                warp_primary=warp)
            return jnp.mean(img)

    if flags & {"fit", "fit-split", "vag"}:
        # mirror examples/inverse_rendering.py's train_step structure to
        # find which piece trips the remote compiler's fusion-pass SIGILL
        import optax

        target = jnp.zeros((cfg.image_height, width, 3), jnp.float32)

        def mse(p):
            img_loss = loss(p)  # loss() returns mean radiance; reuse trace
            return img_loss

        def render_p(p):
            if "nosharded" in flags:
                from rustraytrace_tpu.render import _render_pass_xla

                acc = _render_pass_xla(
                    apply_params(scene, p), cam, key, width=width,
                    height=cfg.image_height, spp=spp, max_depth=depth,
                    integrator=integ, chunk=chunk, stratified=False,
                    sqrt_spp=0, sample_offset=0, backend="xla")
                return acc / spp
            from rustraytrace_tpu.diff import render_mean as rm

            return rm(apply_params(scene, p), cam, key, width=width,
                      height=cfg.image_height, spp=spp, max_depth=depth,
                      mesh=mesh, integrator=integ, chunk=chunk,
                      warp_primary="nowarp" not in flags)

        def loss_mse(p):
            return jnp.mean((render_p(p) - target) ** 2)

        if flags & {"xlawarp", "contract", "contractgrad"}:
            # hand-rolled single-device pass: scan over samples (remat) of a
            # scan over chunks of warped rays (trace_rays_diff post-round-5;
            # the original bisect ran pre-splat warped trace_rays).
            # xlawarp: accumulate the [n,3] image, MSE loss (tests whether
            #   shard_map is a crash ingredient).
            # contract: contract each chunk against a ct slice immediately —
            #   the image buffer never materializes, scalar scan carry
            #   (tests the "kept forward accumulation" crash ingredient).
            from rustraytrace_tpu.render import trace_rays_diff

            h = cfg.image_height
            n_pix = width * h
            n_pad = -(-n_pix // chunk) * chunk
            n_chunks = n_pad // chunk
            pix = jnp.arange(n_pad, dtype=jnp.int32)
            px_all = (pix % width).astype(jnp.float32).reshape(
                n_chunks, chunk)
            py_all = jnp.minimum(pix // width, h - 1).astype(
                jnp.float32).reshape(n_chunks, chunk)
            starts = jnp.arange(n_chunks) * chunk
            tgt_flat = jnp.zeros((n_pad, 3), jnp.float32)
            ct_flat = jnp.ones((n_pad, 3), jnp.float32) / (3.0 * n_pix * spp)

            def one_sample(p, s):
                sc = apply_params(scene, p)

                def chunk_body(_, args):
                    gc_, px_, py_ = args
                    kc = jax.random.fold_in(jax.random.fold_in(key, s), gc_)
                    rad, _uw = trace_rays_diff(
                        sc, cam, kc, s, px_, py_, max_depth=depth,
                        integrator=integ, warp=True)
                    return None, rad

                _, rads = jax.lax.scan(chunk_body, None,
                                       (starts, px_all, py_all))
                return rads.reshape(n_pad, 3)

            body = jax.checkpoint(one_sample)

            if "contractgrad" in flags:
                # grad-ONLY with ct an argument: the primal contraction is
                # dead code, so the forward trace should be DCE'd leaving
                # backward+recompute — the shape grad-of-mean survives in
                def loss_ct(p, ct):
                    def sample_body(acc, s):
                        rads = body(p, s)
                        return acc + jnp.sum(rads * ct), None

                    out, _ = jax.lax.scan(
                        sample_body, jnp.float32(0), jnp.arange(spp))
                    return out

                f = jax.jit(jax.grad(loss_ct, argnums=0))
                g = f(params0, ct_flat)
                gc = np.asarray(g["sph_center"])
                dt_compile = time.perf_counter() - t0
                t0 = time.perf_counter()
                np.asarray(f(params0, ct_flat)["sph_center"])
                dt_run = time.perf_counter() - t0
                paths = n_pix * spp
                print(f"OK w={width} spp={spp} d={depth} chunk={chunk} "
                      f"flags={sorted(flags)} compile={dt_compile:.1f}s "
                      f"run={dt_run:.3f}s ({paths / dt_run / 1e6:.3f} "
                      f"Mpaths/s) |g_center|={np.abs(gc).max():.3e}",
                      flush=True)
                return 0

            if "contract" in flags:
                def loss_hand(p):
                    def sample_body(acc, s):
                        rads = body(p, s)
                        return acc + jnp.sum(rads * ct_flat), None

                    out, _ = jax.lax.scan(
                        sample_body, jnp.float32(0), jnp.arange(spp))
                    return out
            else:
                def loss_hand(p):
                    def sample_body(acc, s):
                        return acc + body(p, s), None

                    img, _ = jax.lax.scan(
                        sample_body, jnp.zeros((n_pad, 3), jnp.float32),
                        jnp.arange(spp))
                    return jnp.mean((img / spp - tgt_flat) ** 2)

            f = jax.jit(jax.value_and_grad(loss_hand))
            out = f(params0)
            np.asarray(out[0])
            gc = np.asarray(out[1]["sph_center"])
            dt_compile = time.perf_counter() - t0
            t0 = time.perf_counter()
            out = f(params0)
            np.asarray(out[0])
            dt_run = time.perf_counter() - t0
            paths = n_pix * spp
            print(f"OK w={width} spp={spp} d={depth} chunk={chunk} "
                  f"flags={sorted(flags)} compile={dt_compile:.1f}s "
                  f"run={dt_run:.3f}s ({paths / dt_run / 1e6:.3f} Mpaths/s) "
                  f"|g_center|={np.abs(gc).max():.3e}", flush=True)
            return 0

        masks = {k: jnp.ones_like(v) for k, v in params0.items()}

        def row_mask():
            def update(updates, state, params=None):
                return ({k: u * masks[k] for k, u in updates.items()}, state)
            return optax.GradientTransformation(
                lambda p: optax.EmptyState(), update)

        opt = optax.chain(
            optax.zero_nans(), optax.clip_by_global_norm(1.0), row_mask(),
            optax.multi_transform(
                {"alb": optax.adam(0.03), "ctr": optax.adam(0.004)},
                {"tex_color1": "alb", "sph_center": "ctr"}))
        opt_state = opt.init(params0)

        if "linct" in flags:
            # two-program split: forward render (compiles), then grad of the
            # LINEAR functional sum(render * ct) with ct an input constant —
            # the backward has no primal-output dependence, the pattern the
            # fusion pass survives (grad-of-mean compiles)
            fwd = jax.jit(render_p)
            img = fwd(params0)
            np.asarray(img)
            ct = 2.0 * (img - target) / img.size

            def lin(p, ct):
                return jnp.sum(render_p(p) * ct)

            gradf = jax.jit(jax.grad(lin))
            g = gradf(params0, ct)
            gc = np.asarray(g["sph_center"])
            dt_compile = time.perf_counter() - t0
            t0 = time.perf_counter()
            np.asarray(fwd(params0))
            np.asarray(gradf(params0, ct)["sph_center"])
            dt_run = time.perf_counter() - t0
            paths = width * cfg.image_height * spp
            print(f"OK w={width} spp={spp} d={depth} chunk={chunk} "
                  f"flags={sorted(flags)} compile={dt_compile:.1f}s "
                  f"run={dt_run:.3f}s ({paths / dt_run / 1e6:.3f} Mpaths/s "
                  f"fwd+bwd) |g_center|={np.abs(gc).max():.3e}", flush=True)
            return 0

        if "vag" in flags:
            if "mean" in flags:       # value_and_grad of the MEAN loss
                f = jax.jit(lambda p: jax.value_and_grad(loss)(p))
            elif "gradonly" in flags:  # plain grad of the MSE loss
                f = jax.jit(lambda p: (jnp.float32(0), jax.grad(loss_mse)(p)))
            else:
                f = jax.jit(lambda p: jax.value_and_grad(loss_mse)(p))
            out = f(params0)
            np.asarray(out[0])
            g = out[1]
        elif "fit" in flags:
            @jax.jit
            def train_step(p, s, k):
                l, grads = jax.value_and_grad(loss_mse)(p)
                updates, s = opt.update(grads, s, p)
                return optax.apply_updates(p, updates), s, l

            p1, s1, l1 = train_step(params0, opt_state, key)
            np.asarray(l1)
            g = jax.tree.map(lambda a, b: a - b, p1, params0)
        else:  # fit-split: grad jitted apart from the optax update
            gradf = jax.jit(jax.value_and_grad(loss_mse))

            @jax.jit
            def updatef(grads, s, p):
                updates, s = opt.update(grads, s, p)
                return optax.apply_updates(p, updates), s

            l1, grads = gradf(params0)
            np.asarray(l1)
            p1, s1 = updatef(grads, opt_state, params0)
            np.asarray(p1["sph_center"])
            g = grads
        gc = np.asarray(g["sph_center"])
        dt_compile = time.perf_counter() - t0
        print(f"OK w={width} spp={spp} d={depth} chunk={chunk} "
              f"flags={sorted(flags)} compile={dt_compile:.1f}s "
              f"|g_center|={np.abs(gc).max():.3e}", flush=True)
        return 0

    f = jax.jit(jax.grad(loss))
    g = f(params0)
    gc = np.asarray(g["sph_center"])
    dt_compile = time.perf_counter() - t0
    # timed steady-state grad step (same jitted callable => cached)
    t0 = time.perf_counter()
    gg = f(params0)
    np.asarray(gg["sph_center"])
    dt_run = time.perf_counter() - t0
    paths = width * cfg.image_height * spp
    print(f"OK w={width} spp={spp} d={depth} chunk={chunk} flags={sorted(flags)} "
          f"compile={dt_compile:.1f}s run={dt_run:.3f}s "
          f"({paths / dt_run / 1e6:.3f} Mpaths/s) "
          f"|g_center|={np.abs(gc).max():.3e}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
