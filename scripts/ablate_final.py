"""book2_final_scene component ablation on the real TPU (round 3).

Rebuilds the flagship book-2 scene with individual components removed and
measures each variant, to locate where the ~5.5 Mpaths/s bottleneck lives:
the 1006-sphere cloud, the 400 ground boxes, the whole-scene mist medium,
the earth image texture (and with it the SEGMENT loop itself — `solid_seg`
keeps the segmented wavefront loop but without any image texture, isolating
the per-segment HBM/XLA tax from the texel work).

Usage:
    PYTHONPATH=/root/repo:/root/.axon_site python scripts/ablate_final.py [case ...]
"""

import json
import sys
import time

import numpy as np


def build_final(no_cloud=False, no_boxes=False, no_mist=False,
                no_inner=False, no_image=False, no_perlin=False,
                image_width=800):
    """book2_final_scene (models/scenes.py:312-359) with removable parts."""
    from rustraytrace_tpu.config import RenderConfig
    from rustraytrace_tpu.models.scenes import (_SCENE_SEED, _finish,
                                                _load_earthmap,
                                                _rotate_translate_point)
    from rustraytrace_tpu.scene import SceneBuilder

    rng = np.random.default_rng(_SCENE_SEED)
    b = SceneBuilder()
    ground = b.lambertian((0.48, 0.83, 0.53))
    for i in range(20):
        for j in range(20):
            w = 100.0
            x0 = -1000.0 + i * w
            z0 = -1000.0 + j * w
            y1 = rng.random() * 100.0 + 1.0
            if not no_boxes:
                b.add_box((x0, 0.0, z0), (x0 + w, y1, z0 + w), ground)
    b.add_quad((123, 554, 147), (300, 0, 0), (0, 0, 265),
               b.diffuse_light((7.0, 7.0, 7.0)))
    c1 = np.array([400.0, 400.0, 200.0])
    b.add_sphere(c1, 50.0, b.lambertian((0.7, 0.3, 0.1)),
                 center2=c1 + np.array([30.0, 0.0, 0.0]))
    b.add_sphere((260, 150, 45), 50.0, b.dielectric(1.5))
    b.add_sphere((0, 150, 145), 50.0, b.metal((0.8, 0.8, 0.9), 1.0))
    b.add_sphere((360, 150, 145), 70.0, b.dielectric(1.5))
    if not no_inner:
        b.add_medium_sphere((360, 150, 145), 70.0, 0.2,
                            b.isotropic((0.2, 0.4, 0.9)))
    if not no_mist:
        b.add_medium_sphere((0, 0, 0), 5000.0, 0.0001,
                            b.isotropic((1.0, 1.0, 1.0)))
    if no_image:
        b.add_sphere((400, 200, 400), 100.0, b.lambertian((0.4, 0.3, 0.2)))
    else:
        b.add_sphere((400, 200, 400), 100.0,
                     b.lambertian(tex=b.image_texture(_load_earthmap())))
    if no_perlin:
        b.add_sphere((220, 280, 300), 80.0, b.lambertian((0.6, 0.6, 0.6)))
    else:
        b.add_sphere((220, 280, 300), 80.0, b.lambertian(tex=b.noise(0.2)))
    white = b.lambertian((0.73, 0.73, 0.73))
    for _ in range(1000):
        center = rng.uniform(0.0, 165.0, 3)
        q, _, _ = _rotate_translate_point(center, 15.0, (-100, 270, 395))
        if not no_cloud:
            b.add_sphere(q, 10.0, white)
    cfg = RenderConfig(
        aspect_ratio=1.0, image_width=image_width, samples_per_pixel=64,
        max_depth=40, background=(0.0, 0.0, 0.0), vfov=40.0,
        lookfrom=(478.0, 278.0, -600.0), lookat=(278.0, 278.0, 0.0),
    )
    return _finish(b, cfg, "path", None)


CASES = {
    "full": dict(),
    "no_image": dict(no_image=True),        # -> respawn megakernel
    "no_cloud": dict(no_cloud=True),
    "no_boxes": dict(no_boxes=True),
    "no_mist": dict(no_mist=True),
    "no_inner": dict(no_inner=True),
    "no_perlin": dict(no_perlin=True),
    "bare": dict(no_cloud=True, no_boxes=True, no_mist=True, no_inner=True,
                 no_perlin=True),
}


def main():
    import jax

    from rustraytrace_tpu.config import derive_camera
    from rustraytrace_tpu.ops.pallas_megakernel import render_pass_megakernel
    from rustraytrace_tpu.ops.pallas_wavefront import render_pass_wavefront
    from rustraytrace_tpu.utils.metrics import time_best

    names = sys.argv[1:] or list(CASES)
    for name in names:
        scene, cfg, _ = build_final(**CASES[name])
        cam = derive_camera(cfg)
        w, h, spp, depth = (cfg.image_width, cfg.image_height, 64, 40)
        has_img = "image" in scene.features
        variants = [("auto", None)]
        if not has_img:
            variants = [("respawn", None)]
        for label, _ in variants:
            key = jax.random.key(0)

            def go():
                if has_img:
                    return render_pass_wavefront(
                        scene, cam, key, width=w, height=h, spp=spp,
                        max_depth=depth)
                return render_pass_megakernel(
                    scene, cam, key, width=w, height=h, spp=spp,
                    max_depth=depth, respawn=True)

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
                                  "error": str(e)[:160]}), flush=True)


if __name__ == "__main__":
    main()
