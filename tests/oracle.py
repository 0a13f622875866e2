"""Scalar NumPy path-tracing oracle for statistical golden tests.

An independent, direct transcription of the path-tracing ALGORITHM (camera
model, sphere intersection, lambertian/metal/dielectric scatter, Russian
roulette, sky background) in straight-line NumPy — deliberately scalar and
recursive like the reference CPU tracer, sharing no code with the JAX
implementation.  The two implementations use different RNG streams, so tests
compare sample MEANS within Monte-Carlo tolerance, never per-sample values.
"""

from __future__ import annotations

import math

import numpy as np

RR_START = 5


def _unit(v):
    return v / np.linalg.norm(v)


class OracleSphere:
    def __init__(self, center, radius, kind, albedo=(1, 1, 1), fuzz=0.0, ior=1.5):
        self.center = np.asarray(center, np.float64)
        self.radius = float(radius)
        self.kind = kind  # 'lam' | 'metal' | 'diel'
        self.albedo = np.asarray(albedo, np.float64)
        self.fuzz = float(fuzz)
        self.ior = float(ior)


def _hit(spheres, o, d, t_min=1e-3, t_max=1e9):
    best_t, best = np.inf, None
    for s in spheres:
        oc = s.center - o
        a = d @ d
        h = d @ oc
        c = oc @ oc - s.radius * s.radius
        disc = h * h - a * c
        if disc <= 0:
            continue
        sq = math.sqrt(disc)
        root = (h - sq) / a
        if not (t_min < root < min(t_max, best_t)):
            root = (h + sq) / a
            if not (t_min < root < min(t_max, best_t)):
                continue
        best_t, best = root, s
    return (best_t, best) if best is not None else (None, None)


def _rand_unit(rng):
    a = rng.random() * 2 * math.pi
    z = rng.random() * 2 - 1
    r = math.sqrt(max(0.0, 1 - z * z))
    return np.array([r * math.cos(a), r * math.sin(a), z])


def _ray_color(spheres, o, d, rng, max_depth):
    atten = np.ones(3)
    for bounce in range(max_depth):
        t, s = _hit(spheres, o, d)
        if s is None:
            unit = _unit(d)
            a = 0.5 * (unit[1] + 1.0)
            sky = (1 - a) * np.ones(3) + a * np.array([0.5, 0.7, 1.0])
            return atten * sky
        p = o + t * d
        outward = (p - s.center) / s.radius
        front = d @ outward < 0
        n = outward if front else -outward
        if s.kind == "lam":
            nd = n + _rand_unit(rng)
            if nd @ nd < 1e-16:
                nd = n
            atten = atten * s.albedo
        elif s.kind == "metal":
            ud = _unit(d)
            refl = ud - 2 * (ud @ n) * n
            nd = refl + s.fuzz * _rand_unit(rng)
            if nd @ n <= 0:
                return np.zeros(3)
            atten = atten * s.albedo
        else:  # dielectric
            ri = (1.0 / s.ior) if front else s.ior
            ud = _unit(d)
            cos_t = min(-ud @ n, 1.0)
            sin_t = math.sqrt(max(0.0, 1 - cos_t * cos_t))
            r0 = ((1 - ri) / (1 + ri)) ** 2
            schlick = r0 + (1 - r0) * (1 - cos_t) ** 5
            if ri * sin_t > 1.0 or schlick > rng.random():
                nd = ud - 2 * (ud @ n) * n
            else:
                perp = ri * (ud + cos_t * n)
                par = -math.sqrt(abs(1 - perp @ perp)) * n
                nd = perp + par
        if bounce >= RR_START:
            prob = float(np.clip(atten.max(), 0.05, 0.95))
            if rng.random() > prob:
                return np.zeros(3)
            atten = atten / prob
        o, d = p, nd
    return np.zeros(3)


def render_oracle(spheres, width, height, spp, max_depth, *, vfov=90.0,
                  lookfrom=(0, 0, 0), lookat=(0, 0, -1), vup=(0, 1, 0),
                  focus_dist=1.0, seed=7):
    """Render mean radiance [H,W,3] (pre-gamma), camera per camera.rs:102-150."""
    rng = np.random.default_rng(seed)
    lookfrom = np.asarray(lookfrom, np.float64)
    lookat = np.asarray(lookat, np.float64)
    theta = math.radians(vfov)
    vh = 2 * math.tan(theta / 2) * focus_dist
    vw = vh * width / height
    w = _unit(lookfrom - lookat)
    u = _unit(np.cross(vup, w))
    v = np.cross(w, u)
    du = vw * u / width
    dv = -vh * v / height
    p00 = lookfrom - focus_dist * w - vw * u / 2 + vh * v / 2 + 0.5 * (du + dv)

    img = np.zeros((height, width, 3))
    for j in range(height):
        for i in range(width):
            acc = np.zeros(3)
            for _ in range(spp):
                px = p00 + (i + rng.random() - 0.5) * du + (j + rng.random() - 0.5) * dv
                acc += _ray_color(spheres, lookfrom, px - lookfrom, rng, max_depth)
            img[j, i] = acc / spp
    return img
