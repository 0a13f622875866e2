"""Spatial-split grid binning for dense sphere clouds (ops/bvh.py, round 4).

The representation change behind the book2_final cloud ceiling: SAH cluster
AABBs over the 1006-sphere cloud OVERLAP (r=10 spheres filling a 165-cube),
so every in-cloud tile origin sits inside ~all of them and the kernel's
ANY-LANE cull admits everything.  Grid binning duplicates each sphere into
every cell it overlaps (SBVH-style spatial split) and clips cell AABBs, so
cells are disjoint and best-t bounding prunes.  These tests pin (a) listing
completeness, (b) exact closest-hit equivalence through the kernel's cull
logic simulated per ray, and (c) the overlap-triggered dispatch.
"""

import numpy as np
import pytest

from rustraytrace_tpu.ops.bvh import (cluster_spheres_numpy,
                                      cluster_spheres_spatial,
                                      grid_bin_spheres,
                                      sphere_fill_fraction)

T_MIN, T_MAX = 1e-3, 1e9


def _cloud(n=300, seed=0, box=100.0, r=8.0):
    rng = np.random.default_rng(seed)
    centers = rng.uniform(0, box, (n, 3)).astype(np.float32)
    radii = np.full(n, r, np.float32)
    return centers, radii


def test_grid_lists_every_overlapped_cell():
    centers, radii = _cloud()
    out = grid_bin_spheres(centers, radii, max_leaf=32, res=6)
    assert out is not None
    order, cl_start, cl_min, cl_max = out
    assert order.shape[0] > centers.shape[0]  # duplication happened
    # every sphere appears at least once, and every listed copy's cluster
    # AABB intersects the sphere's AABB
    assert set(order.tolist()) == set(range(centers.shape[0]))
    for c in range(cl_start.shape[0] - 1):
        for s in order[cl_start[c]:cl_start[c + 1]]:
            lo, hi = centers[s] - radii[s], centers[s] + radii[s]
            assert np.all(cl_min[c] <= hi + 1e-4) and np.all(
                cl_max[c] >= lo - 1e-4)


def _closest_hit_brute(o, d, centers, radii):
    oc = centers - o[None, :]
    a = float(d @ d)
    h = oc @ d
    c = np.sum(oc * oc, axis=-1) - radii * radii
    disc = h * h - a * c
    sq = np.sqrt(np.maximum(disc, 0.0))
    tn, tf = (h - sq) / a, (h + sq) / a
    root = np.where((tn > T_MIN) & (tn < T_MAX), tn, tf)
    ok = (disc > 0) & (root > T_MIN) & (root < T_MAX)
    if not ok.any():
        return np.inf, -1
    i = np.argmin(np.where(ok, root, np.inf))
    return float(root[i]), int(i)


def _closest_hit_culled(o, d, centers, radii, order, cl_start, cl_min,
                        cl_max):
    """Replicates the kernel's cull + sphere loop per ray: scan clusters in
    order, slab-test with the running best t, test member spheres fully."""
    inv = 1.0 / np.where(np.abs(d) < 1e-20,
                         np.where(d < 0, -1e-20, 1e-20), d)
    bt, bi = np.inf, -1
    for c in range(cl_start.shape[0] - 1):
        ta = (cl_min[c] - o) * inv
        tb = (cl_max[c] - o) * inv
        t1 = np.max(np.minimum(ta, tb))
        t2 = np.min(np.maximum(ta, tb))
        if not (t1 <= t2 and t2 > T_MIN and t1 < bt):
            continue
        for s in order[cl_start[c]:cl_start[c + 1]]:
            oc = centers[s] - o
            a = float(d @ d)
            h = float(d @ oc)
            cc = float(oc @ oc) - radii[s] * radii[s]
            disc = h * h - a * cc
            if disc <= 0:
                continue
            sq = np.sqrt(disc)
            tn, tf = (h - sq) / a, (h + sq) / a
            root = tn if (T_MIN < tn < T_MAX) else tf
            if T_MIN < root < T_MAX and root < bt:
                bt, bi = root, int(s)
    return bt, bi


def test_grid_closest_hit_equivalence():
    """Rays from inside and outside the cloud find the identical winner
    through the grid-culled scan as by brute force."""
    centers, radii = _cloud()
    order, cl_start, cl_min, cl_max = grid_bin_spheres(
        centers, radii, max_leaf=32, res=6)
    rng = np.random.default_rng(1)
    for k in range(60):
        if k % 2 == 0:
            o = rng.uniform(0, 100, 3).astype(np.float32)   # inside
        else:
            o = rng.uniform(-200, -100, 3).astype(np.float32)  # outside
        d = rng.normal(size=3).astype(np.float32)
        d /= np.linalg.norm(d)
        t0, i0 = _closest_hit_brute(o, d, centers, radii)
        t1, i1 = _closest_hit_culled(o, d, centers, radii, order, cl_start,
                                     cl_min, cl_max)
        assert i0 == i1 and np.isclose(t0, t1, rtol=1e-5, atol=1e-6), (
            k, t0, i0, t1, i1)


def test_fill_metric_and_dispatch(monkeypatch):
    """Dense cloud -> high fill -> grid layout; sparse field -> SAH kept.
    (Opt-in: the grid measured slower than SAH on book2_final and ships
    default-off; see cluster_spheres_spatial's docstring.)"""
    monkeypatch.setenv("RTT_SPHERE_GRID", "1")
    centers, radii = _cloud()  # 300 r=8 in a 100-cube: fill ~0.64
    assert sphere_fill_fraction(centers, radii) > 0.3
    out = cluster_spheres_spatial(centers, radii, 32)
    assert out[0].shape[0] > centers.shape[0]  # grid (duplicated) layout

    rng = np.random.default_rng(3)
    sparse_c = rng.uniform(0, 1000, (300, 3)).astype(np.float32)
    sparse_r = np.full(300, 2.0, np.float32)
    assert sphere_fill_fraction(sparse_c, sparse_r) <= 0.3
    out2 = cluster_spheres_spatial(sparse_c, sparse_r, 32)
    assert out2[0].shape[0] == 300  # SAH kept, no duplication


def test_reference_scene_dispatch_decisions(monkeypatch):
    """With the grid opted in, book2_final's static cloud group triggers
    it; the flagship random-spheres field stays on SAH."""
    monkeypatch.setenv("RTT_SPHERE_GRID", "1")
    import jax

    from rustraytrace_tpu import models

    def groups(scene):
        cen = np.asarray(scene.sph_center)
        vel = np.asarray(scene.sph_cvel)
        rad = np.abs(np.asarray(scene.sph_radius))
        mask = np.asarray(scene.sph_mask) > 0
        movingp = (np.abs(vel).max(axis=-1) > 0) & mask
        st = ~movingp & mask
        return cen[st], np.where(mask, rad, 0.0)[st]

    s_final, _, _ = models.book2_final_scene(
        dict(image_width=64, samples_per_pixel=2, max_depth=4))
    c, r = groups(s_final)
    out = cluster_spheres_spatial(c, r, 32)
    assert out[0].shape[0] > c.shape[0], "cloud must grid-bin"

    s_flag, _, _ = models.book1_random_spheres(
        dict(image_width=64, samples_per_pixel=2, max_depth=4))
    c, r = groups(s_flag)
    out = cluster_spheres_spatial(c, r, 32)
    assert out[0].shape[0] == c.shape[0], "flagship must stay SAH"


def test_oversize_spheres_fall_back_to_sah_clusters():
    centers, radii = _cloud(n=200)
    centers = np.concatenate(
        [centers, [[200.0, 0.0, 0.0], [0.0, 300.0, 0.0]]]).astype(np.float32)
    radii = np.concatenate([radii, [90.0, 120.0]]).astype(np.float32)
    out = grid_bin_spheres(centers, radii, max_leaf=32, res=6)
    assert out is not None
    order, cl_start, cl_min, cl_max = out
    # the two oversize spheres appear exactly once each (no duplication)
    assert (order == 200).sum() == 1 and (order == 201).sum() == 1
    # and equivalence still holds with mixed sizes
    rng = np.random.default_rng(5)
    for _ in range(30):
        o = rng.uniform(-50, 150, 3).astype(np.float32)
        d = rng.normal(size=3).astype(np.float32)
        d /= np.linalg.norm(d)
        t0, i0 = _closest_hit_brute(o, d, centers, radii)
        t1, i1 = _closest_hit_culled(o, d, centers, radii, order, cl_start,
                                     cl_min, cl_max)
        assert i0 == i1 and np.isclose(t0, t1, rtol=1e-5, atol=1e-6)


def test_prepare_megakernel_grid_on_book2_final(monkeypatch):
    """The real book2_final scene routes its static cloud through the grid
    layout inside prepare_megakernel: with the grid enabled the sphere
    table carries MORE slots than the grid-disabled prep (duplication,
    beyond what unroll padding alone adds)."""
    from rustraytrace_tpu import models
    from rustraytrace_tpu.config import derive_camera
    from rustraytrace_tpu.ops.pallas_megakernel import prepare_megakernel

    scene, cfg, _ = models.book2_final_scene(
        dict(image_width=64, samples_per_pixel=2, max_depth=4))
    cam = derive_camera(cfg)
    kw = dict(width=cfg.image_width, height=cfg.image_height, spp=1,
              max_depth=4, interpret=True, segment=True)
    monkeypatch.delenv("RTT_SPHERE_GRID", raising=False)
    arrays_sah, _ = prepare_megakernel(scene, cam, **kw)
    monkeypatch.setenv("RTT_SPHERE_GRID", "1")
    arrays_grid, _ = prepare_megakernel(scene, cam, **kw)
    assert arrays_grid["tab"].shape[1] > arrays_sah["tab"].shape[1]
