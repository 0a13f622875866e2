"""SAH quad clustering (round 4): cluster_quad_table packs per-cluster
metadata rows into the quad SMEM table; the kernel's qcull slab-tests them
against the tile before scanning member quads.  The reference BVHs its
quads (the_next_week/mod.rs:616-621); reference scenes (<= 10 quads) stay
below QUAD_CLUSTER_MIN and keep the bit-identical linear scan.
"""

import numpy as np
import pytest

from rustraytrace_tpu.config import RenderConfig
from rustraytrace_tpu.ops.pallas_megakernel import (Q_COLS, Q_DP, Q_NX,
                                                    Q_NY, Q_NZ, Q_QX, Q_QZ,
                                                    Q_UX, Q_UZ, Q_VX, Q_VZ,
                                                    Q_WX, Q_WZ,
                                                    QUAD_CLUSTER_MIN,
                                                    cluster_quad_table,
                                                    pack_quad_table)
from rustraytrace_tpu.scene import SceneBuilder

T_MIN, T_MAX = 1e-3, 1e9


def _quad_field(n=64, seed=2):
    """n random unit quads scattered in a 40-cube, plus one camera-facing
    backdrop."""
    rng = np.random.default_rng(seed)
    b = SceneBuilder()
    for k in range(n):
        q = rng.uniform(-20, 20, 3)
        u = rng.normal(size=3)
        u = u / np.linalg.norm(u) * rng.uniform(1.0, 3.0)
        v = np.cross(u, rng.normal(size=3))
        v = v / np.linalg.norm(v) * rng.uniform(1.0, 3.0)
        b.add_quad(tuple(q), tuple(u), tuple(v),
                   b.lambertian((0.5 + 0.5 * (k % 2), 0.4, 0.3)))
    return b.build()


def test_small_scenes_keep_linear_scan():
    b = SceneBuilder()
    b.add_quad((0, 0, -5), (1, 0, 0), (0, 1, 0), b.lambertian((0.5, 0.5, 0.5)))
    scene = b.build()
    qtab0 = pack_quad_table(scene)
    qtab, n_q, n_qc = cluster_quad_table(scene, qtab0)
    assert n_qc == 0 and qtab is qtab0  # untouched below the threshold


def test_cluster_rows_well_formed():
    scene = _quad_field(64)
    qtab0 = pack_quad_table(scene)
    qtab, n_q, n_qc = cluster_quad_table(scene, qtab0)
    assert n_qc > 1
    qt = np.asarray(qtab)
    assert qt.shape == (n_q + n_qc, Q_COLS)
    # starts tile [0, n_rows] contiguously and every real row is covered
    starts = qt[n_q:, 6].astype(int)
    ends = qt[n_q:, 7].astype(int)
    assert starts[0] == 0 and ends[-1] == n_q
    assert (starts[1:] == ends[:-1]).all()
    # member quads' corners lie inside their cluster AABB (live clusters)
    act = np.asarray(scene.quad_mask) > 0
    n_act = int(act.sum())
    for c in range(n_qc):
        lo, hi = qt[n_q + c, 0:3], qt[n_q + c, 3:6]
        for r in range(starts[c], min(ends[c], n_act)):
            q = qt[r, Q_QX:Q_QZ + 1]
            u = qt[r, Q_UX:Q_UZ + 1]
            v = qt[r, Q_VX:Q_VZ + 1]
            for corner in (q, q + u, q + v, q + u + v):
                assert np.all(corner >= lo - 1e-3)
                assert np.all(corner <= hi + 1e-3)


def _quad_hit(o, d, row):
    nq = row[[Q_NX, Q_NY, Q_NZ]]
    denom = float(d @ nq)
    if abs(denom) < 1e-8:
        return np.inf
    t = (row[Q_DP] - float(o @ nq)) / denom
    if not (T_MIN < t < T_MAX):
        return np.inf
    rel = o + t * d - row[Q_QX:Q_QZ + 1]
    w = row[[Q_WX, Q_WX + 1, Q_WZ]]
    u = row[Q_UX:Q_UZ + 1]
    v = row[Q_VX:Q_VZ + 1]
    alpha = float(w @ np.cross(rel, v))
    beta = float(w @ np.cross(u, rel))
    if 0.0 <= alpha <= 1.0 and 0.0 <= beta <= 1.0:
        return t
    return np.inf


def test_quad_cull_closest_hit_equivalence():
    """Per-ray simulation of the kernel's qcull: identical closest quad as
    the brute-force scan, for rays inside and outside the field."""
    scene = _quad_field(96)
    qtab0 = pack_quad_table(scene)
    qtab, n_q, n_qc = cluster_quad_table(scene, qtab0)
    qt = np.asarray(qtab)
    qt0 = np.asarray(qtab0)
    starts = qt[n_q:, 6].astype(int)
    ends = qt[n_q:, 7].astype(int)
    rng = np.random.default_rng(7)
    for k in range(50):
        o = rng.uniform(-30, 30, 3).astype(np.float32)
        d = rng.normal(size=3).astype(np.float32)
        d /= np.linalg.norm(d)
        inv = 1.0 / np.where(np.abs(d) < 1e-20,
                             np.where(d < 0, -1e-20, 1e-20), d)
        # brute force over the ORIGINAL table
        t_brute = min((_quad_hit(o, d, qt0[r]) for r in range(qt0.shape[0])),
                      default=np.inf)
        # culled scan over the clustered table
        bt = np.inf
        for c in range(n_qc):
            ta = (qt[n_q + c, 0:3] - o) * inv
            tb = (qt[n_q + c, 3:6] - o) * inv
            t1 = np.max(np.minimum(ta, tb))
            t2 = np.min(np.maximum(ta, tb))
            if not (t1 <= t2 and t2 > T_MIN and t1 < bt):
                continue
            for r in range(starts[c], ends[c]):
                bt = min(bt, _quad_hit(o, d, qt[r]))
        assert (np.isinf(t_brute) and np.isinf(bt)) or np.isclose(
            t_brute, bt, rtol=1e-5), (k, t_brute, bt)


def test_prepare_threads_qclusters():
    from rustraytrace_tpu.config import derive_camera
    from rustraytrace_tpu.ops.pallas_megakernel import prepare_megakernel

    scene = _quad_field(64)
    cfg = RenderConfig(aspect_ratio=1.0, image_width=32,
                       samples_per_pixel=2, max_depth=4, vfov=60.0,
                       lookfrom=(0, 0, 60), lookat=(0, 0, 0),
                       focus_dist=10.0)
    cam = derive_camera(cfg)
    arrays, statics = prepare_megakernel(
        scene, cam, width=32, height=32, spp=1, max_depth=4, interpret=True)
    assert statics["n_qclusters"] > 1
    assert arrays["qtab"].shape[0] == statics["n_quads"] + statics["n_qclusters"]
