"""Native C++ runtime components vs their NumPy reference implementations."""

import numpy as np
import pytest

from rustraytrace_tpu import native
from rustraytrace_tpu.ops.bvh import build_bvh_numpy, cluster_spheres_numpy
from rustraytrace_tpu.utils.image_io import ppm_p3_bytes


def _random_spheres(n=200, seed=3):
    rng = np.random.default_rng(seed)
    centers = rng.uniform(-10, 10, (n, 3)).astype(np.float32)
    radii = rng.uniform(0.1, 1.0, n).astype(np.float32)
    # one huge ground sphere like book 1
    centers[0] = (0, -1000, 0)
    radii[0] = 1000.0
    return centers, radii


def _check_clusters(centers, radii, order, start, cmin, cmax, max_leaf):
    n = centers.shape[0]
    # permutation covers every sphere once
    assert sorted(order.tolist()) == list(range(n))
    assert start[0] == 0 and start[-1] == n
    sizes = np.diff(start)
    assert np.all(sizes >= 1) and np.all(sizes <= max_leaf)
    # each cluster AABB contains its spheres
    for c in range(len(start) - 1):
        ids = order[start[c]:start[c + 1]]
        lo = (centers[ids] - radii[ids, None]).min(axis=0)
        hi = (centers[ids] + radii[ids, None]).max(axis=0)
        assert np.all(cmin[c] <= lo + 1e-4), c
        assert np.all(cmax[c] >= hi - 1e-4), c


@pytest.mark.parametrize("max_leaf", [4, 16])
def test_numpy_clusters_valid(max_leaf):
    centers, radii = _random_spheres()
    order, start, cmin, cmax = cluster_spheres_numpy(centers, radii, max_leaf)
    _check_clusters(centers, radii, order, start, cmin, cmax, max_leaf)


@pytest.mark.skipif(not native.available(), reason="native lib not built")
@pytest.mark.parametrize("max_leaf", [4, 16])
def test_cpp_clusters_valid(max_leaf):
    centers, radii = _random_spheres(seed=7)
    order, start, cmin, cmax = native.build_sphere_clusters(
        centers, radii, max_leaf)
    _check_clusters(centers, radii, order, start, cmin, cmax, max_leaf)


@pytest.mark.skipif(not native.available(), reason="native lib not built")
def test_cpp_vs_numpy_sah_quality():
    """Both builders implement the same SAH; total cluster surface area
    should agree within 20% (partition stability differs)."""
    centers, radii = _random_spheres(n=400, seed=11)

    def total_area(cmin, cmax):
        d = np.maximum(cmax - cmin, 0)
        return float(np.sum(2 * (d[:, 0] * d[:, 1] + d[:, 1] * d[:, 2]
                                 + d[:, 2] * d[:, 0])))

    _, _, mn_c, mx_c = native.build_sphere_clusters(centers, radii, 8)
    _, _, mn_n, mx_n = cluster_spheres_numpy(centers, radii, 8)
    a_c, a_n = total_area(mn_c, mx_c), total_area(mn_n, mx_n)
    assert a_c == pytest.approx(a_n, rel=0.2)


def test_bvh_numpy_tree_valid():
    centers, radii = _random_spheres(n=50)
    bmin, bmax, left, right, leaf, order = build_bvh_numpy(centers, radii, 2)
    # root box contains everything
    lo = (centers - radii[:, None]).min(axis=0)
    hi = (centers + radii[:, None]).max(axis=0)
    np.testing.assert_allclose(bmin[0], lo, atol=1e-4)
    np.testing.assert_allclose(bmax[0], hi, atol=1e-4)
    # every internal node's box contains its children's boxes
    for i in range(len(left)):
        if leaf[i] < 0:
            for ch in (left[i], right[i]):
                assert np.all(bmin[i] <= bmin[ch] + 1e-5)
                assert np.all(bmax[i] >= bmax[ch] - 1e-5)


@pytest.mark.skipif(not native.available(), reason="native lib not built")
def test_ppm_cpp_matches_python():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (17, 23, 3), dtype=np.uint8)
    assert native.ppm_p3_from_u8(img).split() == ppm_p3_bytes(img).split()


@pytest.mark.skipif(not native.available(), reason="native lib not built")
def test_finalize_ppm_cpp_matches_python():
    from rustraytrace_tpu.render import finalize_image

    rng = np.random.default_rng(1)
    accum = (rng.uniform(0, 4, (9, 11, 3)).astype(np.float32))
    accum[0, 0, 0] = np.inf  # non-finite guard (render_io.rs:16-18)
    accum[0, 1, 1] = np.nan
    spp = 4
    cpp = native.finalize_ppm_p3(accum, spp)
    py = ppm_p3_bytes(finalize_image(accum, spp))
    assert cpp.split() == py.split()


@pytest.mark.skipif(not native.available(), reason="native lib not built")
def test_cluster_aabbs_cpp_matches_numpy():
    """AABB treelet cut: C++ and NumPy implement the same algorithm, so the
    clustering (order, starts, bounds) must agree exactly."""
    from rustraytrace_tpu.ops.bvh import cluster_aabbs_numpy

    rng = np.random.default_rng(9)
    lo = rng.uniform(-50, 50, (200, 3)).astype(np.float32)
    hi = lo + rng.uniform(0.5, 20, (200, 3)).astype(np.float32)
    o_c, s_c, mn_c, mx_c = native.build_aabb_clusters(lo, hi, max_leaf=16)
    o_n, s_n, mn_n, mx_n = cluster_aabbs_numpy(lo, hi, max_leaf=16)
    # std::partition/nth_element are unstable, so orders can differ within a
    # cluster; the cut structure and SAH quality must agree closely
    np.testing.assert_array_equal(s_c, s_n)

    def area_sum(mn, mx):
        d = np.maximum(mx - mn, 0.0)
        return float((2 * (d[:, 0] * d[:, 1] + d[:, 1] * d[:, 2]
                           + d[:, 2] * d[:, 0])).sum())

    assert abs(area_sum(mn_c, mx_c) - area_sum(mn_n, mx_n)) <= (
        0.05 * area_sum(mn_n, mx_n))
    # coverage: every primitive appears once; cluster bounds contain prims
    assert sorted(o_c.tolist()) == list(range(200))
    for c in range(len(s_c) - 1):
        ids = o_c[s_c[c]:s_c[c + 1]]
        assert np.all(lo[ids] >= mn_c[c] - 1e-4)
        assert np.all(hi[ids] <= mx_c[c] + 1e-4)
