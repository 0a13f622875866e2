"""Between-launch ray sorting for the persist kernel (round 4): CPU-side
pins of the driver-side permutation logic.

The permutation itself is pure XLA (argsort over an int32 key), so its
invariants test on CPU; the end-to-end estimator agreement (sorted vs
unsorted radiance mean on a real scene) lives in tests/test_round4_tpu.py
because the persist kernel's on-core PRNG has no CPU lowering.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from rustraytrace_tpu.ops.pallas_wavefront import (_morton8,
                                                   _persist_sort_perm,
                                                   ray_sort_heuristic)

ROWS, LANES = 8, 128
R = ROWS * LANES


def _state(mid, done, slot, pos, d):
    st = jnp.zeros((21, ROWS, LANES), jnp.float32)
    st = st.at[19].set(jnp.asarray(mid.reshape(ROWS, LANES)))
    st = st.at[15].set(jnp.asarray(done.reshape(ROWS, LANES)))
    st = st.at[20].set(jnp.asarray(slot.reshape(ROWS, LANES)))
    for k in range(3):
        st = st.at[1 + k].set(jnp.asarray(pos[k].reshape(ROWS, LANES)))
        st = st.at[4 + k].set(jnp.asarray(d[k].reshape(ROWS, LANES)))
    return st


def _random_state(seed=0, n_finished=128, n_idle=128, spp=8):
    rng = np.random.default_rng(seed)
    slot = rng.permutation(R).astype(np.float32)
    mid = np.ones(R, np.float32)
    mid[: n_finished + n_idle] = 0.0
    done = np.zeros(R, np.float32)
    done[:n_finished] = float(spp)
    pos = rng.uniform(-40, 40, (3, R)).astype(np.float32)
    d = rng.normal(size=(3, R)).astype(np.float32)
    return _state(mid, done, slot, pos, d), slot


def test_sort_perm_is_permutation_with_finished_last():
    st, slot = _random_state()
    perm = np.asarray(_persist_sort_perm(st, 8, R))
    assert sorted(perm.tolist()) == list(range(R))
    # finished lanes (first 128 lane indices) pool at the END so their
    # tiles' persist while_loop exits immediately (dead-lane compaction)
    assert set(perm[-128:].tolist()) == set(range(128))
    # idle-with-samples-left lanes come just before, ordered by SLOT so
    # respawned camera rays stay pixel-coherent
    idle = perm[-256:-128]
    assert set(idle.tolist()) == set(range(128, 256))
    assert (np.diff(slot[idle]) > 0).all()


def test_sort_perm_groups_spatially():
    """Two well-separated position clusters with mixed lane order end up
    contiguous: every lane of cluster A sorts before every lane of
    cluster B (A sits at the Morton origin corner)."""
    rng = np.random.default_rng(3)
    mid = np.ones(R, np.float32)
    done = np.zeros(R, np.float32)
    slot = np.arange(R, dtype=np.float32)
    in_b = rng.permutation(R) < R // 2
    pos = np.where(in_b, rng.uniform(100.0, 101.0, (3, R)),
                   rng.uniform(0.0, 1.0, (3, R))).astype(np.float32)
    d = np.ones((3, R), np.float32)  # one octant: key is position-only
    st = _state(mid, done, slot, pos, d)
    perm = np.asarray(_persist_sort_perm(st, 8, R))
    first_half = perm[: R // 2]
    assert not in_b[first_half].any()


def test_sort_perm_deterministic():
    st, _ = _random_state(seed=7)
    p1 = np.asarray(_persist_sort_perm(st, 8, R))
    p2 = np.asarray(_persist_sort_perm(st, 8, R))
    np.testing.assert_array_equal(p1, p2)


def test_morton8_spread_bits():
    # each input bit b lands at output bit 3b
    for b in range(8):
        assert int(_morton8(jnp.int32(1 << b))) == 1 << (3 * b)


def test_ray_sort_heuristic_env_override(monkeypatch):
    from rustraytrace_tpu import models
    from rustraytrace_tpu.ops.pallas_wavefront import (RAY_SORT_MAX_LANES,
                                                       slot_lane_count)

    scene, _, _ = models.book2_earth()
    monkeypatch.setenv("RTT_SORT_RAYS", "1")
    assert ray_sort_heuristic(scene)
    monkeypatch.setenv("RTT_SORT_RAYS", "0")
    assert not ray_sort_heuristic(scene)
    monkeypatch.delenv("RTT_SORT_RAYS")
    # earth: ~2 primitives — nothing for re-coherent tiles to cull
    assert not ray_sort_heuristic(scene)
    scene_f, _, _ = models.book2_final_scene()
    assert ray_sort_heuristic(scene_f)
    # huge framebuffers opt out: the per-launch permute gather is linear in
    # lanes (~0.3 s at 8.4M) while per-pass work shrinks (BASELINE config 5
    # regressed 58 -> 21 Mpaths/s before the cap)
    assert slot_lane_count(1200, 675) < RAY_SORT_MAX_LANES
    assert ray_sort_heuristic(scene_f, slot_lane_count(1200, 675))
    assert slot_lane_count(3840, 2160) > RAY_SORT_MAX_LANES
    assert not ray_sort_heuristic(scene_f, slot_lane_count(3840, 2160))


def test_segmented_argsort_matches_global_per_segment():
    """Round 5: the segmented sort (linear in R) is exactly the global
    stable argsort applied independently per segment, lanes confined to
    their segment, and the slot restore is its own inverse."""
    import rustraytrace_tpu.ops.pallas_wavefront as wf

    rng = np.random.default_rng(11)
    R_big = 4096
    key = jnp.asarray(rng.integers(0, 1 << 27, R_big), jnp.int32)
    old = wf.SORT_SEG_LANES
    try:
        wf.SORT_SEG_LANES = 1024
        perm = np.asarray(wf._segmented_argsort(key, R_big))
    finally:
        wf.SORT_SEG_LANES = old
    assert sorted(perm.tolist()) == list(range(R_big))
    keys = np.asarray(key)
    for s in range(4):
        lo, hi = s * 1024, (s + 1) * 1024
        seg_perm = perm[lo:hi]
        # confinement: lanes never leave their segment
        assert ((seg_perm >= lo) & (seg_perm < hi)).all()
        # equality with the global stable argsort of just that segment
        ref = np.argsort(keys[lo:hi], kind="stable") + lo
        np.testing.assert_array_equal(seg_perm, ref)
    # restore: permuted slots are a bijection; segmented argsort of them
    # is the exact inverse permutation
    slots = np.arange(R_big)[perm]
    wf.SORT_SEG_LANES = 1024
    try:
        inv = np.asarray(wf._segmented_argsort(
            jnp.asarray(slots, jnp.int32), R_big))
    finally:
        wf.SORT_SEG_LANES = old
    np.testing.assert_array_equal(np.arange(R_big)[perm][inv],
                                  np.arange(R_big))


def test_sort_seg_divisor():
    import rustraytrace_tpu.ops.pallas_wavefront as wf

    R = 6688 * 128  # flagship 1200x675
    # default is GLOBAL (SORT_SEG_LANES = 0: the round-5 decomposition
    # found the permute gather, not the argsort, is the cost — and
    # segment confinement costs coherence)
    assert wf.SORT_SEG_LANES == 0
    assert wf._sort_seg(R) == R
    # with an explicit target: largest divisor <= target, row-aligned
    old = wf.SORT_SEG_LANES
    try:
        wf.SORT_SEG_LANES = 1 << 17
        seg = wf._sort_seg(R)
        assert R % seg == 0 and seg <= 1 << 17 and seg % 128 == 0
        assert wf._sort_seg(1024) == 1024
    finally:
        wf.SORT_SEG_LANES = old
