#!/usr/bin/env python
"""Standalone spike for the MXU dense sphere-intersect formulation
(ROADMAP candidate 6 / VERDICT r4 #3): validates that Mosaic accepts the
constructs (lhs-transposed dot_general with K=4, axis-0 min/argmin over
[NS,128], lane-sliced sphere blocks) and measures the raw pair-loop rate
vs the scalar broadcast loop OUTSIDE the full kernel.

Run on TPU:  PYTHONPATH=... python scripts/spike_dense_mxu.py [NS] [iters]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T = 32          # tile rows
L = 128         # lanes
T_MIN = 1e-3
T_MAX = 1e30
BIG = 3e38
BLOCK = 512


def make_dense(ns, iters):
    nb = ns // BLOCK

    def kernel(dtab_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
               bt_ref, bi_ref):
        ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
        dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
        a = dx * dx + dy * dy + dz * dz
        inv_a = 1.0 / a
        iota_r = jax.lax.broadcasted_iota(jnp.int32, (T, L), 0)

        def loop(it, carry):
            bt, bi = carry

            def row_body(r, c2):
                bt, bi = c2
                rm = (iota_r == r).astype(jnp.float32)

                def grow(arr):
                    return jnp.sum(arr * rm, axis=0, keepdims=True)

                oxr, oyr, ozr = grow(ox), grow(oy), grow(oz)
                dxr, dyr, dzr = grow(dx), grow(dy), grow(dz)
                ar, invar = grow(a), grow(inv_a)
                do = dxr * oxr + dyr * oyr + dzr * ozr
                o2 = oxr * oxr + oyr * oyr + ozr * ozr
                D = jnp.concatenate(
                    [dxr, dyr, dzr, jnp.zeros_like(dxr)], axis=0)  # [4,L]
                O = jnp.concatenate(
                    [oxr, oyr, ozr, -jnp.ones_like(oxr)], axis=0)

                btr = grow(bt)
                bir = jnp.sum(jnp.where(iota_r == r, bi, 0), axis=0,
                              keepdims=True)

                def blk(b, c3):
                    btr, bir = c3
                    ct = dtab_ref[0:4, pl.ds(b * BLOCK, BLOCK)]  # [4,BLOCK]
                    import os
                    hi = (jax.lax.Precision.DEFAULT if os.environ.get('SPIKE_BF16') else jax.lax.Precision.HIGHEST)
                    dC = jax.lax.dot_general(
                        ct, D, (((0,), (0,)), ((), ())),
                        precision=hi,
                        preferred_element_type=jnp.float32)  # [BLOCK,L]
                    m = jax.lax.dot_general(
                        ct, O, (((0,), (0,)), ((), ())),
                        precision=hi,
                        preferred_element_type=jnp.float32)
                    h = dC - do
                    c0 = o2 - 2.0 * m
                    disc = h * h - ar * c0
                    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
                    tn = (h - sq) * invar
                    tf = (h + sq) * invar
                    root = jnp.where((tn > T_MIN) & (tn < T_MAX), tn, tf)
                    take = (disc > 0.0) & (root > T_MIN) & (root < T_MAX)
                    key = jnp.where(take, root, BIG)
                    best = jnp.min(key, axis=0, keepdims=True)
                    sidx = jax.lax.broadcasted_iota(
                        jnp.int32, (BLOCK, L), 0) + b * BLOCK
                    bidx = jnp.min(
                        jnp.where(key == best, sidx, jnp.int32(1 << 30)),
                        axis=0, keepdims=True)
                    imp = best < btr
                    return (jnp.where(imp, best, btr),
                            jnp.where(imp, bidx, bir))

                btr, bir = jax.lax.fori_loop(0, nb, blk, (btr, bir))
                bt = jnp.where(iota_r == r, btr, bt)
                bi = jnp.where(iota_r == r, bir, bi)
                return bt, bi

            return jax.lax.fori_loop(0, T, row_body, (bt, bi))

        init = (jnp.full((T, L), BIG, jnp.float32),
                jnp.full((T, L), -1, jnp.int32))
        bt, bi = jax.lax.fori_loop(0, iters, loop, init)
        bt_ref[:] = bt
        bi_ref[:] = bi

    return kernel


def make_scalar(ns, iters, unroll=4):
    def kernel(tab_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
               bt_ref, bi_ref):
        ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
        dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
        a = dx * dx + dy * dy + dz * dz
        inv_a = 1.0 / a

        def loop(it, carry):
            def body(k, c2):
                bt, bi = c2
                for jj in range(unroll):
                    s = k * unroll + jj
                    cx = tab_ref[0, s]
                    cy = tab_ref[1, s]
                    cz = tab_ref[2, s]
                    r2 = tab_ref[3, s]
                    ocx = cx - ox
                    ocy = cy - oy
                    ocz = cz - oz
                    h = dx * ocx + dy * ocy + dz * ocz
                    c = ocx * ocx + ocy * ocy + ocz * ocz - r2
                    disc = h * h - a * c
                    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
                    tn = (h - sq) * inv_a
                    tf = (h + sq) * inv_a
                    root = jnp.where((tn > T_MIN) & (tn < T_MAX), tn, tf)
                    take = ((disc > 0.0) & (root > T_MIN) & (root < T_MAX)
                            & (root < bt))
                    bt = jnp.where(take, root, bt)
                    bi = jnp.where(take, s, bi)
                return bt, bi

            return jax.lax.fori_loop(0, ns // unroll, body, carry)

        init = (jnp.full((T, L), BIG, jnp.float32),
                jnp.full((T, L), -1, jnp.int32))
        bt, bi = jax.lax.fori_loop(0, iters, loop, init)
        bt_ref[:] = bt
        bi_ref[:] = bi

    return kernel


def main():
    ns = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 200

    rng = np.random.default_rng(0)
    cen = rng.uniform(-50, 50, (ns, 3)).astype(np.float32)
    rad = rng.uniform(1, 10, ns).astype(np.float32)
    r2 = rad * rad
    # dense table [8, ns]: cx, cy, cz, 0.5*(C2 - r2)
    c2 = (cen * cen).sum(1)
    dtab = np.zeros((8, ns), np.float32)
    dtab[0:3] = cen.T
    dtab[3] = 0.5 * (c2 - r2)
    # scalar SMEM table [4, ns]
    stab = np.zeros((4, ns), np.float32)
    stab[0:3] = cen.T
    stab[3] = r2

    o = rng.uniform(-100, 100, (3, T, L)).astype(np.float32)
    d = rng.normal(size=(3, T, L)).astype(np.float32)

    outs = (jax.ShapeDtypeStruct((T, L), jnp.float32),
            jax.ShapeDtypeStruct((T, L), jnp.int32))
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)

    dense = pl.pallas_call(
        make_dense(ns, iters), out_shape=outs,
        in_specs=[vmem] * 7, out_specs=(vmem, vmem))
    scal = pl.pallas_call(
        make_scalar(ns, iters), out_shape=outs,
        in_specs=[smem] + [vmem] * 6, out_specs=(vmem, vmem))

    args = (o[0], o[1], o[2], d[0], d[1], d[2])
    bt_d, bi_d = dense(jnp.asarray(dtab), *map(jnp.asarray, args))
    bt_d, bi_d = np.asarray(bt_d), np.asarray(bi_d)
    bt_s, bi_s = scal(jnp.asarray(stab), *map(jnp.asarray, args))
    bt_s, bi_s = np.asarray(bt_s), np.asarray(bi_s)

    hit_d = bi_d >= 0
    hit_s = bi_s >= 0
    agree = (hit_d == hit_s).mean()
    idx_agree = (bi_d[hit_s & hit_d] == bi_s[hit_s & hit_d]).mean()
    dt_rel = np.abs(bt_d - bt_s)[hit_s & hit_d]
    print(f"hit-mask agreement {agree:.6f}, winner-idx agreement "
          f"{idx_agree:.6f}, |t| max delta {dt_rel.max():.3e}")

    def bench(f, label, *a):
        np.asarray(f(*a)[0])
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(f(*a)[0])
            best = min(best, time.perf_counter() - t0)
        pairs = T * L * ns * iters
        print(f"{label}: {best*1e3:.1f} ms = {pairs/best/1e9:.1f} Gpairs/s",
              flush=True)
        return best

    b_s = bench(scal, f"scalar unroll=4 ns={ns}", jnp.asarray(stab),
                *map(jnp.asarray, args))
    b_d = bench(dense, f"dense MXU      ns={ns}", jnp.asarray(dtab),
                *map(jnp.asarray, args))
    print(f"dense/scalar speedup: {b_s/b_d:.2f}x")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
