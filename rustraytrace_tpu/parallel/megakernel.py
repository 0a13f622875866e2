"""spp-sharded Pallas megakernel rendering over the device mesh.

The single-chip megakernel (ops/pallas_megakernel.py) traces the whole image
in one kernel launch; it scales across chips on the SAMPLE axis — the same
axis the reference's GPU pass loop batches sequentially (64 spp/pass,
``src/gpu/mod.rs:444-481``): every device runs the identical kernel over the
identical (replicated, KB-sized) scene tables with a device-distinct
``sample_offset``, and the per-device radiance sums are reduced with ``psum``
over ICI.  Because the kernel's PRNG is seeded per (pass key ⊕ sample_offset,
tile), device streams are disjoint by construction — the multi-chip render is
a plain variance-reducing average of independent passes.

Host-side table packing (SAH clustering, attribute slabs) happens ONCE via
``prepare_megakernel``; only the (key, offset) execution is shard_mapped.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..config import RenderConfig, derive_camera
from ..render import finalize_image
from ..scene import Scene


def megakernel_shard_eligible(scene: Scene, integrator: str,
                              mesh: Mesh) -> bool:
    """True when the sharded render can route through the megakernel: all
    mesh devices are TPUs (the Mosaic PRNG has no CPU lowering) and the
    scene/integrator pair is kernel-eligible."""
    from ..ops.pallas_megakernel import (megakernel_eligible,
                                         megakernel_mis_eligible)

    devs = mesh.devices.reshape(-1)
    if not all(d.platform == "tpu" for d in devs):
        return False
    if integrator == "path":
        return megakernel_eligible(scene)
    if integrator == "mis":
        return megakernel_mis_eligible(scene)
    return False


def sharded_megakernel_wiring(pass_fn, arrays, key, offsets, mesh: Mesh):
    """The shard_map plumbing, separated from the kernel so its structure is
    testable on the virtual CPU mesh (and by ``dryrun_multichip``) with a
    substitute ``pass_fn``.

    pass_fn(arrays, key, offset_scalar) -> [H, W, 3] per-device radiance sum.
    ``arrays`` is replicated, ``offsets`` [n_devices] is split one-per-device
    over the flattened ('px', 'spp') mesh, and the outputs are psum'd back to
    every device.

    NOTE: a fresh ``pass_fn`` closure defeats JAX's compilation cache —
    every call recompiles (~27 s for the megakernel, measured via
    scaling_bench round 3).  The production pass loops therefore go through
    :func:`_cached_sharded_fn`, which keys the shard_map-wrapped callable on
    the hashable statics; this raw entry stays for one-shot structure
    validation (dryrun_multichip, wiring-only scaling runs)."""
    return _make_wiring(pass_fn, mesh)(arrays, key, offsets)


def _make_wiring(pass_fn, mesh: Mesh, jit: bool = False):
    def body(arrays, key, off):
        img = pass_fn(arrays, key, off[0])
        return jax.lax.psum(img, ("px", "spp"))

    wired = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(), P(("px", "spp"))),
        out_specs=P(),
        check_vma=False,
    )
    # an EAGER shard_map call re-traces and re-lowers every time (measured
    # ~27 s/pass via scaling_bench); jit wraps it in the executable cache,
    # keyed on this wrapper's identity — which _cached_sharded_fn pins
    return jax.jit(wired) if jit else wired


_SHARD_FN_CACHE: dict = {}


def _cached_sharded_fn(cache_key, build):
    """Memoize shard_map-wrapped pass callables: a stable function identity
    is what lets JAX reuse the compiled executable across the passes of a
    render (and across bench repeats)."""
    fn = _SHARD_FN_CACHE.get(cache_key)
    if fn is None:
        fn = build()
        if len(_SHARD_FN_CACHE) > 16:
            _SHARD_FN_CACHE.clear()
        _SHARD_FN_CACHE[cache_key] = fn
    return fn


def render_pass_megakernel_sharded(scene: Scene, cfg_cam, key, *, width: int,
                                   height: int, spp: int, max_depth: int,
                                   mesh: Mesh, mis: bool = False,
                                   stratified: bool = False,
                                   sqrt_spp: int = 0,
                                   sample_offset: int = 0,
                                   respawn: bool = False,
                                   tile_rows: int | None = None) -> jnp.ndarray:
    """Trace >= ``spp`` samples/pixel across every device of the mesh.

    Each device traces ``ceil(spp / n_devices)`` samples at a distinct
    ``sample_offset``; returns the psum'd radiance SUM [H, W, 3] (replicated).
    Actual samples traced = ``spp_traced_mesh(spp, mesh)``.
    """
    from ..ops.pallas_megakernel import (TILE_ROWS,
                                         megakernel_pass_from_prepared,
                                         prepare_megakernel_cached,
                                         respawn_tile_rows)

    if tile_rows is None:
        tile_rows = respawn_tile_rows(scene, mis=mis) if respawn else TILE_ROWS
    n = int(mesh.devices.size)
    spp_local = -(-spp // n)
    arrays, statics = prepare_megakernel_cached(
        scene, cfg_cam, width=width, height=height, spp=spp_local,
        max_depth=max_depth, mis=mis, stratified=stratified,
        sqrt_spp=sqrt_spp, respawn=respawn, tile_rows=tile_rows)
    offsets = (sample_offset
               + jnp.arange(n, dtype=jnp.int32) * spp_local)

    statics_t = tuple(sorted(statics.items()))

    def build():
        st = dict(statics_t)

        def pass_fn(arrays, key, off):
            return megakernel_pass_from_prepared(arrays, st, key, off)

        return _make_wiring(pass_fn, mesh, jit=True)

    fn = _cached_sharded_fn(("mk", statics_t, mesh), build)
    return fn(arrays, key, offsets)


def spp_traced_mesh(spp: int, mesh: Mesh) -> int:
    n = int(mesh.devices.size)
    return -(-spp // n) * n


def render_image_sharded_megakernel(scene: Scene, cfg: RenderConfig, *,
                                    mesh: Mesh, integrator: str = "path",
                                    progress=None,
                                    accum_state: Optional[dict] = None,
                                    on_pass=None,
                                    backend: str = "megakernel"):
    """Full sharded Pallas render: host pass loop + psum'd accumulation.

    Same contract as ``parallel.render.render_image_sharded`` (which routes
    here for eligible scenes on TPU meshes).  ``backend`` picks the per-pass
    kernel: "megakernel" (monolithic) or "wavefront" (segmented, image
    textures).
    """
    import numpy as np

    cam = derive_camera(cfg)
    h, w = cfg.image_height, cfg.image_width

    stratified = cfg.stratified
    sqrt_spp = int(np.sqrt(cfg.samples_per_pixel)) if stratified else 0
    spp_total = sqrt_spp * sqrt_spp if stratified else cfg.samples_per_pixel

    if accum_state is None:
        accum = jnp.zeros((h, w, 3), jnp.float32)
        done = 0
    else:
        accum = jnp.asarray(accum_state["accum"])
        done = int(accum_state["spp_done"])

    key = jax.random.key(cfg.seed)
    n = int(mesh.devices.size)
    from ..render import effective_spp_per_pass

    # fold samples into fewer launches for small images (same per-launch
    # ray budget as the single-chip loop; dispatch cost is per DEVICE pass)
    per_pass = -(-effective_spp_per_pass(cfg, backend, spp_total, h * w)
                 // n) * n

    # primitive-heavy non-image MIS scenes take the ray-sorted persist
    # dispatcher even under the 'megakernel' backend label — the same
    # rerouting as the single-chip render_pass (render.py), so multi-chip
    # runs the same kernel per device as 1-chip for the same scene
    from ..ops.pallas_wavefront import sorted_persist_route

    use_wf = backend == "wavefront" or sorted_persist_route(scene, w, h)

    while done < spp_total:
        this = min(per_pass, spp_traced_mesh(spp_total - done, mesh))
        if use_wf:
            acc_pass = render_pass_wavefront_sharded(
                scene, cam, key, width=w, height=h, spp=this,
                max_depth=cfg.max_depth, mesh=mesh,
                stratified=stratified, sqrt_spp=sqrt_spp,
                mis=integrator == "mis", sample_offset=done)
        else:
            acc_pass = render_pass_megakernel_sharded(
                scene, cam, key, width=w, height=h, spp=this,
                max_depth=cfg.max_depth, mesh=mesh, mis=integrator == "mis",
                stratified=stratified, sqrt_spp=sqrt_spp, sample_offset=done,
                respawn=True)
        accum = accum + acc_pass
        # Fence BEFORE counting the pass: device errors surface
        # asynchronously (at materialization, not dispatch), so without this
        # every captured resume state would hold a poisoned lazy array and
        # the render_image_sharded fallback would re-raise inside its
        # fallback=False recursion instead of degrading (ADVICE r4).  One
        # scalar device->host copy per multi-second pass is noise.
        np.asarray(accum[0, 0, 0])
        done += spp_traced_mesh(this, mesh)
        if progress is not None:
            progress(done, spp_total)
        if on_pass is not None:
            on_pass({"accum": accum, "spp_done": done})

    accum_np = np.asarray(accum)
    return finalize_image(accum_np, done), {"accum": accum_np,
                                            "spp_done": done}


def wavefront_shard_eligible(scene: Scene, integrator: str,
                             mesh: Mesh) -> bool:
    """Sharded-wavefront routing: TPU-only mesh + wavefront-eligible scene
    (image textures on sphere materials — book2_earth / book2_final)."""
    from ..ops.pallas_wavefront import wavefront_eligible

    devs = mesh.devices.reshape(-1)
    if not all(d.platform == "tpu" for d in devs):
        return False
    return wavefront_eligible(scene, integrator)


def render_pass_wavefront_sharded(scene: Scene, cfg_cam, key, *, width: int,
                                  height: int, spp: int, max_depth: int,
                                  mesh: Mesh, stratified: bool = False,
                                  sqrt_spp: int = 0, mis: bool = False,
                                  sample_offset: int = 0) -> jnp.ndarray:
    """spp-sharded WAVEFRONT pass (image-textured scenes): host table prep
    once, per-device segmented bounce loops at device-distinct sample
    offsets, psum'd radiance sum [H, W, 3] (replicated).

    Each device folds its distinct sample offset into the pass key
    (exactly as the single-chip pass loop folds its per-pass offset), so
    device streams are disjoint and the psum is a true variance-reducing
    average of independent sample sets.  Unlike the pixel-sharded XLA
    path, the render is equal to a single-chip render in DISTRIBUTION,
    not bit-identical (segment streams are keyed per (offset, segment),
    not per absolute sample).

    Non-image scenes take the PERSISTENT RESPAWN megakernel per device
    (pallas_megakernel respawn=True — same dispatch wiring, no segment
    loop); image scenes run the segmented loop with per-device XLA texel
    resolve.
    """
    from ..ops.pallas_megakernel import (_unswizzle_index,
                                         prepare_megakernel_cached,
                                         respawn_tile_rows)
    from ..ops.pallas_wavefront import (DMA_TEXELS_SPARSE, DMA_THRESH,
                                        PERSIST_DENSE_ITERS,
                                        PERSIST_SORT_ITERS,
                                        PERSIST_SPARSE_ITERS,
                                        _wavefront_pass_persist,
                                        persist_adaptive_bounds,
                                        persist_plain_iters,
                                        persist_sort_every,
                                        persist_statics_tuple,
                                        ray_sort_heuristic,
                                        slot_lane_count,
                                        texel_gate_heuristic,
                                        wavefront_tile_rows)

    has_image = "image" in scene.features
    sort_rays = ray_sort_heuristic(scene, slot_lane_count(width, height))
    if not has_image and not sort_rays:
        return render_pass_megakernel_sharded(
            scene, cfg_cam, key, width=width, height=height, spp=spp,
            max_depth=max_depth, mesh=mesh, mis=mis,
            stratified=stratified, sqrt_spp=sqrt_spp,
            sample_offset=sample_offset, respawn=True)

    gate_texels = has_image and texel_gate_heuristic(scene)
    n = int(mesh.devices.size)
    spp_local = -(-spp // n)
    tile_rows = (wavefront_tile_rows(scene) if has_image
                 else respawn_tile_rows(scene, mis=mis))
    arrays, statics = prepare_megakernel_cached(
        scene, cfg_cam, width=width, height=height, spp=spp_local,
        max_depth=max_depth, tile_rows=tile_rows, interpret=False,
        segment=True, mis=mis, stratified=stratified, sqrt_spp=sqrt_spp)
    p_statics = persist_statics_tuple(statics)
    key = jax.random.fold_in(key, 0x5EED)  # match render_pass_wavefront
    offsets = sample_offset + jnp.arange(n, dtype=jnp.int32) * spp_local
    rows = statics["rows"]
    persist_iters = (persist_plain_iters(spp_local) if not has_image
                     else PERSIST_SORT_ITERS if sort_rays
                     else PERSIST_SPARSE_ITERS if gate_texels
                     else PERSIST_DENSE_ITERS)

    def build():
        unswz = _unswizzle_index(width, height)

        def pass_fn(args, key, off):
            scene_, arrays_ = args
            acc = _wavefront_pass_persist(
                scene_, arrays_, key, off,
                spp=spp_local, max_depth=max_depth, rows=rows,
                tile_rows=tile_rows, statics=p_statics,
                gate_texels=gate_texels, persist_iters=persist_iters,
                dma_texels=gate_texels and DMA_TEXELS_SPARSE,
                dma_thresh=DMA_THRESH, sort_rays=sort_rays,
                sort_every=persist_sort_every(persist_iters),
                adaptive_bounds=(persist_adaptive_bounds(persist_iters)
                                 if sort_rays else ()))
            return acc[unswz].reshape(height, width, 3)

        return _make_wiring(pass_fn, mesh, jit=True)

    fn = _cached_sharded_fn(
        ("wf", p_statics, mesh, spp_local, max_depth, rows, tile_rows,
         gate_texels, persist_iters, sort_rays, width, height), build)
    return fn((scene, arrays), key, offsets)
