"""Pass-boundary checkpoint/resume of the accumulation state.

The reference's framebuffer is a running (RGB sum, sample count) pair
finalized only at write-out (src/gpu/renderer.wgsl:295-297,
src/render_io.rs:8-12), which makes every pass boundary
(src/gpu/mod.rs:449, src/cuda/mod.rs:403) a resumable state — the reference
just never persists it.  Here it is persisted: an .npz with the accumulated
radiance sum, samples done, the RNG seed, and a scene/config fingerprint so a
resume against different settings is refused instead of silently blending
incompatible renders.
"""

from __future__ import annotations

import hashlib
import json
from typing import Optional

import numpy as np


def _fingerprint(cfg, scene) -> str:
    import jax

    h = hashlib.sha256()
    h.update(json.dumps(
        {k: str(v) for k, v in sorted(vars(cfg).items())}
    ).encode())
    for leaf in jax.tree.leaves(scene):
        a = np.asarray(leaf)
        h.update(str(a.shape).encode())
        # hash the WHOLE buffer: scenes differing only past the first rows
        # (e.g. later spheres of a ~500-sphere field, or diff.fit-updated
        # params) must not fingerprint identically — resume would silently
        # blend incompatible renders. Scene arrays are KBs; cost negligible.
        h.update(a.tobytes())
    return h.hexdigest()[:16]


def save_checkpoint(path: str, accum_state: dict, cfg, scene) -> None:
    np.savez_compressed(
        path,
        accum=np.asarray(accum_state["accum"], np.float32),
        spp_done=np.asarray(accum_state["spp_done"], np.int64),
        seed=np.asarray(cfg.seed, np.int64),
        fingerprint=np.asarray(_fingerprint(cfg, scene)),
    )


def load_checkpoint(path: str, cfg, scene) -> Optional[dict]:
    """Load and validate; raises ValueError on a fingerprint mismatch."""
    with np.load(path, allow_pickle=False) as z:
        fp = str(z["fingerprint"])
        if fp != _fingerprint(cfg, scene):
            raise ValueError(
                f"checkpoint {path} was produced by a different scene/config "
                f"(fingerprint {fp}); refusing to resume"
            )
        return {"accum": z["accum"], "spp_done": int(z["spp_done"])}


# ---------------------------------------------------------------------------
# Orbax train-state checkpoints (inverse rendering)
# ---------------------------------------------------------------------------

def save_train_checkpoint(path: str, *, step: int, params, opt_state,
                          key) -> None:
    """Orbax checkpoint of a diff.fit train state (params, optimizer state,
    step, RNG key) for long inverse-rendering runs — the production-grade
    analog of the render-accumulation .npz above.  ``path`` is a directory
    (Orbax layout); an existing checkpoint at the path is replaced."""
    import os
    import shutil

    import jax
    import jax.numpy as jnp
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    if os.path.exists(path):
        # replace ONLY something that is a checkpoint (Orbax writes
        # _CHECKPOINT_METADATA) or an empty directory — never rmtree an
        # arbitrary user path (a typo'd checkpoint_dir pointed at real
        # data would otherwise destroy it on the first checkpoint)
        is_ckpt = os.path.exists(
            os.path.join(path, "_CHECKPOINT_METADATA"))
        if not is_ckpt and (not os.path.isdir(path) or os.listdir(path)):
            raise ValueError(
                f"refusing to overwrite {path!r}: it exists but is not an "
                "Orbax checkpoint written by save_train_checkpoint")
        shutil.rmtree(path)
    tree = {"step": jnp.asarray(step, jnp.int32), "params": params,
            "opt_state": opt_state,
            "key_data": jax.random.key_data(key)}
    ck = ocp.StandardCheckpointer()
    ck.save(path, tree)
    ck.wait_until_finished()


def load_train_checkpoint(path: str, *, params_like, opt_state_like):
    """Restore a train state saved by :func:`save_train_checkpoint`.

    ``params_like`` / ``opt_state_like`` supply the pytree structure (build
    them exactly as diff.fit does: extract_params + opt.init) so Orbax
    restores optimizer NamedTuples instead of raw nests.  Returns
    ``(step, params, opt_state, key)``."""
    import os

    import jax
    import jax.numpy as jnp
    import jax.tree_util as jtu
    import orbax.checkpoint as ocp

    like = {"step": jnp.asarray(0, jnp.int32), "params": params_like,
            "opt_state": opt_state_like,
            "key_data": jax.random.key_data(jax.random.key(0))}
    abstract = jtu.tree_map(ocp.utils.to_shape_dtype_struct, like)
    ck = ocp.StandardCheckpointer()
    restored = ck.restore(os.path.abspath(path), abstract)
    # decommit: Orbax pins restored arrays to one device, which a
    # multi-device shard_map train step then rejects; round-tripping
    # through host memory yields uncommitted arrays (trees are KBs)
    import numpy as np

    decommit = lambda t: jtu.tree_map(
        lambda a: jnp.asarray(np.asarray(a)), t)
    key = jax.random.wrap_key_data(
        jnp.asarray(np.asarray(restored["key_data"])))
    return (int(restored["step"]), decommit(restored["params"]),
            decommit(restored["opt_state"]), key)
