"""Film checkpoint/resume — a capability the reference lacks entirely
(its film is written only once, at the end of Render; integrator.cpp:341,
and SPPM/MLT iterate without persisting).  On TPU the film is just a
pytree of device arrays plus a sample counter, so mid-render state
serializes naturally: partial renders survive preemption and can resume
with bit-identical results because the samplers are pure functions of
(pixel, sample index, dimension) — restarting at sample s replays
exactly the stream the uninterrupted render would have used.

Format: one .npz with the film arrays, the number of completed spp, and
a fingerprint of (scene, camera, sampler config) so a checkpoint is
never resumed against a different render.
"""
from __future__ import annotations

import logging
import os

import numpy as np

log = logging.getLogger("pbrt_tpu")

_FIELDS = ("weighted", "weight", "raw", "splat")
_VERSION = 1


def render_fingerprint(scene, cfg, spp, max_depth, width, height):
    """Cheap structural hash: shapes + a few content probes, not full
    array hashing (scenes can be tens of MB)."""
    import hashlib
    h = hashlib.sha256()
    h.update(f"v{_VERSION}|{cfg.kind}|{cfg.seed}|{spp}|{max_depth}|"
             f"{width}x{height}|".encode())
    for name in ("tri_v0", "mat_kd", "light_L", "bvh_bounds_lo"):
        arr = getattr(scene, name, None)
        if arr is not None:
            a = np.asarray(arr)
            h.update(name.encode())
            h.update(str(a.shape).encode())
            h.update(np.ascontiguousarray(a.ravel()[:64]).tobytes())
    return h.hexdigest()[:16]


def save(path, film, completed_spp, fingerprint):
    """Atomic write (tmp + rename) so a preemption mid-save never
    corrupts the previous checkpoint."""
    tmp = path + ".tmp"
    arrays = {k: np.asarray(getattr(film, k)) for k in _FIELDS}
    np.savez(tmp, completed_spp=np.int64(completed_spp),
             fingerprint=np.bytes_(fingerprint.encode()), **arrays)
    # numpy appends .npz to names without it
    if not tmp.endswith(".npz") and os.path.exists(tmp + ".npz"):
        tmp = tmp + ".npz"
    os.replace(tmp, path)
    log.info("checkpoint: saved %d spp -> %s", completed_spp, path)


def load(path, film, fingerprint):
    """Return (film_with_restored_state, completed_spp).  On any
    mismatch the checkpoint is ignored (fresh start), never an error."""
    if not os.path.exists(path):
        return film, 0
    try:
        with np.load(path) as z:
            fp = bytes(z["fingerprint"]).decode()
            if fp != fingerprint:
                log.warning("checkpoint %s is for a different render "
                            "(%s != %s) — starting fresh", path, fp,
                            fingerprint)
                return film, 0
            completed = int(z["completed_spp"])
            restored = film
            import jax.numpy as jnp
            for k in _FIELDS:
                cur = getattr(film, k)
                if z[k].shape != tuple(cur.shape):
                    log.warning("checkpoint %s: %s shape mismatch — "
                                "starting fresh", path, k)
                    return film, 0
                restored = restored.replace(**{k: jnp.asarray(z[k])})
        log.info("checkpoint: resuming %s at %d completed spp", path,
                 completed)
        return restored, completed
    except Exception as e:  # corrupt file -> fresh start
        log.warning("checkpoint %s unreadable (%s) — starting fresh",
                    path, e)
        return film, 0
