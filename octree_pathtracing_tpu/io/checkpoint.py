"""Render / training checkpoint-resume.

The reference has none (SURVEY.md §5): progressive state is just
(framebuffer, spp) behind atomics.  Here a checkpoint captures the full
resumable state — accumulated framebuffer, spp, pass index, RNG seed, and
(for inverse rendering) parameters + optimizer state — as a single ``.npz``.
"""

from __future__ import annotations

import io
import json

import numpy as np


def _flatten(prefix: str, tree, out: dict):
    if isinstance(tree, dict):
        for k, v in tree.items():
            _flatten(f"{prefix}.{k}" if prefix else str(k), v, out)
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            _flatten(f"{prefix}.{i}", v, out)
    else:
        out[prefix] = np.asarray(tree)


def _unflatten(flat: dict):
    root: dict = {}
    for key, v in flat.items():
        parts = key.split(".")
        d = root
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = v
    return root


def save_render_checkpoint(path: str, renderer, extra: dict | None = None):
    """Checkpoint a ``render.Renderer``'s progressive state."""
    payload = {
        "framebuffer": np.asarray(renderer.framebuffer),
        "current_spp": np.asarray(renderer.current_spp),
        "pass_index": np.asarray(renderer._pass_index),
        "seed": np.asarray(renderer.seed),
    }
    if extra:
        _flatten("extra", extra, payload)
    meta = dict(width=renderer.width, height=renderer.height, target_spp=renderer.target_spp)
    payload["meta_json"] = np.frombuffer(json.dumps(meta).encode(), np.uint8)
    np.savez_compressed(path, **payload)


def load_render_checkpoint(path: str, renderer) -> dict:
    """Restore into a ``Renderer``; returns any extra payload."""
    import jax.numpy as jnp

    with np.load(path, allow_pickle=False) as z:
        meta = json.loads(bytes(z["meta_json"].tobytes()).decode())
        assert (renderer.height, renderer.width) == tuple(
            np.asarray(z["framebuffer"]).shape[:2]
        ), "checkpoint resolution mismatch"
        renderer.framebuffer = jnp.asarray(z["framebuffer"])
        renderer.current_spp = jnp.asarray(z["current_spp"])
        renderer._pass_index = int(z["pass_index"])
        renderer.seed = int(z["seed"])
        # target_spp is configuration, not progressive state: the caller's
        # requested target wins (resuming a 4-spp checkpoint with --spp 8
        # must render 4 more), so it is saved in meta only for inspection.
        extra_flat = {
            k[len("extra.") :]: z[k] for k in z.files if k.startswith("extra.")
        }
    return _unflatten(extra_flat)


def save_arrays(path: str, tree: dict):
    """Generic pytree-of-arrays checkpoint (e.g. inverse-rendering params)."""
    flat: dict = {}
    _flatten("", tree, flat)
    np.savez_compressed(path, **flat)


def load_arrays(path: str) -> dict:
    with np.load(path, allow_pickle=False) as z:
        return _unflatten({k: z[k] for k in z.files})
