"""Checkpoint / resume for the full mapper state.

The reference's only checkpoint is the PLY + sidecars (no optimizer state;
SURVEY.md §5). We keep that export for interop (mapper.save) and add a real
checkpoint: the complete GaussianState (params + valid mask + exist_since +
Adam moments + densify stats) plus mapper scheduling state, as a single
.npz — resumable mid-run with bitwise-identical continuation.
"""
from __future__ import annotations

import json
import os
from typing import Any

import jax.numpy as jnp
import numpy as np

from legslam_tpu.models import gaussians as G
from legslam_tpu.models.weights_io import load_params, save_params


def save_checkpoint(path: str, state: G.GaussianState,
                    meta: dict | None = None) -> None:
    def as_dict(p: G.GaussianParams) -> dict:
        return {f: getattr(p, f) for f in
                ("xyz", "f_dc", "f_rest", "lang_feat", "opacity",
                 "scaling", "rotation")}

    tree = dict(
        params=as_dict(state.params),
        adam_m=as_dict(state.adam_m),
        adam_v=as_dict(state.adam_v),
        valid=state.valid,
        exist_since=state.exist_since,
        adam_step=state.adam_step,
        stats=dict(grad_accum=state.stats.grad_accum,
                   denom=state.stats.denom,
                   max_radii2d=state.stats.max_radii2d),
        overflow_dropped=state.overflow_dropped,
    )
    save_params(path, tree)
    if meta is not None:
        with open(path + ".meta.json", "w") as f:
            json.dump(meta, f)


def load_checkpoint(path: str) -> tuple[G.GaussianState, dict]:
    tree = load_params(path)
    state = G.GaussianState(
        params=G.GaussianParams(**tree["params"]),
        adam_m=G.GaussianParams(**tree["adam_m"]),
        adam_v=G.GaussianParams(**tree["adam_v"]),
        valid=jnp.asarray(tree["valid"], bool),
        exist_since=jnp.asarray(tree["exist_since"], jnp.int32),
        adam_step=jnp.asarray(tree["adam_step"], jnp.int32),
        stats=G.DensifyStats(**tree["stats"]),
        overflow_dropped=jnp.asarray(tree["overflow_dropped"], jnp.int32),
    )
    meta = {}
    if os.path.exists(path + ".meta.json"):
        with open(path + ".meta.json") as f:
            meta = json.load(f)
    return state, meta


def state_from_ply(ply_path: str, capacity: int) -> G.GaussianState:
    """Resume from the reference-compatible PLY export (loadPly,
    gaussian_model.cpp:854-970 / eval/gaussian_model.py:59-111): params
    restored, Adam moments zeroed."""
    from legslam_tpu.utils.ply import load_gaussian_ply
    raw = load_gaussian_ply(ply_path)
    n = raw["xyz"].shape[0]
    if n > capacity:
        raise ValueError(f"PLY has {n} gaussians > capacity {capacity}")
    st = G.empty(capacity)
    params = st.params
    for name in ("xyz", "f_dc", "f_rest", "lang_feat", "opacity",
                 "scaling", "rotation"):
        arr = getattr(params, name)
        arr = arr.at[:n].set(jnp.asarray(raw[name]))
        params = params.replace(**{name: arr})
    return st.replace(params=params, valid=st.valid.at[:n].set(True))
