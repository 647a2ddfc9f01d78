"""Capacity-padded Gaussian parameter store with Adam + density control.

TPU-native equivalent of the reference GaussianModel (src/gaussian_model.cpp,
include/gaussian_model.h:61-220). The reference reallocates its 7 parameter
tensors (and performs Adam-state "surgery") on every densify/prune; under
XLA we instead keep a FIXED capacity C and a validity mask, so every
operation is a static-shape gather/scatter and the training step never
re-jits:

  * 7 parameter groups in the reference order xyz / f_dc / f_rest /
    lang_feat / opacity / scaling / rotation (gaussian_model.cpp:533-541),
  * activations exp / sigmoid / normalize (gaussian_model.cpp:46-68),
  * create_from_pcd / increase_pcd (knn scale init, opacity
    inv_sigmoid(0.1), identity quat; gaussian_model.cpp:109-385),
  * torch-Adam-exact updates with eps=1e-15 and shared step count
    (gaussian_model.cpp:488-511),
  * densify stats (accumulated ||dL/dmean2D.xy||, gaussian_model.cpp:834-847),
  * clone / split / prune with moment surgery: new slots get zero moments,
    pruned slots zero theirs, step preserved (gaussian_model.cpp:577-832),
  * opacity reset (gaussian_model.cpp:567-575),
  * loop-closure scaled transforms (gaussian_model.cpp:387-481,
    src/operate_points.cu:93-140).
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
from flax import struct

from legslam_tpu.config import (
    INIT_OPACITY,
    KNN_DIST_CLAMP,
    LF_CHANNELS,
    NEAR_CLIP,
    SH_COEFFS_MAX,
)
from legslam_tpu.utils.knn import mean_sq_dist_to_3nn
from legslam_tpu.utils.sh import rgb_to_sh
from legslam_tpu.utils.transforms import (
    inverse_sigmoid,
    normalize_quat,
    quat_to_rotmat,
)

ADAM_B1 = 0.9
ADAM_B2 = 0.999
ADAM_EPS = 1e-15  # gaussian_model.cpp trainingSetup eps


@struct.dataclass
class GaussianParams:
    """The 7 optimizable groups, capacity-padded along the leading axis."""
    xyz: jnp.ndarray        # [C, 3]
    f_dc: jnp.ndarray       # [C, 1, 3] SH DC
    f_rest: jnp.ndarray     # [C, 15, 3] higher SH
    lang_feat: jnp.ndarray  # [C, LF]
    opacity: jnp.ndarray    # [C, 1] raw (pre-sigmoid)
    scaling: jnp.ndarray    # [C, 3] log scales
    rotation: jnp.ndarray   # [C, 4] wxyz quats (normalized on use)


@struct.dataclass
class DensifyStats:
    grad_accum: jnp.ndarray   # [C] accumulated ||dL/dmean2D.xy|| (NDC conv.)
    denom: jnp.ndarray        # [C] visit counts
    max_radii2d: jnp.ndarray  # [C] running max screen radius


@struct.dataclass
class GaussianState:
    params: GaussianParams
    valid: jnp.ndarray        # [C] bool
    exist_since: jnp.ndarray  # [C] int32 creation iteration
    adam_m: GaussianParams
    adam_v: GaussianParams
    adam_step: jnp.ndarray    # [] int32, shared across groups
    stats: DensifyStats
    overflow_dropped: jnp.ndarray  # [] int32: points lost to capacity

    @property
    def capacity(self) -> int:
        return self.params.xyz.shape[0]

    def num_valid(self) -> jnp.ndarray:
        return jnp.sum(self.valid.astype(jnp.int32))

    # Activations (gaussian_model.cpp:46-68)
    def scales(self) -> jnp.ndarray:
        return jnp.exp(self.params.scaling)

    def opacities(self) -> jnp.ndarray:
        return jax.nn.sigmoid(self.params.opacity[:, 0])

    def rotations(self) -> jnp.ndarray:
        return normalize_quat(self.params.rotation)

    def sh(self) -> jnp.ndarray:
        return jnp.concatenate([self.params.f_dc, self.params.f_rest], axis=1)


def _zeros_params(capacity: int) -> GaussianParams:
    return GaussianParams(
        xyz=jnp.zeros((capacity, 3), jnp.float32),
        f_dc=jnp.zeros((capacity, 1, 3), jnp.float32),
        f_rest=jnp.zeros((capacity, SH_COEFFS_MAX - 1, 3), jnp.float32),
        lang_feat=jnp.zeros((capacity, LF_CHANNELS), jnp.float32),
        opacity=jnp.zeros((capacity, 1), jnp.float32),
        scaling=jnp.zeros((capacity, 3), jnp.float32),
        rotation=jnp.zeros((capacity, 4), jnp.float32)
        .at[:, 0].set(1.0),
    )


def empty(capacity: int) -> GaussianState:
    params = _zeros_params(capacity)
    # moments must start at TRUE zero (torch.optim.Adam exp_avg init) —
    # _zeros_params' identity-quat default (w=1) is only for the params;
    # it leaking into adam_m/v would bias the first rotation updates and
    # break the zero-moments-on-invalid-rows invariant the watermark
    # slab-skip (ops/slabs.py) rests on
    zero_mom = jax.tree.map(jnp.zeros_like, params)
    return GaussianState(
        params=params,
        valid=jnp.zeros((capacity,), bool),
        exist_since=jnp.zeros((capacity,), jnp.int32),
        adam_m=zero_mom,
        adam_v=zero_mom,
        adam_step=jnp.zeros((), jnp.int32),
        stats=DensifyStats(
            grad_accum=jnp.zeros((capacity,), jnp.float32),
            denom=jnp.zeros((capacity,), jnp.float32),
            max_radii2d=jnp.zeros((capacity,), jnp.float32)),
        overflow_dropped=jnp.zeros((), jnp.int32),
    )


def _new_point_params(points, colors, lang_feat, point_valid=None):
    """Shared init for create/increase (gaussian_model.cpp:140-167,236-255):
    SH DC from RGB, f_rest zero, scale log(sqrt(mean 3-NN sq dist)),
    identity quat, opacity inverse_sigmoid(0.1).

    `point_valid` masks padded rows out of the 3-NN neighbor pool so a
    shape-padded batch (the mapper's static-shape ingest buckets) yields
    BIT-IDENTICAL params for the real rows as an unpadded call; padded
    rows' params are arbitrary and dropped by the caller's scatter plan."""
    n = points.shape[0]
    dist2 = jnp.clip(mean_sq_dist_to_3nn(points, valid=point_valid),
                     KNN_DIST_CLAMP)
    scaling = jnp.log(jnp.sqrt(dist2))[:, None].repeat(3, axis=1)
    if lang_feat is None:
        lang_feat = jnp.zeros((n, LF_CHANNELS), jnp.float32)
    return GaussianParams(
        xyz=points,
        f_dc=rgb_to_sh(colors)[:, None, :],
        f_rest=jnp.zeros((n, SH_COEFFS_MAX - 1, 3), jnp.float32),
        lang_feat=lang_feat,
        opacity=jnp.full((n, 1), inverse_sigmoid(jnp.float32(INIT_OPACITY))),
        scaling=scaling,
        rotation=jnp.zeros((n, 4), jnp.float32).at[:, 0].set(1.0),
    )


def create_from_pcd(points: jnp.ndarray, colors: jnp.ndarray,
                    capacity: int,
                    lang_feat: jnp.ndarray | None = None) -> GaussianState:
    """Initialize the store from a sparse colored point cloud
    (gaussian_model.cpp:109-194). points/colors [N, 3], N <= capacity."""
    n = points.shape[0]
    assert n <= capacity, f"{n} points exceed capacity {capacity}"
    state = empty(capacity)
    new = _new_point_params(jnp.asarray(points, jnp.float32),
                            jnp.asarray(colors, jnp.float32),
                            lang_feat)
    params = jax.tree.map(
        lambda full, add: full.at[:n].set(add), state.params, new)
    return state.replace(params=params,
                         valid=state.valid.at[:n].set(True))


def grow_capacity(state: GaussianState, new_capacity: int) -> GaussianState:
    """Content-preserving migration to a larger capacity (the mapper's
    geometric capacity ladder). The reference reallocates its parameter
    tensors as the map grows (gaussian_model.cpp densification_postfix);
    under XLA the equivalent is an episodic re-pad: old rows are copied
    verbatim (params, moments, stats, flags), new slots take the
    canonical empty() values (identity quats — NOT zeros, which would
    NaN under quat normalization — zero moments, valid=False)."""
    old = state.capacity
    assert new_capacity >= old
    dst = empty(new_capacity)

    def put(full, part):
        return full.at[:old].set(part)

    return GaussianState(
        params=jax.tree.map(put, dst.params, state.params),
        valid=put(dst.valid, state.valid),
        exist_since=put(dst.exist_since, state.exist_since),
        adam_m=jax.tree.map(put, dst.adam_m, state.adam_m),
        adam_v=jax.tree.map(put, dst.adam_v, state.adam_v),
        adam_step=state.adam_step,
        stats=jax.tree.map(put, dst.stats, state.stats),
        overflow_dropped=state.overflow_dropped,
    )


class ScatterPlan(NamedTuple):
    """Static-shape free-slot allocation: maps n source rows to capacity
    slots; overflowing rows get index C (dropped by scatter mode)."""
    slots: jnp.ndarray      # [n] target slot per source (C = drop)
    n_dropped: jnp.ndarray  # [] int32


def _allocate_slots(valid: jnp.ndarray, want: jnp.ndarray,
                    n_sources: int) -> ScatterPlan:
    """want: [n_sources] bool — sources needing a slot. Stable allocation of
    free slots (invalid first in index order)."""
    capacity = valid.shape[0]
    order = jnp.argsort(valid)                     # stable: invalid first
    n_free = capacity - jnp.sum(valid.astype(jnp.int32))
    rank = jnp.cumsum(want.astype(jnp.int32)) - 1  # allocation rank
    ok = want & (rank < n_free)
    slots = jnp.where(ok, order[jnp.clip(rank, 0, capacity - 1)], capacity)
    n_dropped = jnp.sum((want & ~ok).astype(jnp.int32))
    return ScatterPlan(slots=slots.astype(jnp.int32), n_dropped=n_dropped)


def _scatter_params(dst: GaussianParams, src: GaussianParams,
                    slots: jnp.ndarray) -> GaussianParams:
    return jax.tree.map(
        lambda d, s: d.at[slots].set(s, mode="drop"), dst, src)


def _zero_rows(params: GaussianParams, slots: jnp.ndarray) -> GaussianParams:
    return jax.tree.map(
        lambda p: p.at[slots].set(jnp.zeros_like(p[:slots.shape[0]]),
                                  mode="drop"), params)


def increase_pcd(state: GaussianState, points: jnp.ndarray,
                 colors: jnp.ndarray, iteration,
                 point_valid: jnp.ndarray | None = None,
                 lang_feat: jnp.ndarray | None = None,
                 max_log_scale: jnp.ndarray | None = None) -> GaussianState:
    """Append new points into free slots (gaussian_model.cpp:196-385).
    New slots get zero Adam moments and zero densify stats; the shared step
    count is preserved (densificationPostfix semantics,
    gaussian_model.cpp:655-727)."""
    points = jnp.asarray(points, jnp.float32)
    colors = jnp.asarray(colors, jnp.float32)
    n = points.shape[0]
    if point_valid is None:
        point_valid = jnp.ones((n,), bool)
    plan = _allocate_slots(state.valid, point_valid, n)
    new = _new_point_params(points, colors, lang_feat,
                            point_valid=point_valid)
    if max_log_scale is not None:
        # per-point screen-radius cap on the knn init (the prune-big
        # bound applied at creation; MapperParams.ingest_scale_clamp_px)
        new = new.replace(scaling=jnp.minimum(
            new.scaling, max_log_scale[:, None]))
    params = _scatter_params(state.params, new, plan.slots)
    adam_m = _zero_rows(state.adam_m, plan.slots)
    adam_v = _zero_rows(state.adam_v, plan.slots)
    valid = state.valid.at[plan.slots].set(True, mode="drop")
    exist = state.exist_since.at[plan.slots].set(
        jnp.full((n,), iteration, jnp.int32), mode="drop")
    zeros_n = jnp.zeros((n,), jnp.float32)
    stats = DensifyStats(
        grad_accum=state.stats.grad_accum.at[plan.slots].set(zeros_n, mode="drop"),
        denom=state.stats.denom.at[plan.slots].set(zeros_n, mode="drop"),
        max_radii2d=state.stats.max_radii2d.at[plan.slots].set(zeros_n, mode="drop"),
    )
    return state.replace(
        params=params, valid=valid, exist_since=exist, adam_m=adam_m,
        adam_v=adam_v, stats=stats,
        overflow_dropped=state.overflow_dropped + plan.n_dropped)


# ---------------------------------------------------------------------------
# Adam (torch-exact; gaussian_model.cpp:488-511 group order and eps)
# ---------------------------------------------------------------------------

def adam_update(state: GaussianState, grads: GaussianParams,
                lrs: dict[str, Any], n_slabs: int = 0,
                zero_invalid: bool = False) -> GaussianState:
    """One Adam step over all 7 groups with per-group learning rates.

    Matches torch.optim.Adam: m,v EMA + bias correction, denom =
    sqrt(v/bc2) + eps, update = lr/bc1 * m/denom. Invalid slots receive
    zero grads upstream (or via zero_invalid=True, fused into this pass),
    so their moments only decay.

    n_slabs > 0: watermark slab-skip (ops/slabs.py) — EXACT because rows
    above the live watermark are invalid with zero moments (zeroed on
    prune surgery / fresh allocation) and zero grads, i.e. fixed points
    of the update.
    """
    step = state.adam_step + 1
    t = step.astype(jnp.float32)
    bc1 = 1.0 - ADAM_B1 ** t
    bc2 = 1.0 - ADAM_B2 ** t

    def upd(p, g, m, v, lr, valid):
        # flatten: [P, 3]-shaped arrays waste 125/128 VPU lanes; the update
        # is elementwise so 1-D layout is ~16x faster on TPU (measured).
        # NOTE a single concatenated flat update over all 7 groups was
        # tried and compile-OOMs: XLA canonicalizes the concat+slice+
        # reshape chain into a [total/3, 3]{T(8,128)} temp (42.7x layout
        # padding, 28.9 GB). Per-group flat is the proven form.
        shape = p.shape
        if valid is not None:
            g = jnp.where(valid[(...,) + (None,) * (g.ndim - 1)], g, 0.0)
        p, g, m, v = (a.reshape(-1) for a in (p, g, m, v))
        m = ADAM_B1 * m + (1.0 - ADAM_B1) * g
        v = ADAM_B2 * v + (1.0 - ADAM_B2) * g * g
        denom = jnp.sqrt(v / bc2) + ADAM_EPS
        p = p - (lr / bc1) * m / denom
        return p.reshape(shape), m.reshape(shape), v.reshape(shape)

    names = ("xyz", "f_dc", "f_rest", "lang_feat", "opacity", "scaling",
             "rotation")

    def run(a):
        out_p, out_m, out_v = {}, {}, {}
        for name in names:
            out_p[name], out_m[name], out_v[name] = upd(
                a["p"][name], a["g"][name], a["m"][name], a["v"][name],
                lrs[name], a["valid"] if zero_invalid else None)
        return out_p, out_m, out_v

    args = dict(p={n: getattr(state.params, n) for n in names},
                g={n: getattr(grads, n) for n in names},
                m={n: getattr(state.adam_m, n) for n in names},
                v={n: getattr(state.adam_v, n) for n in names},
                valid=state.valid)
    if n_slabs and state.capacity % n_slabs == 0:
        from legslam_tpu.ops.slabs import prefix_map, watermark
        new_p, new_m, new_v = prefix_map(
            run, lambda a: (a["p"], a["m"], a["v"]), args,
            watermark(state.valid), n_slabs)
    else:
        new_p, new_m, new_v = run(args)
    return state.replace(
        params=GaussianParams(**new_p), adam_m=GaussianParams(**new_m),
        adam_v=GaussianParams(**new_v), adam_step=step)


def expon_lr(step, lr_init: float, lr_final: float, lr_delay_steps: int = 0,
             lr_delay_mult: float = 1.0, max_steps: int = 1_000_000):
    """Plenoxels/JaxNeRF log-lerp schedule (gaussian_model.cpp:1143-1156).
    Returns 0 when step<0 or both lrs are 0."""
    step = jnp.asarray(step, jnp.float32)
    if lr_delay_steps > 0:
        delay_rate = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
            0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0.0, 1.0))
    else:
        delay_rate = 1.0
    tt = jnp.clip(step / max_steps, 0.0, 1.0)
    lr_init = jnp.asarray(lr_init, jnp.float32)
    lr_final = jnp.asarray(lr_final, jnp.float32)
    both_zero = (lr_init == 0.0) & (lr_final == 0.0)
    safe_init = jnp.where(both_zero, 1.0, lr_init)
    safe_final = jnp.where(both_zero, 1.0, lr_final)
    log_lerp = jnp.exp(jnp.log(safe_init) * (1 - tt) +
                       jnp.log(safe_final) * tt)
    return jnp.where((step >= 0) & ~both_zero, delay_rate * log_lerp, 0.0)


# ---------------------------------------------------------------------------
# Densification (gaussian_model.cpp:577-847)
# ---------------------------------------------------------------------------

def add_densification_stats(state: GaussianState, mean2d_grad: jnp.ndarray,
                            radii: jnp.ndarray,
                            n_slabs: int = 0) -> GaussianState:
    """Accumulate ||dL/dmean2D.xy||2 and visit counts for visible gaussians
    (radii > 0), and the running max screen radius
    (gaussian_model.cpp:834-847, gaussian_mapper.cpp:739-747).

    n_slabs > 0: watermark slab-skip — EXACT: rows above the watermark are
    invalid, render with radius 0 (not visible), so their stats rows are
    fixed points of the accumulation."""

    def run(a):
        visible = a["radii"] > 0
        norm = jnp.linalg.norm(a["mg"][:, :2], axis=-1)
        return DensifyStats(
            grad_accum=a["stats"].grad_accum + jnp.where(visible, norm, 0.0),
            denom=a["stats"].denom + visible.astype(jnp.float32),
            max_radii2d=jnp.maximum(
                a["stats"].max_radii2d,
                jnp.where(visible, a["radii"].astype(jnp.float32), 0.0)),
        )

    args = dict(stats=state.stats, mg=mean2d_grad, radii=radii)
    if n_slabs and state.capacity % n_slabs == 0:
        from legslam_tpu.ops.slabs import prefix_map, watermark
        stats = prefix_map(run, lambda a: a["stats"], args,
                           watermark(state.valid), n_slabs)
    else:
        stats = run(args)
    return state.replace(stats=stats)


def add_densification_stats_batched(state: GaussianState,
                                    mean2d_grads: jnp.ndarray,
                                    radii: jnp.ndarray) -> GaussianState:
    """Multi-view variant: accumulate PER-VIEW ||dL/dmean2D.xy||2 with one
    denom increment per view visit, matching the reference's one-view-per-
    iteration accumulation semantics (gaussian_model.cpp:834-847) under the
    data-parallel batched step. mean2d_grads [B, P, 2] must already be
    un-scaled by the 1/B loss mean; radii [B, P]."""
    visible = radii > 0                                     # [B, P]
    norm = jnp.linalg.norm(mean2d_grads[..., :2], axis=-1)  # [B, P]
    stats = DensifyStats(
        grad_accum=state.stats.grad_accum +
        jnp.sum(jnp.where(visible, norm, 0.0), axis=0),
        denom=state.stats.denom + jnp.sum(visible.astype(jnp.float32),
                                          axis=0),
        max_radii2d=jnp.maximum(
            state.stats.max_radii2d,
            jnp.max(jnp.where(visible, radii.astype(jnp.float32), 0.0),
                    axis=0)),
    )
    return state.replace(stats=stats)


def densify_and_prune(state: GaussianState, key: jax.Array,
                      grad_threshold: float, min_opacity: float,
                      extent, max_screen_size,
                      percent_dense: float) -> GaussianState:
    """Clone small / split large high-gradient gaussians, then prune.

    Reference flow (gaussian_model.cpp:729-832): grads = accum/denom
    (NaN->0); clone copies params verbatim when max(scale) <=
    percent_dense*extent; split draws 2 samples ~ N(0, scale) rotated +
    offset with new scale = log(scale/(0.8*2)) and prunes the originals;
    prune drops opacity < min_opacity, and (when max_screen_size > 0)
    radii2D > max_screen_size or scale > 0.1*extent. Stats reset after.
    """
    p = state.params
    grads = state.stats.grad_accum / jnp.maximum(state.stats.denom, 1e-12)
    grads = jnp.nan_to_num(grads, nan=0.0)
    scales = jnp.exp(p.scaling)
    max_scale = jnp.max(scales, axis=-1)
    hot = state.valid & (grads >= grad_threshold)
    clone_m = hot & (max_scale <= percent_dense * extent)
    split_m = hot & (max_scale > percent_dense * extent)

    # --- clones: verbatim copies ---
    plan_c = _allocate_slots(state.valid, clone_m, state.capacity)
    params = _scatter_params(state.params, state.params, plan_c.slots)
    valid = state.valid.at[plan_c.slots].set(True, mode="drop")
    exist = state.exist_since.at[plan_c.slots].set(state.exist_since,
                                                   mode="drop")
    adam_m = _zero_rows(state.adam_m, plan_c.slots)
    adam_v = _zero_rows(state.adam_v, plan_c.slots)
    # fresh slots must not inherit the previous occupant's radius stats
    max_radii = state.stats.max_radii2d.at[plan_c.slots].set(
        jnp.zeros((state.capacity,), jnp.float32), mode="drop")

    # --- splits: two perturbed children, originals pruned ---
    n_split = 2
    rot = quat_to_rotmat(normalize_quat(p.rotation))  # [C,3,3]
    n_dropped = plan_c.n_dropped
    for i in range(n_split):
        key, sub = jax.random.split(key)
        noise = jax.random.normal(sub, p.xyz.shape) * scales
        child_xyz = p.xyz + jnp.einsum("cij,cj->ci", rot, noise)
        child_scaling = jnp.log(scales / (0.8 * n_split))
        child = GaussianParams(
            xyz=child_xyz, f_dc=p.f_dc, f_rest=p.f_rest,
            lang_feat=p.lang_feat, opacity=p.opacity,
            scaling=child_scaling, rotation=p.rotation)
        plan_s = _allocate_slots(valid, split_m, state.capacity)
        params = _scatter_params(params, child, plan_s.slots)
        valid = valid.at[plan_s.slots].set(True, mode="drop")
        exist = exist.at[plan_s.slots].set(state.exist_since, mode="drop")
        adam_m = _zero_rows(adam_m, plan_s.slots)
        adam_v = _zero_rows(adam_v, plan_s.slots)
        max_radii = max_radii.at[plan_s.slots].set(
            jnp.zeros((state.capacity,), jnp.float32), mode="drop")
        n_dropped = n_dropped + plan_s.n_dropped
    valid = valid & ~split_m

    # --- prune (over the updated store; new slots have zero radii stats) ---
    opacity_act = jax.nn.sigmoid(params.opacity[:, 0])
    prune_m = opacity_act < min_opacity
    if max_screen_size is not None:
        big_ws = jnp.max(jnp.exp(params.scaling), axis=-1) > 0.1 * extent
        prune_m = prune_m | (max_radii > max_screen_size) | big_ws
    valid = valid & ~prune_m

    # pruned slots zero their moments (gaussian_model.cpp prune surgery)
    def mask_rows(q):
        return jnp.where(valid[(...,) + (None,) * (q.ndim - 1)], q, 0.0)
    adam_m = jax.tree.map(mask_rows, adam_m)
    adam_v = jax.tree.map(mask_rows, adam_v)

    capacity = state.capacity
    stats = DensifyStats(
        grad_accum=jnp.zeros((capacity,), jnp.float32),
        denom=jnp.zeros((capacity,), jnp.float32),
        max_radii2d=jnp.where(valid, max_radii, 0.0))
    return state.replace(
        params=params, valid=valid, exist_since=exist, adam_m=adam_m,
        adam_v=adam_v, stats=stats,
        overflow_dropped=state.overflow_dropped + n_dropped)


def reset_opacity(state: GaussianState) -> GaussianState:
    """opacity <- inverse_sigmoid(min(sigmoid(opacity), 0.01)), moments
    zeroed for the opacity group (gaussian_model.cpp:567-575 +
    replaceTensorToOptimizer)."""
    act = jax.nn.sigmoid(state.params.opacity)
    new_raw = inverse_sigmoid(jnp.minimum(act, 0.01))
    return state.replace(
        params=state.params.replace(opacity=new_raw),
        adam_m=state.adam_m.replace(opacity=jnp.zeros_like(new_raw)),
        adam_v=state.adam_v.replace(opacity=jnp.zeros_like(new_raw)))


# ---------------------------------------------------------------------------
# Loop-closure transforms (gaussian_model.cpp:387-481, operate_points.cu)
# ---------------------------------------------------------------------------

def rotmat_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """[..., 3, 3] -> [..., 4] wxyz. Branch-free Shoemake (matches
    cuda_rasterizer/operate_points.h:120-155 up to sign conventions;
    quaternions are sign-ambiguous and normalized on use)."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22
    qw = jnp.sqrt(jnp.maximum(0.0, 1.0 + tr)) / 2
    qx = jnp.sqrt(jnp.maximum(0.0, 1.0 + m00 - m11 - m22)) / 2
    qy = jnp.sqrt(jnp.maximum(0.0, 1.0 - m00 + m11 - m22)) / 2
    qz = jnp.sqrt(jnp.maximum(0.0, 1.0 - m00 - m11 + m22)) / 2
    qx = jnp.copysign(qx, m21 - m12)
    qy = jnp.copysign(qy, m02 - m20)
    qz = jnp.copysign(qz, m10 - m01)
    return normalize_quat(jnp.stack([qw, qx, qy, qz], -1))


def apply_scaled_transformation(state: GaussianState, scale,
                                R: jnp.ndarray, t: jnp.ndarray
                                ) -> GaussianState:
    """Whole-map similarity update: xyz <- R @ (s*xyz) + t, log-scale +=
    log(s), rotation <- R * rot; xyz/scaling moments reset
    (gaussian_model.cpp:387-420 applyScaledTransformation; note the
    reference multiplies scaling_ (log) by s — a known quirk it immediately
    replaces in the optimizer; we use the geometrically-correct += log(s),
    cited difference)."""
    p = state.params
    xyz = (scale * p.xyz) @ R.T + t
    scaling = p.scaling + jnp.log(scale)
    rot_new = rotmat_to_quat(R[None] @ quat_to_rotmat(normalize_quat(p.rotation)))
    params = p.replace(xyz=xyz, scaling=scaling, rotation=rot_new)
    zeros3 = jnp.zeros_like(p.xyz)
    adam_m = state.adam_m.replace(xyz=zeros3, scaling=jnp.zeros_like(p.scaling))
    adam_v = state.adam_v.replace(xyz=zeros3, scaling=jnp.zeros_like(p.scaling))
    return state.replace(params=params, adam_m=adam_m, adam_v=adam_v)


def mark_visible(xyz: jnp.ndarray, world_view: jnp.ndarray) -> jnp.ndarray:
    """Frustum near-plane visibility (markVisible / in_frustum,
    rasterizer_impl.cu:211-228 + auxiliary.h:154)."""
    z = xyz @ world_view[2, :3] + world_view[2, 3]
    return z > NEAR_CLIP


def transform_visible_points(state: GaussianState,
                             not_transformed: jnp.ndarray,
                             diff_R: jnp.ndarray, diff_t: jnp.ndarray,
                             kf_world_view: jnp.ndarray,
                             kf_creation_iter,
                             stable_num_iter_existence: int,
                             scale) -> tuple[GaussianState, jnp.ndarray, jnp.ndarray]:
    """Loop-closure surgery on the points visible from a corrected keyframe
    (gaussian_model.cpp:422-481 + operate_points.cu:93-140): points that are
    (a) not yet transformed this op, (b) unstable (created within
    stable_num_iter_existence of the KF), and (c) in the KF frustum get
    p <- diff_R @ (s*p) + diff_t and composed rotations; xyz/rotation
    moments reset. Returns (state, updated not_transformed mask, count)."""
    p = state.params
    unstable = jnp.abs(state.exist_since - kf_creation_iter) < \
        stable_num_iter_existence
    visible = mark_visible(p.xyz, kf_world_view)
    m = not_transformed & unstable & visible & state.valid

    xyz_new = (scale * p.xyz) @ diff_R.T + diff_t
    rot_new = rotmat_to_quat(
        diff_R[None] @ quat_to_rotmat(normalize_quat(p.rotation)))
    params = p.replace(
        xyz=jnp.where(m[:, None], xyz_new, p.xyz),
        rotation=jnp.where(m[:, None], rot_new, p.rotation),
        # a Sim(3)-rescaled region rescales its gaussian extents too
        # (log-scale shift; no-op at the reference's rigid scale == 1)
        scaling=jnp.where(m[:, None], p.scaling + jnp.log(scale),
                          p.scaling))
    adam_m = state.adam_m.replace(
        xyz=jnp.where(m[:, None], 0.0, state.adam_m.xyz),
        rotation=jnp.where(m[:, None], 0.0, state.adam_m.rotation))
    adam_v = state.adam_v.replace(
        xyz=jnp.where(m[:, None], 0.0, state.adam_v.xyz),
        rotation=jnp.where(m[:, None], 0.0, state.adam_v.rotation))
    n = jnp.sum(m.astype(jnp.int32))
    return (state.replace(params=params, adam_m=adam_m, adam_v=adam_v),
            not_transformed & ~m, n)
