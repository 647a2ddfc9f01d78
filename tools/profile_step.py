"""Segment profile of the production mapping step at bench shapes.

Times isolated pieces of the train step (median over PROF_ITERS calls with
a per-call host fetch — block_until_ready alone does not force execution
through the axon tunnel) so perf work targets the real bottleneck:

  binning        the sort-dominated prep pipeline (compute_binning)
  render_fwd     preprocess + pair gathers + forward kernel (cached binning)
  render_grad    value_and_grad of render+loss (adds bwd kernel + scatters)
  loss           mapping_loss fwd+bwd on fixed images
  step_cached    full train_step with a cached binning
  step_fresh     full train_step including binning

Env: PROF_MM_DTYPE (bfloat16), PROF_ITERS (8), PROF_TRACE=dir to also dump
a jax.profiler trace of one step_fresh call, PROF_SMOKE=1 tiny shapes.

Usage: python tools/profile_step.py
"""
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from legslam_tpu.utils.runtime import (enable_compilation_cache,
                                       profile_trace, save_peak_memory)


def median_time(fn, sync, iters):
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn()
        sync(out)
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def pipelined_time(fn, sync, iters, depth):
    """Per-call time with `depth` calls dispatched back-to-back and ONE
    host sync at the end: the axon dispatch latency (~19 ms/call when
    synced per call) overlaps device execution, so this approximates the
    true device time per call — the number that matters inside the
    production mapper, which syncs once per refresh group."""
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = None
        for _ in range(depth):
            out = fn()
        sync(out)
        ts.append((time.perf_counter() - t0) / depth)
    ts.sort()
    return ts[len(ts) // 2]


def main():
    enable_compilation_cache()
    from legslam_tpu.config import OptimizationParams, RasterizeConfig
    from legslam_tpu.mapper.train_step import train_step
    from legslam_tpu.models import gaussians as G
    from legslam_tpu.ops import losses as L
    from legslam_tpu.ops.rasterize import compute_binning, render_arrays
    from legslam_tpu.utils.camera import CameraView

    smoke = os.environ.get("PROF_SMOKE") == "1"
    mm = os.environ.get("PROF_MM_DTYPE", "bfloat16")
    pmode = os.environ.get("PROF_POWER_MODE", "vpu")
    p_slabs = int(os.environ.get("PROF_P_SLABS", "0"))
    iters = int(os.environ.get("PROF_ITERS", "8"))
    chunk = int(os.environ.get("PROF_CHUNK", "256"))
    width, height = (320, 192) if smoke else (1200, 680)
    width = int(os.environ.get("PROF_W", width))
    height = int(os.environ.get("PROF_H", height))
    n_points = 20_000 if smoke else 200_000
    capacity = 1 << (15 if smoke else 18)

    tile_h = int(os.environ.get("PROF_TILE_H", "16"))
    # span caps are in TILES: keep the same pixel coverage per gaussian
    # when the tile height shrinks
    span_y = max(8 * 16 // tile_h, 1)
    cfg = RasterizeConfig(tile_h=tile_h, tile_w=128, max_span_x=4,
                          max_span_y=span_y, chunk=chunk, backend="pallas",
                          max_pairs=1 << (16 if smoke else 20), mm_dtype=mm,
                          power_mode=pmode, p_slabs=p_slabs)
    opt = OptimizationParams()
    rng = np.random.default_rng(0)
    pts = rng.uniform(-3, 3, size=(n_points, 3)).astype(np.float32)
    pts[:, 2] = rng.uniform(0.5, 8.0, size=n_points).astype(np.float32)
    cols = rng.uniform(size=(n_points, 3)).astype(np.float32)
    st = G.create_from_pcd(pts, cols, capacity)
    aniso = float(os.environ.get("PROF_ANISO", "0"))
    if aniso > 0:
        # stretch one scale axis like post-densify split stores (the
        # anisotropic tile-ellipse cull's real operating point; the
        # isotropic knn-init scene underestimates its pair reduction)
        import jax.numpy as _jnp
        stretch = rng.uniform(0.0, aniso, capacity).astype(np.float32)
        sc = st.params.scaling + _jnp.stack(
            [_jnp.asarray(stretch),
             _jnp.zeros(capacity, _jnp.float32),
             _jnp.zeros(capacity, _jnp.float32)], axis=1)
        st = st.replace(params=st.params.replace(scaling=sc))
    # match the bench's steady-state store model (20 px prune bound)
    from bench import steady_state_scale_clamp
    st = steady_state_scale_clamp(st, pts, fx=600.0)
    w2c = np.eye(4, dtype=np.float32)
    view = CameraView.create(w2c[:3, :3], w2c[:3, 3], width, height,
                             fx=600.0, fy=600.0)
    gt_color = jnp.asarray(rng.uniform(size=(height, width, 3)), jnp.float32)
    gt_lf = jnp.asarray(rng.normal(0, 0.5, (height, width, 64)), jnp.float32)
    gt_depth = jnp.asarray(rng.uniform(0.5, 8.0, (height, width)),
                           jnp.float32)
    mask = jnp.ones((height, width), jnp.float32)
    bg = jnp.zeros(3)

    binning_jit = jax.jit(compute_binning,
                          static_argnames=("width", "height", "cfg",
                                           "max_per_tile"))

    def make_binning(s):
        return binning_jit(s.params.xyz, jnp.exp(s.params.scaling),
                           s.params.rotation, s.valid, view.world_view,
                           view.full_proj, view.tan_fovx, view.tan_fovy,
                           width=width, height=height, cfg=cfg,
                           max_per_tile=2048,
                           opacity=jax.nn.sigmoid(s.params.opacity[:, 0]))

    def render(s, binning):
        p = s.params
        sh = jnp.concatenate([p.f_dc, p.f_rest], axis=1)
        return render_arrays(
            p.xyz, sh, p.lang_feat, jax.nn.sigmoid(p.opacity[:, 0]),
            jnp.exp(p.scaling), p.rotation, s.valid, view.world_view,
            view.full_proj, view.cam_center, view.tan_fovx, view.tan_fovy,
            width, height, bg, 3, cfg, binning=binning)

    from legslam_tpu.ops.pallas.composite import (composite_tiles_pallas,
                                                  prepare_pairs)
    from legslam_tpu.ops.projection import preprocess as _pp
    from legslam_tpu.utils.transforms import normalize_quat

    ntx = -(-width // cfg.tile_w)
    nty = -(-height // cfg.tile_h)

    @jax.jit
    def preprocess_only(s):
        p = s.params
        pre = _pp(p.xyz, jnp.exp(p.scaling), normalize_quat(p.rotation),
                  s.valid, view.world_view, view.full_proj, width, height,
                  600.0, 600.0, view.tan_fovx, view.tan_fovy, 1.0)
        return (pre.mean2d[0, 0] + pre.conic[0, 0] + pre.depth[0]
                + pre.radius[0])

    @jax.jit
    def preprocess_grad(s):
        def f(xyz, scaling, rotation):
            pre = _pp(xyz, jnp.exp(scaling), normalize_quat(rotation),
                      s.valid, view.world_view, view.full_proj, width,
                      height, 600.0, 600.0, view.tan_fovx, view.tan_fovy,
                      1.0)
            return jnp.sum(pre.mean2d * 1e-3) + jnp.sum(pre.conic * 1e-3)
        g = jax.grad(f, argnums=(0, 1, 2))(s.params.xyz, s.params.scaling,
                                           s.params.rotation)
        return g[0][0, 0] + g[1][0, 0] + g[2][0, 0]

    @jax.jit
    def pairs_only(s, binning):
        p = s.params
        pre = _pp(p.xyz, jnp.exp(p.scaling), normalize_quat(p.rotation),
                  s.valid, view.world_view, view.full_proj, width, height,
                  600.0, 600.0, view.tan_fovx, view.tan_fovy, 1.0)
        feats = jnp.concatenate(
            [p.f_dc[:, 0], p.lang_feat, pre.depth[:, None]], -1)
        if mm == "bfloat16":
            feats = feats.astype(jnp.bfloat16)
        start, count, geo, pf = prepare_pairs(
            binning[0], pre.mean2d, pre.conic,
            jax.nn.sigmoid(p.opacity[:, 0]), feats, cfg.max_pairs,
            cfg.chunk)
        return start, count, geo, pf

    @jax.jit
    def kernel_only(start, count, geo, pf):
        acc, tfin = composite_tiles_pallas(
            start, count, geo, pf, tile_w=cfg.tile_w, tile_h=cfg.tile_h,
            ntx=ntx, ntiles=ntx * nty, chunk=cfg.chunk, mm_dtype=mm,
            power_mode=pmode)
        return acc[0, 0, 0] + tfin[0, 0, 0]

    from legslam_tpu.ops.pallas.composite_bwd import (
        composite_backward_pallas)

    @jax.jit
    def bwd_kernel_only(start, count, geo, pf, gout, gtfin, tfin, acc):
        dgeo, dfeats = composite_backward_pallas(
            start, count, geo, pf, gout, gtfin, tfin, acc,
            tile_w=cfg.tile_w, tile_h=cfg.tile_h, ntx=ntx,
            ntiles=ntx * nty, chunk=cfg.chunk, mm_dtype=mm,
            power_mode=pmode)
        return dgeo[0, 0] + dfeats[0, 0].astype(jnp.float32)

    @jax.jit
    def scatter_only(gid, gm):
        acc = jnp.zeros((capacity, gm.shape[1]), jnp.float32) \
            .at[gid].add(gm, mode="drop")
        return acc[0, 0]

    @jax.jit
    def render_fwd(s, binning):
        out = render(s, binning)
        return out.color[0, 0, 0] + out.depth[0, 0] + out.lang_feat[0, 0, 0]

    @jax.jit
    def render_grad(s, binning):
        def f(params):
            out = render(s.replace(params=params), binning)
            return L.mapping_loss(out.color, gt_color, out.lang_feat, gt_lf,
                                  out.depth, gt_depth, mask, 0.2)
        val, g = jax.value_and_grad(f)(s.params)
        return val + g.xyz[0, 0]

    from legslam_tpu.mapper.train_step import make_lrs
    from legslam_tpu.models import gaussians as G

    @jax.jit
    def adam_stats_only(s, g, m2, radii):
        s = G.add_densification_stats(s, m2, radii)
        s = G.adam_update(s, g, make_lrs(opt, 1.0, jnp.asarray(0.0)))
        return s.params.xyz[0, 0] + s.stats.grad_accum[0]

    @jax.jit
    def loss_only(c, lf, d):
        def f(c):
            return L.mapping_loss(c, gt_color, lf, gt_lf, d, gt_depth,
                                  mask, 0.2)
        val, g = jax.value_and_grad(f)(c)
        return val + g[0, 0, 0]

    @jax.jit
    def grad_noloss(s, binning):
        # value_and_grad of a trivial contraction of the render outputs:
        # render_grad minus this = the mapping loss's true fwd+bwd
        # marginal inside the fused graph (isolated segments oversum)
        def f(params):
            out = render(s.replace(params=params), binning)
            return (jnp.sum(out.color) * 1e-3
                    + jnp.sum(out.lang_feat) * 1e-4
                    + jnp.sum(out.depth) * 1e-4)
        val, g = jax.value_and_grad(f)(s.params)
        return val + g.xyz[0, 0]

    @jax.jit
    def render_loss_fwd(s, binning):
        # forward-only render + loss: render_grad minus this = the whole
        # backward slice (loss bwd + bwd kernel + scatter + preprocess
        # grad) as actually scheduled
        out = render(s, binning)
        return L.mapping_loss(out.color, gt_color, out.lang_feat, gt_lf,
                              out.depth, gt_depth, mask, 0.2)

    def step(s, binning):
        return train_step(s, view.world_view, view.full_proj,
                          view.cam_center, view.tan_fovx, view.tan_fovy,
                          gt_color, gt_lf, gt_depth, mask, bg,
                          jnp.asarray(0.0), 1.0, width=width, height=height,
                          active_sh_degree=3, opt=opt, cfg=cfg,
                          max_per_tile=2048, binning=binning)

    binning = jax.block_until_ready(make_binning(st))
    rc = jnp.asarray(rng.uniform(size=(height, width, 3)), jnp.float32)
    rlf = jnp.asarray(rng.normal(0, 0.5, (height, width, 64)), jnp.float32)
    rd = jnp.asarray(rng.uniform(0.5, 8.0, (height, width)), jnp.float32)

    segs = {}
    # warmup (compile) everything first
    g_fake = jax.tree.map(lambda x: x * 1e-4, st.params)
    m2_fake = jnp.zeros((capacity, 2), jnp.float32)
    r_fake = jnp.ones((capacity,), jnp.int32)
    float(adam_stats_only(st, g_fake, m2_fake, r_fake))
    float(preprocess_only(st))
    float(preprocess_grad(st))
    pp_out = jax.block_until_ready(pairs_only(st, binning))
    float(kernel_only(*pp_out))
    npix = cfg.tile_h * cfg.tile_w
    c_out = pp_out[3].shape[1]
    gout_f = jnp.ones((ntx * nty, npix, c_out), jnp.float32) * 1e-3
    g1_f = jnp.ones((ntx * nty, npix, 1), jnp.float32)
    float(bwd_kernel_only(*pp_out, gout_f, g1_f * 1e-3, g1_f * 0.5,
                          gout_f))
    gid_f = jnp.asarray(rng.integers(0, n_points, cfg.max_pairs), jnp.int32)
    gm_f = jnp.asarray(rng.normal(size=(cfg.max_pairs, 136)), jnp.float32)
    float(scatter_only(gid_f, gm_f))
    float(render_fwd(st, binning))
    float(render_grad(st, binning))
    float(grad_noloss(st, binning))
    float(render_loss_fwd(st, binning))
    float(loss_only(rc, rlf, rd))
    s2, aux = step(st, binning)
    float(aux.loss)
    s3, aux = step(st, None)
    float(aux.loss)

    depth = int(os.environ.get("PROF_PIPELINE", "0"))
    if depth > 1:
        timer = functools.partial(pipelined_time, depth=depth)
    else:
        timer = median_time

    fetch = lambda x: float(x)  # noqa: E731
    segs["binning"] = timer(
        lambda: make_binning(st), lambda b: int(b[0].num_rendered), iters)
    segs["preprocess"] = timer(
        lambda: preprocess_only(st), fetch, iters)
    segs["preprocess_grad"] = timer(
        lambda: preprocess_grad(st), fetch, iters)
    segs["pair_gathers"] = timer(
        lambda: pairs_only(st, binning), lambda o: float(o[2][0, 0]), iters)
    segs["fwd_kernel"] = timer(
        lambda: kernel_only(*pp_out), fetch, iters)
    segs["bwd_kernel"] = timer(
        lambda: bwd_kernel_only(*pp_out, gout_f, g1_f * 1e-3, g1_f * 0.5,
                                gout_f), fetch, iters)
    segs["scatter"] = timer(
        lambda: scatter_only(gid_f, gm_f), fetch, iters)
    segs["render_fwd"] = timer(
        lambda: render_fwd(st, binning), fetch, iters)
    segs["render_grad"] = timer(
        lambda: render_grad(st, binning), fetch, iters)
    segs["grad_noloss"] = timer(
        lambda: grad_noloss(st, binning), fetch, iters)
    segs["render_loss_fwd"] = timer(
        lambda: render_loss_fwd(st, binning), fetch, iters)
    segs["loss"] = timer(lambda: loss_only(rc, rlf, rd), fetch, iters)
    segs["adam_stats"] = timer(
        lambda: adam_stats_only(st, g_fake, m2_fake, r_fake), fetch, iters)
    segs["step_cached"] = timer(
        lambda: step(st, binning), lambda o: float(o[1].loss), iters)
    segs["step_fresh"] = timer(
        lambda: step(st, None), lambda o: float(o[1].loss), iters)

    trace_dir = os.environ.get("PROF_TRACE")
    if trace_dir:
        with profile_trace(trace_dir):
            _, aux = step(st, None)
            float(aux.loss)
        save_peak_memory(os.path.join(trace_dir, "TpuPeakUsageMB.txt"))

    print(json.dumps(dict(
        mm_dtype=mm, power_mode=pmode, chunk=chunk, tile_h=cfg.tile_h,
        width=width, height=height,
        n_points=n_points,
        num_rendered=int(binning[0].num_rendered),
        segments_ms={k: round(v * 1e3, 1) for k, v in segs.items()})))


if __name__ == "__main__":
    main()
