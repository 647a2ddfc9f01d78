"""Offline estimate of the fwd kernel's early-termination tail.

Replays the Pallas forward kernel's termination rule (while max over the
tile's pixels of log T >= log(1e-4): process next chunk) in numpy over the
bench scene's binning, and reports:

  - chunk-steps actually processed vs chunk-steps if no termination,
  - the live-pair fraction (pairs at positions before the per-tile
    termination watermark) — the upper bound on what a termination-aware
    pair trim could cut from the row-rate gather/scatter engine.

Runs on CPU (bypasses the axon tunnel): PROF_W/PROF_H control the frame.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from legslam_tpu.config import (ALPHA_MAX, ALPHA_MIN,  # noqa: E402
                                RasterizeConfig, T_TERMINATE)


def main():
    from bench import steady_state_scale_clamp
    from legslam_tpu.models import gaussians as G
    from legslam_tpu.ops.projection import preprocess as _pp
    from legslam_tpu.ops.rasterize import compute_binning
    from legslam_tpu.utils.camera import CameraView
    from legslam_tpu.utils.transforms import normalize_quat

    width = int(os.environ.get("PROF_W", "640"))
    height = int(os.environ.get("PROF_H", "480"))
    n_points = 200_000
    capacity = 1 << 18
    chunk = 256
    cfg = RasterizeConfig(tile_h=16, tile_w=128, max_span_x=4, max_span_y=8,
                          chunk=chunk, backend="pallas", max_pairs=1 << 20,
                          mm_dtype="bfloat16")
    rng = np.random.default_rng(0)
    pts = rng.uniform(-3, 3, size=(n_points, 3)).astype(np.float32)
    pts[:, 2] = rng.uniform(0.5, 8.0, size=n_points).astype(np.float32)
    cols = rng.uniform(size=(n_points, 3)).astype(np.float32)
    st = G.create_from_pcd(pts, cols, capacity=capacity)
    st = steady_state_scale_clamp(st, pts, fx=600.0)
    # opacity model knob: "init" keeps inverse_sigmoid(0.1); "trained"
    # samples a converged-store-like bimodal distribution (most surface
    # gaussians train toward ~1, a low-opacity tail survives above the
    # 0.02 prune bound)
    opmodel = os.environ.get("OPACITY_MODEL", "init")
    if opmodel == "derived":
        from bench import steady_state_opacity
        st = steady_state_opacity(st, rng)
    elif opmodel != "init":
        frac_hi = float(opmodel)  # e.g. 0.7 => 70% high-opacity
        u = rng.uniform(size=capacity).astype(np.float32)
        hi = rng.uniform(0.55, 0.995, size=capacity).astype(np.float32)
        lo = rng.uniform(0.02, 0.55, size=capacity).astype(np.float32)
        op_t = np.where(u < frac_hi, hi, lo)
        inv = np.log(op_t / (1.0 - op_t)).astype(np.float32)
        st = st.replace(params=st.params.replace(
            opacity=jnp.asarray(inv[:, None])))
    view = CameraView.create(np.eye(3, dtype=np.float32),
                             np.zeros(3, np.float32), width, height,
                             fx=600.0, fy=600.0)
    opac = jax.nn.sigmoid(st.params.opacity[:, 0])
    binning = compute_binning(
        st.params.xyz, jnp.exp(st.params.scaling), st.params.rotation,
        st.valid, view.world_view, view.full_proj, view.tan_fovx,
        view.tan_fovy, width=width, height=height, cfg=cfg,
        max_per_tile=2048, opacity=opac)[0]
    pre = _pp(st.params.xyz, jnp.exp(st.params.scaling),
              normalize_quat(st.params.rotation), st.valid, view.world_view,
              view.full_proj, width, height, 600.0, 600.0, view.tan_fovx,
              view.tan_fovy, 1.0)

    ntx = -(-width // cfg.tile_w)
    nty = -(-height // cfg.tile_h)
    ntiles = ntx * nty
    gid = np.array(binning.pair_gid)
    start = np.array(binning.tile_start)
    count = np.array(binning.tile_count)
    nvalid = int(binning.num_rendered)
    mean2d = np.array(pre.mean2d)
    conic = np.array(pre.conic)
    op = np.array(opac)
    P = mean2d.shape[0]
    log_term = np.log(T_TERMINATE)

    tot_chunks_noterm = 0
    tot_chunks_term = 0
    live_pairs = 0
    total_pairs = 0
    for t in range(ntiles):
        s, c = int(start[t]), int(count[t])
        s = min(s, len(gid))
        c = min(c, len(gid) - s)
        if c <= 0:
            continue
        total_pairs += c
        base0 = (s // chunk) * chunk
        n_chunks = (s + c - base0 + chunk - 1) // chunk
        tot_chunks_noterm += n_chunks
        tx = (t % ntx) * cfg.tile_w
        ty = (t // ntx) * cfg.tile_h
        xs = tx + np.arange(cfg.tile_w, dtype=np.float32)
        ys = ty + np.arange(cfg.tile_h, dtype=np.float32)
        pxg, pyg = np.meshgrid(xs, ys)
        px = pxg.reshape(-1, 1)
        py = pyg.reshape(-1, 1)
        log_t = np.zeros((px.shape[0], 1), np.float32)
        k_fin = 0
        for k in range(n_chunks):
            if log_t.max() < log_term:
                break
            k_fin = k + 1
            off = base0 + k * chunk
            idx = np.arange(off, off + chunk)
            in_range = (idx >= s) & (idx < s + c)
            g = gid[np.minimum(idx, len(gid) - 1)]
            g = np.where(g >= P, 0, g)
            o = np.where(in_range, op[g], 0.0).astype(np.float32)
            gx = mean2d[g, 0][None, :]
            gy = mean2d[g, 1][None, :]
            ca = conic[g, 0][None, :]
            cb = conic[g, 1][None, :]
            cc = conic[g, 2][None, :]
            dx = gx - px
            dy = gy - py
            power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
            alpha = np.minimum(o[None, :] * np.exp(power), ALPHA_MAX)
            keep = (power <= 0.0) & (alpha >= ALPHA_MIN)
            alpha = np.where(keep, alpha, 0.0)
            log_t = log_t + np.log1p(-alpha).sum(axis=1, keepdims=True)
        tot_chunks_term += k_fin
        live_end = min(base0 + k_fin * chunk, s + c)
        live_pairs += max(live_end - s, 0)

    print(dict(width=width, height=height, nvalid=nvalid,
               total_pairs=total_pairs,
               chunks_no_term=tot_chunks_noterm,
               chunks_with_term=tot_chunks_term,
               chunk_frac=round(tot_chunks_term / max(tot_chunks_noterm, 1),
                                4),
               live_pairs=live_pairs,
               live_frac=round(live_pairs / max(total_pairs, 1), 4)))


if __name__ == "__main__":
    main()
