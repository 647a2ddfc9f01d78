"""Termination-aware binning trim (ops/binning.trim_binning).

The forward compositing kernel's per-tile T<1e-4 termination watermark
(`kfin`, forward.cu:353-357 semantics) bounds the pairs that can ever
contribute color or gradient at the measured state; trim_binning compacts
each tile's range to that prefix (+slack) so the row-rate-bound pair
engine and both kernels skip the dead tail on cached-binning reuse steps.

1. numpy oracle for the sort-free segment-affine compaction itself;
2. e2e: pallas render (interpret) with emit_kfin -> trim -> re-render
   composites the identical contributing-pair set (outputs/grads agree to
   f32-reassociation tolerance — compaction shifts chunk boundaries) while
   actually removing pairs;
3. the mapper integration (refresh step trims its cache entry).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from legslam_tpu.config import RasterizeConfig
from legslam_tpu.ops.binning import Binning, trim_binning
from legslam_tpu.ops.rasterize import compute_binning, render_arrays

from .util import random_scene, simple_view


def _oracle_trim(tile_start, tile_count, pair_gid, kfin, max_pairs, chunk,
                 slack, P):
    start = np.minimum(tile_start, max_pairs)
    end = np.minimum(tile_start + tile_count, max_pairs)
    gid_out, starts, counts = [], [], []
    for t in range(len(tile_start)):
        base0 = (start[t] // chunk) * chunk
        live_end = min(end[t], base0 + (kfin[t] + slack) * chunk)
        cnt = max(int(live_end - start[t]), 0)
        starts.append(len(gid_out))
        counts.append(cnt)
        gid_out.extend(pair_gid[start[t]:start[t] + cnt])
    gid = np.full(len(pair_gid), P, np.int32)
    gid[:len(gid_out)] = gid_out
    return (np.asarray(starts, np.int32), np.asarray(counts, np.int32),
            gid, len(gid_out))


@pytest.mark.parametrize("npair,ntiles,chunk,seed", [
    (128, 7, 8, 0),     # npair % 64 == 0 -> chunked gather path
    (100, 5, 16, 1),    # npair % 64 != 0 -> single-chunk path
    (256, 12, 8, 2),    # with zero-count tiles + full-keep tiles
])
def test_trim_matches_oracle(npair, ntiles, chunk, seed):
    rng = np.random.default_rng(seed)
    P = 64
    counts = rng.integers(0, 2 * chunk + 5, size=ntiles)
    if seed == 2:
        counts[::3] = 0  # force zero-count tiles sharing a start
    total = int(counts.sum())
    assert total <= npair
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int64)
    pair_gid = np.full(npair, P, np.int32)
    pair_gid[:total] = rng.integers(0, P, size=total)
    max_chunks = -(-int(counts.max() or 1) // chunk) + 1
    kfin = rng.integers(0, max_chunks + 1, size=ntiles).astype(np.int32)

    b = Binning(order=jnp.arange(P, dtype=jnp.int32),
                pair_gid=jnp.asarray(pair_gid),
                tile_start=jnp.asarray(starts, jnp.int32),
                tile_count=jnp.asarray(counts, jnp.int32),
                num_rendered=jnp.asarray(total, jnp.int32),
                span_overflow=jnp.asarray(0, jnp.int32))
    t = trim_binning(b, jnp.asarray(kfin), max_pairs=npair, chunk=chunk,
                     slack_chunks=1)
    os_, oc, og, ototal = _oracle_trim(starts, counts, pair_gid, kfin,
                                       npair, chunk, 1, P)
    assert int(t.num_rendered) == ototal
    np.testing.assert_array_equal(np.asarray(t.tile_start), os_)
    np.testing.assert_array_equal(np.asarray(t.tile_count), oc)
    np.testing.assert_array_equal(np.asarray(t.pair_gid), og)


CFG_P = RasterizeConfig(tile_h=16, tile_w=128, max_span_x=3, max_span_y=8,
                        chunk=32, tile_batch=4, backend="pallas",
                        max_pairs=4096, pallas_interpret=True)


def _opaque_scene(rng, n=300, capacity=384, n_blanket=12):
    """Random cloud behind a layer of huge opaque 'blanket' gaussians: the
    blankets (closest in depth, composited first) drive EVERY pixel past
    T<1e-4, so the cloud behind them is dead tail the watermark cuts."""
    scene = random_scene(rng, n=n, capacity=capacity, spread=0.5)
    scene["opacity"] = np.clip(
        rng.uniform(0.7, 0.95, size=capacity), 0, 1).astype(np.float32)
    m, s, o = (scene["means3d"], scene["scales"], scene["opacity"])
    m[:n_blanket] = rng.uniform(-0.3, 0.3, (n_blanket, 3))
    m[:n_blanket, 2] = np.linspace(0.9, 1.1, n_blanket)  # in front
    s[:n_blanket] = 0.6   # radius ~ 3*0.6*120/1 px: covers the frame
    o[:n_blanket] = 0.999
    return scene


def test_trim_render_exact_at_measured_state(rng):
    scene = _opaque_scene(rng)
    view = simple_view(width=128, height=48)
    bg = jnp.asarray([0.2, 0.1, 0.3])
    W, H = 128, 48

    binning = compute_binning(
        jnp.asarray(scene["means3d"]), jnp.asarray(scene["scales"]),
        jnp.asarray(scene["quats"]), jnp.asarray(scene["valid"]),
        view.world_view, view.full_proj, view.tan_fovx, view.tan_fovy,
        width=W, height=H, cfg=CFG_P, max_per_tile=512,
        opacity=jnp.asarray(scene["opacity"]))

    def render(b, means, op, emit=False):
        return render_arrays(
            means, jnp.asarray(scene["sh"]), jnp.asarray(scene["lang_feat"]),
            op, jnp.asarray(scene["scales"]), jnp.asarray(scene["quats"]),
            jnp.asarray(scene["valid"]), view.world_view, view.full_proj,
            view.cam_center, view.tan_fovx, view.tan_fovy, W, H, bg,
            3, CFG_P, max_per_tile=512, binning=b, emit_kfin=emit)

    means = jnp.asarray(scene["means3d"])
    op = jnp.asarray(scene["opacity"])
    out0 = render(binning, means, op, emit=True)
    assert out0.kfin is not None and out0.kfin.shape == (1 * 3,)

    trimmed = trim_binning(binning[0], out0.kfin, max_pairs=CFG_P.max_pairs,
                           chunk=CFG_P.chunk, slack_chunks=1)
    # the dense opaque scene must terminate early somewhere
    assert int(trimmed.num_rendered) < int(binning[0].num_rendered)

    out1 = render((trimmed, binning[1]), means, op)
    np.testing.assert_allclose(np.asarray(out1.color),
                               np.asarray(out0.color), atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out1.final_t),
                               np.asarray(out0.final_t), atol=1e-5,
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out1.depth),
                               np.asarray(out0.depth), atol=1e-4, rtol=1e-5)

    target = jnp.asarray(rng.uniform(size=(H, W, 3)), jnp.float32)

    def loss(m, o, b):
        out = render(b, m, o)
        return jnp.mean(jnp.abs(out.color - target)) + 0.1 * jnp.mean(
            out.depth * out.final_t)

    g0 = jax.grad(loss, argnums=(0, 1))(means, op, binning)
    g1 = jax.grad(loss, argnums=(0, 1))(means, op, (trimmed, binning[1]))
    for a, b, name in zip(g1, g0, ("means", "opacity")):
        assert np.isfinite(np.asarray(a)).all(), name
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5,
                                   rtol=1e-3, err_msg=name)


def test_trim_staleness_converges(rng):
    """Trim introduces a staleness mode the plain cache doesn't have:
    pairs behind an occluder stay trimmed between refreshes even as the
    occluder's opacity fades under optimization. At mapping LRs the
    occluder can't fade far in one refresh group, so training with a
    trimmed cache must track the exact path closely (the analogue of
    tests/test_binning_cache.py::test_stale_cache_converges)."""
    from legslam_tpu.config import OptimizationParams
    from legslam_tpu.mapper.train_step import train_step
    from legslam_tpu.models import gaussians as G

    W, H = 128, 48
    view = simple_view(width=W, height=H)
    scene = _opaque_scene(rng, n=300, capacity=512)
    st = G.create_from_pcd(scene["means3d"][:300],
                           np.clip(scene["sh"][:300, 0] * 0.28 + 0.5, 0, 1),
                           capacity=512)
    # carry the opaque-blanket opacities/scales into the param store
    # (create_from_pcd inits opacity at 0.1 — nothing would terminate)
    op_logit = np.log(scene["opacity"] / (1 - scene["opacity"]))
    st = st.replace(params=st.params.replace(
        opacity=jnp.asarray(op_logit[:, None], jnp.float32),
        scaling=jnp.asarray(np.log(scene["scales"]), jnp.float32),
        rotation=jnp.asarray(scene["quats"], jnp.float32)))
    opt = OptimizationParams()
    gt_c = jnp.asarray(rng.uniform(size=(H, W, 3)), jnp.float32)
    gt_d = jnp.asarray(rng.uniform(1, 6, size=(H, W)), jnp.float32)
    mask = jnp.ones((H, W), jnp.float32)

    def step(s, binning=None, i=1.0, emit=False):
        return train_step(
            s, view.world_view, view.full_proj, view.cam_center,
            view.tan_fovx, view.tan_fovy, gt_c, None, gt_d, mask,
            jnp.zeros(3), jnp.asarray(i), 1.0, width=W, height=H,
            active_sh_degree=0, opt=opt, cfg=CFG_P,
            include_lang_feat=False, max_per_tile=512, binning=binning,
            emit_kfin=emit)

    def binning_of(s):
        return compute_binning(
            s.params.xyz, jnp.exp(s.params.scaling), s.params.rotation,
            s.valid, view.world_view, view.full_proj, view.tan_fovx,
            view.tan_fovy, width=W, height=H, cfg=CFG_P, max_per_tile=512,
            opacity=jax.nn.sigmoid(s.params.opacity[:, 0]))

    refresh = 4
    st_exact = st_trim = st
    b = None
    losses_exact, losses_trim = [], []
    trimmed_any = False
    for i in range(2 * refresh):
        st_exact, aux = step(st_exact, i=float(i))
        losses_exact.append(float(aux.loss))
        if i % refresh == 0:
            b = binning_of(st_trim)
            st_trim, auxt = step(st_trim, binning=b, i=float(i), emit=True)
            tb = trim_binning(b[0], auxt.kfin, max_pairs=CFG_P.max_pairs,
                              chunk=CFG_P.chunk, slack_chunks=1)
            trimmed_any |= int(tb.num_rendered) < int(b[0].num_rendered)
            b = (tb, b[1])
        else:
            st_trim, auxt = step(st_trim, binning=b, i=float(i))
        losses_trim.append(float(auxt.loss))
    assert trimmed_any, "opaque scene never trimmed anything"
    assert losses_trim[-1] < losses_trim[0]
    assert abs(losses_trim[-1] - losses_exact[-1]) < \
        0.05 * abs(losses_exact[-1]) + 1e-3, (losses_exact, losses_trim)


def test_trim_fresh_staleness_converges(rng):
    """Pre-trimming the REFRESH step at the previous group's watermark
    (+1 extra slack chunk) adds one group of staleness on top of the
    reuse-step trim: the group-leading step composites inside last
    group's live set instead of re-measuring from the full pair set. At
    mapping LRs the live set drifts by well under a chunk per group, so
    training must still track the exact path closely."""
    from legslam_tpu.config import OptimizationParams
    from legslam_tpu.mapper.train_step import train_step
    from legslam_tpu.models import gaussians as G

    W, H = 128, 48
    view = simple_view(width=W, height=H)
    scene = _opaque_scene(rng, n=300, capacity=512)
    st = G.create_from_pcd(scene["means3d"][:300],
                           np.clip(scene["sh"][:300, 0] * 0.28 + 0.5, 0, 1),
                           capacity=512)
    op_logit = np.log(scene["opacity"] / (1 - scene["opacity"]))
    st = st.replace(params=st.params.replace(
        opacity=jnp.asarray(op_logit[:, None], jnp.float32),
        scaling=jnp.asarray(np.log(scene["scales"]), jnp.float32),
        rotation=jnp.asarray(scene["quats"], jnp.float32)))
    opt = OptimizationParams()
    gt_c = jnp.asarray(rng.uniform(size=(H, W, 3)), jnp.float32)
    gt_d = jnp.asarray(rng.uniform(1, 6, size=(H, W)), jnp.float32)
    mask = jnp.ones((H, W), jnp.float32)

    def step(s, binning=None, i=1.0, emit=False):
        return train_step(
            s, view.world_view, view.full_proj, view.cam_center,
            view.tan_fovx, view.tan_fovy, gt_c, None, gt_d, mask,
            jnp.zeros(3), jnp.asarray(i), 1.0, width=W, height=H,
            active_sh_degree=0, opt=opt, cfg=CFG_P,
            include_lang_feat=False, max_per_tile=512, binning=binning,
            emit_kfin=emit)

    def binning_of(s):
        return compute_binning(
            s.params.xyz, jnp.exp(s.params.scaling), s.params.rotation,
            s.valid, view.world_view, view.full_proj, view.tan_fovx,
            view.tan_fovy, width=W, height=H, cfg=CFG_P, max_per_tile=512,
            opacity=jax.nn.sigmoid(s.params.opacity[:, 0]))

    refresh, groups = 4, 3
    st_exact = st_trim = st
    b, kfin = None, None
    losses_exact, losses_trim = [], []
    pretrimmed_any = False
    for i in range(groups * refresh):
        st_exact, aux = step(st_exact, i=float(i))
        losses_exact.append(float(aux.loss))
        if i % refresh == 0:
            b = binning_of(st_trim)
            if kfin is not None:  # the trim-fresh pre-trim
                pb = trim_binning(b[0], kfin, max_pairs=CFG_P.max_pairs,
                                  chunk=CFG_P.chunk, slack_chunks=2)
                pretrimmed_any |= \
                    int(pb.num_rendered) < int(b[0].num_rendered)
                b = (pb, b[1])
            st_trim, auxt = step(st_trim, binning=b, i=float(i), emit=True)
            kfin = auxt.kfin
            tb = trim_binning(b[0], kfin, max_pairs=CFG_P.max_pairs,
                              chunk=CFG_P.chunk, slack_chunks=1)
            b = (tb, b[1])
        else:
            st_trim, auxt = step(st_trim, binning=b, i=float(i))
        losses_trim.append(float(auxt.loss))
    assert pretrimmed_any, "opaque scene never pre-trimmed a refresh step"
    assert losses_trim[-1] < losses_trim[0]
    assert abs(losses_trim[-1] - losses_exact[-1]) < \
        0.05 * abs(losses_exact[-1]) + 1e-3, (losses_exact, losses_trim)


def test_mapper_trim_fresh(monkeypatch, tmp_path):
    """The mapper pre-trims refresh steps at the stored watermark
    (slack_chunks=2 calls), stores each refresh's kfin, and re-measures
    untrimmed once the watermark's age exceeds trim_fresh_max_age."""
    from legslam_tpu.data.synthetic import SyntheticDataset
    from legslam_tpu.mapper import mapper as mapper_mod
    from legslam_tpu.mapper.mapper import GaussianMapper
    from legslam_tpu.slam.trajectory import TrajectoryFrontend
    from legslam_tpu.config import MapperParams, OptimizationParams

    cfg = dataclasses.replace(CFG_P, max_pairs=8192)
    ds = SyntheticDataset(n_frames=4, width=128, height=64,
                          n_gaussians=500, seed=7, clutter_ratio=0.0)
    frontend = TrajectoryFrontend(ds.intrinsics, kf_stride=2,
                                  max_corners=200)
    mapper = GaussianMapper(
        frontend.queue, ds.intrinsics,
        opt=OptimizationParams(densify_from_iter=10 ** 9,
                               opacity_reset_interval=0, iterations=100),
        mp=MapperParams(min_num_initial_map_kfs=2, depth_cache=2),
        cfg=cfg, capacity=1 << 12, result_dir=str(tmp_path),
        max_per_tile=512, include_lang_feat=False,
        binning_refresh_interval=2, binning_trim=True,
        binning_trim_fresh=True)
    mapper.trim_fresh_max_age = 1  # force a full re-measure quickly
    for frame in ds:
        frontend.track(frame)
    frontend.finish()
    mapper.drain_operations()
    mapper.initialize_map()

    slacks = []
    real = mapper_mod._trim_binning_jit

    def spy(b, kfin, **kw):
        slacks.append(kw.get("slack_chunks", 1))
        return real(b, kfin, **kw)

    monkeypatch.setattr(mapper_mod, "_trim_binning_jit", spy)
    losses = []
    for _ in range(10):
        mapper.train_iteration()
        losses.append(float(mapper._last_aux.loss))
    assert np.isfinite(losses).all()
    assert 2 in slacks, f"no pre-trim ran: slacks={slacks}"
    assert mapper._kfin_cache, "watermark store never populated"
    # ages stay bounded by the re-measure guard
    assert all(age <= mapper.trim_fresh_max_age
               for age, _ in mapper._kfin_cache.values())
    # surgery invalidation clears the watermark store too
    mapper._invalidate_binning()
    assert not mapper._kfin_cache


def test_mapper_trims_cached_binning(monkeypatch, tmp_path):
    """The refresh step replaces its cache entry with the trimmed binning,
    reuse steps consume the trimmed object, and training stays finite."""
    from legslam_tpu.data.synthetic import SyntheticDataset
    from legslam_tpu.mapper import mapper as mapper_mod
    from legslam_tpu.mapper.mapper import GaussianMapper
    from legslam_tpu.slam.trajectory import TrajectoryFrontend
    from legslam_tpu.config import MapperParams, OptimizationParams

    cfg = dataclasses.replace(CFG_P, max_pairs=8192)
    ds = SyntheticDataset(n_frames=8, width=128, height=64,
                          n_gaussians=500, seed=7, clutter_ratio=0.0)
    frontend = TrajectoryFrontend(ds.intrinsics, kf_stride=2,
                                  max_corners=200)
    mapper = GaussianMapper(
        frontend.queue, ds.intrinsics,
        opt=OptimizationParams(densify_from_iter=10 ** 9,
                               opacity_reset_interval=0, iterations=100),
        mp=MapperParams(min_num_initial_map_kfs=3, depth_cache=3),
        cfg=cfg, capacity=1 << 12, result_dir=str(tmp_path),
        max_per_tile=512, include_lang_feat=False,
        binning_refresh_interval=4, binning_trim=True)
    for frame in ds:
        frontend.track(frame)
    frontend.finish()
    mapper.drain_operations()
    mapper.initialize_map()

    calls = []
    real = mapper_mod._trim_binning_jit

    def spy(b, kfin, **kw):
        out = real(b, kfin, **kw)
        calls.append((int(b.num_rendered), int(out.num_rendered), out))
        return out

    monkeypatch.setattr(mapper_mod, "_trim_binning_jit", spy)
    losses = []
    for _ in range(8):
        mapper.train_iteration()
        losses.append(float(mapper._last_aux.loss))
    assert np.isfinite(losses).all()
    # trim ran on refresh steps only: <= ceil(8 / refresh) + distinct
    # (kf, level) entries, and every trim output landed in the cache
    assert calls, "trim was never invoked"
    cached = [v[1][0] for v in mapper._binning_cache.values()]
    assert any(any(c is t for c in cached) for _, _, t in calls[-2:])
    for before, after, _ in calls:
        assert after <= before
