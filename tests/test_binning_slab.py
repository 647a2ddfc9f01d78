"""bin_gaussians vs a brute-force numpy oracle.

The span-slab prefix (binning._slab_combos + the lax.switch in
bin_gaussians) must be invisible: whichever subgrid branch the data
selects, the emitted (tile, depth-rank) pair set equals the full
enumeration over the static span caps. The xla-vs-pallas render parity
tests share compute_binning, so a binning bug would cancel out there —
this oracle is independent. Scenes are chosen to hit different branches:
all-tiny spans, tall span-y outliers (full-height column combos), and
cap-saturating giants (the full grid)."""
import jax.numpy as jnp
import numpy as np
import pytest

from legslam_tpu.config import RasterizeConfig
from legslam_tpu.ops.binning import _slab_combos, bin_gaussians
from legslam_tpu.ops.projection import preprocess
from legslam_tpu.utils.camera import CameraView
from legslam_tpu.utils.transforms import normalize_quat

W, H = 256, 128
CFG = RasterizeConfig(tile_h=16, tile_w=128, max_span_x=2, max_span_y=8,
                      chunk=64, max_pairs=1 << 14, backend="pallas")


def _scene(seed, log_scale_lo, log_scale_hi, n=400, tall_frac=0.0):
    rng = np.random.default_rng(seed)
    xyz = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
    xyz[:, 2] = rng.uniform(1.0, 6.0, n).astype(np.float32)
    scales = np.exp(rng.uniform(log_scale_lo, log_scale_hi,
                                (n, 3))).astype(np.float32)
    if tall_frac > 0:
        k = max(int(n * tall_frac), 1)
        scales[:k, 1] *= 20.0  # a few tall outliers stretch span-y
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    valid = np.ones(n, bool)
    valid[-5:] = False
    return xyz, scales, quats, valid


def _oracle(pre, W, H, cfg):
    """Brute-force per-gaussian tile enumeration over the span caps."""
    P = pre.mean2d.shape[0]
    ntx, nty = -(-W // cfg.tile_w), -(-H // cfg.tile_h)
    mask = np.asarray(pre.mask)
    depth = np.where(mask, np.asarray(pre.depth), np.inf)
    order = np.argsort(depth, kind="stable")
    rank_of = np.empty(P, np.int64)
    rank_of[order] = np.arange(P)
    px = np.asarray(pre.mean2d)
    r = np.asarray(pre.radius).astype(np.float64)
    x0 = np.clip(np.floor((px[:, 0] - r) / cfg.tile_w), 0, ntx).astype(int)
    x1 = np.clip(np.floor((px[:, 0] + r + cfg.tile_w - 1) / cfg.tile_w),
                 0, ntx).astype(int)
    y0 = np.clip(np.floor((px[:, 1] - r) / cfg.tile_h), 0, nty).astype(int)
    y1 = np.clip(np.floor((px[:, 1] + r + cfg.tile_h - 1) / cfg.tile_h),
                 0, nty).astype(int)
    keys = []
    for i in range(P):
        if not mask[i] or (x1[i] - x0[i]) * (y1[i] - y0[i]) <= 0:
            continue
        for ty in range(y0[i], min(y1[i], y0[i] + cfg.max_span_y)):
            for tx in range(x0[i], min(x1[i], x0[i] + cfg.max_span_x)):
                keys.append((ty * ntx + tx) * P + rank_of[i])
    keys = np.sort(np.asarray(keys, np.int64))
    gid = order[keys % P]
    tile_of = keys // P
    counts = np.bincount(tile_of, minlength=ntx * nty)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    return keys, gid, starts, counts


@pytest.mark.parametrize("seed,lo,hi,tall", [
    (0, -4.5, -3.0, 0.0),    # tiny spans -> small slab branch
    (1, -4.5, -3.0, 0.02),   # tall outliers -> full-height column branch
    (2, -3.0, -1.2, 0.0),    # big gaussians -> cap-saturating branches
])
def test_binning_matches_oracle(seed, lo, hi, tall):
    xyz, scales, quats, valid = _scene(seed, lo, hi, tall_frac=tall)
    view = CameraView.create(np.eye(3, dtype=np.float32),
                             np.zeros(3, np.float32), W, H,
                             fx=140.0, fy=140.0)
    pre = preprocess(jnp.asarray(xyz), jnp.asarray(scales),
                     normalize_quat(jnp.asarray(quats)), jnp.asarray(valid),
                     view.world_view, view.full_proj, W, H,
                     view.focal_x, view.focal_y, view.tan_fovx,
                     view.tan_fovy)
    b = bin_gaussians(pre, W, H, CFG)

    keys, gid, starts, counts = _oracle(pre, W, H, CFG)
    n = keys.shape[0]
    assert n > 0 and n < CFG.max_pairs
    assert int(b.num_rendered) == n
    np.testing.assert_array_equal(np.asarray(b.pair_gid)[:n], gid)
    assert np.all(np.asarray(b.pair_gid)[n:] == pre.mean2d.shape[0])
    np.testing.assert_array_equal(np.asarray(b.tile_start), starts)
    np.testing.assert_array_equal(np.asarray(b.tile_count), counts)


def test_slab_combos_cover():
    """Every achievable (ky_need, kx_need) has a covering combo, and the
    selected (first) combo is minimal-area among covers."""
    for msy, msx in [(8, 4), (4, 4), (2, 2), (8, 2), (1, 1)]:
        combos = _slab_combos(msy, msx)
        assert combos[-1] == (msy, msx) or (msy, msx) in combos
        areas = [ky * kx for ky, kx in combos]
        assert areas == sorted(areas)
        for ky_need in range(1, msy + 1):
            for kx_need in range(1, msx + 1):
                covers = [(ky, kx) for ky, kx in combos
                          if ky >= ky_need and kx >= kx_need]
                assert covers, (msy, msx, ky_need, kx_need)
