"""Compact-before-sort binning (pallas backend fast path).

When the pair-emission buffer (P * span, ~90% sentinels) exceeds
cfg.max_pairs, bin_gaussians compacts valid pairs with a stable
cumsum+scatter before sorting, shrinking the sort ~8x (measured 89 -> ~40 ms
at bench scale). Semantics: identical to the full sort when everything
fits; under overflow, pairs are dropped in depth order (farthest first)
rather than by tile index.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from legslam_tpu.config import RasterizeConfig
from legslam_tpu.ops.binning import bin_gaussians
from legslam_tpu.ops.projection import preprocess
from legslam_tpu.utils.camera import CameraView
from legslam_tpu.utils.transforms import normalize_quat

W, H = 256, 128


@pytest.fixture(scope="module")
def pre():
    rng = np.random.default_rng(0)
    P = 1024
    xyz = rng.uniform(-2, 2, (P, 3)).astype(np.float32)
    xyz[:, 2] += 5
    sc = np.exp(rng.uniform(-3, -1.5, (P, 3))).astype(np.float32)
    q = normalize_quat(jnp.asarray(rng.normal(size=(P, 4)).astype(np.float32)))
    w2c = np.eye(4, dtype=np.float32)
    view = CameraView.create(w2c[:3, :3], w2c[:3, 3], W, H, fx=120.0,
                             fy=120.0)
    return preprocess(jnp.asarray(xyz), jnp.asarray(sc), q,
                      jnp.ones(P, bool), view.world_view, view.full_proj,
                      W, H, 120.0, 120.0, view.tan_fovx, view.tan_fovy, 1.0)


def _cfg(backend, max_pairs):
    return RasterizeConfig(tile_h=16, tile_w=128, max_span_x=2,
                           max_span_y=6, chunk=64, backend=backend,
                           max_pairs=max_pairs)


def test_compact_matches_full_sort(pre):
    # emission 12288 > max_pairs 4096 triggers compaction; num_valid ~2.9k
    # fits, so results must equal the xla path's full sort exactly
    bc = bin_gaussians(pre, W, H, _cfg("pallas", 4096))
    bf = bin_gaussians(pre, W, H, _cfg("xla", 4096))
    nv = int(bf.num_rendered)
    assert nv < 4096
    assert np.array_equal(np.asarray(bc.pair_gid[:nv]),
                          np.asarray(bf.pair_gid[:nv]))
    assert np.array_equal(np.asarray(bc.tile_count),
                          np.asarray(bf.tile_count))
    assert int(bc.num_rendered) == nv


def test_overflow_drops_deepest(pre):
    b = bin_gaussians(pre, W, H, _cfg("pallas", 2048))
    assert int(b.num_rendered) > 2048       # genuinely overflowing
    assert int(b.tile_count.sum()) == 2048  # buffer exactly full
    # kept pairs come from the shallowest depth ranks (emission order is
    # rank-major): every kept gid must sit in the front of the depth order
    order = np.asarray(b.order)
    rank_of = {int(g): i for i, g in enumerate(order)}
    ranks = np.array([rank_of[int(g)] for g in np.asarray(b.pair_gid)])
    assert ranks.max() < len(order) * 0.75
    starts = np.asarray(b.tile_start)
    assert (starts[1:] >= starts[:-1]).all()
