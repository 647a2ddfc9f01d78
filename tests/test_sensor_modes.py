"""Sensor modes beyond RGB-D (gaussian_mapper.cpp:1253-1492): SGM stereo
disparity, the monocular depth-borrow densify branch, and both branches
wired through the mapper's inactive-geometry cache."""
import numpy as np
import pytest

import jax.numpy as jnp

from legslam_tpu.config import MapperParams, RasterizeConfig
from legslam_tpu.ops import stereo as S

H, W = 96, 160
FX = FY = 80.0
CX, CY = W / 2 - 0.5, H / 2 - 0.5


@pytest.fixture(scope="module")
def textured_pair():
    """Left image + right image shifted by a constant true disparity."""
    rng = np.random.default_rng(0)
    base = rng.uniform(size=(H, W // 8 + 8))
    # smooth but textured: upsample random low-res noise
    import jax.image
    left = np.asarray(jax.image.resize(base, (H, (W // 8 + 8) * 8),
                                       method="linear"))[:, :W]
    left = (left - left.min()) / (left.max() - left.min())
    D = 12
    right = np.roll(left, -D, axis=1)
    return left.astype(np.float32), right.astype(np.float32), D


def test_sgm_recovers_constant_disparity(textured_pair):
    left, right, D = textured_pair
    disp = np.asarray(S.sgm_disparity(jnp.asarray(left), jnp.asarray(right),
                                      num_disp=32, min_disp=2))
    # interior pixels (away from the wrap-around band and borders)
    inner = disp[8:-8, 40:-20]
    valid = inner[inner > 0]
    assert valid.size > 0.8 * inner.size
    assert abs(np.median(valid) - D) < 1.0, np.median(valid)


def test_census_transform_properties():
    rng = np.random.default_rng(1)
    img = rng.uniform(size=(16, 24)).astype(np.float32)
    c = np.asarray(S.census_transform(jnp.asarray(img)))
    assert c.dtype == np.uint32
    # identical images -> identical censuses -> zero hamming cost
    c2 = np.asarray(S.census_transform(jnp.asarray(img)))
    np.testing.assert_array_equal(c, c2)
    # constant image -> all zero bits (no neighbor strictly darker)
    c0 = np.asarray(S.census_transform(jnp.ones((8, 8), jnp.float32)))
    assert (c0 == 0).all()


def test_stereo_densify_backprojects_keypoints(textured_pair):
    left, right, D = textured_pair
    rgb_l = np.repeat(left[..., None], 3, -1)
    rgb_r = np.repeat(right[..., None], 3, -1)
    kps = np.stack(np.meshgrid(np.arange(48, W - 24, 8),
                               np.arange(12, H - 12, 8)), -1) \
        .reshape(-1, 2).astype(np.float32)
    baseline = 0.1
    pts, cols, ok = S.stereo_inactive_geo_densify(
        jnp.asarray(rgb_l), jnp.asarray(rgb_r), jnp.asarray(kps),
        FX, FY, CX, CY, baseline, num_disp=32, min_disp=2)
    pts, ok = np.asarray(pts), np.asarray(ok)
    assert ok.sum() > 0.7 * len(kps)
    z_expect = FX * baseline / D
    z = pts[ok, 2]
    assert abs(np.median(z) - z_expect) < 0.15 * z_expect


def test_mapper_stereo_branch(textured_pair):
    from legslam_tpu.mapper.mapper import GaussianMapper
    from legslam_tpu.slam.interface import KeyframePacket, OperationQueue
    left, right, D = textured_pair
    intr = dict(width=W, height=H, fx=FX, fy=FY, cx=CX, cy=CY,
                stereo_baseline=0.1)
    m = GaussianMapper(OperationQueue(), intr, capacity=1 << 10,
                       sensor_type="stereo",
                       mp=MapperParams(depth_cache=1,
                                       min_num_inactive_geo_densify=5,
                                       stereo_num_disparity=32,
                                       stereo_min_disparity=2))
    kps = np.stack(np.meshgrid(np.arange(48, W - 24, 8),
                               np.arange(12, H - 12, 8)), -1) \
        .reshape(-1, 2).astype(np.float32)
    pkt = KeyframePacket(
        fid=0, timestamp=0.0, R=np.eye(3, dtype=np.float32),
        t=np.zeros(3, np.float32),
        color=np.repeat(left[..., None], 3, -1),
        depth=None, lf_image=None,
        color_right=np.repeat(right[..., None], 3, -1),
        kp_pixels=kps,
        kp_points_local=np.full((len(kps), 3), -1, np.float32))
    m._ingest_keyframe(pkt)
    # depth_cache=1 -> flushed into pending points (state is None)
    assert m._pending_points or m._depth_cache
    pts = m._pending_points[0][0] if m._pending_points else \
        m._depth_cache[0][0]
    z_expect = FX * 0.1 / D
    assert abs(np.median(pts[:, 2]) - z_expect) < 0.3 * z_expect


def test_mapper_mono_branch():
    from legslam_tpu.mapper.mapper import GaussianMapper
    from legslam_tpu.slam.interface import KeyframePacket, OperationQueue
    intr = dict(width=W, height=H, fx=FX, fy=FY, cx=CX, cy=CY)
    m = GaussianMapper(OperationQueue(), intr, capacity=1 << 10,
                       sensor_type="monocular",
                       mp=MapperParams(depth_cache=1,
                                       min_num_inactive_geo_densify=2,
                                       mono_max_pixel_dist=3.0))
    # keypoint pairs 2px apart; one of each pair has depth
    kps, local = [], []
    for i in range(20):
        x, y = 20 + 6 * i, 40.0
        kps += [[x, y], [x + 2, y]]
        z = 2.0 + 0.05 * i
        local += [[(x - CX) / FX * z, (y - CY) / FY * z, z], [-1, -1, -1]]
    pkt = KeyframePacket(
        fid=0, timestamp=0.0, R=np.eye(3, dtype=np.float32),
        t=np.zeros(3, np.float32),
        color=np.full((H, W, 3), 0.5, np.float32), depth=None,
        lf_image=None, kp_pixels=np.asarray(kps, np.float32),
        kp_points_local=np.asarray(local, np.float32))
    m._ingest_keyframe(pkt)
    assert m._pending_points or m._depth_cache
    pts = m._pending_points[0][0] if m._pending_points else \
        m._depth_cache[0][0]
    assert len(pts) == 20         # every depthless keypoint borrowed
    # borrowed depths match their neighbors'
    assert np.all((pts[:, 2] > 1.9) & (pts[:, 2] < 3.1))


def test_mono_borrow_respects_max_dist():
    kp = jnp.asarray([[10.0, 10.0], [30.0, 10.0]])
    depths = jnp.asarray([2.0, -1.0])
    has = jnp.asarray([True, False])
    _, ok = S.mono_borrow_depth(kp, depths, has, 5.0, FX, FY, CX, CY)
    assert not bool(ok[1])        # 20px away > 5px budget
    _, ok = S.mono_borrow_depth(kp, depths, has, 25.0, FX, FY, CX, CY)
    assert bool(ok[1])
