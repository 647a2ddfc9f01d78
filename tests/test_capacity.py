"""Capacity-axis (FSDP-style) store sharding: parallel/capacity.py +
GaussianMapper(shard_store=True).

The store's capacity-leading leaves (7 param groups, Adam moments,
densify stats, valid) live sharded over the mesh; the spatial step
all-gathers the render working set inside the loss and keeps the
Adam/stat updates sharded. The sharding constraint is semantically the
identity, so the sharded-store mapper must match the replicated-store
spatial mapper exactly; persistent store bytes per device must scale
~1/D."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from legslam_tpu.config import (
    MapperParams,
    OptimizationParams,
    RasterizeConfig,
)
from legslam_tpu.data.synthetic import SyntheticDataset
from legslam_tpu.mapper.mapper import GaussianMapper
from legslam_tpu.models import gaussians as G
from legslam_tpu.parallel import capacity, sharded
from legslam_tpu.slam.trajectory import TrajectoryFrontend

CFG = RasterizeConfig(tile_h=16, tile_w=128, max_span_x=1, max_span_y=4,
                      chunk=64, tile_batch=4)
OPT = OptimizationParams(
    densify_from_iter=10, densification_interval=25,
    opacity_reset_interval=0, iterations=200,
    position_lr_init=0.0016, position_lr_final=1.6e-5)


def _fed_mapper(tmp_path, strips, shard_store, seed=7):
    ds = SyntheticDataset(n_frames=12, width=128, height=64,
                          n_gaussians=600, seed=seed, clutter_ratio=0.0)
    frontend = TrajectoryFrontend(ds.intrinsics, kf_stride=3,
                                  max_corners=200)
    mapper = GaussianMapper(
        frontend.queue, ds.intrinsics, opt=OPT,
        mp=MapperParams(min_num_initial_map_kfs=3, depth_cache=3),
        cfg=CFG, capacity=1 << 13, result_dir=str(tmp_path),
        max_per_tile=512, include_lang_feat=False, spatial_strips=strips,
        shard_store=shard_store)
    for frame in ds:
        frontend.track(frame)
    frontend.finish()
    return ds, mapper


def test_shard_state_layout():
    mesh = sharded.make_mesh(8)
    st = G.empty(1 << 10)
    ss = capacity.shard_state(st, mesh)
    spec = ss.params.xyz.sharding.spec
    assert spec == P(("data",)) or spec == P("data"), spec
    shard0 = ss.params.xyz.addressable_shards[0].data
    assert shard0.shape[0] == (1 << 10) // 8
    assert ss.adam_m.xyz.addressable_shards[0].data.shape[0] == \
        (1 << 10) // 8
    assert ss.stats.grad_accum.addressable_shards[0].data.shape[0] == \
        (1 << 10) // 8
    # scalars replicate
    assert ss.adam_step.sharding.spec == P()
    # persistent bytes ~1/8 of the replicated footprint
    rep = sum(leaf.size * leaf.dtype.itemsize
              for leaf in jax.tree.leaves(st))
    per_dev = capacity.shard_bytes_per_device(ss)
    assert per_dev < rep / 8 + 4096, (per_dev, rep)


def test_sharded_store_matches_replicated_step(tmp_path):
    """One shard_store tick == one replicated spatial tick == one plain
    single-device tick (the gather constraint is the identity)."""
    ds1, m1 = _fed_mapper(tmp_path, strips=4, shard_store=False)
    ds2, m2 = _fed_mapper(tmp_path, strips=4, shard_store=True)
    for m in (m1, m2):
        m.drain_operations(limit=64)
        if not m.has_met_initial_conditions():
            pytest.skip("synthetic frontend produced too few keyframes")
        m.initialize_map()
    fid = sorted(m1.keyframes)[0]
    m1._kf_cycle = [fid]
    m2._kf_cycle = [fid]
    for _ in range(2):
        m1.train_iteration()
        m2.train_iteration()
    # the sharded store really is sharded after the tick
    spec = m2.state.params.xyz.sharding.spec
    assert spec != P() and spec is not None, spec
    assert m2.state.params.xyz.addressable_shards[0].data.shape[0] == \
        m2.state.capacity // m2._mesh.devices.size
    for name in ("xyz", "opacity", "scaling", "rotation"):
        np.testing.assert_allclose(
            np.asarray(getattr(m1.state.params, name)),
            np.asarray(getattr(m2.state.params, name)),
            atol=5e-5, err_msg=name)
    np.testing.assert_allclose(np.asarray(m1.state.stats.denom),
                               np.asarray(m2.state.stats.denom), atol=0)
    np.testing.assert_allclose(np.asarray(m1.state.adam_v.xyz),
                               np.asarray(m2.state.adam_v.xyz), atol=1e-7)


def test_sharded_store_without_strips_matches_plain(tmp_path):
    """shard_store on a plain 1D data mesh (spatial_strips=1): the
    single-view step all-gathers inside the loss (train_step
    gather_mesh), keeps the store sharded, and matches the unsharded
    single-device mapper exactly."""
    ds1, m1 = _fed_mapper(tmp_path, strips=1, shard_store=False)
    ds2, m2 = _fed_mapper(tmp_path, strips=1, shard_store=True)
    assert m2._mesh is not None and m2._mesh.devices.size == 8
    for m in (m1, m2):
        m.drain_operations(limit=64)
        if not m.has_met_initial_conditions():
            pytest.skip("synthetic frontend produced too few keyframes")
        m.initialize_map()
    fid = sorted(m1.keyframes)[0]
    m1._kf_cycle = [fid]
    m2._kf_cycle = [fid]
    for _ in range(2):
        m1.train_iteration()
        m2.train_iteration()
    spec = m2.state.params.xyz.sharding.spec
    assert spec != P() and spec is not None, spec
    assert m2.state.params.xyz.addressable_shards[0].data.shape[0] == \
        m2.state.capacity // 8
    for name in ("xyz", "opacity", "scaling", "rotation"):
        np.testing.assert_allclose(
            np.asarray(getattr(m1.state.params, name)),
            np.asarray(getattr(m2.state.params, name)),
            atol=5e-5, err_msg=name)
    np.testing.assert_allclose(np.asarray(m1.state.stats.denom),
                               np.asarray(m2.state.stats.denom), atol=0)
    np.testing.assert_allclose(np.asarray(m1.state.adam_v.xyz),
                               np.asarray(m2.state.adam_v.xyz), atol=1e-7)


@pytest.mark.slow
def test_sharded_store_mapper_runs(tmp_path):
    """Full mapper loop (scheduling, densify surgery, culling) on the
    sharded store stays finite and keeps the sharding."""
    assert len(jax.devices()) == 8
    ds, mapper = _fed_mapper(tmp_path, strips=8, shard_store=True)
    mapper.drain_operations(limit=64)
    if not mapper.has_met_initial_conditions():
        pytest.skip("too few keyframes")
    mapper.initialize_map()
    for _ in range(30):
        mapper.train_iteration()
    jax.block_until_ready(mapper.state.params.xyz)
    assert np.isfinite(float(mapper._last_aux.loss))
    assert int(mapper.state.adam_step) == 30
