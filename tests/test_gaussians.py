"""Gaussian store: init, adam, densify/prune, opacity reset, transforms."""
import jax
import jax.numpy as jnp
import numpy as np

from legslam_tpu.models import gaussians as G
from legslam_tpu.utils.knn import mean_sq_dist_to_3nn


def test_knn_exact(rng):
    pts = rng.normal(size=(50, 3)).astype(np.float32)
    got = np.asarray(mean_sq_dist_to_3nn(jnp.asarray(pts), chunk=16))
    d2 = ((pts[:, None] - pts[None]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    want = np.sort(d2, axis=1)[:, :3].mean(1)
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_create_from_pcd(rng):
    pts = rng.normal(size=(20, 3)).astype(np.float32)
    cols = rng.uniform(size=(20, 3)).astype(np.float32)
    st = G.create_from_pcd(pts, cols, capacity=32)
    assert int(st.num_valid()) == 20
    np.testing.assert_allclose(st.params.xyz[:20], pts)
    # DC SH inverts back to color
    from legslam_tpu.utils.sh import sh_to_rgb
    np.testing.assert_allclose(np.asarray(sh_to_rgb(st.params.f_dc[:20, 0])),
                               cols, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(st.opacities()[:20]), 0.1, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(st.params.rotation[:20, 0]), 1.0)


def test_increase_pcd_and_overflow(rng):
    pts = rng.normal(size=(10, 3)).astype(np.float32)
    cols = rng.uniform(size=(10, 3)).astype(np.float32)
    st = G.create_from_pcd(pts, cols, capacity=16)
    st = G.increase_pcd(st, pts + 5.0, cols, iteration=7)
    assert int(st.num_valid()) == 16  # 10 + 6 (4 dropped)
    assert int(st.overflow_dropped) == 4
    # new slots carry the creation iteration
    newly = np.asarray(st.exist_since)[10:16]
    assert (newly == 7).all()


def test_adam_matches_torch(rng):
    """Our adam must match torch.optim.Adam bit-for-bit-ish."""
    import torch
    n = 12
    st = G.create_from_pcd(rng.normal(size=(n, 3)).astype(np.float32),
                           rng.uniform(size=(n, 3)).astype(np.float32),
                           capacity=n)
    xyz_t = torch.tensor(np.asarray(st.params.xyz), requires_grad=True)
    # rotation too: its param init is the identity quat (w=1), which once
    # leaked into the moment init (empty() used _zeros_params for adam_m/v)
    # — torch initializes exp_avg to TRUE zeros regardless of param values
    rot_t = torch.tensor(np.asarray(st.params.rotation), requires_grad=True)
    opt = torch.optim.Adam([
        dict(params=[xyz_t], lr=0.01),
        dict(params=[rot_t], lr=0.001)], eps=1e-15)

    lrs = dict(xyz=0.01, f_dc=0.0, f_rest=0.0, lang_feat=0.0, opacity=0.0,
               scaling=0.0, rotation=0.001)
    zero = jax.tree.map(jnp.zeros_like, st.params)
    for i in range(3):
        g = rng.normal(size=(n, 3)).astype(np.float32)
        gr = rng.normal(size=(n, 4)).astype(np.float32)
        xyz_t.grad = torch.tensor(g)
        rot_t.grad = torch.tensor(gr)
        opt.step()
        grads = zero.replace(xyz=jnp.asarray(g), rotation=jnp.asarray(gr))
        st = G.adam_update(st, grads, lrs)
    np.testing.assert_allclose(np.asarray(st.params.xyz),
                               xyz_t.detach().numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(st.params.rotation),
                               rot_t.detach().numpy(), atol=1e-6)


def test_expon_lr():
    # endpoints of the log-lerp schedule
    np.testing.assert_allclose(
        float(G.expon_lr(0, 1e-2, 1e-4, max_steps=100)), 1e-2, rtol=1e-5)
    np.testing.assert_allclose(
        float(G.expon_lr(100, 1e-2, 1e-4, max_steps=100)), 1e-4, rtol=1e-5)
    np.testing.assert_allclose(
        float(G.expon_lr(50, 1e-2, 1e-4, max_steps=100)), 1e-3, rtol=1e-5)
    assert float(G.expon_lr(-1, 1e-2, 1e-4, max_steps=100)) == 0.0


def test_densify_clone_and_split(rng):
    n, cap = 8, 64
    st = G.create_from_pcd(rng.normal(size=(n, 3)).astype(np.float32) * 3,
                           rng.uniform(size=(n, 3)).astype(np.float32),
                           capacity=cap)
    extent = 10.0
    pd = 0.01  # percent_dense: threshold scale = 0.1
    # make gaussian 0 small (clone) and gaussian 1 big (split)
    scaling = np.array(st.params.scaling)
    scaling[0] = np.log(0.01)
    scaling[1] = np.log(1.0)
    st = st.replace(params=st.params.replace(scaling=jnp.asarray(scaling)))
    # gradients above threshold for 0 and 1 only
    stats = st.stats.replace(
        grad_accum=jnp.zeros(cap).at[0].set(10.0).at[1].set(10.0),
        denom=jnp.ones(cap))
    st = st.replace(stats=stats)
    before = int(st.num_valid())
    st2 = G.densify_and_prune(st, jax.random.key(0), grad_threshold=1.0,
                              min_opacity=0.005, extent=extent,
                              max_screen_size=None, percent_dense=pd)
    # clone adds 1; split adds 2 and removes 1 => net +2
    assert int(st2.num_valid()) == before + 2
    # split children scale = log(scale/1.6)
    child_sc = np.exp(np.asarray(st2.params.scaling))
    assert np.isclose(sorted(child_sc[:, 0])[-1], 1.0 / 1.6, rtol=1e-4) or \
        np.any(np.isclose(child_sc, 1.0 / 1.6, rtol=1e-4))
    # moments for new slots are zero
    assert np.all(np.asarray(st2.adam_m.xyz)[~np.asarray(st2.valid)] == 0)


def test_prune_by_opacity(rng):
    n = 6
    st = G.create_from_pcd(rng.normal(size=(n, 3)).astype(np.float32),
                           rng.uniform(size=(n, 3)).astype(np.float32),
                           capacity=8)
    op = np.array(st.params.opacity)
    op[2] = -10.0  # sigmoid ~ 0
    st = st.replace(params=st.params.replace(opacity=jnp.asarray(op)))
    st2 = G.densify_and_prune(st, jax.random.key(1), grad_threshold=1e9,
                              min_opacity=0.02, extent=1.0,
                              max_screen_size=None, percent_dense=0.01)
    assert int(st2.num_valid()) == n - 1
    assert not bool(st2.valid[2])


def test_opacity_reset(rng):
    st = G.create_from_pcd(rng.normal(size=(4, 3)).astype(np.float32),
                           rng.uniform(size=(4, 3)).astype(np.float32),
                           capacity=4)
    st = G.reset_opacity(st)
    np.testing.assert_allclose(np.asarray(st.opacities()), 0.01, rtol=1e-4)
    assert np.all(np.asarray(st.adam_m.opacity) == 0)


def test_scaled_transformation(rng):
    pts = rng.normal(size=(5, 3)).astype(np.float32)
    st = G.create_from_pcd(pts, rng.uniform(size=(5, 3)).astype(np.float32),
                           capacity=5)
    # rotate 90deg about z, translate, scale 2
    R = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], np.float32)
    t = np.array([1.0, 2.0, 3.0], np.float32)
    st2 = G.apply_scaled_transformation(st, 2.0, jnp.asarray(R),
                                        jnp.asarray(t))
    want = (2.0 * pts) @ R.T + t
    np.testing.assert_allclose(np.asarray(st2.params.xyz), want, rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(jnp.exp(st2.params.scaling)),
                               2.0 * np.exp(np.asarray(st.params.scaling)),
                               rtol=1e-5)


def test_rotmat_quat_roundtrip(rng):
    from legslam_tpu.utils.transforms import normalize_quat, quat_to_rotmat
    q = normalize_quat(jnp.asarray(rng.normal(size=(16, 4)).astype(np.float32)))
    R = quat_to_rotmat(q)
    q2 = G.rotmat_to_quat(R)
    R2 = quat_to_rotmat(q2)
    np.testing.assert_allclose(np.asarray(R), np.asarray(R2), atol=5e-5)


def test_transform_visible_points(rng):
    pts = np.array([[0, 0, 5.0], [0, 0, -5.0], [0, 0, 6.0]], np.float32)
    st = G.create_from_pcd(pts, np.ones((3, 3), np.float32) * 0.5, capacity=4)
    w2v = jnp.eye(4)  # camera at origin looking +z
    not_t = jnp.ones(4, bool)
    R = jnp.eye(3)
    t = jnp.asarray([0.0, 1.0, 0.0])
    st2, not_t2, n = G.transform_visible_points(
        st, not_t, R, t, w2v, kf_creation_iter=0,
        stable_num_iter_existence=30, scale=1.0)
    assert int(n) == 2  # point behind camera untouched
    np.testing.assert_allclose(np.asarray(st2.params.xyz[0]), [0, 1, 5],
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(st2.params.xyz[1]), [0, 0, -5],
                               atol=1e-6)
    assert not bool(not_t2[0]) and bool(not_t2[1])


def test_ply_roundtrip(tmp_path, rng):
    from legslam_tpu.utils import ply
    n = 7
    kw = dict(
        xyz=rng.normal(size=(n, 3)).astype(np.float32),
        f_dc=rng.normal(size=(n, 1, 3)).astype(np.float32),
        f_rest=rng.normal(size=(n, 15, 3)).astype(np.float32),
        lang_feat=rng.normal(size=(n, 64)).astype(np.float32),
        opacity=rng.normal(size=(n, 1)).astype(np.float32),
        scaling=rng.normal(size=(n, 3)).astype(np.float32),
        rotation=rng.normal(size=(n, 4)).astype(np.float32),
    )
    p = str(tmp_path / "point_cloud.ply")
    ply.save_gaussian_ply(p, **kw)
    back = ply.load_gaussian_ply(p)
    for k, v in kw.items():
        np.testing.assert_allclose(back[k], v, err_msg=k)


def test_increase_pcd_padded_parity(rng):
    """Shape-padded ingest (the mapper's static-shape buckets) must leave
    the real rows bit-identical to an unpadded call: point_valid masks the
    padding out of the 3-NN neighbor pool and the scatter plan."""
    pts = rng.normal(size=(9, 3)).astype(np.float32)
    cols = rng.uniform(size=(9, 3)).astype(np.float32)
    base = G.create_from_pcd(pts, cols, capacity=64)
    add_p, add_c = pts * 0.5 + 3.0, cols[::-1].copy()

    plain = G.increase_pcd(base, add_p, add_c, iteration=3)

    m = 16
    pp = np.zeros((m, 3), np.float32); pp[:9] = add_p
    # garbage (NaN) in the padded tail must not leak into real rows
    pp[9:] = np.nan
    cc = np.zeros((m, 3), np.float32); cc[:9] = add_c
    valid = np.zeros((m,), bool); valid[:9] = True
    padded = G.increase_pcd(base, pp, cc, iteration=3,
                            point_valid=jnp.asarray(valid))

    assert int(padded.num_valid()) == int(plain.num_valid()) == 18
    for a, b in zip(jax.tree.leaves(plain.params),
                    jax.tree.leaves(padded.params)):
        np.testing.assert_array_equal(np.asarray(a)[:18], np.asarray(b)[:18])
    np.testing.assert_array_equal(np.asarray(plain.valid),
                                  np.asarray(padded.valid))
    assert int(padded.overflow_dropped) == 0


def test_mapper_ingest_bucket():
    from legslam_tpu.mapper.mapper import _ingest_bucket
    assert _ingest_bucket(1, 1 << 18) == 1024
    assert _ingest_bucket(1024, 1 << 18) == 1024
    assert _ingest_bucket(1025, 1 << 18) == 2048
    assert _ingest_bucket(300_000, 1 << 18) == 1 << 18


def test_increase_pcd_scale_clamp(rng):
    """max_log_scale caps the knn scale init per point (the mapper's
    ingest_scale_clamp_px bound); +inf rows keep the raw init."""
    pts = rng.normal(size=(12, 3)).astype(np.float32) * 3.0
    cols = rng.uniform(size=(12, 3)).astype(np.float32)
    base = G.create_from_pcd(pts, cols, capacity=64)
    raw = G.increase_pcd(base, pts + 9.0, cols, iteration=1)
    cap = np.full((12,), -2.0, np.float32)
    cap[6:] = np.inf
    clamped = G.increase_pcd(base, pts + 9.0, cols, iteration=1,
                             max_log_scale=jnp.asarray(cap))
    sc_raw = np.asarray(raw.params.scaling)[12:24]
    sc_cl = np.asarray(clamped.params.scaling)[12:24]
    np.testing.assert_array_equal(sc_cl[:6],
                                  np.minimum(sc_raw[:6], -2.0))
    np.testing.assert_array_equal(sc_cl[6:], sc_raw[6:])


def test_grow_capacity_preserves_content(rng):
    pts = rng.normal(size=(20, 3)).astype(np.float32)
    cols = rng.uniform(size=(20, 3)).astype(np.float32)
    st = G.create_from_pcd(pts, cols, capacity=32)
    st = st.replace(adam_step=jnp.asarray(7, jnp.int32),
                    adam_m=jax.tree.map(lambda a: a + 0.5, st.adam_m))
    big = G.grow_capacity(st, 128)
    assert big.capacity == 128
    assert int(big.num_valid()) == 20
    for a, b in zip(jax.tree.leaves(st.params), jax.tree.leaves(big.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b)[:32])
    for a, b in zip(jax.tree.leaves(st.adam_m), jax.tree.leaves(big.adam_m)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b)[:32])
    assert int(big.adam_step) == 7
    # new rotation slots carry the identity quat (normalize-safe), zero
    # moments, invalid
    np.testing.assert_array_equal(np.asarray(big.params.rotation)[32:, 0], 1.0)
    assert not np.asarray(big.valid)[32:].any()
    assert np.asarray(jax.tree.leaves(big.adam_v)[0])[32:].sum() == 0


def test_mapper_capacity_ladder_grows():
    """Online ingest through the ladder: store starts at a small rung and
    grows without losing points (the static-shape analogue of the
    reference's dynamic tensor growth)."""
    import jax as _jax
    from legslam_tpu.mapper.mapper import GaussianMapper

    class _Src:
        def pop_operation(self): return None
        def is_shutdown(self): return False

    rng = np.random.default_rng(0)
    intr = dict(width=64, height=48, fx=50.0, fy=50.0, cx=32, cy=24)
    m = GaussianMapper(_Src(), intr, capacity=1 << 18,
                       result_dir="/tmp/ladder_t")
    assert m.capacity_ladder
    pts0 = rng.normal(size=(1000, 3)).astype(np.float32)
    m._pending_points.append((pts0, rng.uniform(size=(1000, 3)).astype(np.float32)))

    class _KFStub:
        R = np.eye(3, dtype=np.float32)
        t = np.zeros(3, np.float32)
    m.keyframes[0] = _KFStub()
    m.initialize_map()
    del m.keyframes[0]
    assert m.state.capacity == 1 << 15          # starting rung
    assert m.cfg.max_pairs == max(1 << 16, 8 << 15)
    n_total = 1000
    for _ in range(30):
        k = 1000
        m._increase_points(
            rng.normal(size=(k, 3)).astype(np.float32) + 5,
            rng.uniform(size=(k, 3)).astype(np.float32))
        n_total += k
    assert m.state.capacity > (1 << 15)          # grew at least one rung
    assert int(m.state.num_valid()) == n_total   # nothing dropped
    assert int(m.state.overflow_dropped) == 0
