import time, functools, numpy as np, jax, jax.numpy as jnp
from legslam_tpu.utils.runtime import enable_compilation_cache
enable_compilation_cache()
from legslam_tpu.config import OptimizationParams, RasterizeConfig
from legslam_tpu.models import gaussians as G
from legslam_tpu.ops import losses
from legslam_tpu.ops.rasterize import render_arrays
from legslam_tpu.utils.camera import CameraView

width, height = 1200, 680
n = 200_000; cap = 1<<18
cfg = RasterizeConfig(tile_h=16, tile_w=128, max_span_x=4, max_span_y=8,
                      chunk=256, backend="pallas", max_pairs=1<<20)
opt = OptimizationParams()
rng = np.random.default_rng(0)
pts = rng.uniform(-3,3,size=(n,3)).astype(np.float32); pts[:,2]=rng.uniform(0.5,8.0,size=n).astype(np.float32)
st = G.create_from_pcd(pts, rng.uniform(size=(n,3)).astype(np.float32), capacity=cap)
view = CameraView.create(np.eye(3,dtype=np.float32), np.zeros(3,np.float32), width, height, fx=600., fy=600.)
gt_color = jnp.asarray(rng.uniform(size=(height,width,3)),jnp.float32)
gt_lf = jnp.asarray(rng.normal(size=(height,width,64)),jnp.float32)
gt_depth = jnp.asarray(rng.uniform(0.5,8.,size=(height,width)),jnp.float32)
mask = jnp.ones((height,width),jnp.float32); bg = jnp.zeros(3)
p = st.params

def render(params, stop_comp):
    xyz, f_dc, f_rest, lang_feat, opacity, scaling, rotation = params
    sh = jnp.concatenate([f_dc, f_rest], axis=1)
    out = render_arrays(xyz, sh, lang_feat, jax.nn.sigmoid(opacity[:,0]),
        jnp.exp(scaling), rotation, st.valid, view.world_view, view.full_proj,
        view.cam_center, view.tan_fovx, view.tan_fovy, width, height, bg, 3, cfg)
    col, lf, dep = out.color, out.lang_feat, out.depth
    if stop_comp:
        col, lf, dep = map(jax.lax.stop_gradient, (col, lf, dep))
    return losses.mapping_loss(col, gt_color, lf, gt_lf, dep, gt_depth, mask, 0.2)

params = (p.xyz, p.f_dc, p.f_rest, p.lang_feat, p.opacity, p.scaling, p.rotation)

def timeit(label, f, reps=5):
    o = f(); v = float(jax.tree.leaves(o)[0].ravel()[0])
    t0=time.perf_counter()
    for _ in range(reps): o = f(); v = float(jax.tree.leaves(o)[0].ravel()[0])
    print(label, "%.0f ms" % ((time.perf_counter()-t0)/reps*1e3), flush=True)

fwd = jax.jit(lambda: render(params, False))
timeit("fwd+loss only", fwd)
g_nocomp = jax.jit(lambda: jax.grad(lambda q: render(q, True))(params))
timeit("grad w/o compositing bwd (loss-side only)", g_nocomp)
g_full = jax.jit(lambda: jax.grad(lambda q: render(q, False))(params))
timeit("grad full", g_full)
