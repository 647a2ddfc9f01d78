import time, numpy as np, jax, jax.numpy as jnp
from legslam_tpu.utils.runtime import enable_compilation_cache
enable_compilation_cache()
from legslam_tpu.config import OptimizationParams, RasterizeConfig
from legslam_tpu.mapper.train_step import train_step
from legslam_tpu.models import gaussians as G
from legslam_tpu.utils.camera import CameraView

width, height = 1200, 680
n = 200_000; cap = 1<<18
cfg = RasterizeConfig(tile_h=16, tile_w=128, max_span_x=4, max_span_y=8,
                      chunk=256, backend="pallas", max_pairs=1<<20,
                      n_buckets=8, bucket_cap=1<<17)
opt = OptimizationParams()
rng = np.random.default_rng(0)
pts = rng.uniform(-3,3,size=(n,3)).astype(np.float32); pts[:,2]=rng.uniform(0.5,8.0,size=n).astype(np.float32)
st = G.create_from_pcd(pts, rng.uniform(size=(n,3)).astype(np.float32), capacity=cap)
view = CameraView.create(np.eye(3,dtype=np.float32), np.zeros(3,np.float32), width, height, fx=600., fy=600.)
gt_color = jnp.asarray(rng.uniform(size=(height,width,3)),jnp.float32)
gt_lf = jnp.asarray(rng.normal(size=(height,width,64)),jnp.float32)
gt_depth = jnp.asarray(rng.uniform(0.5,8.,size=(height,width)),jnp.float32)
mask = jnp.ones((height,width),jnp.float32); bg = jnp.zeros(3)
def step(s,i):
    return train_step(s, view.world_view, view.full_proj, view.cam_center,
        view.tan_fovx, view.tan_fovy, gt_color, gt_lf, gt_depth, mask,
        bg, jnp.asarray(float(i)), 1.0, width=width, height=height,
        active_sh_degree=3, opt=opt, cfg=cfg, max_per_tile=2048)
print("compiling train step (pallas)...", flush=True)
t0=time.perf_counter()
st, aux = step(st, 0); print("first loss:", float(aux.loss), "compile:", time.perf_counter()-t0, flush=True)
for k in range(5):
    t0=time.perf_counter()
    st, aux = step(st, k+1)
    v = float(aux.loss)
    print(f"iter {k}: {(time.perf_counter()-t0)*1e3:.0f} ms loss={v:.4f}", flush=True)
import jax.numpy as jnp2
for nm in ("xyz","opacity","scaling","rotation","lang_feat","f_dc"):
    a = getattr(st.params, nm)
    print(nm, "finite:", bool(jnp.isfinite(a).all()), flush=True)
