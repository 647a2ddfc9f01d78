import time, numpy as np, jax, jax.numpy as jnp
from legslam_tpu.utils.runtime import enable_compilation_cache
enable_compilation_cache()
from legslam_tpu.config import RasterizeConfig
from legslam_tpu.models import gaussians as G
from legslam_tpu.ops.projection import preprocess
from legslam_tpu.ops.binning import bin_gaussians
from legslam_tpu.ops.pallas.composite import composite_image_pallas, prepare_pairs
from legslam_tpu.utils.camera import CameraView

width, height = 1200, 680
n = 200_000; cap = 1<<18
cfg = RasterizeConfig(tile_h=16, tile_w=128, max_span_x=4, max_span_y=8, chunk=256, tile_batch=16)
rng = np.random.default_rng(0)
pts = rng.uniform(-3,3,size=(n,3)).astype(np.float32); pts[:,2]=rng.uniform(0.5,8.0,size=n).astype(np.float32)
st = G.create_from_pcd(pts, rng.uniform(size=(n,3)).astype(np.float32), capacity=cap)
view = CameraView.create(np.eye(3,dtype=np.float32), np.zeros(3,np.float32), width, height, fx=600., fy=600.)

def stage_all():
    pre = preprocess(st.params.xyz, st.scales(), st.rotations(), st.valid,
        view.world_view, view.full_proj, width, height, view.focal_x, view.focal_y,
        view.tan_fovx, view.tan_fovy)
    rgb = jnp.zeros((cap,3)) + 0.5
    feats = jnp.concatenate([rgb, st.params.lang_feat, pre.depth[:,None]], -1)
    b = bin_gaussians(pre, width, height, cfg)
    img, tf = composite_image_pallas(b, pre.mean2d, pre.conic, st.opacities(),
        feats, width, height, cfg.tile_w, cfg.tile_h, max_pairs=1<<20, chunk=256)
    return img, tf

f = jax.jit(stage_all)
print("compiling...", flush=True)
t0=time.perf_counter(); o = f(); v = float(o[1][0,0])
print("compile+first:", time.perf_counter()-t0, "s", flush=True)
print("meanT:", float(o[1].mean()), flush=True)
t0=time.perf_counter()
for _ in range(10):
    o = f(); v = float(o[1][0,0])
print("pallas v2 full render ms:", (time.perf_counter()-t0)/10*1e3, flush=True)

# stage timings
from legslam_tpu.ops.pallas.composite import composite_tiles_pallas
@jax.jit
def prep_only():
    pre = preprocess(st.params.xyz, st.scales(), st.rotations(), st.valid,
        view.world_view, view.full_proj, width, height, view.focal_x, view.focal_y,
        view.tan_fovx, view.tan_fovy)
    rgb = jnp.zeros((cap,3)) + 0.5
    feats = jnp.concatenate([rgb, st.params.lang_feat, pre.depth[:,None]], -1)
    b = bin_gaussians(pre, width, height, cfg)
    return prepare_pairs(b, pre.mean2d, pre.conic, st.opacities(), feats, 1<<20, 256)
o2 = prep_only(); v=float(o2[0][0])
t0=time.perf_counter()
for _ in range(10): o2 = prep_only(); v=float(o2[0][0])
print("prep-only (preprocess+bin+gather) ms:", (time.perf_counter()-t0)/10*1e3, flush=True)
