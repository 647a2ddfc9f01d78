import time, numpy as np, jax, jax.numpy as jnp
from legslam_tpu.utils.runtime import enable_compilation_cache
enable_compilation_cache()
from legslam_tpu.config import RasterizeConfig
from legslam_tpu.models import gaussians as G
from legslam_tpu.ops.projection import preprocess
from legslam_tpu.ops.binning import bin_gaussians
from legslam_tpu.ops.pallas.composite import prepare_pairs, composite_tiles_pallas
from legslam_tpu.ops.pallas.composite_bwd import composite_backward_pallas
from legslam_tpu.utils.camera import CameraView

width, height = 1200, 680
n = 200_000; cap = 1<<18
cfg = RasterizeConfig(tile_h=16, tile_w=128, max_span_x=4, max_span_y=8,
                      chunk=256, backend="pallas", max_pairs=1<<20)
rng = np.random.default_rng(0)
pts = rng.uniform(-3,3,size=(n,3)).astype(np.float32); pts[:,2]=rng.uniform(0.5,8.0,size=n).astype(np.float32)
st = G.create_from_pcd(pts, rng.uniform(size=(n,3)).astype(np.float32), capacity=cap)
view = CameraView.create(np.eye(3,dtype=np.float32), np.zeros(3,np.float32), width, height, fx=600., fy=600.)

@jax.jit
def prep():
    pre = preprocess(st.params.xyz, st.scales(), st.rotations(), st.valid,
        view.world_view, view.full_proj, width, height, view.focal_x, view.focal_y,
        view.tan_fovx, view.tan_fovy)
    rgb = jnp.zeros((cap,3)) + 0.5
    feats = jnp.concatenate([rgb, st.params.lang_feat, pre.depth[:,None]], -1)
    b = bin_gaussians(pre, width, height, cfg)
    return prepare_pairs(b, pre.mean2d, pre.conic, st.opacities(), feats, 1<<20, 256)

start, count, geo, pf = jax.block_until_ready(prep())
ntx, nty = 10, 43; ntiles = 430; npix = 2048

fwd = jax.jit(lambda s,c,g,f: composite_tiles_pallas(s,c,g,f, tile_w=128, tile_h=16,
    ntx=ntx, ntiles=ntiles, chunk=256))
acc, tfin = fwd(start, count, geo, pf); v=float(tfin[0,0,0])
gout = jnp.ones_like(acc) * 0.01
gtfin = jnp.ones_like(tfin) * 0.01
bwd = jax.jit(lambda s,c,g,f,go,gt,tf: composite_backward_pallas(s,c,g,f,go,gt,tf,
    tile_w=128, tile_h=16, ntx=ntx, ntiles=ntiles, chunk=256))
dg, df = bwd(start, count, geo, pf, gout, gtfin, tfin); v=float(dg[0,0])

def med(f, label, reps=7):
    ts=[]
    for _ in range(reps):
        t0=time.perf_counter(); o=f(); v=float(jax.tree.leaves(o)[0].ravel()[0]); ts.append(time.perf_counter()-t0)
    ts.sort(); print(label, "%.0f ms (median)" % (ts[len(ts)//2]*1e3), flush=True)

med(lambda: fwd(start, count, geo, pf), "fwd kernel")
med(lambda: bwd(start, count, geo, pf, gout, gtfin, tfin), "bwd kernel")

# scatter-add VJP cost: grad of prepare_pairs' gathers
@jax.jit
def prep_vjp(dgeo, dfeats):
    def f(mean2d, conic, opac, feats):
        pre_m = mean2d  # placeholders: gather path only
        b = BIN
        s_, c_, g_, p_ = prepare_pairs(b, mean2d, conic, opac, feats, 1<<20, 256)
        return jnp.sum(g_ * dgeo) + jnp.sum(p_ * dfeats)
    return jax.grad(f, argnums=(0,1,2,3))(MEAN2D, CONIC, OPAC, FEATS)

# build inputs
pre0 = preprocess(st.params.xyz, st.scales(), st.rotations(), st.valid,
    view.world_view, view.full_proj, width, height, view.focal_x, view.focal_y,
    view.tan_fovx, view.tan_fovy)
MEAN2D = pre0.mean2d; CONIC = pre0.conic; OPAC = st.opacities()
FEATS = jnp.concatenate([jnp.zeros((cap,3))+0.5, st.params.lang_feat, pre0.depth[:,None]], -1)
BIN = bin_gaussians(pre0, width, height, cfg)
o = prep_vjp(dg, df); v=float(o[0][0,0])
med(lambda: prep_vjp(dg, df), "prep gather VJP (scatter-adds)")
