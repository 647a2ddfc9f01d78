import time
import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from legslam_tpu.utils.runtime import enable_compilation_cache
enable_compilation_cache()

P = 1 << 18
rng = np.random.default_rng(0)
src = jnp.asarray(rng.normal(size=(8, P)).astype(np.float32))
idx = jnp.asarray(rng.integers(0, P, (256,)).astype(np.int32))

def kernel(src_ref, idx_ref, out_ref):
    idxb = jnp.broadcast_to(idx_ref[0][None, :], (8, 256))
    out_ref[:] = jnp.take_along_axis(src_ref[:], idxb, axis=1)

try:
    out = pl.pallas_call(kernel,
        out_shape=jax.ShapeDtypeStruct((8, 256), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(src, idx[None])
    want = np.asarray(src)[:, np.asarray(idx)]
    print("take_along_axis lane-gather: correct:", np.allclose(out, want), flush=True)
except Exception as e:
    print("take_along_axis failed:", str(e)[:250], flush=True)

# bf16 wide gather [128, chunk] from [128, P] bf16
srcb = jnp.asarray(rng.normal(size=(128, P)).astype(np.float32)).astype(jnp.bfloat16)
def kernel2(src_ref, idx_ref, out_ref):
    idxb = jnp.broadcast_to(idx_ref[0][None, :], (128, 256))
    out_ref[:] = jnp.take_along_axis(src_ref[:], idxb, axis=1)
try:
    out = pl.pallas_call(kernel2,
        out_shape=jax.ShapeDtypeStruct((128, 256), jnp.bfloat16),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(srcb, idx[None])
    want = np.asarray(srcb.astype(jnp.float32))[:, np.asarray(idx)]
    print("bf16 [128,P] lane-gather: correct:",
          np.allclose(np.asarray(out.astype(jnp.float32)), want), flush=True)
except Exception as e:
    print("bf16 wide gather failed:", str(e)[:250], flush=True)

# segment_sum 1M rows x 128 -> 262k segments
data = jnp.asarray(rng.normal(size=(1<<20, 128)).astype(np.float32))
gid = jnp.asarray(rng.integers(0, P, 1<<20).astype(np.int32))
@jax.jit
def seg(data, gid):
    return jnp.zeros((P, 128), jnp.float32).at[gid].add(data)
t0=time.perf_counter(); o = seg(data, gid); v=float(o[0,0])
print("segment-add compile+run: %.1f s" % (time.perf_counter()-t0), flush=True)
t0=time.perf_counter()
for _ in range(3): o = seg(data, gid); v=float(o[0,0])
print("segment-add 1Mx128 -> 262k: %.1f ms" % ((time.perf_counter()-t0)/3*1e3), flush=True)

# scalar segment add (for dgeo if pair-space): 1M -> 262k, 8 rows
data8 = jnp.asarray(rng.normal(size=(1<<20,)).astype(np.float32))
@jax.jit
def seg8(d, gid):
    return jnp.zeros((P,), jnp.float32).at[gid].add(d)
o = seg8(data8, gid); v=float(o[0])
t0=time.perf_counter()
for _ in range(3): o = seg8(data8, gid); v=float(o[0])
print("segment-add 1M scalar: %.1f ms" % ((time.perf_counter()-t0)/3*1e3), flush=True)
