import time, functools, numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from legslam_tpu.utils.runtime import enable_compilation_cache
enable_compilation_cache()
LANES = 128

# static-unrolled bitonic at 2^16 for runtime comparison
def stage_static(x, R, k, j):
    s = 1 << j
    if s < R: axis, shift, size, dim = 0, s, R, 0
    else: axis, shift, size, dim = 1, s//R, LANES, 1
    idx = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), dim)
    low = (idx & shift) == 0
    if (1 << k) < R:
        bit = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 0) & (1 << k)
    else:
        bit = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 1) & ((1 << k)//R)
    asc_i = jnp.where(bit == 0, 1, 0); low_i = jnp.where(low, 1, 0)
    ks = asc_i == low_i
    p = jnp.where(low, pltpu.roll(x, size-shift, axis=axis), pltpu.roll(x, shift, axis=axis))
    return jnp.where(ks, jnp.minimum(x, p), jnp.maximum(x, p))

def kern(x_ref, o_ref, *, R, log_n):
    x = x_ref[:]
    for k in range(1, log_n+1):
        for j in range(k-1, -1, -1):
            x = stage_static(x, R, k, j)
    o_ref[:] = x

@functools.partial(jax.jit, static_argnames=())
def sort_static_16(keys):
    n = keys.shape[0]; R = n // LANES
    x = keys.reshape(LANES, R).T
    o = pl.pallas_call(functools.partial(kern, R=R, log_n=16),
        out_shape=jax.ShapeDtypeStruct((R, LANES), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100*1024*1024))(x)
    return o.T.reshape(-1)

rng = np.random.default_rng(0)
keys = jnp.asarray(rng.integers(0, 1<<30, 1<<16).astype(np.int32))
t0=time.perf_counter(); o = sort_static_16(keys); v=int(o[0])
print("static 2^16 compile+run:", time.perf_counter()-t0, "sorted:", bool(jnp.all(o[1:]>=o[:-1])), flush=True)
t0=time.perf_counter()
for _ in range(10): o = sort_static_16(keys); v=int(o[0])
print("static 2^16 run ms:", (time.perf_counter()-t0)/10*1e3, flush=True)

# XLA batched sort comparison
for shape in ((64, 1<<17), (1, 1<<23), (43, 1<<17)):
    k2 = jnp.asarray(rng.integers(0, 1<<30, shape).astype(np.int32))
    f = jax.jit(lambda a: jnp.sort(a, axis=-1))
    o = f(k2); v = int(o.ravel()[0])
    t0=time.perf_counter()
    for _ in range(5): o = f(k2); v=int(o.ravel()[0])
    print(f"xla sort {shape}: {(time.perf_counter()-t0)/5*1e3:.1f} ms", flush=True)
