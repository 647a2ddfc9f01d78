import time, numpy as np, jax, jax.numpy as jnp
from legslam_tpu.utils.runtime import enable_compilation_cache
enable_compilation_cache()
from legslam_tpu.ops.pallas.sort import sort_keys, sort_kv, argsort_f32

rng = np.random.default_rng(0)
for logn in (22, 23):
    n = 1 << logn
    keys = jnp.asarray(rng.integers(0, 1<<30, n).astype(np.int32))
    try:
        o = sort_keys(keys); v = int(o[0])
        t0=time.perf_counter()
        for _ in range(5): o = sort_keys(keys); v=int(o[0])
        dt = (time.perf_counter()-t0)/5*1e3
        ok = bool(jnp.all(o[1:] >= o[:-1]))
        print(f"sort_keys 2^{logn}: {dt:.1f} ms sorted={ok}", flush=True)
    except Exception as e:
        print(f"sort_keys 2^{logn} failed: {str(e)[:200]}", flush=True)

n = 1 << 18
keys = jnp.asarray(rng.uniform(0.2, 50, n).astype(np.float32))
valid = jnp.asarray(rng.uniform(size=n) > 0.1)
o = argsort_f32(keys, valid); v = int(o[0])
t0=time.perf_counter()
for _ in range(5): o = argsort_f32(keys, valid); v=int(o[0])
print(f"argsort_f32 2^18: {(time.perf_counter()-t0)/5*1e3:.1f} ms", flush=True)
