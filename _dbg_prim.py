import time, numpy as np, jax, jax.numpy as jnp

rng = np.random.default_rng(0)
P = 1<<18
gid1m = jnp.asarray(rng.integers(0, P, 1<<20).astype(np.int32))
feats = jnp.asarray(rng.normal(size=(P, 128)).astype(np.float32))
geo = jnp.asarray(rng.normal(size=(8, P)).astype(np.float32))
depth = jnp.asarray(rng.normal(size=(P,)).astype(np.float32))
keys3m = jnp.asarray(rng.integers(0, 1<<28, 3<<20).astype(np.int32))

def timeit(label, f, reps=5):
    o = f(); v = float(np.asarray(jax.tree.leaves(o)[0]).ravel()[0])
    t0=time.perf_counter()
    for _ in range(reps): o=f(); v=float(np.asarray(jax.tree.leaves(o)[0]).ravel()[0])
    print(label, "%.1f ms" % ((time.perf_counter()-t0)/reps*1e3), flush=True)

timeit("row-gather feats [1M x 128]", jax.jit(lambda: feats[gid1m]))
timeit("col-gather geo [8 x 1M]", jax.jit(lambda: geo[:, gid1m]))
timeit("argsort 262k f32", jax.jit(lambda: jnp.argsort(depth)))
timeit("sort 3M int32", jax.jit(lambda: jnp.sort(keys3m)))
timeit("sort+carry 3M (key,val)", jax.jit(lambda: jax.lax.sort((keys3m, gid1m[: 3<<20] if False else jnp.arange(3<<20, dtype=jnp.int32)), num_keys=1)))
