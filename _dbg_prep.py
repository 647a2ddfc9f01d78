import time, numpy as np, jax, jax.numpy as jnp

ntiles = 430; chunk = 256; max_pairs = 1<<20
pairs_pad = max_pairs + ntiles*chunk
NPAIR = (1<<18)*32
rng = np.random.default_rng(0)
tile_start = jnp.asarray(np.sort(rng.integers(0, NPAIR, ntiles)).astype(np.int32))
tile_count = jnp.asarray(rng.integers(0, 3000, ntiles).astype(np.int32))
pair_gid = jnp.asarray(rng.integers(0, 1<<18, NPAIR).astype(np.int32))
feats = jnp.asarray(rng.normal(size=(1<<18, 68)).astype(np.float32))

def timeit(label, f):
    t0=time.perf_counter(); o = f(); v=float(np.asarray(jax.tree.leaves(o)[0]).ravel()[0])
    print(label, "compile+run %.1fs" % (time.perf_counter()-t0), flush=True)
    t0=time.perf_counter()
    for _ in range(3): o=f(); v=float(np.asarray(jax.tree.leaves(o)[0]).ravel()[0])
    print(label, "run %.1f ms" % ((time.perf_counter()-t0)/3*1e3), flush=True)

@jax.jit
def stage1():
    count = jnp.minimum(tile_count, max_pairs)
    acount = -(-count // chunk) * chunk
    astart = jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.cumsum(acount).astype(jnp.int32)])[:-1]
    return astart, count

timeit("cumsum", stage1)

astart, count = stage1()

@jax.jit
def stage2():
    slot = jnp.arange(pairs_pad, dtype=jnp.int32)
    tile_of = jnp.searchsorted(astart, slot, side="right").astype(jnp.int32) - 1
    return tile_of

timeit("searchsorted 1.1M/430", stage2)
tile_of = stage2()

@jax.jit
def stage3():
    slot = jnp.arange(pairs_pad, dtype=jnp.int32)
    within = slot - astart[tile_of]
    live = within < count[tile_of]
    src = jnp.where(live, tile_start[tile_of] + within, 0)
    gid = jnp.where(live, pair_gid[src], 0)
    return gid, live

timeit("gathers", stage3)
gid, live = stage3()

@jax.jit
def stage4():
    pf = feats[gid] * live[:, None]
    pf = jnp.pad(pf, ((0,0),(0,60)))
    return pf

timeit("feats gather+pad", stage4)
