"""Microbench: the _corner_cull chain layout variants on device.

Isolates the cull compute from the (shape-static) sort so the +44 ms
the cull adds to binning can be attributed: the [S,P]-oriented math, the
bool transpose back to pair order, the [P,6] cull-column gather, or the
where/key fusion. Prints one JSON line of per-variant ms.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from legslam_tpu.utils.runtime import enable_compilation_cache


def timed(fn, sync, iters=6, depth=8):
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = None
        for _ in range(depth):
            out = fn()
        sync(out)
        ts.append((time.perf_counter() - t0) / depth)
    ts.sort()
    return ts[len(ts) // 2] * 1e3


def main():
    enable_compilation_cache()
    P, msy, msx = 1 << 18, 8, 4
    S = msy * msx
    tile_w, tile_h = 128, 16
    rng = np.random.default_rng(0)
    cs = jnp.asarray(rng.normal(size=(P, 6)).astype(np.float32))
    x0 = jnp.asarray(rng.integers(0, 8, size=P).astype(np.int32))
    y0 = jnp.asarray(rng.integers(0, 40, size=P).astype(np.int32))
    in_span = jnp.asarray(rng.uniform(size=(P, msy, msx)) < 0.2)
    order = jnp.asarray(rng.permutation(P).astype(np.int32))

    from legslam_tpu.ops.binning import _corner_cull

    def v_full():                       # current: cull + gather
        return _corner_cull(in_span, x0, y0, cs[order], tile_w, tile_h)

    def v_nogather():                   # cull cols pre-sorted (free)
        return _corner_cull(in_span, x0, y0, cs, tile_w, tile_h)

    def v_gather_only():                # the [P,6] row gather alone
        return cs[order]

    def v_key(ins):                     # downstream key build + sum
        ty = y0[:, None, None] + jnp.arange(msy, dtype=jnp.int32)[None, :, None]
        tx = x0[:, None, None] + jnp.arange(msx, dtype=jnp.int32)[None, None, :]
        tid = ty * 10 + tx
        rank = jnp.arange(P, dtype=jnp.int32)
        key = jnp.where(ins, tid * P + rank[:, None, None], 47 * P)
        return key.reshape(-1), jnp.sum(ins.astype(jnp.int32))

    out = {}
    for name, fn in [
        ("cull_full", jax.jit(v_full)),
        ("cull_nogather", jax.jit(v_nogather)),
        ("gather_only", jax.jit(v_gather_only)),
        ("cull_plus_key", jax.jit(lambda: v_key(v_full()))),
        ("key_only", jax.jit(lambda: v_key(in_span))),
    ]:
        r = fn()
        jax.block_until_ready(r)
        leaf = jax.tree_util.tree_leaves(r)[-1]
        out[name] = round(timed(fn, lambda o: np.asarray(
            jax.tree_util.tree_leaves(o)[-1]).ravel()[0].item()), 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
