"""Probe: Mosaic dynamic gather from VMEM + VMEM capacity on this chip."""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from legslam_tpu.utils.runtime import enable_compilation_cache

enable_compilation_cache()


def probe_lane_gather():
    P = 1 << 18

    def kernel(src_ref, idx_ref, out_ref):
        idx = idx_ref[:]                    # [8, 128] int32
        out_ref[:] = jnp.take(src_ref[:], idx.reshape(-1),
                              axis=1).reshape(8, 8 * 128)[:, :128] \
            if False else src_ref[:, 0:128] * 0
    # simpler: take along axis=1 with a [128] vector
    def kernel2(src_ref, idx_ref, out_ref):
        idx = idx_ref[0]                    # [128] int32 row
        out_ref[:] = jnp.take(src_ref[:], idx, axis=1)

    src = jnp.asarray(np.random.default_rng(0).normal(
        size=(8, P)).astype(np.float32))
    idx = jnp.asarray(np.random.default_rng(1).integers(
        0, P, (8, 128)).astype(np.int32))
    try:
        out = pl.pallas_call(
            kernel2,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(src, idx)
        want = np.asarray(src)[:, np.asarray(idx[0])]
        ok = np.allclose(np.asarray(out), want)
        print("lane-gather (jnp.take axis=1 in kernel): WORKS, correct:", ok,
              flush=True)
    except Exception as e:
        print("lane-gather failed:", str(e)[:300], flush=True)


def probe_big_take_chunk():
    """1M-row gather via [128]-wide per-step takes inside a kernel grid."""
    P = 1 << 18
    N = 1 << 20

    def kernel(src_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take(src_ref[:], idx_ref[0], axis=1)

    src = jnp.asarray(np.random.default_rng(0).normal(
        size=(8, P)).astype(np.float32))
    idx = jnp.asarray(np.random.default_rng(1).integers(
        0, P, (N // 128, 1, 128)).astype(np.int32))
    try:
        f = jax.jit(lambda s, i: pl.pallas_call(
            kernel,
            grid=(N // 128,),
            out_shape=jax.ShapeDtypeStruct((8, N), jnp.float32),
            in_specs=[pl.BlockSpec((8, P), lambda t: (0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((1, 1, 128), lambda t: (t, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((8, 128), lambda t: (0, t),
                                   memory_space=pltpu.VMEM),
        )(s, i))
        out = f(src, idx)
        v = float(out[0, 0])
        t0 = time.perf_counter()
        for _ in range(5):
            out = f(src, idx)
            v = float(out[0, 0])
        print("pallas 1M lane-gather: %.1f ms" %
              ((time.perf_counter() - t0) / 5 * 1e3), flush=True)
    except Exception as e:
        print("pallas big gather failed:", str(e)[:300], flush=True)


def probe_vmem_capacity():
    for mb in (24, 40, 56, 80, 110):
        n = mb * 1024 * 1024 // 4 // 128

        def kernel(x_ref, o_ref):
            o_ref[:] = x_ref[pl.ds(0, 8), :] * 2.0

        try:
            x = jnp.ones((n, 128), jnp.float32)
            out = pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=128 * 1024 * 1024),
            )(x)
            print(f"VMEM {mb}MB resident: OK ({float(out[0,0])})", flush=True)
        except Exception as e:
            print(f"VMEM {mb}MB resident: FAIL {str(e)[:160]}", flush=True)
            break


def probe_xla_chunked_gather():
    """XLA row-gather in lax.map chunks (compile-hang workaround?)."""
    P = 1 << 18
    N = 1 << 20
    feats = jnp.asarray(np.random.default_rng(0).normal(
        size=(P, 128)).astype(np.float32))
    gid = jnp.asarray(np.random.default_rng(1).integers(
        0, P, N).astype(np.int32))

    @jax.jit
    def g(feats, gid):
        return jax.lax.map(lambda ix: feats[ix],
                           gid.reshape(64, -1)).reshape(N, 128)

    t0 = time.perf_counter()
    out = g(feats, gid)
    v = float(out[0, 0])
    print("xla chunked row-gather compile+run: %.1f s" %
          (time.perf_counter() - t0), flush=True)
    t0 = time.perf_counter()
    for _ in range(3):
        out = g(feats, gid)
        v = float(out[0, 0])
    print("xla chunked row-gather: %.1f ms" %
          ((time.perf_counter() - t0) / 3 * 1e3), flush=True)


if __name__ == "__main__":
    probe_lane_gather()
    probe_vmem_capacity()
    probe_big_take_chunk()
    probe_xla_chunked_gather()
