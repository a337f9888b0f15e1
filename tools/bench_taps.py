"""Microbenchmark: dynamic vs static VMEM ring-buffer reads inside a serial
Pallas grid — isolates the suspected per-layer stall in the WaveNet AR
kernel (ROADMAP round-1: ~14 us/layer unexplained)."""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, R = 8, 512
BUF = 504
T = 2000
LAYERS = 24


def make(mode: str):
    dil = np.array([2 ** (i % 6) for i in range(LAYERS)], np.int32)
    offs = np.concatenate([[0], np.cumsum(2 * dil)[:-1]]).astype(np.int32)

    def kernel(dil_ref, offs_ref, w_ref, out_ref, bufs, h):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            bufs[...] = jnp.zeros_like(bufs)
            h[...] = jnp.ones_like(h)

        for l in range(LAYERS):
            if mode == "dynamic":
                d = dil_ref[l]
                off = offs_ref[l]
                two_d = 2 * d
                wp = jax.lax.rem(t, two_d)
                tap_d = off + jax.lax.rem(wp + d, two_d)
                tap_2d = off + wp
                x2 = bufs[pl.ds(tap_2d, 1)][0]
                x1 = bufs[pl.ds(tap_d, 1)][0]
                hv = h[...]
                y = (x1 + x2 + hv) @ w_ref[...]
                bufs[pl.ds(tap_2d, 1)] = hv[None]
            elif mode == "static":
                x2 = bufs[pl.ds(2 * l, 1)][0]
                x1 = bufs[pl.ds(2 * l + 1, 1)][0]
                hv = h[...]
                y = (x1 + x2 + hv) @ w_ref[...]
                bufs[pl.ds(2 * l, 1)] = hv[None]
            else:  # compute only
                hv = h[...]
                y = (hv + hv + hv) @ w_ref[...]
            h[...] = jnp.tanh(y)
        out_ref[...] = h[...][None]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, B, R), lambda t, *_: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((BUF, B, R), jnp.float32),
                        pltpu.VMEM((B, R), jnp.float32)],
    )
    f = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((1, B, R), jnp.float32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True,
                                             vmem_limit_bytes=100 * 2**20))
    w = jnp.asarray(np.random.RandomState(0).randn(R, R) * 0.01, jnp.float32)
    return functools.partial(f, jnp.asarray(dil), jnp.asarray(offs), w)


def bench(mode):
    f = make(mode)
    out = f()
    _ = float(out.sum())  # warm + fetch
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        out = f()
        _ = float(out.sum())  # value fetch closes the timing (axon gotcha)
        best = min(best, time.perf_counter() - t0)
    per_iter = best / T * 1e6
    print(f"{mode:8s}: {best*1e3:8.2f} ms total, {per_iter:7.3f} us/iter, "
          f"{per_iter/LAYERS*1000:7.1f} ns/layer")


if __name__ == "__main__":
    for mode in ("compute", "static", "dynamic"):
        bench(mode)
