"""Microbenchmark tower for the WaveNet AR kernel body: isolates where the
~14 us/layer goes by reconstructing the production body in stages.

  matmul1   one 512x512 matmul/layer, resident f32 (bench_taps baseline)
  body6_res the production 6-matmul body, RESIDENT bf16 weights,
            statically-indexed per layer, grid (T,)
  body6_str the same body, STREAMED bf16 weights via grid (T, L) BlockSpecs
            (the production structure)
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B = 8
R, G, S, C = 512, 512, 256, 80
G2 = G // 2
BUF = 504
T = 1000
L = 24


def _weights(rng):
    return dict(
        w_dil=jnp.asarray(rng.randn(L, 3, R, G) * 0.02, jnp.bfloat16),
        w_c=jnp.asarray(rng.randn(L, C, G) * 0.02, jnp.bfloat16),
        w_skip=jnp.asarray(rng.randn(L, G2, S) * 0.02, jnp.bfloat16),
        w_out=jnp.asarray(rng.randn(L, G2, R) * 0.02, jnp.bfloat16),
        b=jnp.asarray(rng.randn(L, 1, G) * 0.01, jnp.float32),
    )


def _body(h, x1, x2, cond, w_dil, w_c, w_skip, w_out, b):
    conv = (jnp.dot(x2, w_dil[0], preferred_element_type=jnp.float32)
            + jnp.dot(x1, w_dil[1], preferred_element_type=jnp.float32)
            + jnp.dot(h.astype(jnp.bfloat16), w_dil[2],
                      preferred_element_type=jnp.float32)
            + jnp.dot(cond, w_c, preferred_element_type=jnp.float32)
            + b[0])
    a, g = conv[:, :G2], conv[:, G2:]
    gated = (jnp.tanh(a) * jax.nn.sigmoid(g)).astype(jnp.bfloat16)
    s = jnp.dot(gated, w_skip, preferred_element_type=jnp.float32)
    res = jnp.dot(gated, w_out, preferred_element_type=jnp.float32)
    return res + h, s


def make_resident():
    w = _weights(np.random.RandomState(0))
    dil = np.array([2 ** (i % 6) for i in range(L)], np.int32)
    offs = np.concatenate([[0], np.cumsum(2 * dil)[:-1]]).astype(np.int32)

    def kernel(dil_ref, offs_ref, w_dil_ref, w_c_ref, w_skip_ref, w_out_ref,
               b_ref, out_ref, bufs, h, skip):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            bufs[...] = jnp.zeros_like(bufs)
            h[...] = jnp.ones_like(h)

        skip[...] = jnp.zeros_like(skip)
        cond = h[...][:, :C].astype(jnp.bfloat16)
        for l in range(L):
            d = dil_ref[l]
            off = offs_ref[l]
            two_d = 2 * d
            wp = jax.lax.rem(t, two_d)
            tap_d = off + jax.lax.rem(wp + d, two_d)
            x2 = bufs[pl.ds(off + wp, 1)][0]
            x1 = bufs[pl.ds(tap_d, 1)][0]
            hv = h[...]
            new_h, s = _body(hv, x1, x2, cond,
                             w_dil_ref[l], w_c_ref[l], w_skip_ref[l],
                             w_out_ref[l], b_ref[l])
            bufs[pl.ds(off + wp, 1)] = hv.astype(jnp.bfloat16)[None]
            h[...] = new_h * 0.7071
            skip[...] = skip[...] + s
        out_ref[...] = h[...][None]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=pl.BlockSpec((1, B, R), lambda t, *_: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((BUF, B, R), jnp.bfloat16),
                        pltpu.VMEM((B, R), jnp.float32),
                        pltpu.VMEM((B, S), jnp.float32)],
    )
    f = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((1, B, R), jnp.float32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True,
                                             vmem_limit_bytes=120 * 2**20))
    return functools.partial(f, jnp.asarray(dil), jnp.asarray(offs),
                             w["w_dil"], w["w_c"], w["w_skip"], w["w_out"],
                             w["b"])


def make_streamed():
    w = _weights(np.random.RandomState(0))
    dil = np.array([2 ** (i % 6) for i in range(L)], np.int32)
    offs = np.concatenate([[0], np.cumsum(2 * dil)[:-1]]).astype(np.int32)

    def kernel(dil_ref, offs_ref, w_dil_ref, w_c_ref, w_skip_ref, w_out_ref,
               b_ref, out_ref, bufs, h, skip):
        t = pl.program_id(0)
        l = pl.program_id(1)

        @pl.when((t == 0) & (l == 0))
        def _():
            bufs[...] = jnp.zeros_like(bufs)
            h[...] = jnp.ones_like(h)

        @pl.when(l == 0)
        def _z():
            skip[...] = jnp.zeros_like(skip)

        cond = h[...][:, :C].astype(jnp.bfloat16)
        d = dil_ref[l]
        off = offs_ref[l]
        two_d = 2 * d
        wp = jax.lax.rem(t, two_d)
        tap_d = off + jax.lax.rem(wp + d, two_d)
        x2 = bufs[pl.ds(off + wp, 1)][0]
        x1 = bufs[pl.ds(tap_d, 1)][0]
        hv = h[...]
        new_h, s = _body(hv, x1, x2, cond,
                         w_dil_ref[0], w_c_ref[0], w_skip_ref[0],
                         w_out_ref[0], b_ref[0])
        bufs[pl.ds(off + wp, 1)] = hv.astype(jnp.bfloat16)[None]
        h[...] = new_h * 0.7071
        skip[...] = skip[...] + s

        @pl.when(l == L - 1)
        def _out():
            out_ref[...] = h[...][None]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T, L),
        in_specs=[
            pl.BlockSpec((1, 3, R, G), lambda t, l, *_: (l, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, G), lambda t, l, *_: (l, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G2, S), lambda t, l, *_: (l, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G2, R), lambda t, l, *_: (l, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, G), lambda t, l, *_: (l, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, B, R), lambda t, l, *_: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((BUF, B, R), jnp.bfloat16),
                        pltpu.VMEM((B, R), jnp.float32),
                        pltpu.VMEM((B, S), jnp.float32)],
    )
    f = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((1, B, R), jnp.float32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True,
                                             vmem_limit_bytes=100 * 2**20))
    return functools.partial(f, jnp.asarray(dil), jnp.asarray(offs),
                             w["w_dil"], w["w_c"], w["w_skip"], w["w_out"],
                             w["b"])


def bench(name, f):
    t0 = time.perf_counter()
    out = f()
    _ = float(out.sum())
    compile_s = time.perf_counter() - t0
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        out = f()
        _ = float(out.sum())
        best = min(best, time.perf_counter() - t0)
    per_samp = best / T * 1e6
    print(f"{name:10s}: {per_samp:8.2f} us/sample, {per_samp/L*1000:7.0f} "
          f"ns/layer, {1e6/per_samp:8.0f} samples/s/utt  "
          f"(compile {compile_s:.0f}s)")


if __name__ == "__main__":
    import sys
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("both", "resident"):
        bench("resident", make_resident())
    if which in ("both", "streamed"):
        bench("streamed", make_streamed())
