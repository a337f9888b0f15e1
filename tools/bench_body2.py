"""Stage-wise isolation of the resident-kernel slowdown: start from the fast
37us/sample microbenchmark body and add production features cumulatively.

  stage0  bench_body resident (no streamed input, fat static out block)
  stage1  + cond input block streamed per t (1, B, C)
  stage2  + tiny output block per t (1, 1, B) instead of the fat static one
  stage3  + first_conv head + final matmuls + x_prev scratch chain
  stage4  + per-layer bias adds from resident (L, 1, G) refs
"""

import functools
import sys
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


def make(stage: int):
    rng = np.random.RandomState(0)
    w_dil = jnp.asarray(rng.randn(L, 3, R, G) * 0.02, jnp.bfloat16)
    w_c = jnp.asarray(rng.randn(L, C, G) * 0.02, jnp.bfloat16)
    w_skip = jnp.asarray(rng.randn(L, G2, S) * 0.02, jnp.bfloat16)
    w_out = jnp.asarray(rng.randn(L, G2, R) * 0.02, jnp.bfloat16)
    b_dil = jnp.asarray(rng.randn(L, 1, G) * 0.01, jnp.float32)
    w_first = jnp.asarray(rng.randn(1, R) * 0.1, jnp.float32)
    w_f1 = jnp.asarray(rng.randn(S, S) * 0.05, jnp.bfloat16)
    w_f2 = jnp.asarray(rng.randn(S, 128) * 0.05, jnp.float32)
    cond_in = jnp.asarray(rng.rand(T, B, C), jnp.float32)
    dil = np.array([2 ** (i % 6) for i in range(L)], np.int32)
    offs = np.concatenate([[0], np.cumsum(2 * dil)[:-1]]).astype(np.int32)

    def kernel(dil_ref, offs_ref, *args):
        if stage >= 1:
            cond_ref = args[0]
            args = args[1:]
        (w_dil_ref, w_c_ref, w_skip_ref, w_out_ref, b_ref,
         wf_ref, wf1_ref, wf2_ref, out_ref, bufs, h_scr, xp) = args
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            bufs[...] = jnp.zeros_like(bufs)
            h_scr[...] = jnp.ones_like(h_scr)
            xp[...] = jnp.zeros_like(xp)

        if stage >= 3:
            h = xp[:, :1] * wf_ref[0][None, :]
        else:
            h = h_scr[...]
        cond = (cond_ref[0] if stage >= 1
                else h_scr[...][:, :C]).astype(jnp.bfloat16)
        skip = None
        for l in range(L):
            d = dil_ref[l]
            off = offs_ref[l]
            two_d = 2 * d
            wp = jax.lax.rem(t, two_d)
            tap_d = off + jax.lax.rem(wp + d, two_d)
            x2 = bufs[pl.ds(off + wp, 1)][0]
            x1 = bufs[pl.ds(tap_d, 1)][0]
            conv = (jnp.dot(x2, w_dil_ref[l, 0], preferred_element_type=jnp.float32)
                    + jnp.dot(x1, w_dil_ref[l, 1], preferred_element_type=jnp.float32)
                    + jnp.dot(h.astype(jnp.bfloat16), w_dil_ref[l, 2],
                              preferred_element_type=jnp.float32)
                    + jnp.dot(cond, w_c_ref[l], preferred_element_type=jnp.float32))
            if stage >= 4:
                conv = conv + b_ref[l, 0]
            a, g = conv[:, :G2], conv[:, G2:]
            gated = (jnp.tanh(a) * jax.nn.sigmoid(g)).astype(jnp.bfloat16)
            s = jnp.dot(gated, w_skip_ref[l], preferred_element_type=jnp.float32)
            res = jnp.dot(gated, w_out_ref[l], preferred_element_type=jnp.float32)
            bufs[pl.ds(off + wp, 1)] = h.astype(jnp.bfloat16)[None]
            h = (res + h) * 0.7071
            skip = s if skip is None else (skip + s) * 0.7071

        if stage >= 3:
            o = jax.nn.relu(skip)
            o = jax.nn.relu(jnp.dot(o.astype(jnp.bfloat16), wf1_ref[...],
                                    preferred_element_type=jnp.float32))
            y = jnp.dot(o, wf2_ref[...], preferred_element_type=jnp.float32)
            x = jnp.clip(y[:, 0], -1, 1)
            xp[...] = jnp.broadcast_to(x[:, None], xp.shape)
        h_scr[...] = h
        if stage >= 2:
            out_ref[...] = h[:, :1].reshape(1, 1, B) if False else \
                jnp.zeros((1, 1, B), jnp.float32) + h[:1, :B].reshape(1, 1, B)
        else:
            out_ref[...] = h[None]

    in_specs = []
    extra_args = []
    if stage >= 1:
        in_specs.append(pl.BlockSpec((1, B, C), lambda t, *_: (t, 0, 0),
                                     memory_space=pltpu.VMEM))
        extra_args.append(cond_in)
    in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)] * 8
    if stage >= 2:
        out_specs = pl.BlockSpec((1, 1, B), lambda t, *_: (t, 0, 0),
                                 memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((T, 1, B), jnp.float32)
    else:
        out_specs = pl.BlockSpec((1, B, R), lambda t, *_: (0, 0, 0),
                                 memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((1, B, R), jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2, grid=(T,), in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[pltpu.VMEM((BUF, B, R), jnp.bfloat16),
                        pltpu.VMEM((B, R), jnp.float32),
                        pltpu.VMEM((B, 128), jnp.float32)])
    f = pl.pallas_call(kernel, grid_spec=grid_spec, out_shape=out_shape,
                       compiler_params=pltpu.CompilerParams(
                           has_side_effects=True,
                           vmem_limit_bytes=120 * 2**20))
    return functools.partial(f, jnp.asarray(dil), jnp.asarray(offs),
                             *extra_args, w_dil, w_c, w_skip, w_out, b_dil,
                             w_first, w_f1, w_f2)


if __name__ == "__main__":
    stages = [int(s) for s in sys.argv[1:]] or [0, 1, 2, 3, 4]
    for st in stages:
        f = make(st)
        out = f()
        _ = float(out.sum())
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            out = f()
            _ = float(out.sum())
            best = min(best, time.perf_counter() - t0)
        us = best / T * 1e6
        print(f"stage{st}: {us:8.2f} us/sample  {1e6/us:8.0f} samples/s/utt")
