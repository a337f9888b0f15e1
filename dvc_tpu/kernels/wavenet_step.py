"""Fused Pallas TPU kernel: WaveNet autoregressive MoL generation.

This replaces the reference's sample-serial Python `incremental_forward`
(preprocessing/processing.py:45-74 — the dominating cost of the whole
conversion path, SURVEY.md §3.2) with ONE Pallas kernel for the entire
generation:

  * grid = (T_samples, n_layers), executed serially on the core — the
    autoregressive dependence lives in VMEM scratch between grid steps;
  * per-layer dilated-conv state is a VMEM ring buffer (the fast-wavenet
    queue): layer l keeps its last 2*dilation inputs; the write head is
    t mod 2d, so no data ever shifts;
  * the big per-layer weights (dilated conv + out projection) stream from
    HBM via the grid's BlockSpec index_map — Pallas double-buffers the next
    layer's block automatically while the MXU chews the current one, so the
    kernel runs at the HBM-bandwidth speed-of-light for this serial model
    (~weights_bytes / HBM_BW per sample, amortized over the whole batch);
  * ALL per-layer weights (dilated conv, cond, skip, out projections)
    stream per layer — keeping any resident measured 2.45x SLOWER (resident
    w_c/w_skip forced worse VMEM layouts); biases stay resident;
  * mixture-of-logistics sampling happens in-kernel with the TPU PRNG
    (pltpu.prng_seed / prng_random_bits), so no host round-trip per sample.

Numerical contract: identical to models.wavenet.fast_generate (and therefore
to the teacher-forced conv forward) up to the RNG stream, which here is the
TPU hardware PRNG instead of jax.random.

TWO kernel variants, auto-dispatched by VMEM footprint:
  * RESIDENT (default, batch <= ~96): grid (T,), ALL weights live in VMEM
    (49 MB bf16) and the 24-layer loop is statically unrolled — no weight
    DMA, no per-layer grid bookkeeping.
  * STREAMED (large batch): grid (T, L), per-layer weight blocks DMA'd via
    BlockSpec index_map (double-buffered by Pallas).

Measured (v5e, full 24-layer config, bf16 weights; best-of-3 with
value-fetch-closed timing — this environment's block_until_ready acks early):
    resident b=1:  76.0k samples/s/utt (4.7x realtime single stream)
    resident b=8:  71.3k samples/s/utt (570k aggregate)
    resident b=64: 44.3k samples/s/utt (2.84M aggregate)
    resident b=96: 32.6k samples/s/utt (3.13M aggregate — 196x realtime)
    streamed b=128: 5.7k samples/s/utt (735k aggregate)
Round-2 findings (tools/bench_taps.py / bench_body*.py): the round-1
"ring-buffer dynamic read" hypothesis was WRONG — dynamic VMEM taps cost the
same as static; the 14 us/layer was the (T, L) grid's per-layer block
plumbing (streamed body 3.9 us/layer vs 1.6 resident), plus TWO host-side
per-call costs that dwarfed the kernel: re-packing/re-uploading 50 MB of
weights (fixed by pack_wavenet_params_cached) and re-tracing/lowering the
pallas_call (~3 s/call on this 1-core host; fixed by the _resident_call
lru_cache + jit).
Round-1 tuning history (streamed): (a) the 16MB scoped-vmem cap was a
compiler default — vmem_limit_bytes raises it; (b) streaming biases as
blocks gave +77%% at b128; (c) fusing the 6 matmuls into 2 measured 3.4x
WORSE (concat copies), so fuse_matmuls defaults off.


int8 weight streaming (quantize_int8=True) is available — halves HBM bytes
with per-out-channel scales, trajectory deviation < 0.01 — but measured
SLOWER than bf16 at batch 16 (1521 vs 2187 samples/s/utt under host
contention): the per-matmul int8->bf16 cast costs more than the saved DMA
at this batch.  Revisit if the loop becomes DMA-bound (larger batch).

SINGLE-STREAM LATENCY RECORD (round 3; v5e, b=1, device-side timing over a
192-frame utterance — the short-utterance "76k" headline includes ~29 ms
of this environment's per-call tunnel dispatch+fetch):
  measured floor: 11.7 us/sample = 85.5k samples/s = 5.3x realtime.
  decomposition (layer-count + channel-width sweeps):
    per layer 407 ns = ~271 ns VMEM->MXU weight reads (2.05 MB/layer at a
    measured ~7.5 TB/s effective) + ~136 ns issue/fixed;
    per sample +2.14 us tail (final1/final2 + MoL sampling + grid step).
  bf16 speed of light: 49.1 MB of weights must cross VMEM->MXU per sample
  = 6.5 us = 9.6x realtime at ZERO overhead, so >10x realtime single
  stream is INFEASIBLE for this model in bf16 on one chip.  Experiments,
  all measured on-chip and all negative:
    * samples_per_step 2/4/8 grid unroll: +-2%, worse at 8 (grid
      bookkeeping is not a cost; the knob stays);
    * fused input-side matmul ([x_2d|x_d|x_t|cond] @ w_cat via aligned
      xcat scratch writes): 10% SLOWER — the scratch writes serialize
      against the big dot while separate dots pipeline from the taps;
    * fused output-side gated @ [w_skip|w_out]: 4% slower (same effect);
    * single-PRNG-call MoL tail: within noise (knob stays);
    * int8 arithmetic: saves ~135 ns/layer of reads but adds per-layer
      activation quantization on the serial path (~100 ns) + quality risk
      — net ~35 ns/layer best case; not taken (see streamed int8 above).
  Multi-chip: a tensor-parallel split needs >=1 psum (2 ICI hops) per
  layer ON the serial path — at ~1 us/hop that is +48 us vs the 9.8 us of
  layer compute it halves; a layer-pipeline split leaves the serial chain
  length unchanged.  Both decisively negative for latency (they help
  aggregate/VMEM only).  Latency-critical serving should use the
  non-autoregressive iSTFT vocoder family (models/istft_vocoder.py,
  87x realtime single stream measured) — the AR WaveNet path exists for
  reference parity and maximum quality.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dvc_tpu.config import VocoderConfig
from dvc_tpu.models.wavenet import WaveNet

SQRT_HALF = np.float32(math.sqrt(0.5))


def _quantize_int8(w: np.ndarray, axis_last: bool = True):
    """Per-output-channel symmetric int8 quantization: w ~= q * scale with
    scale over all axes but the last (output-channel) axis."""
    red = tuple(range(w.ndim - 1))
    scale = np.max(np.abs(w), axis=red, keepdims=True) / 127.0
    scale = np.maximum(scale, 1e-12)
    q = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
    return q, np.squeeze(scale, axis=red).astype(np.float32)


_PACK_CACHE: dict = {}


def pack_wavenet_params_cached(params: dict, cfg: VocoderConfig,
                               dtype=jnp.bfloat16,
                               quantize: bool = False,
                               fused: bool = False) -> dict:
    """Memoized pack_wavenet_params.  Packing stacks ~25M host-side params
    and uploads ~50 MB to the device — done per CALL it dominates generation
    (measured 568 vs ~25k samples/s/utt); callers converting many utterances
    with the same weights must hit this cache."""
    # cfg participates BY VALUE (frozen dataclass): an id() key could alias a
    # recycled address from a garbage-collected config of different geometry
    key = (id(params), str(dtype), quantize, fused, cfg)
    hit = _PACK_CACHE.get(key)
    if hit is not None and hit[0] is params:
        return hit[1]
    packed = pack_wavenet_params(params, cfg, dtype, quantize, fused=fused)
    if len(_PACK_CACHE) > 4:
        _PACK_CACHE.clear()
    _PACK_CACHE[key] = (params, packed)  # strong ref keeps id() stable
    return packed


def pack_wavenet_params(params: dict, cfg: VocoderConfig,
                        dtype=jnp.bfloat16, quantize: bool = False,
                        fused: bool = False) -> dict:
    """Flax param tree -> packed, layer-stacked arrays for the kernel.

    quantize=True stores the four streamed weight families as int8 with
    per-(layer, tap, out-channel) scales — halves the per-sample HBM traffic
    that bounds the AR loop; dequantization is a post-matmul row scale.

    fused=True additionally builds the concatenated w_cat/w_so layouts used
    by the fuse_matmuls experiment; by default small dummies are stored so
    the common paths don't pack and upload an extra ~49 MB they never read.
    """
    L = cfg.layers

    def p(*path):
        t = params
        for k in path:
            t = t[k]
        return np.asarray(t)

    w_dil = np.stack([p(f"layer{i}", "conv", "kernel") for i in range(L)])
    b_dil = np.stack([p(f"layer{i}", "conv", "bias") for i in range(L)])
    w_c = np.stack([p(f"layer{i}", "conv1x1c", "kernel")[0] for i in range(L)])
    w_skip = np.stack([p(f"layer{i}", "conv1x1_skip", "kernel")[0] for i in range(L)])
    b_skip = np.stack([p(f"layer{i}", "conv1x1_skip", "bias") for i in range(L)])
    w_out = np.stack([p(f"layer{i}", "conv1x1_out", "kernel")[0] for i in range(L)])
    b_out = np.stack([p(f"layer{i}", "conv1x1_out", "bias") for i in range(L)])

    dil = np.array([cfg.dilation(i) for i in range(L)], np.int32)
    offs = np.concatenate([[0], np.cumsum(2 * dil)[:-1]]).astype(np.int32)

    # fused layouts: one input-side matmul [x_2d; x_d; x_t; cond] @ w_cat and
    # one output-side matmul gated @ [w_skip | w_out] — six small matmuls per
    # layer became two (small-M matmul issue overhead dominated the body)
    if fused and not quantize:
        w_cat = np.concatenate([w_dil[:, 0], w_dil[:, 1], w_dil[:, 2], w_c],
                               axis=1)                  # (L, 3R+C, G)
        w_so = np.concatenate([w_skip, w_out], axis=2)  # (L, G2, S+R)
    else:
        w_cat = np.zeros((L, 1, 1), np.float32)
        w_so = np.zeros((L, 1, 1), np.float32)

    if quantize:
        qd = np.empty_like(w_dil, dtype=np.int8)
        sd = np.empty((L, 3, w_dil.shape[-1]), np.float32)
        for li in range(L):
            for tap in range(3):
                qd[li, tap], sd[li, tap] = _quantize_int8(w_dil[li, tap])
        qo = np.empty_like(w_out, dtype=np.int8)
        so = np.empty((L, w_out.shape[-1]), np.float32)
        qc = np.empty_like(w_c, dtype=np.int8)
        sc = np.empty((L, w_c.shape[-1]), np.float32)
        qs = np.empty_like(w_skip, dtype=np.int8)
        ss = np.empty((L, w_skip.shape[-1]), np.float32)
        for li in range(L):
            qo[li], so[li] = _quantize_int8(w_out[li])
            qc[li], sc[li] = _quantize_int8(w_c[li])
            qs[li], ss[li] = _quantize_int8(w_skip[li])
        w_dil, w_out, w_c, w_skip = qd, qo, qc, qs
        scales = {"s_dil": jnp.asarray(sd), "s_out": jnp.asarray(so),
                  "s_c": jnp.asarray(sc), "s_skip": jnp.asarray(ss)}
        wdt = jnp.int8
        # rebuilding fused layouts from the quantized tensors is not
        # supported; the quantized path keeps the unfused 6-matmul body
        w_cat = w_cat.astype(np.int8)
        w_so = w_so.astype(np.int8)
    else:
        scales = {}
        wdt = dtype

    return {
        **scales,
        "quantized": quantize,
        # streamed per layer
        "w_dil": jnp.asarray(w_dil, wdt),                    # (L, 3, R, G)
        "w_out": jnp.asarray(w_out, wdt),                    # (L, G/2, R)
        "w_c": jnp.asarray(w_c, wdt),                        # (L, C, G)
        "w_skip": jnp.asarray(w_skip, wdt),                  # (L, G/2, S)
        "w_cat": jnp.asarray(w_cat, wdt),                    # (L, 3R+C, G)
        "w_so": jnp.asarray(w_so, wdt),                      # (L, G/2, S+R)
        "b_dil": jnp.asarray(b_dil, jnp.float32)[:, None, :],    # (L, 1, G)
        "b_skip": jnp.asarray(b_skip, jnp.float32)[:, None, :],  # (L, 1, S)
        "b_out": jnp.asarray(b_out, jnp.float32)[:, None, :],    # (L, 1, R)
        "w_first": jnp.asarray(p("first_conv", "kernel")[0], jnp.float32),  # (1, R)
        "b_first": jnp.asarray(p("first_conv", "bias"), jnp.float32)[None, :],
        "w_f1": jnp.asarray(p("final1", "kernel")[0], dtype),  # (S, S)
        "b_f1": jnp.asarray(p("final1", "bias"), jnp.float32)[None, :],
        "w_f2": jnp.asarray(p("final2", "kernel")[0], jnp.float32),  # (S, K)
        "b_f2": jnp.asarray(p("final2", "bias"), jnp.float32)[None, :],
        "dil": jnp.asarray(dil),                             # (L,) SMEM
        "offs": jnp.asarray(offs),                           # (L,) SMEM
        "buf_total": int((2 * dil).sum()),
    }


def _uniform_from_bits(bits):
    """uint32 random bits -> uniform floats in (eps, 1-eps)."""
    f = bits.astype(jnp.float32) * (1.0 / 4294967296.0) + 0.5
    return jnp.clip(f, 1e-5, 1.0 - 1e-5)


def _mol_sample(y_hat, batch, nr_mix, log_scale_min, deterministic,
                single_draw: bool = False):
    """In-kernel MoL sampling (B, 3K) -> (B,): gumbel-max mixture selection +
    logistic inverse CDF; deterministic mode returns the argmax mixture mean.

    single_draw=True takes all randomness from ONE prng_random_bits call
    (the per-call issue cost is on the serial per-sample path); the RNG
    stream differs from the two-call layout but the distribution is
    identical."""
    logit = y_hat[:, :nr_mix]
    if deterministic:
        gumb = jnp.zeros_like(logit)
        u2 = None
    elif single_draw:
        u = _uniform_from_bits(pltpu.bitcast(
            pltpu.prng_random_bits((batch, 2 * nr_mix)), jnp.int32))
        gumb = -jnp.log(-jnp.log(u[:, :nr_mix]))
        u2 = u[:, nr_mix]
    else:
        u1 = _uniform_from_bits(pltpu.bitcast(
            pltpu.prng_random_bits((batch, nr_mix)), jnp.int32))
        gumb = -jnp.log(-jnp.log(u1))
        u2 = None
    sel_idx = jnp.argmax(logit + gumb, axis=-1)
    onehot = (jax.lax.broadcasted_iota(jnp.int32, (batch, nr_mix), 1)
              == sel_idx[:, None]).astype(jnp.float32)
    mean = jnp.sum(y_hat[:, nr_mix:2 * nr_mix] * onehot, axis=-1)
    log_s = jnp.maximum(
        jnp.sum(y_hat[:, 2 * nr_mix:] * onehot, axis=-1), log_scale_min)
    if deterministic:
        x = mean
    else:
        if u2 is None:
            u2 = _uniform_from_bits(pltpu.bitcast(
                pltpu.prng_random_bits((batch, nr_mix)), jnp.int32))[:, 0]
        x = mean + jnp.exp(log_s) * (jnp.log(u2) - jnp.log1p(-u2))
    return jnp.clip(x, -1.0, 1.0)


def _make_kernel_resident(cfg: VocoderConfig, batch: int,
                          deterministic: bool = False, sb: int = 1,
                          single_draw: bool = False):
    """v3 kernel: grid (T,) with ALL weights RESIDENT in VMEM and the layer
    loop statically unrolled (static weight indexing, no per-layer grid
    bookkeeping, no weight DMA in the loop).  Microbenchmarks on v5e showed
    the streamed (T, L) structure pays ~4 us/layer of block plumbing while
    the whole resident body runs in ~1.6 us/layer; the full model's weights
    (49 MB bf16) plus the ring buffers fit VMEM up to batch ~64.

    sb = samples per grid step: the sb>1 body generates sb consecutive
    samples serially inside ONE grid iteration, amortizing Mosaic's
    per-iteration bookkeeping and the cond/out block DMAs over sb samples
    (the autoregressive dependence is unchanged — sample j+1 reads the
    x_prev produced by sample j within the same body)."""
    L = cfg.layers
    R = cfg.residual_channels
    G = cfg.gate_channels
    G2 = G // 2
    S = cfg.skip_out_channels
    K = cfg.out_channels
    nr_mix = K // 3
    legacy = cfg.legacy
    log_scale_min = np.float32(cfg.log_scale_min)
    dil_static = [cfg.dilation(i) for i in range(L)]
    offs_static = np.concatenate([[0], np.cumsum([2 * d for d in dil_static])[:-1]])

    def kernel(seed_ref,                                    # scalar prefetch
               cond_ref,                                    # (sb, B, C) idx t
               w_dil_ref, w_out_ref, w_c_ref, w_skip_ref,   # resident (L,...)
               b_dil_ref, b_skip_ref, b_out_ref,            # resident biases
               w_first_ref, b_first_ref, w_f1_ref, b_f1_ref, w_f2_ref, b_f2_ref,
               out_ref, bufs, x_prev):                      # out + scratch
        tb = pl.program_id(0)

        @pl.when(tb == 0)
        def _init():
            if not deterministic:
                pltpu.prng_seed(seed_ref[0])
            bufs[...] = jnp.zeros_like(bufs)
            x_prev[...] = jnp.zeros_like(x_prev)

        cd = w_dil_ref.dtype
        for j in range(sb):
            t = tb * sb + j                            # absolute sample index
            x_col = x_prev[:, :1]
            h = x_col * w_first_ref[0][None, :] + b_first_ref[0][None, :]
            cond = cond_ref[j]
            skip = None

            for ll in range(L):
                d = dil_static[ll]
                off = int(offs_static[ll])
                two_d = 2 * d
                wp = jax.lax.rem(t, two_d)             # dynamic within buffer
                tap_d = off + jax.lax.rem(wp + d, two_d)
                tap_2d = off + wp
                x_tm2d = bufs[pl.ds(tap_2d, 1)][0].astype(jnp.float32)
                x_tmd = bufs[pl.ds(tap_d, 1)][0].astype(jnp.float32)

                conv = (jnp.dot(x_tm2d.astype(cd), w_dil_ref[ll, 0],
                                preferred_element_type=jnp.float32)
                        + jnp.dot(x_tmd.astype(cd), w_dil_ref[ll, 1],
                                  preferred_element_type=jnp.float32)
                        + jnp.dot(h.astype(cd), w_dil_ref[ll, 2],
                                  preferred_element_type=jnp.float32)
                        + jnp.dot(cond.astype(cd), w_c_ref[ll],
                                  preferred_element_type=jnp.float32)
                        + b_dil_ref[ll, 0])
                a = conv[:, :G2]
                g = conv[:, G2:]
                gated = jnp.tanh(a) * jax.nn.sigmoid(g)

                s = (jnp.dot(gated.astype(cd), w_skip_ref[ll],
                             preferred_element_type=jnp.float32)
                     + b_skip_ref[ll, 0])
                res = (jnp.dot(gated.astype(cd), w_out_ref[ll],
                               preferred_element_type=jnp.float32)
                       + b_out_ref[ll, 0])

                bufs[pl.ds(tap_2d, 1)] = h.astype(bufs.dtype)[None]
                h = (res + h) * SQRT_HALF
                if skip is None:
                    skip = s
                else:
                    skip = (skip + s) * (SQRT_HALF if legacy else 1.0)

            o = jax.nn.relu(skip)
            o = jax.nn.relu(jnp.dot(o.astype(w_f1_ref.dtype), w_f1_ref[...],
                                    preferred_element_type=jnp.float32)
                            + b_f1_ref[0][None, :])
            y_hat = jnp.dot(o, w_f2_ref[...],
                            preferred_element_type=jnp.float32) + b_f2_ref[0][None, :]
            x = _mol_sample(y_hat, batch, nr_mix, log_scale_min, deterministic,
                            single_draw=single_draw)
            x_prev[...] = jnp.broadcast_to(x[:, None], x_prev.shape)
            out_ref[j] = x[None, :]

    return kernel


@functools.lru_cache(maxsize=16)
def _resident_call(cfg: VocoderConfig, b: int, t_total: int, C: int,
                   buf_total: int, wdt_name: str, deterministic: bool,
                   interpret: bool, sb: int = 1, single_draw: bool = False):
    """Build (once per shape signature) the jitted resident-kernel callable.

    Rebuilding pl.pallas_call per invocation re-traces + re-lowers the
    24-layer unrolled kernel on the host every call (~3 s of fixed overhead
    per utterance on a 1-core host, measured) — caching the jitted function
    removes it."""
    assert t_total % sb == 0, (t_total, sb)
    kernel = _make_kernel_resident(cfg, b, deterministic=deterministic, sb=sb,
                                   single_draw=single_draw)
    wdt = jnp.dtype(wdt_name)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # seed
        grid=(t_total // sb,),
        in_specs=[
            pl.BlockSpec((sb, b, C), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),       # cond (T, B, C)
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 13,
        out_specs=pl.BlockSpec((sb, 1, b), lambda t, *_: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((buf_total, b, cfg.residual_channels), wdt),
            pltpu.VMEM((b, 128), jnp.float32),           # x_prev
        ],
    )
    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((t_total, 1, b), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
        interpret=interpret,
    )

    def run(seed_arr, cond_tbc, *weights):
        return call(seed_arr, cond_tbc, *weights)[:, 0, :].T

    return run if interpret else jax.jit(run)


def pallas_generate_resident(packed: dict, cond: jax.Array, seed: int,
                             cfg: VocoderConfig, interpret: bool = False,
                             deterministic: bool = False,
                             samples_per_step: int = 1,
                             single_draw: bool = False) -> jax.Array:
    """Resident-weights generation path; cond is (B, T, C) upsampled.

    samples_per_step > 1 unrolls that many consecutive samples into one
    grid iteration (see _make_kernel_resident); T is padded up to a
    multiple and the output trimmed back.  single_draw takes each sample's
    MoL randomness from one PRNG call instead of two.  Both measured
    within noise of the default at b=1 on v5e (see module docstring) —
    they stay as granularity knobs, not defaults."""
    b, t_total, C = cond.shape
    sb = samples_per_step
    t_pad = (-t_total) % sb
    if t_pad:
        cond = jnp.concatenate(
            [cond, jnp.zeros((b, t_pad, C), cond.dtype)], axis=1)
    run = _resident_call(cfg, b, t_total + t_pad, C, packed["buf_total"],
                         str(packed["w_dil"].dtype), deterministic, interpret,
                         sb, single_draw)
    out = run(jnp.asarray([seed], jnp.int32),
              jnp.swapaxes(cond, 0, 1).astype(jnp.float32),
              packed["w_dil"], packed["w_out"], packed["w_c"],
              packed["w_skip"], packed["b_dil"], packed["b_skip"],
              packed["b_out"], packed["w_first"], packed["b_first"],
              packed["w_f1"], packed["b_f1"], packed["w_f2"],
              packed["b_f2"])
    return out[:, :t_total] if t_pad else out


def _make_kernel(cfg: VocoderConfig, t_total: int, batch: int,
                 deterministic: bool = False, quantized: bool = False,
                 lb: int = 1, fused: bool = False):
    """lb = layers per grid block: the (T, L) grid pays Mosaic's per-iteration
    bookkeeping L times per sample; lb>1 runs lb statically-unrolled layers
    per iteration (weight blocks of lb layers stream together), trading VMEM
    for fewer grid iterations.  Measured at b=64: lb=1 168k, lb=4 95k,
    lb=6 113k samples/s aggregate — coarser weight blocks LOSE pipelining
    granularity, so lb=1 (the default) is optimal on v5e; the knob stays for
    other parts/configs."""
    L = cfg.layers
    assert L % lb == 0, (L, lb)
    R = cfg.residual_channels
    G = cfg.gate_channels
    G2 = G // 2
    S = cfg.skip_out_channels
    K = cfg.out_channels
    nr_mix = K // 3
    legacy = cfg.legacy
    log_scale_min = np.float32(cfg.log_scale_min)

    def kernel(dil_ref, offs_ref, seed_ref,               # scalar prefetch (SMEM)
               cond_ref,                                   # (1, B, C) VMEM, idx t
               w_dil_ref,                                  # (lb, 3, R, G) VMEM, idx l
               w_out_ref,                                  # (lb, G2, R) VMEM, idx l
               w_c_ref, w_skip_ref,                        # (lb, C, G), (lb, G2, S) idx l
               s_dil_ref, s_out_ref, s_c_ref, s_skip_ref,  # int8 scales (resident)
               b_dil_ref, b_skip_ref, b_out_ref,           # resident biases
               w_first_ref, b_first_ref, w_f1_ref, b_f1_ref, w_f2_ref, b_f2_ref,
               out_ref,                                    # (1, 1, B) VMEM, idx t
               bufs, h_scr, skip_scr, x_prev):             # scratch
        t = pl.program_id(0)
        l = pl.program_id(1)

        @pl.when((t == 0) & (l == 0))
        def _init():
            if not deterministic:
                pltpu.prng_seed(seed_ref[0])
            bufs[...] = jnp.zeros_like(bufs)
            x_prev[...] = jnp.zeros_like(x_prev)

        @pl.when(l == 0)
        def _first():
            # first_conv (k=1): per-sample scalar input scales the weight row
            x_col = x_prev[:, :1]  # (B, 1); lanes 1.. are copies
            h_scr[...] = x_col * w_first_ref[0][None, :] + b_first_ref[0][None, :]
            skip_scr[...] = jnp.zeros_like(skip_scr)

        cd = jnp.bfloat16 if quantized else w_dil_ref.dtype

        def mm(xv, wv, scale_row=None):
            y = jnp.dot(xv.astype(cd), wv.astype(cd),
                        preferred_element_type=jnp.float32)
            if quantized:
                y = y * scale_row
            return y

        for j in range(lb):
            ll = l * lb + j                        # absolute layer index
            d = dil_ref[ll]
            off = offs_ref[ll]
            two_d = 2 * d
            wp = jax.lax.rem(t, two_d)             # write head == x_{t-2d} slot
            tap_d = off + jax.lax.rem(wp + d, two_d)   # x_{t-d}
            tap_2d = off + wp                      # x_{t-2d}

            h_in = h_scr[...]                      # (B, R) f32 — layer input
            x_tm2d = bufs[pl.ds(tap_2d, 1)][0].astype(jnp.float32)
            x_tmd = bufs[pl.ds(tap_d, 1)][0].astype(jnp.float32)

            if fused:
                # ONE input-side matmul over [x_2d; x_d; x_t; cond] and one
                # output-side matmul [skip | out] — small-M matmul issue
                # overhead dominated the 6-matmul body
                xcat = jnp.concatenate(
                    [x_tm2d, x_tmd, h_in, cond_ref[0].astype(jnp.float32)],
                    axis=-1)
                conv = (mm(xcat, w_dil_ref[j])       # w_cat block (3R+C, G)
                        + b_dil_ref[j, 0])
                a = conv[:, :G2]
                g = conv[:, G2:]
                gated = jnp.tanh(a) * jax.nn.sigmoid(g)
                so = mm(gated, w_out_ref[j])         # w_so block (G2, S+R)
                s = so[:, :S] + b_skip_ref[j, 0]
                res = so[:, S:] + b_out_ref[j, 0]
            else:
                w = w_dil_ref[j]                       # (3, R, G)
                sd = s_dil_ref[pl.ds(ll, 1)][0] if quantized else None  # (3, G)
                conv = (mm(x_tm2d, w[0], sd[0][None, :] if quantized else None)
                        + mm(x_tmd, w[1], sd[1][None, :] if quantized else None)
                        + mm(h_in, w[2], sd[2][None, :] if quantized else None)
                        + b_dil_ref[j, 0]
                        + mm(cond_ref[0], w_c_ref[j],
                             s_c_ref[pl.ds(ll, 1)][0][None, :] if quantized else None))
                a = conv[:, :G2]
                g = conv[:, G2:]
                gated = jnp.tanh(a) * jax.nn.sigmoid(g)    # (B, G2) f32

                s = (mm(gated, w_skip_ref[j],
                        s_skip_ref[pl.ds(ll, 1)][0][None, :] if quantized else None)
                     + b_skip_ref[j, 0])
                res = (mm(gated, w_out_ref[j],
                          s_out_ref[pl.ds(ll, 1)][0][None, :] if quantized else None)
                       + b_out_ref[j, 0])

            # push this layer's input into its ring buffer (overwrites x_{t-2d})
            bufs[pl.ds(tap_2d, 1)] = h_in.astype(bufs.dtype)[None]

            h_scr[...] = (res + h_in) * SQRT_HALF
            scale = SQRT_HALF if legacy else 1.0
            if j == 0:
                prev = skip_scr[...]
                skip_scr[...] = jnp.where(l == 0, s, (prev + s) * scale)
            else:
                skip_scr[...] = (skip_scr[...] + s) * scale

        @pl.when(l == (L // lb) - 1)
        def _final():
            o = jax.nn.relu(skip_scr[...])
            o = jax.nn.relu(jnp.dot(o.astype(w_f1_ref.dtype), w_f1_ref[...],
                                    preferred_element_type=jnp.float32)
                            + b_f1_ref[0][None, :])
            y_hat = jnp.dot(o, w_f2_ref[...],
                            preferred_element_type=jnp.float32) + b_f2_ref[0][None, :]
            x = _mol_sample(y_hat, batch, nr_mix, log_scale_min, deterministic)
            x_prev[...] = jnp.broadcast_to(x[:, None], x_prev.shape)
            out_ref[...] = x[None, None, :]

    return kernel


@functools.lru_cache(maxsize=4)
def _upsample_jit(cfg: VocoderConfig):
    from flax import linen as nn
    return jax.jit(nn.apply(lambda m, c: m.upsample(c), WaveNet(cfg)))


def _resident_fits(packed: dict, cfg: VocoderConfig, batch: int,
                   budget_bytes: int = 100 * 1024 * 1024) -> bool:
    """Estimate whether all weights + ring buffers fit VMEM for the resident
    kernel (v5e exposes well over the 16MB compiler-default scoped limit)."""
    itemsize = jnp.dtype(packed["w_dil"].dtype).itemsize
    weights = sum(int(np.prod(packed[k].shape)) for k in
                  ("w_dil", "w_out", "w_c", "w_skip")) * itemsize
    bufs = packed["buf_total"] * batch * cfg.residual_channels * itemsize
    return weights + bufs < budget_bytes


def pallas_generate(variables: dict, c_frames: jax.Array, seed: int,
                    cfg: VocoderConfig = VocoderConfig(),
                    interpret: bool = False,
                    weight_dtype=jnp.bfloat16,
                    deterministic: bool = False,
                    quantize_int8: bool = False,
                    layers_per_block: int = 1,
                    fuse_matmuls: bool = False,
                    resident: bool | None = None) -> jax.Array:
    """(B, T_frames, n_mels) mel -> (B, T_frames * hop) sampled waveform.

    resident (default auto): keep ALL weights in VMEM and unroll the layer
    loop in a grid-(T,) kernel — 2938 -> ~25k samples/s/utt on v5e (the
    streamed (T, L) grid paid ~4x the body time in per-layer block plumbing).
    Falls back to the streamed kernel when weights + ring buffers exceed
    VMEM (large batch) or int8 streaming is requested.

    quantize_int8: stream the four big weight families as int8 with
    per-output-channel scales (half the HBM traffic of bf16); activations
    and accumulations stay bf16/f32.
    """
    packed = pack_wavenet_params_cached(variables["params"], cfg, weight_dtype,
                                        quantize=quantize_int8,
                                        fused=fuse_matmuls and not quantize_int8)
    # upsample conditioning once, batched, outside the kernel — JITTED: run
    # eagerly this dispatches dozens of ops one by one (seconds of fixed
    # overhead per call over a remote-device link)
    cond = _upsample_jit(cfg)(variables, c_frames)  # (B, T, C)
    b, t_total, C = cond.shape

    if resident is None:
        resident = (not quantize_int8 and not fuse_matmuls
                    and layers_per_block == 1)
    if resident:
        assert not quantize_int8, "resident path is bf16/f32 only"
        if _resident_fits(packed, cfg, b):
            return pallas_generate_resident(packed, cond, seed, cfg,
                                            interpret=interpret,
                                            deterministic=deterministic)
        # batch too large for resident ring buffers: run resident-sized
        # sub-batches sequentially — at b=128 two resident b=64 passes
        # measured ~3.9x the streamed kernel's aggregate (2.84M vs 735k
        # samples/s)
        sub = b
        while sub > 1 and not _resident_fits(packed, cfg, sub):
            sub //= 2
        if _resident_fits(packed, cfg, sub):
            outs = [pallas_generate_resident(packed, cond[i:i + sub], seed + i,
                                             cfg, interpret=interpret,
                                             deterministic=deterministic)
                    for i in range(0, b, sub)]
            return jnp.concatenate(outs, axis=0)
        # the WEIGHTS alone exceed the VMEM budget (bigger-than-default
        # model): resident is impossible at any batch — stream from HBM
        resident = False

    L = cfg.layers
    R = cfg.residual_channels
    G = cfg.gate_channels
    G2 = G // 2
    S = cfg.skip_out_channels
    C_dim = cfg.cin_channels

    lb = layers_per_block
    fused = fuse_matmuls and not quantize_int8
    act_dtype = jnp.bfloat16 if quantize_int8 else weight_dtype
    run = _streamed_call(cfg, t_total, b, C, packed["buf_total"], lb, fused,
                         quantize_int8, jnp.dtype(act_dtype).name,
                         deterministic, interpret)
    L_dim = cfg.layers
    G = cfg.gate_channels
    if quantize_int8:
        scale_args = (packed["s_dil"], packed["s_out"], packed["s_c"],
                      packed["s_skip"])
    else:
        scale_args = (jnp.zeros((L_dim, 3, G), jnp.float32),
                      jnp.zeros((L_dim, cfg.residual_channels), jnp.float32),
                      jnp.zeros((L_dim, G), jnp.float32),
                      jnp.zeros((L_dim, cfg.skip_out_channels), jnp.float32))
    return run(
        packed["dil"], packed["offs"], jnp.asarray([seed], jnp.int32),
        jnp.swapaxes(cond, 0, 1).astype(jnp.float32),   # (T, B, C)
        *((packed["w_cat"], packed["w_so"],
           jnp.zeros((1, 8, 128), jnp.float32),
           jnp.zeros((1, 8, 128), jnp.float32))
          if fused else
          (packed["w_dil"], packed["w_out"], packed["w_c"], packed["w_skip"])),
        *scale_args,
        packed["b_dil"], packed["b_skip"], packed["b_out"],
        packed["w_first"], packed["b_first"], packed["w_f1"], packed["b_f1"],
        packed["w_f2"], packed["b_f2"])


@functools.lru_cache(maxsize=16)
def _streamed_call(cfg: VocoderConfig, t_total: int, b: int, C: int,
                   buf_total: int, lb: int, fused: bool, quantized: bool,
                   act_dtype_name: str, deterministic: bool,
                   interpret: bool):
    """Build (once per shape signature) the jitted streamed-kernel callable
    — the same trace-cache the resident path has (rebuilding pallas_call
    per invocation pays ~3 s of host trace/lower time per utterance on a
    1-core host)."""
    L = cfg.layers
    R = cfg.residual_channels
    G = cfg.gate_channels
    G2 = G // 2
    S = cfg.skip_out_channels
    C_dim = cfg.cin_channels
    act_dtype = jnp.dtype(act_dtype_name)
    kernel = _make_kernel(cfg, t_total, b, deterministic=deterministic,
                          quantized=quantized, lb=lb, fused=fused)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # dil, offs, seed
        grid=(t_total, L // lb),
        in_specs=[
            pl.BlockSpec((1, b, C), lambda t, l, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),            # cond (T, B, C)
            # slot A/B: fused = (w_cat, w_so); unfused = (w_dil, w_out)
            (pl.BlockSpec((lb, 3 * R + C_dim, G), lambda t, l, *_: (l, 0, 0),
                          memory_space=pltpu.VMEM) if fused else
             pl.BlockSpec((lb, 3, R, G), lambda t, l, *_: (l, 0, 0, 0),
                          memory_space=pltpu.VMEM)),
            (pl.BlockSpec((lb, G2, S + R), lambda t, l, *_: (l, 0, 0),
                          memory_space=pltpu.VMEM) if fused else
             pl.BlockSpec((lb, G2, R), lambda t, l, *_: (l, 0, 0),
                          memory_space=pltpu.VMEM)),
            # slots C/D only used unfused; fused passes small dummies
            (pl.BlockSpec(memory_space=pltpu.VMEM) if fused else
             pl.BlockSpec((lb, C_dim, G), lambda t, l, *_: (l, 0, 0),
                          memory_space=pltpu.VMEM)),
            (pl.BlockSpec(memory_space=pltpu.VMEM) if fused else
             pl.BlockSpec((lb, G2, S), lambda t, l, *_: (l, 0, 0),
                          memory_space=pltpu.VMEM)),
            pl.BlockSpec(memory_space=pltpu.VMEM),            # s_dil
            pl.BlockSpec(memory_space=pltpu.VMEM),            # s_out
            pl.BlockSpec(memory_space=pltpu.VMEM),            # s_c
            pl.BlockSpec(memory_space=pltpu.VMEM),            # s_skip
            pl.BlockSpec((lb, 1, G), lambda t, l, *_: (l, 0, 0),
                         memory_space=pltpu.VMEM),            # b_dil stream
            pl.BlockSpec((lb, 1, S), lambda t, l, *_: (l, 0, 0),
                         memory_space=pltpu.VMEM),            # b_skip stream
            pl.BlockSpec((lb, 1, R), lambda t, l, *_: (l, 0, 0),
                         memory_space=pltpu.VMEM),            # b_out stream
            pl.BlockSpec(memory_space=pltpu.VMEM),            # w_first
            pl.BlockSpec(memory_space=pltpu.VMEM),            # b_first
            pl.BlockSpec(memory_space=pltpu.VMEM),            # w_f1
            pl.BlockSpec(memory_space=pltpu.VMEM),            # b_f1
            pl.BlockSpec(memory_space=pltpu.VMEM),            # w_f2
            pl.BlockSpec(memory_space=pltpu.VMEM),            # b_f2
        ],
        out_specs=pl.BlockSpec((1, 1, b), lambda t, l, *_: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((buf_total, b, R), act_dtype),         # ring buffers
            pltpu.VMEM((b, R), jnp.float32),                  # h carry
            pltpu.VMEM((b, S), jnp.float32),                  # skip acc
            pltpu.VMEM((b, 128), jnp.float32),                # x_prev (lane-padded)
        ],
    )
    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((t_total, 1, b), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            # the 16MB scoped-vmem cap is a compiler default, not the part's
            # physical VMEM; larger batches need the ring buffers resident
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )

    def run(*args):
        return call(*args)[:, 0, :].T  # (B, T)

    return run if interpret else jax.jit(run)
