"""Building-block layers shared by all models.

- ConvNorm / LinearNorm: xavier-initialized conv/linear (reference
  model/disentangled_vae.py:90-121) operating channels-last.
- LSTM: multi-layer, optionally bidirectional LSTM with PyTorch parameter
  layout (W_ih/W_hh/b_ih/b_hh, gate order i,f,g,o — needed for torch->JAX
  checkpoint conversion) built for the MXU: the input projection of ALL
  timesteps is one large matmul outside the scan; only the small recurrent
  matmul lives inside `lax.scan` (unrolled — sequences here are <=80 steps).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any

# LSTM scan unrolling. Sequences up to FULL_UNROLL_MAX_T are FULLY unrolled
# (no lax.scan at all) — measured 64% faster on the v5e train step at T=64
# (28.2 vs 46.3 ms/step, bs=128) for ~3x the compile time.  Longer sequences
# fall back to a scan with DEFAULT_UNROLL.  Tests set both low
# (tests/conftest.py) to keep CPU compiles fast.
FULL_UNROLL_MAX_T = 80
DEFAULT_UNROLL = 8

_GAINS = {"linear": 1.0, "relu": float(np.sqrt(2.0)), "tanh": 5.0 / 3.0, "sigmoid": 1.0}


def xavier_uniform_gain(gain: float) -> Callable:
    """torch.nn.init.xavier_uniform_ with gain == variance_scaling(gain^2, fan_avg, uniform)."""
    return nn.initializers.variance_scaling(gain * gain, "fan_avg", "uniform")


def torch_linear_bias_init(fan_in: int) -> Callable:
    """torch Linear/Conv default bias: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / np.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def const_init(value: float) -> Callable:
    def init(key, shape, dtype=jnp.float32):
        return jnp.full(shape, value, dtype)

    return init


class LinearNorm(nn.Module):
    """Dense with torch-xavier init (reference model/disentangled_vae.py:90-100)."""

    features: int
    use_bias: bool = True
    w_init_gain: str = "linear"
    bias_init_value: float | None = None  # None -> torch default U(+-1/sqrt(fan_in))
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        fan_in = x.shape[-1]
        bias_init = (const_init(self.bias_init_value) if self.bias_init_value is not None
                     else torch_linear_bias_init(fan_in))
        return nn.Dense(self.features, use_bias=self.use_bias,
                        kernel_init=xavier_uniform_gain(_GAINS[self.w_init_gain]),
                        bias_init=bias_init, dtype=self.dtype, name="dense")(x)


class ConvNorm(nn.Module):
    """1-D conv (channels-last, SAME padding for odd kernels) with torch-xavier
    init (reference model/disentangled_vae.py:103-121)."""

    features: int
    kernel_size: int = 1
    stride: int = 1
    dilation: int = 1
    use_bias: bool = True
    w_init_gain: str = "linear"
    bias_init_value: float | None = None
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        assert self.kernel_size % 2 == 1
        pad = self.dilation * (self.kernel_size - 1) // 2
        fan_in = x.shape[-1] * self.kernel_size
        bias_init = (const_init(self.bias_init_value) if self.bias_init_value is not None
                     else torch_linear_bias_init(fan_in))
        return nn.Conv(self.features, (self.kernel_size,), strides=(self.stride,),
                       kernel_dilation=(self.dilation,), padding=[(pad, pad)],
                       use_bias=self.use_bias,
                       kernel_init=xavier_uniform_gain(_GAINS[self.w_init_gain]),
                       bias_init=bias_init, dtype=self.dtype, name="conv")(x)


class BatchNorm(nn.Module):
    """torch BatchNorm1d semantics over (B, T, C): normalize per-channel across
    (B, T); running stats in the `batch_stats` collection.

    `groups` > 1 enables PAIR-FUSED normalization: the batch is treated as
    `groups` stacked sub-batches (e.g. the two utterances of a GVAE pair run
    through one 2B-batch conv/LSTM pass), and train-mode statistics are
    computed PER GROUP over (B/groups, T) — numerically identical to calling
    the layer `groups` times on the halves (which is what the reference does,
    model/variational_base_vae.py:62-63), so training gradients match the
    unfused path exactly.  Running stats are updated once with the MEAN of
    the group statistics; the reference's two sequential EMA updates weight
    the second half slightly more (O(1-momentum) per step) — both recursions
    converge to the same stationary statistics, and training gradients are
    unaffected (eval-time running stats only).
    Param/collection layout matches flax.BatchNorm (scale/bias + mean/var
    under "bn") so checkpoints are interchangeable with the unfused path.
    """

    use_running_average: bool | None = None
    momentum: float = 0.9  # = 1 - torch momentum (0.1)
    epsilon: float = 1e-5
    groups: int = 1
    # (no dtype knob: statistics are always computed in float32 and the
    # output is cast back to the input dtype, torch BatchNorm1d's behavior)

    @nn.compact
    def __call__(self, x: jax.Array, use_running_average: bool | None = None) -> jax.Array:
        ura = nn.merge_param("use_running_average", self.use_running_average,
                             use_running_average)
        # groups=1 also routes through _GroupedBN: flax's nn.BatchNorm tracks
        # the BIASED batch variance in running stats while torch (and the
        # grouped path) track the UNBIASED one — one implementation keeps
        # pair_fused on/off checkpoints and torch parity consistent
        return _GroupedBN(momentum=self.momentum, epsilon=self.epsilon,
                          groups=max(1, self.groups), name="bn")(x, ura)


class _GroupedBN(nn.Module):
    momentum: float = 0.9
    epsilon: float = 1e-5
    groups: int = 1

    @nn.compact
    def __call__(self, x: jax.Array, use_running_average: bool) -> jax.Array:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
            y = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
            return y * scale + bias

        g = self.groups
        assert x.ndim == 3, (
            f"train-mode BatchNorm expects (B, T, C), got {x.shape} — "
            "reshape rank-2/4 inputs to channels-last 3D first")
        b, t, _ = x.shape
        assert b % g == 0, f"batch {b} must divide groups {g}"
        xg = x.reshape(g, b // g, t, c).astype(jnp.float32)
        mean_g = jnp.mean(xg, axis=(1, 2), keepdims=True)        # (g,1,1,C)
        var_g = jnp.mean((xg - mean_g) ** 2, axis=(1, 2), keepdims=True)
        y = (xg - mean_g) * jax.lax.rsqrt(var_g + self.epsilon)
        y = y.reshape(b, t, c).astype(x.dtype) * scale + bias
        if not self.is_initializing():
            # torch tracks the UNBIASED batch variance in running stats
            n = (b // g) * t
            unbias = n / max(n - 1, 1)
            ra_mean.value = self.momentum * ra_mean.value \
                + (1 - self.momentum) * jnp.mean(mean_g[:, 0, 0, :], axis=0)
            ra_var.value = self.momentum * ra_var.value \
                + (1 - self.momentum) * jnp.mean(var_g[:, 0, 0, :], axis=0) * unbias
        return y


def _torch_lstm_init(hidden: int) -> Callable:
    bound = 1.0 / np.sqrt(hidden)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def lstm_direction(x: jax.Array, w_ih: jax.Array, w_hh: jax.Array,
                   b_ih: jax.Array, b_hh: jax.Array, reverse: bool = False,
                   unroll: int | None = None) -> tuple[jax.Array, tuple[jax.Array, jax.Array]]:
    """One LSTM direction over (B, T, I).

    Returns (outputs (B, T, H), (h_T, c_T)).  Gate order (i, f, g, o) matches
    torch so converted checkpoints drop straight in.
    """
    h_dim = w_hh.shape[-1]
    b, t, _ = x.shape
    # All-timestep input projection: a single (B*T, I) x (I, 4H) MXU matmul.
    xp = jnp.einsum("bti,gi->btg", x, w_ih, preferred_element_type=jnp.float32)
    xp = xp + b_ih + b_hh
    if reverse:
        xp = jnp.flip(xp, axis=1)
    xs = jnp.swapaxes(xp, 0, 1)  # (T, B, 4H)
    w_hh_t = w_hh.T  # (H, 4H)

    def step(carry, xt):
        h, c = carry
        gates = xt + jnp.dot(h, w_hh_t, preferred_element_type=jnp.float32)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        return (h, c), h

    if unroll is None:
        unroll = t if t <= FULL_UNROLL_MAX_T else DEFAULT_UNROLL
    init = (jnp.zeros((b, h_dim), xp.dtype), jnp.zeros((b, h_dim), xp.dtype))
    (h_t, c_t), ys = jax.lax.scan(step, init, xs, unroll=unroll)
    ys = jnp.swapaxes(ys, 0, 1)
    if reverse:
        ys = jnp.flip(ys, axis=1)
    return ys, (h_t, c_t)


class LSTM(nn.Module):
    """Multi-layer (bi)LSTM, torch parameter layout & init.

    Input (B, T, I) -> output (B, T, H * num_directions).  Final-layer hidden
    states are also returned (the GE2E encoder consumes hidden[-1],
    reference preprocessing/encoder/model.py:53-56).
    """

    features: int
    num_layers: int = 1
    bidirectional: bool = False
    unroll: int | None = None
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array) -> tuple[jax.Array, tuple[jax.Array, jax.Array]]:
        h = self.features
        init = _torch_lstm_init(h)
        directions = [False, True] if self.bidirectional else [False]
        finals = None
        for layer in range(self.num_layers):
            in_dim = x.shape[-1]
            outs = []
            finals = []
            for rev in directions:
                sfx = f"l{layer}" + ("_reverse" if rev else "")
                w_ih = self.param(f"w_ih_{sfx}", init, (4 * h, in_dim))
                w_hh = self.param(f"w_hh_{sfx}", init, (4 * h, h))
                b_ih = self.param(f"b_ih_{sfx}", init, (4 * h,))
                b_hh = self.param(f"b_hh_{sfx}", init, (4 * h,))
                if self.dtype is not None:
                    x_c, w_ih, w_hh = (a.astype(self.dtype) for a in (x, w_ih, w_hh))
                else:
                    x_c = x
                ys, hc = lstm_direction(x_c, w_ih, w_hh, b_ih, b_hh, rev, self.unroll)
                outs.append(ys)
                finals.append(hc)
            x = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=-1)
        h_fin = jnp.stack([f[0] for f in finals], 0)  # (num_dirs, B, H) of last layer
        c_fin = jnp.stack([f[1] for f in finals], 0)
        return x, (h_fin, c_fin)
