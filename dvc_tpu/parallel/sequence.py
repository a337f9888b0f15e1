"""Sequence (frame-axis) parallelism: sharded 1-D convolution with halo
exchange, and a blockwise-recurrent sharded LSTM with ring carry relay.

The reference architecture caps sequences at 64 frames and chunks long
utterances into independent blocks (model/variational_base_vae.py:335-348),
so it has no cross-chunk receptive field at all.  This module provides the
TPU-native long-context building block SURVEY.md §2.2 calls for: the time
axis of a (B, T, C) activation is sharded over a mesh axis, and the k-wide
convolution exchanges its (k-1)//2-frame halos with neighbor devices via
`lax.ppermute` over ICI — so a whole utterance can be convolved without
chunk boundaries, at any length, across chips.

Used standalone (`sequence_sharded_conv1d`) or as the drop-in conv for a
frame-sharded encoder variant.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.6 exposes shard_map at top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore


def _halo_conv_local(x_local: jax.Array, kernel: jax.Array,
                     bias: jax.Array | None, axis_name: str,
                     halo: int) -> jax.Array:
    """Per-shard body: exchange halos with neighbors, then VALID conv."""
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)

    if halo > 0 and n > 1:
        # my last `halo` frames go to my right neighbor (they are its left halo)
        right_perm = [(i, (i + 1) % n) for i in range(n)]
        left_halo = jax.lax.ppermute(x_local[:, -halo:, :], axis_name, right_perm)
        # my first `halo` frames go to my left neighbor (its right halo)
        left_perm = [(i, (i - 1) % n) for i in range(n)]
        right_halo = jax.lax.ppermute(x_local[:, :halo, :], axis_name, left_perm)
        # zero at the global sequence edges (SAME zero padding semantics)
        left_halo = jnp.where(idx == 0, jnp.zeros_like(left_halo), left_halo)
        right_halo = jnp.where(idx == n - 1, jnp.zeros_like(right_halo),
                               right_halo)
        x_ext = jnp.concatenate([left_halo, x_local, right_halo], axis=1)
    else:
        pad = [(0, 0), (halo, halo), (0, 0)]
        x_ext = jnp.pad(x_local, pad)

    y = jax.lax.conv_general_dilated(
        x_ext, kernel, window_strides=(1,), padding=[(0, 0)],
        dimension_numbers=("NHC", "HIO", "NHC"))
    if bias is not None:
        y = y + bias
    return y


def sequence_sharded_conv1d(x: jax.Array, kernel: jax.Array,
                            bias: jax.Array | None, mesh: Mesh,
                            axis_name: str | None = None) -> jax.Array:
    """SAME-padded 1-D conv of (B, T, C) with T sharded over `axis_name`.

    Bit-equal to the unsharded `lax.conv_general_dilated` with SAME zero
    padding (tests/test_parallel.py asserts this on an 8-device CPU mesh).
    kernel: (k, C_in, C_out) with odd k.
    """
    axis_name = axis_name or mesh.axis_names[0]
    k = kernel.shape[0]
    assert k % 2 == 1, "odd kernels only (SAME padding)"
    halo = (k - 1) // 2
    n = mesh.shape[axis_name]
    assert x.shape[1] % n == 0, "frame axis must divide the mesh axis"

    body = functools.partial(_halo_conv_local, axis_name=axis_name, halo=halo)
    spec_x = P(None, axis_name, None)
    fn = shard_map(body, mesh=mesh,
                   in_specs=(spec_x, P(None, None, None), P(None)),
                   out_specs=spec_x)
    if bias is None:
        bias = jnp.zeros((kernel.shape[-1],), x.dtype)
    return fn(x, kernel, bias)


def _lstm_local_round(xs_local: jax.Array, h0: jax.Array, c0: jax.Array,
                      w_hh_t: jax.Array, unroll: int):
    """Scan the local chunk from a given carry; xs_local: (Tl, B, 4H)."""

    def step(carry, xt):
        h, c = carry
        gates = xt + jnp.dot(h, w_hh_t, preferred_element_type=jnp.float32)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        return (h, c), h

    return jax.lax.scan(step, (h0, c0), xs_local, unroll=unroll)


def sequence_sharded_lstm(x: jax.Array, w_ih: jax.Array, w_hh: jax.Array,
                          b_ih: jax.Array, b_hh: jax.Array, mesh: Mesh,
                          axis_name: str | None = None, reverse: bool = False,
                          unroll: int = 8
                          ) -> tuple[jax.Array, tuple[jax.Array, jax.Array]]:
    """One LSTM direction over (B, T, I) with the FRAME axis sharded.

    The TPU-native split of the recurrence: the input projection — the
    MXU-heavy (B*T, I) x (I, 4H) matmul — runs fully parallel on every
    shard, and only the small (B, H) carry travels: the recurrence relays
    (h, c) around the device ring with `lax.ppermute`, one shard active per
    round (blockwise-recurrent pattern).  Memory and the big matmuls scale
    with the shards; a bidirectional pair pipelines its two directions from
    opposite ends of the ring concurrently.

    Bit-equal to layers.lstm_direction (tests/test_sequence_parallel.py).
    Returns (outputs (B, T, H) frame-sharded, (h_T, c_T) replicated).
    """
    axis_name = axis_name or mesh.axis_names[0]
    n = mesh.shape[axis_name]
    assert x.shape[1] % n == 0, "frame axis must divide the mesh axis"
    h_dim = w_hh.shape[-1]
    b = x.shape[0]

    def body(x_local, w_ih_, w_hh_, b_ih_, b_hh_):
        idx = jax.lax.axis_index(axis_name)
        xp = jnp.einsum("bti,gi->btg", x_local, w_ih_,
                        preferred_element_type=jnp.float32) + b_ih_ + b_hh_
        if reverse:
            xp = jnp.flip(xp, axis=1)
        xs_local = jnp.swapaxes(xp, 0, 1)  # (Tl, B, 4H)
        w_hh_t = w_hh_.T

        # carries must be device-varying for shard_map's type system (their
        # values genuinely diverge per shard once the ring relay runs)
        def _varying(z):
            if hasattr(jax.lax, "pcast"):  # jax >= 0.9: pvary is deprecated
                return jax.lax.pcast(z, axis_name, to="varying")
            try:
                return jax.lax.pvary(z, axis_name)
            except AttributeError:  # older jax: derive from a varying value
                return z + xs_local[0, :1, :1] * 0.0

        zero_h = _varying(jnp.zeros((b, h_dim), xp.dtype))
        ys0 = _varying(jnp.zeros((xs_local.shape[0], b, h_dim), xp.dtype))
        # ring direction: forward passes the carry to idx+1; a reversed
        # direction starts at the LAST shard and passes to idx-1
        if reverse:
            perm = [(i, (i - 1) % n) for i in range(n)]
            active_of_round = lambda r: (n - 1) - r
        else:
            perm = [(i, (i + 1) % n) for i in range(n)]
            active_of_round = lambda r: r

        def do_round(r, carry):
            (h, c), ys = carry
            (h2, c2), ys_local = _lstm_local_round(xs_local, h, c, w_hh_t,
                                                   unroll)
            active = idx == active_of_round(r)
            ys = jnp.where(active, ys_local, ys)
            h_send = jnp.where(active, h2, h)
            c_send = jnp.where(active, c2, c)
            h_next = jax.lax.ppermute(h_send, axis_name, perm)
            c_next = jax.lax.ppermute(c_send, axis_name, perm)
            return (h_next, c_next), ys

        (h_fin, c_fin), ys = jax.lax.fori_loop(
            0, n, do_round, ((zero_h, zero_h), ys0))
        # after the final relay the true carry sits on the ring's start
        # shard; replicate it with a masked psum
        start = n - 1 if reverse else 0
        h_fin = jax.lax.psum(jnp.where(idx == start, h_fin, 0.0), axis_name)
        c_fin = jax.lax.psum(jnp.where(idx == start, c_fin, 0.0), axis_name)
        ys = jnp.swapaxes(ys, 0, 1)  # (B, Tl, H)
        if reverse:
            ys = jnp.flip(ys, axis=1)
        return ys, h_fin, c_fin

    spec_t = P(None, axis_name, None)
    rep2 = P(None, None)
    fn = shard_map(body, mesh=mesh,
                   in_specs=(spec_t, rep2, rep2, P(None), P(None)),
                   out_specs=(spec_t, rep2, rep2))
    ys, h_fin, c_fin = fn(x, w_ih, w_hh, b_ih, b_hh)
    return ys, (h_fin, c_fin)


def frame_sharded_encode_conv_stack(x: jax.Array, params: dict, mesh: Mesh,
                                    train: bool = False,
                                    eps: float = 1e-5) -> jax.Array:
    """The DisentangledVAE encoder's 3-conv stack with the frame axis sharded
    (BatchNorm in inference mode — running stats are position-independent, so
    sharding is exact; train-mode batch stats would need a psum, which
    `use_running_average=False` paths do via the data-parallel batch axis
    instead).

    params: the `encoder` subtree of a DisentangledVAE param/batch_stats pair
    ({"params": ..., "batch_stats": ...}).
    """
    p = params["params"]
    bs = params["batch_stats"]
    h = x
    for i in range(3):
        kern = p[f"conv{i}"]["conv"]["kernel"]
        bias = p[f"conv{i}"]["conv"]["bias"]
        h = sequence_sharded_conv1d(h, kern, bias, mesh)
        bn_p = p[f"bn{i}"]["bn"]
        bn_s = bs[f"bn{i}"]["bn"]
        h = (h - bn_s["mean"]) / jnp.sqrt(bn_s["var"] + eps) \
            * bn_p["scale"] + bn_p["bias"]
        h = jax.nn.relu(h)
    return h
