"""Sequence (frame-axis) parallelism: sharded 1-D convolution with halo
exchange.

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


def frame_sharded_encode_conv_stack(x: jax.Array, params: dict, mesh: Mesh,
                                    train: bool = False) -> jax.Array:
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
        h = (h - bn_s["mean"]) / jnp.sqrt(bn_s["var"] + 1e-5) \
            * bn_p["scale"] + bn_p["bias"]
        h = jax.nn.relu(h)
    return h
