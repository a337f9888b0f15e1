"""torch -> JAX checkpoint conversion for the reference's published weights.

Two checkpoint families (reference README.md:13-14):
  * DisentangledVAE  `DisentangledVAE_VCTK_{epoch}.pth` — a torch state_dict
    of model/disentangled_vae.py:124-195;
  * WaveNet vocoder  `checkpoint_step001000000_ema.pth` — r9y9
    wavenet_vocoder weights with weight normalization
    (preprocessing/hparams.py:97), fused here to plain kernels.

Conventions:
  torch Linear weight (out, in)        -> flax Dense kernel (in, out): W.T
  torch Conv1d weight (out, in, k)     -> flax Conv kernel (k, in, out)
  torch LSTM weight_ih_l{n}[_reverse]  -> LSTM w_ih_l{n}[_reverse] (same layout,
                                          gate order i,f,g,o preserved by design)
  torch BatchNorm1d weight/bias        -> bn scale/bias (params)
          running_mean/running_var     -> bn mean/var   (batch_stats)
  weight_norm (g, v)                   -> w = g * v / ||v||_dim0
"""

from __future__ import annotations

from typing import Any

import numpy as np


def _np(t) -> np.ndarray:
    import torch
    if isinstance(t, torch.Tensor):
        return t.detach().cpu().numpy()
    return np.asarray(t)


def load_torch_state_dict(path: str) -> dict[str, np.ndarray]:
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "state_dict" in ckpt:
        ckpt = ckpt["state_dict"]
    if isinstance(ckpt, dict) and "model_state" in ckpt:
        ckpt = ckpt["model_state"]
    return {k: _np(v) for k, v in ckpt.items()}


def fuse_weight_norm(sd: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    """Replace every (weight_g, weight_v) pair with the fused weight."""
    out = dict(sd)
    for k in list(sd):
        if k.endswith("weight_g"):
            base = k[: -len("weight_g")]
            g = out.pop(k)
            v = out.pop(base + "weight_v")
            axes = tuple(range(1, v.ndim))
            norm = np.sqrt((v * v).sum(axis=axes, keepdims=True))
            out[base + "weight"] = g * v / np.maximum(norm, 1e-12)
    return out


def _linear(sd, prefix):
    p = {"kernel": sd[prefix + ".weight"].T}
    if prefix + ".bias" in sd:
        p["bias"] = sd[prefix + ".bias"]
    return p


def _conv1d(sd, prefix):
    p = {"kernel": sd[prefix + ".weight"].transpose(2, 1, 0)}
    if prefix + ".bias" in sd:
        p["bias"] = sd[prefix + ".bias"]
    return p


def _bn(sd, prefix):
    params = {"scale": sd[prefix + ".weight"], "bias": sd[prefix + ".bias"]}
    stats = {"mean": sd[prefix + ".running_mean"], "var": sd[prefix + ".running_var"]}
    return params, stats


def _lstm(sd, prefix, num_layers, bidirectional):
    p = {}
    dot = f"{prefix}." if prefix else ""
    for layer in range(num_layers):
        for rev in ([False, True] if bidirectional else [False]):
            t_sfx = f"l{layer}" + ("_reverse" if rev else "")
            p[f"w_ih_{t_sfx}"] = sd[f"{dot}weight_ih_{t_sfx}"]
            p[f"w_hh_{t_sfx}"] = sd[f"{dot}weight_hh_{t_sfx}"]
            p[f"b_ih_{t_sfx}"] = sd[f"{dot}bias_ih_{t_sfx}"]
            p[f"b_hh_{t_sfx}"] = sd[f"{dot}bias_hh_{t_sfx}"]
    return p


def convert_disentangled_vae(sd: dict[str, np.ndarray]) -> tuple[dict, dict]:
    """torch state_dict -> (params, batch_stats) for models.DisentangledVAE.

    Name map for reference model/disentangled_vae.py:124-195:
      enc_modules.{i}.0.conv / .1   -> encoder/conv{i}/conv, encoder/bn{i}/bn
      enc_lstm                      -> encoder/lstm (2 layers, bidir)
      enc_linear.linear_layer       -> encoder/linear/dense
      style/content.linear_layer    -> encoder/style|content/dense
      dec_pre_linear1|2             -> decoder/pre_linear1|2/dense
      dec_lstm1|2                   -> decoder/lstm1|2
      dec_modules.{i}.0 / .1        -> decoder/conv{i}/conv, decoder/bn{i}/bn
      dec_linear2.linear_layer      -> decoder/linear2/dense
      postnet.convolutions.{i}.0.conv / .1 -> postnet_mod/conv{i}/conv, bn{i}/bn
    """
    enc: dict[str, Any] = {}
    enc_bs: dict[str, Any] = {}
    for i in range(3):
        enc[f"conv{i}"] = {"conv": _conv1d(sd, f"enc_modules.{i}.0.conv")}
        p, s = _bn(sd, f"enc_modules.{i}.1")
        enc[f"bn{i}"] = {"bn": p}
        enc_bs[f"bn{i}"] = {"bn": s}
    enc["lstm"] = _lstm(sd, "enc_lstm", 2, True)
    enc["linear"] = {"dense": _linear(sd, "enc_linear.linear_layer")}
    enc["style"] = {"dense": _linear(sd, "style.linear_layer")}
    enc["content"] = {"dense": _linear(sd, "content.linear_layer")}

    dec: dict[str, Any] = {}
    dec_bs: dict[str, Any] = {}
    dec["pre_linear1"] = {"dense": _linear(sd, "dec_pre_linear1")}
    dec["pre_linear2"] = {"dense": _linear(sd, "dec_pre_linear2")}
    dec["lstm1"] = _lstm(sd, "dec_lstm1", 1, False)
    for i in range(3):
        dec[f"conv{i}"] = {"conv": _conv1d(sd, f"dec_modules.{i}.0")}
        p, s = _bn(sd, f"dec_modules.{i}.1")
        dec[f"bn{i}"] = {"bn": p}
        dec_bs[f"bn{i}"] = {"bn": s}
    dec["lstm2"] = _lstm(sd, "dec_lstm2", 2, False)
    dec["linear2"] = {"dense": _linear(sd, "dec_linear2.linear_layer")}

    post: dict[str, Any] = {}
    post_bs: dict[str, Any] = {}
    for i in range(5):
        post[f"conv{i}"] = {"conv": _conv1d(sd, f"postnet.convolutions.{i}.0.conv")}
        p, s = _bn(sd, f"postnet.convolutions.{i}.1")
        post[f"bn{i}"] = {"bn": p}
        post_bs[f"bn{i}"] = {"bn": s}

    params = {"encoder": enc, "decoder": dec, "postnet_mod": post}
    batch_stats = {"encoder": enc_bs, "decoder": dec_bs, "postnet_mod": post_bs}
    return params, batch_stats


def convert_wavenet(sd: dict[str, np.ndarray], n_layers: int = 24,
                    n_upsample: int = 4) -> dict:
    """r9y9 wavenet_vocoder state_dict -> params for models.WaveNet.

    r9y9 names: first_conv, conv_layers.{i}.{conv,conv1x1c,conv1x1_skip,
    conv1x1_out}, last_conv_layers.{1,3}, upsample_conv.{2j} (ConvTranspose2d
    interleaved with ReLU).  Weight norm must be fused first
    (`fuse_weight_norm`).
    """
    sd = fuse_weight_norm(sd)
    params: dict[str, Any] = {}
    params["first_conv"] = _conv1d(sd, "first_conv")
    for i in range(n_layers):
        base = f"conv_layers.{i}"
        params[f"layer{i}"] = {
            "conv": _conv1d(sd, f"{base}.conv"),
            "conv1x1c": _conv1d(sd, f"{base}.conv1x1c"),
            "conv1x1_skip": _conv1d(sd, f"{base}.conv1x1_skip"),
            "conv1x1_out": _conv1d(sd, f"{base}.conv1x1_out"),
        }
    params["final1"] = _conv1d(sd, "last_conv_layers.1")
    params["final2"] = _conv1d(sd, "last_conv_layers.3")

    up: dict[str, Any] = {}
    for j in range(n_upsample):
        w = sd[f"upsample_conv.{2 * j}.weight"]  # (in=1, out=1, kf, 2s)
        up[f"up{j}_kernel"] = w[0, 0]            # torch layout kept
        if f"upsample_conv.{2 * j}.bias" in sd:
            up[f"up{j}_bias"] = sd[f"upsample_conv.{2 * j}.bias"]
        else:
            up[f"up{j}_bias"] = np.zeros((1,), np.float32)
    params["upsample"] = up
    return params
