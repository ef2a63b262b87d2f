"""PyTorch -> Flax weight porting for released STARCOP checkpoints.

Maps a Lightning/torch state_dict of ``smp.Unet(encoder_name='mobilenet_v2')``
(the released HuggingFace ``final_checkpoint_model.ckpt`` layout — reference
model_module.py:238-266) onto the ``MobileNetV2UNet`` param/batch_stats pytree.

Name mapping (torch -> flax):
  network.encoder.features.0.{0,1}           -> encoder/features_0/{conv,bn}
  network.encoder.features.i.conv.*          -> encoder/features_i/{expand,depthwise,project,project_bn}
  network.encoder.features.18.{0,1}          -> encoder/features_18/{conv,bn}
  network.decoder.blocks.i.conv{1,2}.{0,1}   -> decoder_i/conv{1,2}/{conv,bn}
  network.segmentation_head.0                -> segmentation_head

Tensor layout: conv (O, I, kh, kw) -> (kh, kw, I, O); depthwise (C, 1, kh, kw)
-> (kh, kw, 1, C); BN weight/bias/running_mean/running_var -> scale/bias/mean/var.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np

# torchvision feature index -> (has expand?) ; feature 1 is the t=1 block.
_T1_FEATURE = 1
_STEM_FEATURES = (0, 18)


def _conv_kernel(w: np.ndarray, depthwise: bool = False) -> np.ndarray:
    w = np.asarray(w)
    if depthwise:
        return np.transpose(w, (2, 3, 1, 0))  # (C,1,kh,kw) -> (kh,kw,1,C)
    return np.transpose(w, (2, 3, 1, 0))  # (O,I,kh,kw) -> (kh,kw,I,O)


def _strip_prefix(state_dict: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Strip the Lightning 'network.' prefix; drop normalizer/loss params."""
    out = {}
    for k, v in state_dict.items():
        if k.startswith("network."):
            k = k[len("network.") :]
        if k.startswith(("normalizer.", "pos_weight", "loss_function")):
            continue
        out[k] = np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
    return out


def _bn(sd: Dict[str, np.ndarray], prefix: str) -> Tuple[Dict, Dict]:
    params = {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}
    stats = {"mean": sd[f"{prefix}.running_mean"], "var": sd[f"{prefix}.running_var"]}
    return params, stats


def _convbn(sd, conv_key, bn_key, depthwise=False):
    p_bn, s_bn = _bn(sd, bn_key)
    params = {"conv": {"kernel": _conv_kernel(sd[f"{conv_key}.weight"], depthwise)}, "bn": p_bn}
    stats = {"bn": s_bn}
    return params, stats


def _port_encoder(sd: Dict[str, np.ndarray], prefix: str) -> Tuple[Dict, Dict]:
    """Port a mobilenet_v2 feature extractor under ``prefix`` ('' for a bare
    torchvision state_dict, 'encoder.' inside an smp.Unet)."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    for i in range(19):
        name = f"features_{i}"
        if i in _STEM_FEATURES:
            p, s = _convbn(sd, f"{prefix}features.{i}.0", f"{prefix}features.{i}.1")
            params[name], stats[name] = p, s
        elif i == _T1_FEATURE:
            # t=1 block: conv.0 = depthwise ConvBNReLU, conv.1 = project, conv.2 = project bn
            p_dw, s_dw = _convbn(
                sd, f"{prefix}features.{i}.conv.0.0", f"{prefix}features.{i}.conv.0.1", depthwise=True
            )
            p_bn, s_bn = _bn(sd, f"{prefix}features.{i}.conv.2")
            params[name] = {
                "depthwise": p_dw,
                "project": {"kernel": _conv_kernel(sd[f"{prefix}features.{i}.conv.1.weight"])},
                "project_bn": p_bn,
            }
            stats[name] = {"depthwise": s_dw, "project_bn": s_bn}
        else:
            # expand (conv.0), depthwise (conv.1), project (conv.2), project bn (conv.3)
            p_ex, s_ex = _convbn(
                sd, f"{prefix}features.{i}.conv.0.0", f"{prefix}features.{i}.conv.0.1"
            )
            p_dw, s_dw = _convbn(
                sd, f"{prefix}features.{i}.conv.1.0", f"{prefix}features.{i}.conv.1.1", depthwise=True
            )
            p_bn, s_bn = _bn(sd, f"{prefix}features.{i}.conv.3")
            params[name] = {
                "expand": p_ex,
                "depthwise": p_dw,
                "project": {"kernel": _conv_kernel(sd[f"{prefix}features.{i}.conv.2.weight"])},
                "project_bn": p_bn,
            }
            stats[name] = {"expand": s_ex, "depthwise": s_dw, "project_bn": s_bn}
    return params, stats


def port_smp_mobilenetv2_unet(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """Convert an smp.Unet(mobilenet_v2) state_dict to MobileNetV2UNet variables.

    Returns {"params": ..., "batch_stats": ...} ready for
    ``SegmentationModel.apply`` / ``network.apply``.
    """
    sd = _strip_prefix(state_dict)
    enc_p, enc_s = _port_encoder(sd, "encoder.")
    params: Dict[str, Any] = {"encoder": enc_p}
    stats: Dict[str, Any] = {"encoder": enc_s}

    for i in range(5):
        block_p, block_s = {}, {}
        for conv in ("conv1", "conv2"):
            p, s = _convbn(
                sd, f"decoder.blocks.{i}.{conv}.0", f"decoder.blocks.{i}.{conv}.1"
            )
            block_p[conv], block_s[conv] = p, s
        params[f"decoder_{i}"], stats[f"decoder_{i}"] = block_p, block_s

    params["segmentation_head"] = {
        "kernel": _conv_kernel(sd["segmentation_head.0.weight"]),
        "bias": sd["segmentation_head.0.bias"],
    }

    def to_jnp(tree):
        import jax.numpy as jnp

        return {
            k: to_jnp(v) if isinstance(v, dict) else jnp.asarray(v) for k, v in tree.items()
        }

    return {"params": to_jnp(params), "batch_stats": to_jnp(stats)}


def port_torchvision_mobilenet_v2(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """Convert a BARE torchvision ``mobilenet_v2`` state_dict (ImageNet
    release layout: ``features.*`` + ``classifier.*``) to encoder-only
    variables {"params": {"encoder": ...}, "batch_stats": {"encoder": ...}}.

    This is the weight source behind the reference's
    ``encoder_weights='imagenet'`` rule (model_module.py:244-246 — smp
    downloads the same torchvision ImageNet checkpoint)."""
    sd = {
        k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
        for k, v in state_dict.items()
        if not k.startswith("classifier.")
    }
    enc_p, enc_s = _port_encoder(sd, "")

    def to_jnp(tree):
        import jax.numpy as jnp

        return {
            k: to_jnp(v) if isinstance(v, dict) else jnp.asarray(v) for k, v in tree.items()
        }

    return {"params": to_jnp({"encoder": enc_p}), "batch_stats": to_jnp({"encoder": enc_s})}


def init_encoder_from_torchvision(
    variables: Dict[str, Any], state_dict: Dict[str, Any]
) -> Dict[str, Any]:
    """Fresh MobileNetV2UNet variables + torchvision ImageNet state_dict ->
    variables with the encoder replaced (decoder/head keep their random
    init). Input must be 3-channel: ImageNet's stem conv has 3 input
    channels (the reference only enables this when in_channels == 3)."""
    ported = port_torchvision_mobilenet_v2(state_dict)
    stem = variables["params"]["encoder"]["features_0"]["conv"]["kernel"]
    if stem.shape[2] != 3:
        raise ValueError(
            f"ImageNet encoder init requires 3 input channels, model has {stem.shape[2]}"
        )
    out = {k: dict(v) for k, v in variables.items()}
    out["params"]["encoder"] = ported["params"]["encoder"]
    out["batch_stats"]["encoder"] = ported["batch_stats"]["encoder"]
    return out


def find_imagenet_mobilenet_v2() -> "str | None":
    """Locate a torchvision mobilenet_v2 ImageNet checkpoint on disk:
    $STARCOP_TPU_IMAGENET_MOBILENETV2, then the torch hub cache. Returns None
    when absent (zero-egress environments can't download it)."""
    import glob
    import os

    explicit = os.environ.get("STARCOP_TPU_IMAGENET_MOBILENETV2")
    if explicit and os.path.exists(explicit):
        return explicit
    hub = os.environ.get(
        "TORCH_HOME", os.path.join(os.path.expanduser("~"), ".cache", "torch")
    )
    hits = sorted(glob.glob(os.path.join(hub, "hub", "checkpoints", "mobilenet_v2*.pth")))
    return hits[0] if hits else None


def load_torch_checkpoint(path: str) -> Dict[str, Any]:
    """Load a Lightning .ckpt / torch .pt state_dict from disk."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return obj
