"""Weight porters: torch-format state_dicts -> Flax variable trees.

The reference consumes torchvision ``resnet50(pretrained=True)``
(``/root/reference/src/extractor/visualise_resnet.py:21``) and the DINO
ViT-B/16 checkpoint (``src/extractor/visualise_vit_layer.py:304-330``).
These porters map those exact key layouts onto :class:`relaxtpu.models.ResNet50`
and :class:`relaxtpu.models.ViT` so published checkpoints drop in unchanged.

Conventions: torch Conv2d weight (O, I, kH, kW) -> flax (kH, kW, I, O);
torch Linear weight (O, I) -> flax (I, O); BatchNorm weight/bias ->
scale/bias params, running_mean/var -> batch_stats.
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np


def _np(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    # torch tensor without importing torch at module scope
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)


def load_torch_checkpoint(path: str) -> dict[str, np.ndarray]:
    """Load a .pth state_dict into plain numpy arrays (CPU, lazy torch import)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return {k: _np(v) for k, v in sd.items()}


def _conv(w) -> np.ndarray:
    return _np(w).transpose(2, 3, 1, 0)


def _linear(w) -> np.ndarray:
    return _np(w).transpose(1, 0)


def port_torch_resnet50(sd: Mapping[str, Any]) -> dict:
    """torchvision resnet50 state_dict -> {'params': ..., 'batch_stats': ...}."""
    params: dict[str, Any] = {}
    stats: dict[str, Any] = {}

    def put_bn(dst_params: dict, dst_stats: dict, flax_name: str, torch_prefix: str):
        dst_params[flax_name] = {
            "scale": _np(sd[f"{torch_prefix}.weight"]),
            "bias": _np(sd[f"{torch_prefix}.bias"]),
        }
        dst_stats[flax_name] = {
            "mean": _np(sd[f"{torch_prefix}.running_mean"]),
            "var": _np(sd[f"{torch_prefix}.running_var"]),
        }

    params["conv1"] = {"kernel": _conv(sd["conv1.weight"])}
    stats_root: dict[str, Any] = {}
    put_bn(params, stats_root, "bn1", "bn1")
    stats.update(stats_root)

    blocks_per_stage = (3, 4, 6, 3)
    for si, nblocks in enumerate(blocks_per_stage, start=1):
        for bi in range(nblocks):
            tp = f"layer{si}.{bi}"
            fname = f"layer{si}_{bi}"
            bp: dict[str, Any] = {}
            bs: dict[str, Any] = {}
            for ci in (1, 2, 3):
                bp[f"conv{ci}"] = {"kernel": _conv(sd[f"{tp}.conv{ci}.weight"])}
                put_bn(bp, bs, f"bn{ci}", f"{tp}.bn{ci}")
            if f"{tp}.downsample.0.weight" in sd:
                bp["downsample_conv"] = {"kernel": _conv(sd[f"{tp}.downsample.0.weight"])}
                put_bn(bp, bs, "downsample_bn", f"{tp}.downsample.1")
            params[fname] = bp
            stats[fname] = bs

    return {"params": params, "batch_stats": stats}


def port_torch_vit(sd: Mapping[str, Any], depth: int = 12) -> dict:
    """DINO VisionTransformer state_dict -> {'params': ...} for ViT."""
    params: dict[str, Any] = {
        "cls_token": _np(sd["cls_token"]),
        "pos_embed": _np(sd["pos_embed"]),
        "patch_embed": {
            "kernel": _conv(sd["patch_embed.proj.weight"]),
            "bias": _np(sd["patch_embed.proj.bias"]),
        },
        "norm": {"scale": _np(sd["norm.weight"]), "bias": _np(sd["norm.bias"])},
    }
    for i in range(depth):
        tp = f"blocks.{i}"
        params[f"block{i}"] = {
            "norm1": {"scale": _np(sd[f"{tp}.norm1.weight"]), "bias": _np(sd[f"{tp}.norm1.bias"])},
            "norm2": {"scale": _np(sd[f"{tp}.norm2.weight"]), "bias": _np(sd[f"{tp}.norm2.bias"])},
            "attn": {
                "qkv": {"kernel": _linear(sd[f"{tp}.attn.qkv.weight"]), "bias": _np(sd[f"{tp}.attn.qkv.bias"])},
                "proj": {"kernel": _linear(sd[f"{tp}.attn.proj.weight"]), "bias": _np(sd[f"{tp}.attn.proj.bias"])},
            },
            "mlp_fc1": {"kernel": _linear(sd[f"{tp}.mlp.fc1.weight"]), "bias": _np(sd[f"{tp}.mlp.fc1.bias"])},
            "mlp_fc2": {"kernel": _linear(sd[f"{tp}.mlp.fc2.weight"]), "bias": _np(sd[f"{tp}.mlp.fc2.bias"])},
        }
    return {"params": params}
