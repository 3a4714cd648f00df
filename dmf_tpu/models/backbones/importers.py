"""Offline checkpoint importers: torch state_dicts -> Flax backbone params.

Pure-numpy ports of the reference's weight plumbing — run once, offline:
* timm-style ResNet50 key layout -> our ResNetFeatures param tree;
* RadImageNet (Lab-Rasool) key remapping (foundation_model.py:180-218);
* first-conv channel adaptation for N-channel grayscale medical input:
  simple mean-replicate (foundation_model.py:99-124) and the advanced
  BT.601-luminance + deterministic linspace scaling variant
  (foundation_model.py:128-176);
* ViT patch-embed adaptation + position-embedding grid resize for the
  256px override (foundation_model.py:321-431).

No network access: callers supply a loaded state_dict (``torch.load`` on a
local file, or any mapping of numpy arrays).  Conversions: conv OIHW->HWIO,
linear (out,in)->(in,out).
"""

from __future__ import annotations

from typing import Dict, Mapping, Tuple

import numpy as np


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


# ---------------------------------------------------------------------------
# First-conv channel adaptation
# ---------------------------------------------------------------------------


def adapt_first_conv(w: np.ndarray, in_channels: int) -> np.ndarray:
    """Mean-replicate adaptation (foundation_model.py:99-124). OIHW."""
    if w.shape[1] == in_channels:
        return w
    w_mean = w.mean(axis=1, keepdims=True)
    return np.repeat(w_mean, in_channels, axis=1)


def advanced_adapt_first_conv(
    w: np.ndarray, in_channels: int, eps: float = 0.05
) -> np.ndarray:
    """BT.601-luminance + monotonic per-channel scaling
    (foundation_model.py:128-176). OIHW."""
    if w.shape[1] == in_channels:
        return w
    if w.shape[1] >= 3:
        lum = 0.2989 * w[:, 0:1] + 0.5870 * w[:, 1:2] + 0.1140 * w[:, 2:3]
    else:
        lum = w.mean(axis=1, keepdims=True)
    w_new = np.repeat(lum, in_channels, axis=1)
    scales = np.linspace(1.0 - eps, 1.0 + eps, in_channels).reshape(
        1, in_channels, 1, 1
    )
    return (w_new * scales).astype(w.dtype)


# ---------------------------------------------------------------------------
# RadImageNet (Lab-Rasool) -> timm key remap (foundation_model.py:180-218)
# ---------------------------------------------------------------------------


def map_rasool_to_timm_keys(sd: Mapping[str, np.ndarray]) -> Dict[str, np.ndarray]:
    layer_map = {"4": "layer1", "5": "layer2", "6": "layer3", "7": "layer4"}
    out = {}
    for k, v in sd.items():
        nk = k[len("backbone."):] if k.startswith("backbone.") else k
        if nk == "0.weight":
            nk = "conv1.weight"
        elif nk.startswith("1."):
            nk = "bn1." + nk[2:]
        elif nk and nk[0] in layer_map and len(nk) > 1 and nk[1] == ".":
            nk = f"{layer_map[nk[0]]}.{nk[2:]}"
        if nk.startswith("fc."):
            continue
        out[nk] = v
    return out


# ---------------------------------------------------------------------------
# ResNet import
# ---------------------------------------------------------------------------

_RESNET_LAYERS = (3, 4, 6, 3)


def _conv(sd, key):
    return _np(sd[key]).transpose(2, 3, 1, 0)  # OIHW -> HWIO


def _bn(sd, prefix):
    return {
        "scale": _np(sd[prefix + ".weight"]),
        "bias": _np(sd[prefix + ".bias"]),
        "mean": _np(sd[prefix + ".running_mean"]),
        "var": _np(sd[prefix + ".running_var"]),
    }


def _bn_split(bn):
    params = {"BatchNorm_0": {"scale": bn["scale"], "bias": bn["bias"]}}
    stats = {"BatchNorm_0": {"mean": bn["mean"], "var": bn["var"]}}
    return params, stats


def import_resnet50(
    state_dict: Mapping[str, np.ndarray],
    in_channels: int,
    use_advanced_adapt: bool = True,
    deep_stem: bool = False,
    min_tensors: int = 100,
) -> Tuple[dict, dict]:
    """Convert a timm-layout ResNet50 state_dict to (params, batch_stats)
    for ``ResNetFeatures``.  Applies first-conv channel adaptation.

    For RadImageNet checkpoints, call :func:`map_rasool_to_timm_keys` first
    (the reference chains them the same way, foundation_model.py:275-281).
    Raises RuntimeError if fewer than ``min_tensors`` tensors were imported
    — the reference's >=100-loaded-tensors sanity check on RadImageNet
    weight loads (foundation_model.py:297-301).
    """
    sd = {k: _np(v) for k, v in state_dict.items()}

    # adapt first conv (on OIHW, like the reference)
    first_key = "conv1.0.weight" if deep_stem else "conv1.weight"
    if first_key in sd:
        adapt = advanced_adapt_first_conv if use_advanced_adapt else adapt_first_conv
        sd[first_key] = adapt(sd[first_key], in_channels)

    params: dict = {}
    stats: dict = {}

    def put(name, p, s=None):
        params[name] = p
        if s is not None:
            stats[name] = s

    if deep_stem:
        for i, (ck, bk) in enumerate(
            [("conv1.0", "conv1.1"), ("conv1.3", "conv1.4"), ("conv1.6", "bn1")]
        ):
            put(f"stem_conv{i + 1}", {"kernel": _conv(sd, ck + ".weight")})
            p, s = _bn_split(_bn(sd, bk))
            put(f"stem_bn{i + 1}", p, s)
    else:
        put("conv1", {"kernel": _conv(sd, "conv1.weight")})
        p, s = _bn_split(_bn(sd, "bn1"))
        put("bn1", p, s)

    for stage in range(4):
        for block in range(_RESNET_LAYERS[stage]):
            pre = f"layer{stage + 1}.{block}"
            name = f"layer{stage + 1}_block{block}"
            bp: dict = {}
            bs: dict = {}
            for ci in (1, 2, 3):
                bp[f"conv{ci}"] = {"kernel": _conv(sd, f"{pre}.conv{ci}.weight")}
                p, s = _bn_split(_bn(sd, f"{pre}.bn{ci}"))
                bp[f"bn{ci}"] = p
                bs[f"bn{ci}"] = s
            # downsample: timm 'downsample.0/1' (or '.1/.2' with avg_down)
            for conv_idx in (0, 1):
                ck = f"{pre}.downsample.{conv_idx}.weight"
                if ck in sd and sd[ck].ndim == 4:
                    bp["downsample_conv"] = {"kernel": _conv(sd, ck)}
                    p, s = _bn_split(_bn(sd, f"{pre}.downsample.{conv_idx + 1}"))
                    bp["downsample_bn"] = p
                    bs["downsample_bn"] = s
                    break
            put(name, bp, bs)

    n_loaded = sum(
        1 for tree in (params, stats)
        for _ in _iter_arrays(tree)
    )
    if n_loaded < min_tensors:
        raise RuntimeError(
            f"suspiciously few tensors imported ({n_loaded} < {min_tensors}) "
            "— checkpoint layout mismatch (foundation_model.py:297-301)"
        )
    return params, stats


def _iter_arrays(tree):
    if isinstance(tree, Mapping):
        for v in tree.values():
            yield from _iter_arrays(v)
    else:
        yield tree


def export_resnet50(
    params: Mapping[str, Mapping],
    stats: Mapping[str, Mapping],
    deep_stem: bool = False,
) -> Dict[str, np.ndarray]:
    """Inverse of :func:`import_resnet50`: ResNetFeatures (params,
    batch_stats) -> a timm-layout state_dict (numpy; conv OIHW, incl. the
    ``num_batches_tracked`` counters torch BatchNorms serialize).

    ``deep_stem`` selects the resnet50d layout: the 3-conv stem under
    ``conv1.{0,3,6}`` and — because timm pairs deep_stem with avg_down —
    downsample convs shifted to ``downsample.{1,2}`` behind the AvgPool.
    """
    sd: Dict[str, np.ndarray] = {}

    def conv(key, p):
        sd[key + ".weight"] = np.asarray(
            p["kernel"], np.float32).transpose(3, 2, 0, 1)

    def bn(key, p, s):
        b, t = p["BatchNorm_0"], s["BatchNorm_0"]
        sd[key + ".weight"] = np.asarray(b["scale"], np.float32)
        sd[key + ".bias"] = np.asarray(b["bias"], np.float32)
        sd[key + ".running_mean"] = np.asarray(t["mean"], np.float32)
        sd[key + ".running_var"] = np.asarray(t["var"], np.float32)
        sd[key + ".num_batches_tracked"] = np.asarray(0, np.int64)

    if deep_stem:
        for i, (ck, bk) in enumerate(
            [("conv1.0", "conv1.1"), ("conv1.3", "conv1.4"), ("conv1.6", "bn1")]
        ):
            conv(ck, params[f"stem_conv{i + 1}"])
            bn(bk, params[f"stem_bn{i + 1}"], stats[f"stem_bn{i + 1}"])
    else:
        conv("conv1", params["conv1"])
        bn("bn1", params["bn1"], stats["bn1"])

    for stage in range(4):
        for block in range(_RESNET_LAYERS[stage]):
            pre = f"layer{stage + 1}.{block}"
            name = f"layer{stage + 1}_block{block}"
            bp, bs = params[name], stats[name]
            for ci in (1, 2, 3):
                conv(f"{pre}.conv{ci}", bp[f"conv{ci}"])
                bn(f"{pre}.bn{ci}", bp[f"bn{ci}"], bs[f"bn{ci}"])
            if "downsample_conv" in bp:
                idx = 1 if deep_stem else 0
                conv(f"{pre}.downsample.{idx}", bp["downsample_conv"])
                bn(f"{pre}.downsample.{idx + 1}", bp["downsample_bn"],
                   bs["downsample_bn"])
    return sd


# ---------------------------------------------------------------------------
# ViT import
# ---------------------------------------------------------------------------


def resize_pos_embed(pos: np.ndarray, new_grid: int) -> np.ndarray:
    """Bicubic-resize the (1, 1+G*G, C) position embedding to a new grid
    (the reference overrides img_size=256 on a 224-trained ViT)."""
    cls_tok, grid = pos[:, :1], pos[:, 1:]
    g = int(np.sqrt(grid.shape[1]))
    if g == new_grid:
        return pos
    import jax
    import jax.numpy as jnp

    grid = grid.reshape(1, g, g, -1)
    resized = jax.image.resize(
        jnp.asarray(grid), (1, new_grid, new_grid, grid.shape[-1]), "bicubic"
    )
    resized = np.asarray(resized).reshape(1, new_grid * new_grid, -1)
    return np.concatenate([cls_tok, resized], axis=1)


def import_vit_base(
    state_dict: Mapping[str, np.ndarray],
    in_channels: int,
    img_size: int = 256,
    patch_size: int = 16,
    depth: int = 12,
    use_advanced_adapt: bool = True,
) -> Tuple[dict, dict]:
    """Convert a timm vit_base_patch16 state_dict to ViTFeatures params."""
    sd = {k: _np(v) for k, v in state_dict.items()}

    pe = sd["patch_embed.proj.weight"]  # (C, 3, p, p) OIHW
    adapt = advanced_adapt_first_conv if use_advanced_adapt else adapt_first_conv
    pe = adapt(pe, in_channels)

    params: dict = {
        "patch_embed": {
            "kernel": pe.transpose(2, 3, 1, 0),
            "bias": sd["patch_embed.proj.bias"],
        },
        "cls_token": sd["cls_token"],
        "pos_embed": resize_pos_embed(sd["pos_embed"], img_size // patch_size),
    }
    for i in range(depth):
        pre = f"blocks.{i}"
        params[f"block{i}"] = {
            "norm1": {"scale": sd[f"{pre}.norm1.weight"],
                      "bias": sd[f"{pre}.norm1.bias"]},
            "attn": {
                "qkv": {"kernel": sd[f"{pre}.attn.qkv.weight"].T,
                        "bias": sd[f"{pre}.attn.qkv.bias"]},
                "proj": {"kernel": sd[f"{pre}.attn.proj.weight"].T,
                         "bias": sd[f"{pre}.attn.proj.bias"]},
            },
            "norm2": {"scale": sd[f"{pre}.norm2.weight"],
                      "bias": sd[f"{pre}.norm2.bias"]},
            "mlp_fc1": {"kernel": sd[f"{pre}.mlp.fc1.weight"].T,
                        "bias": sd[f"{pre}.mlp.fc1.bias"]},
            "mlp_fc2": {"kernel": sd[f"{pre}.mlp.fc2.weight"].T,
                        "bias": sd[f"{pre}.mlp.fc2.bias"]},
        }
    return params, {}


def export_vit_base(params: Mapping[str, Mapping]) -> Dict[str, np.ndarray]:
    """Inverse of :func:`import_vit_base`: ViTFeatures params -> a timm
    vit_base_patch16-layout state_dict (numpy).  The position embedding is
    exported at the model's own grid (no resize back to 224)."""
    f32 = lambda v: np.asarray(v, np.float32)
    sd: Dict[str, np.ndarray] = {
        "patch_embed.proj.weight": f32(
            params["patch_embed"]["kernel"]).transpose(3, 2, 0, 1),
        "patch_embed.proj.bias": f32(params["patch_embed"]["bias"]),
        "cls_token": f32(params["cls_token"]),
        "pos_embed": f32(params["pos_embed"]),
    }
    depth = len([k for k in params if k.startswith("block")])
    for i in range(depth):
        b, pre = params[f"block{i}"], f"blocks.{i}"
        sd[f"{pre}.norm1.weight"] = f32(b["norm1"]["scale"])
        sd[f"{pre}.norm1.bias"] = f32(b["norm1"]["bias"])
        sd[f"{pre}.attn.qkv.weight"] = f32(b["attn"]["qkv"]["kernel"]).T
        sd[f"{pre}.attn.qkv.bias"] = f32(b["attn"]["qkv"]["bias"])
        sd[f"{pre}.attn.proj.weight"] = f32(b["attn"]["proj"]["kernel"]).T
        sd[f"{pre}.attn.proj.bias"] = f32(b["attn"]["proj"]["bias"])
        sd[f"{pre}.norm2.weight"] = f32(b["norm2"]["scale"])
        sd[f"{pre}.norm2.bias"] = f32(b["norm2"]["bias"])
        sd[f"{pre}.mlp.fc1.weight"] = f32(b["mlp_fc1"]["kernel"]).T
        sd[f"{pre}.mlp.fc1.bias"] = f32(b["mlp_fc1"]["bias"])
        sd[f"{pre}.mlp.fc2.weight"] = f32(b["mlp_fc2"]["kernel"]).T
        sd[f"{pre}.mlp.fc2.bias"] = f32(b["mlp_fc2"]["bias"])
    return sd
