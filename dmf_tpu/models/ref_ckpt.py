"""Migration importer: reference PyTorch/Lightning checkpoints -> dmf_tpu.

A user of the reference switches frameworks with their trained weights: this
maps the reference's ``ModelMaskHeadBackbone`` (model_module.py:481-733) and
``FusionModel`` (model_module.py:842-1000) state_dicts onto our Flax
``Encoder``/``FusionModel`` variable trees.  Lightning checkpoints store the
module under a ``model.`` prefix (prepare_single_model.py:213-216 strips it
the same way).

The importer is TEMPLATE-DRIVEN: it walks the target model's initialized
variables, so config-dependent structure (skip/SE/recon presence, repeat
counts, mask-head chain length, backbone on/off) never needs re-deriving —
anything present in the template is filled from the reference keys, and a
missing reference key is a hard error naming both sides.

Layout notes (verified against the reference source):
* ResNetLiteBlock_withRecon: ``bottlenecks.{i}.{0,1,4,5,7,8}`` conv/BN
  triplets, ``skip.{0,1}``, ``se.fc.{1,3}`` (1x1 convs; ours are Dense),
  ``reconstruct.conv.{0,1,3}`` (model_module.py:220-316).
* MaskHeadResize: ``pre``, ``down_{64,128,256,512}_to_32.{0,2,4,6}``,
  ``out`` — all four chains exist in the ckpt; the template's conv count
  selects the one the geometry actually uses (model_module.py:131-215).
* CrossAttentionBlock: packed ``cross_attn.in_proj_weight/bias`` split into
  q/k/v + ``attn_ffn.{0,1,3}`` (model_module.py:799-818).
* Backbone: timm layout under ``backbone_adapter.backbone.*`` — delegated
  to :func:`..backbones.importers.import_resnet50`.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional, Tuple

import numpy as np


def _np(v) -> np.ndarray:
    if hasattr(v, "detach"):
        return v.detach().cpu().numpy()
    return np.asarray(v)


def strip_lightning_prefix(state_dict: Mapping[str, Any],
                           prefix: str = "model.") -> Dict[str, Any]:
    """Drop Lightning's ``model.`` wrapper prefix (prepare_single_model.py:213-216)."""
    return {
        (k[len(prefix):] if k.startswith(prefix) else k): v
        for k, v in state_dict.items()
    }


def load_lightning_ckpt(path: str) -> Dict[str, Any]:
    """Load a ``.ckpt``/``.pth`` file and return the bare model state_dict."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    sd = obj.get("state_dict", obj) if isinstance(obj, dict) else obj
    return strip_lightning_prefix(sd)


class _Importer:
    """Fills a Flax (params, batch_stats) template from a torch state_dict."""

    def __init__(self, sd: Mapping[str, Any]):
        self.sd = {k: _np(v) for k, v in sd.items()}
        self.used: set = set()

    def take(self, key: str) -> np.ndarray:
        if key not in self.sd:
            raise KeyError(f"reference checkpoint has no tensor '{key}'")
        self.used.add(key)
        return self.sd[key]

    def has(self, key: str) -> bool:
        return key in self.sd

    # -- leaf converters ---------------------------------------------------
    def conv(self, p: dict, key: str) -> None:
        w = self.take(key + ".weight")
        _check(p["kernel"], w.transpose(2, 3, 1, 0), key)
        p["kernel"] = w.transpose(2, 3, 1, 0).copy()
        if "bias" in p:
            p["bias"] = self.take(key + ".bias").copy()

    def dense(self, p: dict, key: str) -> None:
        w = self.take(key + ".weight")
        _check(p["kernel"], w.T, key)
        p["kernel"] = w.T.copy()
        if "bias" in p:
            p["bias"] = self.take(key + ".bias").copy()

    def dense_from_conv1x1(self, p: dict, key: str) -> None:
        """Reference SE blocks use 1x1 convs where ours use Dense."""
        w = self.take(key + ".weight")[:, :, 0, 0]  # (O, I)
        _check(p["kernel"], w.T, key)
        p["kernel"] = w.T.copy()
        if "bias" in p:
            p["bias"] = self.take(key + ".bias").copy()

    def bn(self, p: dict, s: dict, key: str) -> None:
        p["scale"] = self.take(key + ".weight").copy()
        p["bias"] = self.take(key + ".bias").copy()
        s["mean"] = self.take(key + ".running_mean").copy()
        s["var"] = self.take(key + ".running_var").copy()

    def norm(self, p: dict, key: str) -> None:  # GroupNorm / LayerNorm
        p["scale"] = self.take(key + ".weight").copy()
        p["bias"] = self.take(key + ".bias").copy()

    # -- composite modules -------------------------------------------------
    def bn_wrapper(self, p: dict, s: dict, key: str) -> None:
        """Our BatchNorm wrapper nests the stats under ``BatchNorm_0``."""
        self.bn(p["BatchNorm_0"], s["BatchNorm_0"], key)

    def se(self, p: dict, key: str) -> None:
        """SEBlock: reference ``fc`` Sequential(pool, conv, GELU, conv, sig)."""
        self.dense_from_conv1x1(p["Dense_0"], key + ".fc.1")
        self.dense_from_conv1x1(p["Dense_1"], key + ".fc.3")

    def recon_head(self, p: dict, s: dict, key: str) -> None:
        self.conv(p["Conv_0"], key + ".conv.0")
        self.bn_wrapper(p["BatchNorm_0"], s["BatchNorm_0"], key + ".conv.1")
        self.conv(p["Conv_1"], key + ".conv.3")

    def res_block(self, p: dict, s: dict, key: str) -> None:
        """ResNetLiteBlock_withRecon -> our ResLiteBlock naming."""
        bn_idx = 0
        if "skip_conv" in p:
            self.conv(p["skip_conv"], key + ".skip.0")
            self.bn_wrapper(p[f"BatchNorm_{bn_idx}"], s[f"BatchNorm_{bn_idx}"],
                            key + ".skip.1")
            bn_idx += 1
        n_convs = len([k for k in p if k.startswith("Conv_")])
        assert n_convs % 3 == 0, f"{key}: unexpected conv count {n_convs}"
        for i in range(n_convs // 3):  # one bottleneck per repeat
            base = f"{key}.bottlenecks.{i}"
            for j, t_idx in enumerate((0, 4, 7)):  # conv positions
                self.conv(p[f"Conv_{3 * i + j}"], f"{base}.{t_idx}")
            for j, t_idx in enumerate((1, 5, 8)):  # bn positions
                k = f"BatchNorm_{bn_idx + 3 * i + j}"
                self.bn_wrapper(p[k], s[k], f"{base}.{t_idx}")
        if "se" in p:
            self.se(p["se"], key + ".se")
        if "reconstruct" in p:
            self.recon_head(p["reconstruct"], s["reconstruct"],
                            key + ".reconstruct")

    def mask_head(self, p: dict, key: str) -> None:
        """pre -> Conv_0; the template's middle convs select the reference
        down-chain; out -> last conv."""
        n = len([k for k in p if k.startswith("Conv_")])
        self.conv(p["Conv_0"], key + ".pre")
        n_mid = n - 2
        if n_mid > 0:
            chain = {1: "down_64_to_32", 2: "down_128_to_32",
                     3: "down_256_to_32", 4: "down_512_to_32"}[n_mid]
            for j in range(n_mid):
                self.conv(p[f"Conv_{1 + j}"], f"{key}.{chain}.{2 * j}")
        self.conv(p[f"Conv_{n - 1}"], key + ".out")

    def projector(self, p: dict, s: dict, key: str) -> None:
        self.conv(p["Conv_0"], key + ".proj.0")
        self.bn_wrapper(p["BatchNorm_0"], s["BatchNorm_0"], key + ".proj.1")
        self.conv(p["Conv_1"], key + ".proj.3")
        self.bn_wrapper(p["BatchNorm_1"], s["BatchNorm_1"], key + ".proj.4")

    def down_align(self, p: dict, s: dict, key: str) -> None:
        self.conv(p["Conv_0"], key + ".proj.0")
        self.bn_wrapper(p["BatchNorm_0"], s["BatchNorm_0"], key + ".proj.1")

    def spatial_attention(self, p: dict, key: str) -> None:
        p["gamma"] = self.take(key + ".gamma").reshape(()).copy()
        self.conv(p["Conv_0"], key + ".mask_processor.0")
        self.norm(p["GroupNorm_0"], key + ".mask_processor.1")
        self.conv(p["Conv_1"], key + ".mask_processor.3")

    def transformer_stage(self, p: dict, key: str) -> None:
        """Hybrid TransformerStage (transformer_model.py:137-175): PatchEmbed
        conv+LN, then pre-LN blocks with packed qkv and LayerScale."""
        self.conv(p["patch_embed"], key + ".patch_embed.proj")
        self.norm(p["patch_norm"], key + ".patch_embed.norm")
        i = 0
        while f"block{i}" in p:
            b = p[f"block{i}"]
            base = f"{key}.transformer.layers.{i}"
            self.norm(b["LayerNorm_0"], base + ".norm1")
            self.dense(b["attn"]["qkv"], base + ".attn.qkv")
            self.dense(b["attn"]["proj"], base + ".attn.proj")
            self.norm(b["LayerNorm_1"], base + ".norm2")
            self.dense(b["mlp"]["Dense_0"], base + ".mlp.fc1")
            self.dense(b["mlp"]["Dense_1"], base + ".mlp.fc2")
            b["gamma1"] = self.take(base + ".gamma1").copy()
            b["gamma2"] = self.take(base + ".gamma2").copy()
            i += 1

    def cross_attention(self, p: dict, key: str) -> None:
        C = p["q_proj"]["kernel"].shape[0]
        w = self.take(key + ".cross_attn.in_proj_weight")  # (3C, C)
        b = self.take(key + ".cross_attn.in_proj_bias")
        for i, name in enumerate(("q_proj", "k_proj", "v_proj")):
            p[name]["kernel"] = w[i * C:(i + 1) * C].T.copy()
            p[name]["bias"] = b[i * C:(i + 1) * C].copy()
        self.dense(p["out_proj"], key + ".cross_attn.out_proj")
        self.norm(p["LayerNorm_0"], key + ".attn_ffn.0")
        self.dense(p["Dense_0"], key + ".attn_ffn.1")
        self.dense(p["Dense_1"], key + ".attn_ffn.3")


def _check(old: Any, new: np.ndarray, key: str) -> None:
    old = np.asarray(old)
    if old.shape != new.shape:
        raise ValueError(
            f"shape mismatch importing '{key}': checkpoint {new.shape} vs "
            f"model {old.shape} — config/geometry disagree with the ckpt"
        )


def _to_host(tree):
    if isinstance(tree, Mapping):
        return {k: _to_host(v) for k, v in tree.items()}
    return np.asarray(tree)


def import_reference_encoder(
    state_dict: Mapping[str, Any],
    variables: Mapping[str, Any],
    backbone_in_channels: Optional[int] = None,
) -> Dict[str, Any]:
    """Map a reference ``ModelMaskHeadBackbone`` state_dict onto an
    initialized ``Encoder`` variables tree; returns new variables.

    ``backbone_in_channels``: input channel count for first-conv adaptation
    when the checkpoint's backbone conv1 doesn't match (ImageNet 3-channel
    ckpts); None = channels must already match.
    """
    imp = _Importer(strip_lightning_prefix(state_dict))
    params = _to_host(variables["params"])
    stats = _to_host(variables.get("batch_stats", {}))

    if "modality_attention" in params:
        imp.se(params["modality_attention"], "modality_attention")

    if "backbone_adapter" in params:
        _import_adapter_necks(imp, params["backbone_adapter"],
                              stats["backbone_adapter"])
        # ViT backbones carry no BN stats, so the template may lack the slot
        _import_backbone(imp, params["backbone"], stats.get("backbone", {}),
                         backbone_in_channels)
        for scalar in ("f2_weight", "f3_weight"):
            if scalar in params:
                params[scalar] = imp.take(scalar).reshape(()).copy()
        for gn in ("norm_f2", "norm_f3"):
            if gn in params:
                imp.norm(params[gn], gn)

    for blk in ("block1", "block2", "block3"):
        if blk in params:
            imp.res_block(params[blk], stats[blk], blk)

    if "f1_to_f2" in params:
        imp.down_align(params["f1_to_f2"], stats["f1_to_f2"], "f1_to_f2")
    if "f2_to_f3" in params:
        imp.down_align(params["f2_to_f3"], stats["f2_to_f3"], "f2_to_f3")
    if "mask_head" in params:
        imp.mask_head(params["mask_head"], "mask_head")
    if "mask_spatial_attention" in params:
        imp.spatial_attention(params["mask_spatial_attention"],
                              "mask_spatial_attention")
    for proj in ("proj_f1", "proj_f2", "proj_r1", "proj_r2"):
        if proj in params:
            imp.projector(params[proj], stats[proj], proj)
    if "transformer" in params:
        imp.transformer_stage(params["transformer"], "transformer")
        imp.conv(params["trans_out_proj"], "trans_out_proj")
    imp.dense(params["classification_head"]["Dense_0"],
              "classification_head.fc")

    return {"params": params, "batch_stats": stats}


def _import_adapter_necks(imp: _Importer, p: dict, s: dict) -> None:
    for i in range(1, 4):
        for j in range(2):
            ck = f"backbone_adapter.necks.f{i}.{3 * j}"
            bk = f"backbone_adapter.necks.f{i}.{3 * j + 1}"
            imp.conv(p[f"neck_f{i}_conv{j}"], ck)
            imp.bn_wrapper(p[f"neck_f{i}_bn{j}"], s[f"neck_f{i}_bn{j}"], bk)


def _import_backbone(imp: _Importer, p: dict, s: dict,
                     in_channels: Optional[int]) -> None:
    """The timm backbone: in our Encoder it's the top-level ``backbone``
    child; in the reference ckpt the shared module appears under
    'backbone.' and/or 'backbone_adapter.backbone.' (model_module.py:539-546).

    Dispatches on the checkpoint's own layout: ``patch_embed.proj.weight``
    marks a ViT/DINO backbone (foundation_model.py:371-431), otherwise a
    ResNet stem is expected.  ViT geometry (depth, patch size, grid) is read
    off the TEMPLATE so the checkpoint's 224-grid position embedding is
    resized to whatever the target model was built with
    (foundation_model.py:321-369's img_size=256 override)."""
    from .backbones.importers import import_resnet50, import_vit_base

    sub = {}
    # torch._dynamo.disable wraps the encoder-level backbone, adding an
    # ``_orig_mod`` level (model_module.py:539); the adapter's copy of the
    # shared module is unwrapped
    for prefix in ("backbone._orig_mod.", "backbone_adapter.backbone.",
                   "backbone."):
        sub = {k[len(prefix):]: v for k, v in imp.sd.items()
               if k.startswith(prefix)}
        if sub:
            imp.used.update(prefix + k for k in sub)
            break
    if not sub:
        raise KeyError("no backbone tensors in checkpoint")

    if "patch_embed.proj.weight" in sub:  # ViT/DINO (token backbone)
        depth = len([k for k in p if k.startswith("block")])
        ph, pw, t_in, _ = np.asarray(p["patch_embed"]["kernel"]).shape
        assert ph == pw, "non-square patch embed in template"
        grid = int(np.sqrt(np.asarray(p["pos_embed"]).shape[1] - 1))
        want_in = in_channels if in_channels is not None else t_in
        bp, _ = import_vit_base(
            sub, in_channels=want_in, img_size=grid * ph, patch_size=ph,
            depth=depth,
        )
        _splice(p, bp, "backbone params")
        if s:
            raise ValueError("template has BN stats for a ViT backbone")
        return

    stem = "conv1.weight" if "conv1.weight" in sub else "conv1.0.weight"
    want_in = (in_channels if in_channels is not None
               else sub[stem].shape[1])
    deep_stem = stem != "conv1.weight"
    bp, bs = import_resnet50(sub, in_channels=want_in, deep_stem=deep_stem)
    _splice(p, bp, "backbone params")
    _splice(s, bs, "backbone stats")


def _splice(dst: dict, src: dict, what: str) -> None:
    if set(dst) != set(src):
        missing = set(dst) ^ set(src)
        raise ValueError(f"{what}: tree mismatch at {sorted(missing)[:6]}")
    for k in dst:
        if isinstance(dst[k], dict):
            _splice(dst[k], src[k], what)
        else:
            _check(dst[k], np.asarray(src[k]), what + "/" + k)
            dst[k] = np.asarray(src[k])


def import_reference_fusion(
    state_dict: Mapping[str, Any],
    variables: Mapping[str, Any],
) -> Dict[str, Any]:
    """Map a reference ``FusionModel`` state_dict onto an initialized
    ``FusionModel`` variables tree; returns new variables."""
    imp = _Importer(strip_lightning_prefix(state_dict))
    params = _to_host(variables["params"])
    stats = _to_host(variables.get("batch_stats", {}))

    for name in ("proj_in_dwi", "proj_in_dce"):
        if name in params:  # nn.Identity when channels already match
            imp.conv(params[name], name)
    imp.conv(params["fusion_conv_reduce"]["Conv_0"],
             "fusion_conv_reduce.reduce.0")
    imp.bn_wrapper(params["fusion_conv_reduce"]["BatchNorm_0"],
                   stats["fusion_conv_reduce"]["BatchNorm_0"],
                   "fusion_conv_reduce.reduce.1")
    imp.res_block(params["refine"], stats["refine"], "refine")
    imp.dense(params["gating"]["fc"], "gating.fc")
    if "cross_attn_block" in params:
        imp.cross_attention(params["cross_attn_block"], "cross_attn_block")
    if "fusion_se" in params:
        imp.se(params["fusion_se"], "fusion_se")
    imp.mask_head(params["mask_head"], "mask_head")
    imp.dense(params["classifier"], "classifier.2")
    if "fusion_reconstruct" in params:
        imp.recon_head(params["fusion_reconstruct"],
                       stats["fusion_reconstruct"], "fusion_reconstruct")
    imp.projector(params["projF"], stats["projF"], "projF")

    return {"params": params, "batch_stats": stats}
