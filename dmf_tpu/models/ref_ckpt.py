"""Migration importer/exporter: reference Lightning checkpoints <-> dmf_tpu.

A user of the reference switches frameworks with their trained weights — in
EITHER direction:

* import: maps the reference's ``ModelMaskHeadBackbone``
  (model_module.py:481-733) and ``FusionModel`` (model_module.py:842-1000)
  state_dicts onto our Flax ``Encoder``/``FusionModel`` variable trees.
  Lightning checkpoints store the module under a ``model.`` prefix
  (prepare_single_model.py:213-216 strips it the same way).
* export: the exact inverse — our variables back to a reference-layout
  state_dict that ``load_state_dict(strict=True)`` accepts on the genuine
  torch modules, plus :func:`save_lightning_ckpt` for the on-disk format.

The mapping is TEMPLATE-DRIVEN: both directions walk the target model's
initialized variables, so config-dependent structure (skip/SE/recon
presence, repeat counts, mask-head chain length, backbone on/off) never
needs re-deriving — anything present in the template is mapped, and a
missing reference key on import is a hard error naming both sides.  The
shared walk lives in :class:`_MapperBase`; ``_Importer``/``_Exporter``
implement only the direction-specific leaf conversions.

Layout notes (verified against the reference source):
* ResNetLiteBlock_withRecon: ``bottlenecks.{i}.{0,1,4,5,7,8}`` conv/BN
  triplets, ``skip.{0,1}``, ``se.fc.{1,3}`` (1x1 convs; ours are Dense),
  ``reconstruct.conv.{0,1,3}`` (model_module.py:220-316).
* MaskHeadResize: ``pre``, ``down_{64,128,256,512}_to_32.{0,2,4,6}``,
  ``out`` — ALL FOUR chains exist in the ckpt (model_module.py:152-187);
  the template's conv count selects the one the geometry actually uses.
  Export fills the unused chains with torch-default-initialized tensors.
* CrossAttentionBlock: packed ``cross_attn.in_proj_weight/bias`` split into
  q/k/v + ``attn_ffn.{0,1,3}`` (model_module.py:799-818).
* Backbone: timm layout; the reference dynamo-wraps the encoder-level
  attribute, so a serialized module carries the shared backbone TWICE —
  ``backbone._orig_mod.*`` and ``backbone_adapter.backbone._orig_mod.*``
  (model_module.py:539-546).  Import accepts any of the three observed
  prefixes; export emits both wrapped paths.
* torch BatchNorms serialize a ``num_batches_tracked`` counter; import
  ignores it, export emits 0 (it only feeds the momentum=None path).
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


def save_lightning_ckpt(path: str, state_dict: Mapping[str, np.ndarray],
                        prefix: str = "model.") -> None:
    """Write a Lightning-layout checkpoint the reference's resume path loads
    directly (``{'state_dict': {'model.'+k: tensor}}``,
    prepare_single_model.py:208-218)."""
    import torch

    # torch.tensor copies, so non-writable (device-backed) arrays are safe
    sd = {prefix + k: torch.tensor(np.asarray(v))
          for k, v in state_dict.items()}
    torch.save({"state_dict": sd}, path)


class _MapperBase:
    """Structure walk shared by import and export.

    Composite modules are expressed purely in terms of the leaf primitives
    (``conv``/``dense``/``dense_from_conv1x1``/``bn``/``norm``/``scalar``/
    ``packed_qkv``) plus template introspection, so each direction only
    implements the leaves: the importer reads the torch state_dict and
    writes the Flax template, the exporter reads the template and writes a
    torch state_dict.
    """

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
        """ResNetLiteBlock_withRecon <-> our ResLiteBlock naming."""
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

    _MASK_CHAINS = {1: "down_64_to_32", 2: "down_128_to_32",
                    3: "down_256_to_32", 4: "down_512_to_32"}

    def mask_head(self, p: dict, key: str) -> None:
        """pre -> Conv_0; the template's middle convs select the reference
        down-chain; out -> last conv."""
        n = len([k for k in p if k.startswith("Conv_")])
        self.conv(p["Conv_0"], key + ".pre")
        n_mid = n - 2
        if n_mid > 0:
            chain = self._MASK_CHAINS[n_mid]
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
        self.scalar(p, "gamma", key + ".gamma")
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
            self.scalar(b, "gamma1", base + ".gamma1")
            self.scalar(b, "gamma2", base + ".gamma2")
            i += 1

    def cross_attention(self, p: dict, key: str) -> None:
        self.packed_qkv(p, key + ".cross_attn")
        self.dense(p["out_proj"], key + ".cross_attn.out_proj")
        self.norm(p["LayerNorm_0"], key + ".attn_ffn.0")
        self.dense(p["Dense_0"], key + ".attn_ffn.1")
        self.dense(p["Dense_1"], key + ".attn_ffn.3")


class _Importer(_MapperBase):
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
        """Reference SE blocks use 1x1 convs where ours are Dense."""
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

    def scalar(self, p: dict, name: str, key: str) -> None:
        p[name] = self.take(key).reshape(np.asarray(p[name]).shape).copy()

    def packed_qkv(self, p: dict, key: str) -> None:
        """torch MHA packs q/k/v into one (3C, C) in_proj."""
        C = p["q_proj"]["kernel"].shape[0]
        w = self.take(key + ".in_proj_weight")  # (3C, C)
        b = self.take(key + ".in_proj_bias")
        for i, name in enumerate(("q_proj", "k_proj", "v_proj")):
            p[name]["kernel"] = w[i * C:(i + 1) * C].T.copy()
            p[name]["bias"] = b[i * C:(i + 1) * C].copy()


class _Exporter(_MapperBase):
    """Emits a reference-layout state_dict from a Flax (params, stats) tree.

    ``rng`` seeds the torch-default initialization of reference-only slots
    (the unused MaskHeadResize chains) so exports are deterministic.
    """

    def __init__(self, rng: Optional[np.random.RandomState] = None):
        self.out: Dict[str, np.ndarray] = {}
        self.rng = rng if rng is not None else np.random.RandomState(0)

    def put(self, key: str, v) -> None:
        self.out[key] = np.asarray(v, dtype=np.float32)

    # -- leaf converters (inverse of _Importer's) ---------------------------
    def conv(self, p: dict, key: str) -> None:
        self.put(key + ".weight", np.asarray(p["kernel"]).transpose(3, 2, 0, 1))
        if "bias" in p:
            self.put(key + ".bias", p["bias"])

    def dense(self, p: dict, key: str) -> None:
        self.put(key + ".weight", np.asarray(p["kernel"]).T)
        if "bias" in p:
            self.put(key + ".bias", p["bias"])

    def dense_from_conv1x1(self, p: dict, key: str) -> None:
        w = np.asarray(p["kernel"]).T  # (O, I)
        self.put(key + ".weight", w[:, :, None, None])
        if "bias" in p:
            self.put(key + ".bias", p["bias"])

    def bn(self, p: dict, s: dict, key: str) -> None:
        self.put(key + ".weight", p["scale"])
        self.put(key + ".bias", p["bias"])
        self.put(key + ".running_mean", s["mean"])
        self.put(key + ".running_var", s["var"])
        self.out[key + ".num_batches_tracked"] = np.asarray(0, np.int64)

    def norm(self, p: dict, key: str) -> None:
        self.put(key + ".weight", p["scale"])
        self.put(key + ".bias", p["bias"])

    def scalar(self, p: dict, name: str, key: str) -> None:
        self.put(key, p[name])

    def packed_qkv(self, p: dict, key: str) -> None:
        w = np.concatenate(
            [np.asarray(p[n]["kernel"]).T for n in ("q_proj", "k_proj", "v_proj")],
            axis=0,
        )
        b = np.concatenate(
            [np.asarray(p[n]["bias"]) for n in ("q_proj", "k_proj", "v_proj")],
            axis=0,
        )
        self.put(key + ".in_proj_weight", w)
        self.put(key + ".in_proj_bias", b)

    # -- reference-only slots ------------------------------------------------
    def mask_head(self, p: dict, key: str) -> None:
        super().mask_head(p, key)
        # the reference registers ALL FOUR down chains regardless of which
        # one the geometry uses (model_module.py:152-187); fill the unused
        # ones at torch's default conv init so strict loads succeed and a
        # later geometry change in the reference still starts sanely
        n_mid = len([k for k in p if k.startswith("Conv_")]) - 2
        mid_ch = np.asarray(p["Conv_0"]["kernel"]).shape[3]
        for cnt, chain in self._MASK_CHAINS.items():
            if cnt == n_mid:
                continue
            for j in range(cnt):
                self.default_conv(f"{key}.{chain}.{2 * j}", mid_ch, mid_ch, 3)

    def default_conv(self, key: str, out_ch: int, in_ch: int, k: int,
                     bias: bool = True) -> None:
        """torch nn.Conv2d default init: kaiming_uniform(a=sqrt(5)) ==
        U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for weight and bias alike."""
        bound = 1.0 / np.sqrt(in_ch * k * k)
        self.put(key + ".weight",
                 self.rng.uniform(-bound, bound, (out_ch, in_ch, k, k)))
        if bias:
            self.put(key + ".bias",
                     self.rng.uniform(-bound, bound, (out_ch,)))

    def default_bn(self, key: str, ch: int) -> None:
        """torch nn.BatchNorm2d defaults: identity affine, fresh stats."""
        self.put(key + ".weight", np.ones(ch))
        self.put(key + ".bias", np.zeros(ch))
        self.put(key + ".running_mean", np.zeros(ch))
        self.put(key + ".running_var", np.ones(ch))
        self.out[key + ".num_batches_tracked"] = np.asarray(0, np.int64)


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


def export_reference_encoder(
    variables: Mapping[str, Any], seed: int = 0
) -> Dict[str, np.ndarray]:
    """Inverse migration: our ``Encoder`` variables -> a reference
    ``ModelMaskHeadBackbone`` state_dict (torch key layout, numpy values)
    that the genuine module accepts with ``load_state_dict(strict=True)``.

    Slots the reference registers but our functional model does not carry
    — the unused MaskHeadResize down chains everywhere, and the alpha-blend
    scalars + GroupNorms when built without a backbone
    (model_module.py:593-596) — are emitted at the reference's own default
    values (``seed`` makes the torch-default conv fills deterministic).
    Wrap with :func:`save_lightning_ckpt` for the on-disk format.
    """
    exp = _Exporter(np.random.RandomState(seed))
    params = _to_host(variables["params"])
    stats = _to_host(variables.get("batch_stats", {}))

    if "modality_attention" in params:
        exp.se(params["modality_attention"], "modality_attention")

    if "backbone_adapter" in params:
        _export_adapter_necks(exp, params["backbone_adapter"],
                              stats["backbone_adapter"])
        _export_backbone(exp, params["backbone"], stats.get("backbone", {}))
        for scalar in ("f2_weight", "f3_weight"):
            if scalar in params:
                exp.put(scalar, params[scalar])
        for gn in ("norm_f2", "norm_f3"):
            if gn in params:
                exp.norm(params[gn], gn)

    for blk in ("block1", "block2", "block3"):
        if blk in params:
            exp.res_block(params[blk], stats[blk], blk)

    if "f1_to_f2" in params:
        exp.down_align(params["f1_to_f2"], stats["f1_to_f2"], "f1_to_f2")
    if "f2_to_f3" in params:
        exp.down_align(params["f2_to_f3"], stats["f2_to_f3"], "f2_to_f3")
    if "mask_head" in params:
        exp.mask_head(params["mask_head"], "mask_head")
    if "mask_spatial_attention" in params:
        exp.spatial_attention(params["mask_spatial_attention"],
                              "mask_spatial_attention")
    for proj in ("proj_f1", "proj_f2", "proj_r1", "proj_r2"):
        if proj in params:
            exp.projector(params[proj], stats[proj], proj)
    if "transformer" in params:
        exp.transformer_stage(params["transformer"], "transformer")
        exp.conv(params["trans_out_proj"], "trans_out_proj")
    exp.dense(params["classification_head"]["Dense_0"],
              "classification_head.fc")

    c1 = _block_out_channels(params["block1"])
    c2 = _block_out_channels(params["block2"])
    c3 = (_block_out_channels(params["block3"]) if "block3" in params
          else int(np.asarray(params["trans_out_proj"]["kernel"]).shape[3]))

    if "backbone_adapter" not in params:
        # registered unconditionally by the reference even when no backbone
        # consumes them (model_module.py:593-596): scalars at their 0.5
        # default, GroupNorm(c, c) at identity
        exp.put("f2_weight", 0.5)
        exp.put("f3_weight", 0.5)
        for gn, c in (("norm_f2", c1), ("norm_f3", c2)):
            exp.put(gn + ".weight", np.ones(c))
            exp.put(gn + ".bias", np.zeros(c))

    # f1_to_f2 / f2_to_f3 are also registered unconditionally
    # (model_module.py:604-605): a 1x1 conv + BN unless the channel counts
    # match (then nn.Identity, no tensors); our functional model only
    # materializes the one its mask_stage consumes
    for name, ci, co in (("f1_to_f2", c1, c2), ("f2_to_f3", c2, c3)):
        if name in params or ci == co:
            continue
        exp.default_conv(name + ".proj.0", co, ci, 1, bias=False)
        exp.default_bn(name + ".proj.1", co)

    return exp.out


def _block_out_channels(p: dict) -> int:
    """Output width of a ResLiteBlock = its last bottleneck conv's filters."""
    n = len([k for k in p if k.startswith("Conv_")])
    return int(np.asarray(p[f"Conv_{n - 1}"]["kernel"]).shape[3])


def _import_adapter_necks(imp: _Importer, p: dict, s: dict) -> None:
    for i in range(1, 4):
        for j in range(2):
            ck = f"backbone_adapter.necks.f{i}.{3 * j}"
            bk = f"backbone_adapter.necks.f{i}.{3 * j + 1}"
            imp.conv(p[f"neck_f{i}_conv{j}"], ck)
            imp.bn_wrapper(p[f"neck_f{i}_bn{j}"], s[f"neck_f{i}_bn{j}"], bk)


def _export_adapter_necks(exp: _Exporter, p: dict, s: dict) -> None:
    for i in range(1, 4):
        for j in range(2):
            exp.conv(p[f"neck_f{i}_conv{j}"],
                     f"backbone_adapter.necks.f{i}.{3 * j}")
            exp.bn_wrapper(p[f"neck_f{i}_bn{j}"], s[f"neck_f{i}_bn{j}"],
                           f"backbone_adapter.necks.f{i}.{3 * j + 1}")


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
    # shared module is the same wrapper, so try wrapped paths first
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


def _export_backbone(exp: _Exporter, p: dict, s: dict) -> None:
    """Emit the timm-layout backbone under BOTH paths the reference
    serializes: the dynamo-wrapped encoder attribute ``backbone._orig_mod.``
    (model_module.py:539) and the adapter's shared copy
    ``backbone_adapter.backbone._orig_mod.`` (model_module.py:545)."""
    from .backbones.importers import export_resnet50, export_vit_base

    if "patch_embed" in p:  # ViT/DINO token backbone
        sd = export_vit_base(p)
    else:
        sd = export_resnet50(p, s, deep_stem="stem_conv1" in p)
    for prefix in ("backbone._orig_mod.",
                   "backbone_adapter.backbone._orig_mod."):
        for k, v in sd.items():
            exp.out[prefix + k] = v


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


def export_reference_fusion(
    variables: Mapping[str, Any], seed: int = 0
) -> Dict[str, np.ndarray]:
    """Inverse migration: our ``FusionModel`` variables -> a reference
    ``FusionModel`` state_dict accepted by ``load_state_dict(strict=True)``
    on the genuine module (see :func:`export_reference_encoder`)."""
    exp = _Exporter(np.random.RandomState(seed))
    params = _to_host(variables["params"])
    stats = _to_host(variables.get("batch_stats", {}))

    for name in ("proj_in_dwi", "proj_in_dce"):
        if name in params:  # nn.Identity when channels already match
            exp.conv(params[name], name)
    exp.conv(params["fusion_conv_reduce"]["Conv_0"],
             "fusion_conv_reduce.reduce.0")
    exp.bn_wrapper(params["fusion_conv_reduce"]["BatchNorm_0"],
                   stats["fusion_conv_reduce"]["BatchNorm_0"],
                   "fusion_conv_reduce.reduce.1")
    exp.res_block(params["refine"], stats["refine"], "refine")
    exp.dense(params["gating"]["fc"], "gating.fc")
    if "cross_attn_block" in params:
        exp.cross_attention(params["cross_attn_block"], "cross_attn_block")
    if "fusion_se" in params:
        exp.se(params["fusion_se"], "fusion_se")
    exp.mask_head(params["mask_head"], "mask_head")
    exp.dense(params["classifier"], "classifier.2")
    if "fusion_reconstruct" in params:
        exp.recon_head(params["fusion_reconstruct"],
                       stats["fusion_reconstruct"], "fusion_reconstruct")
    exp.projector(params["projF"], stats["projF"], "projF")

    return exp.out
