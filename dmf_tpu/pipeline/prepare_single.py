"""Single-modality preparation: raw tensors -> splits, processors, model.

Behavior-compatible redesign of ``prepare_single_custom_model``
(prepare_single_model.py:22-177): per-modality prep (ADC / DCE-max), mask
resize + stratified split, Nyul fit on train, backbone build, model build —
but as pure data flow, with the per-sample torchvision transform pipeline
replaced by batched on-device processing (data/modality.py) and the
post-transform split cache (prepare_single_model.py:154-174) replaced by
processed ``.npz`` splits for fusion reuse.
"""

from __future__ import annotations

import dataclasses
import os
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config, resolve_backbone_config
from ..data.modality import ModalityProcessor
from ..data.preprocess import (
    NyulStandardizer,
    dce_global_max_normalize,
    prep_dwi_adc_maps,
)
from ..data.splits import train_val_indices
from ..models import Encoder
from ..models.backbones import BackboneBundle, build_backbone, graft_backbone_variables
from ..ops.resize import resize_nearest


@dataclass
class SingleModelData:
    """Raw per-split arrays + processors for one modality/fold."""

    method: str
    fold: int
    splits: Dict[str, Dict[str, Optional[np.ndarray]]]  # train/val/test
    processor: ModalityProcessor
    processors_by_split: Dict[str, ModalityProcessor]
    nyul: Optional[NyulStandardizer]
    train_labels: np.ndarray


def load_raw_tensors(cfg: Config, method: str) -> Dict[str, np.ndarray]:
    """Load the raw tensor store.

    Accepts ``.npz`` (native format, channels-last) or the reference's
    ``.pth`` torch tensors (NCHW -> transposed on load); falls back to
    synthetic data when the store is absent so every pipeline stage stays
    runnable (the Kaggle tensors are not distributed).
    """
    base = cfg.base_path
    npz = os.path.join(base, f"{method}_tensordata.npz")
    if os.path.exists(npz):
        d = np.load(npz)
        return {k: d[k] for k in d.files}

    def find_pth(stem: str) -> Optional[str]:
        # flat layout, or the reference's nested one-dir-per-store layout
        # (parameters_generate.py:290-296: base/dwi_tensordata/
        # dwi_tensordata.pth etc.) so a reference archive works unmodified
        for p in (os.path.join(base, f"{stem}.pth"),
                  os.path.join(base, stem, f"{stem}.pth")):
            if os.path.exists(p):
                return p
        return None

    pth = find_pth(f"{method}_tensordata")
    if pth is not None:
        import torch

        def to_np(t):
            return t.float().numpy().transpose(0, 2, 3, 1)

        def load(stem):
            return torch.load(find_pth(stem), map_location="cpu")

        return {
            "imgs": to_np(torch.load(pth, map_location="cpu")),
            "test_imgs": to_np(load(f"{method}_test_tensordata")),
            "labels": load("labels_tensordata").numpy(),
            "test_labels": load("labels_test_tensordata").numpy(),
            "masks": torch.load(os.path.join(base, "masks/mask.pth"),
                                map_location="cpu")
            .float().numpy().transpose(0, 2, 3, 1),
        }
    from ..data.synthetic import make_synthetic_arrays

    raw = make_synthetic_arrays(seed=cfg.seed)
    key = "dwi" if method == "dwi" else "dce"
    return {
        "imgs": raw[key],
        "test_imgs": raw[f"{key}_test"],
        "labels": raw["labels"],
        "test_labels": raw["labels_test"],
        "masks": raw["masks"],
    }


def prepare_single_data(
    cfg: Config, method: str, fold: int,
    raw: Optional[Dict[str, np.ndarray]] = None,
) -> SingleModelData:
    """Split + fit normalizers for one (method, fold)."""
    raw = raw or load_raw_tensors(cfg, method)
    imgs, test_imgs = raw["imgs"], raw["test_imgs"]
    labels, test_labels = raw["labels"], raw["test_labels"]
    mc = cfg.model_config(method)

    tr, va = train_val_indices(labels, cfg.segnum, cfg.class_num, fold,
                               cfg.seed)

    # modality-specific raw prep (prepare_single_model.py:311-343)
    adc_maps = [None, None, None]
    adc_splits: List[Optional[np.ndarray]] = [None, None, None]
    nyul = None
    if method == "dwi" and cfg.dwi_add_adc_map:
        adc_maps = prep_dwi_adc_maps(
            imgs, test_imgs, cfg.dwi_bvals_to_use, cfg.reference_compat
        )
        # compat mode computes ONE map per split from raw samples 0/1/test0
        # *before* splitting, exactly like prepare_single_model.py:319-326;
        # the corrected path returns per-sample map stacks which must travel
        # with their samples through shuffled batches — slice them into the
        # splits and feed them per-batch instead of via the processor
        if not cfg.reference_compat:
            all_train = np.asarray(adc_maps[0])
            adc_splits = [all_train[tr], all_train[va],
                          np.asarray(adc_maps[2])]
            adc_maps = [None, None, None]
    elif method == "dce":
        imgs = np.asarray(dce_global_max_normalize(jnp.asarray(imgs)))
        test_imgs = np.asarray(dce_global_max_normalize(jnp.asarray(test_imgs)))

    # masks -> mask_target_size (nearest), split with images
    masks = raw.get("masks")
    mask_splits: List[Optional[np.ndarray]] = [None, None, None]
    if mc.mask.enabled and masks is not None:
        target = tuple(mc.mask.mask_target_size)
        if masks.shape[1:3] != target:
            masks = np.asarray(resize_nearest(jnp.asarray(masks), target))
        mask_splits = [masks[tr], masks[va], None]  # test masks don't exist

    splits = {
        "train": {"imgs": imgs[tr], "masks": mask_splits[0],
                  "labels": labels[tr], "adc": adc_splits[0]},
        "val": {"imgs": imgs[va], "masks": mask_splits[1],
                "labels": labels[va], "adc": adc_splits[1]},
        "test": {"imgs": test_imgs, "masks": None, "labels": test_labels,
                 "adc": adc_splits[2]},
    }

    # Nyul fit on the raw (max-normalized) train split
    if method == "dce":
        nyul = NyulStandardizer()
        nyul_path = os.path.join(cfg.base_path, "nyul_landmarks.npy")
        if os.path.exists(nyul_path):
            try:
                nyul.load(nyul_path)
            except Exception:
                pass
        if not nyul.fitted:
            nyul.fit(splits["train"]["imgs"])
            try:
                os.makedirs(cfg.base_path, exist_ok=True)
                nyul.save(nyul_path)
            except OSError:
                pass

    per_split = {
        name: ModalityProcessor(cfg, method, nyul=nyul, adc_map=adc_maps[i])
        for i, name in enumerate(("train", "val", "test"))
    }
    return SingleModelData(
        method=method,
        fold=fold,
        splits=splits,
        processor=per_split["train"],
        processors_by_split=per_split,
        nyul=nyul,
        train_labels=splits["train"]["labels"],
    )


def build_single_model(
    cfg: Config,
    method: str,
    pretrained_path: Optional[str] = None,
    dtype=jnp.float32,
):
    """Build the encoder module (+ backbone) and its init variables.

    Replaces backbone build + ``initialize_model`` + config-mutation
    (prepare_single_model.py:94-98, 148; foundation_model.py:490-573).
    Returns ``(model, variables, resolved_cfg)``.
    """
    mc = cfg.model_config(method)
    bundle: Optional[BackboneBundle] = None
    backbone = None
    if mc.use_backbone:
        mc = resolve_backbone_config(mc)
        bundle = build_backbone(mc, cfg.channel_num(method),
                                pretrained_path=pretrained_path, dtype=dtype)
        backbone = bundle.module
    model = Encoder(
        method=method, config=mc, channel_num=cfg.channel_num(method),
        num_classes=cfg.class_num, backbone=backbone, dtype=dtype,
    )
    sample = jnp.zeros(
        (2, mc.input_size, mc.input_size, cfg.channel_num(method)), jnp.float32
    )
    from ..utils.init import init_on_cpu

    variables = init_on_cpu(
        lambda: model.init(
            {"params": jax.random.PRNGKey(cfg.seed),
             "dropout": jax.random.PRNGKey(cfg.seed + 1)},
            sample, train=False,
        )
    )
    if bundle is not None and bundle.params is not None:
        variables = graft_backbone_variables(jax.device_get(variables), bundle)
    resolved = dataclasses.replace(cfg, **{f"{method}_model": mc}) \
        if method in ("dwi", "dce") else cfg
    return model, variables, resolved


def save_processed_split(
    path: str, imgs: np.ndarray, masks: Optional[np.ndarray],
    labels: Optional[np.ndarray],
) -> None:
    """Processed-split cache for fusion reuse (prepare_single_model.py:259-265)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    data = {"imgs": imgs}
    if masks is not None:
        data["masks"] = masks
    if labels is not None:
        data["labels"] = labels
    np.savez(path, **data)


def load_processed_split(path: str) -> Dict[str, np.ndarray]:
    if not path.endswith(".npz"):
        path = path + ".npz"
    d = np.load(path)
    return {k: d[k] for k in d.files}


def export_processed_splits(
    cfg: Config, data: SingleModelData, rng_seed: int = 0,
) -> Dict[str, str]:
    """Process every split once and cache it (the fusion stage trains from
    these, mirroring the reference's post-transform extraction at
    prepare_single_model.py:154-174 — including the quirk that the train
    split is a single frozen augmentation realization)."""
    key = jax.random.PRNGKey(rng_seed)
    out = {}
    for split, arrays in data.splits.items():
        proc = data.processors_by_split[split]
        adc = arrays.get("adc")
        if split == "train" and cfg.reference_compat:
            imgs = np.asarray(proc.train_batch(key, arrays["imgs"], adc=adc))
        else:
            imgs = np.asarray(proc.eval_batch(arrays["imgs"], adc=adc))
        path = os.path.join(
            cfg.base_path, "processed",
            f"{data.method}{data.fold}{split}data",
        )
        save_processed_split(
            path, imgs,
            arrays.get("masks") if data.method == "dwi" else None,
            arrays.get("labels") if data.method == "dwi" else None,
        )
        out[split] = path + ".npz"
    return out
