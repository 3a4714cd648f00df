"""Per-modality batch processing: augmentation + normalization + ADC append.

One jitted XLA program per (modality, split) replaces the reference's
per-sample torchvision Compose + DataLoader workers
(prepare_single_model.py:107-141).  Pipeline order matches the reference:
augment (train only) -> resize -> normalize -> append (un-augmented) ADC.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from ..config import Config
from .augment import augment_batch, eval_resize
from .preprocess import NyulStandardizer, append_adc, dwi_normalize


class ModalityProcessor:
    """Device-side processing for one modality.

    ``adc_map`` (DWI only): the split's shared ADC map under reference
    compat (prepare_single_model.py:319-332) or a per-sample map stack.
    """

    def __init__(
        self,
        cfg: Config,
        method: str,
        nyul: Optional[NyulStandardizer] = None,
        adc_map: Optional[jnp.ndarray] = None,
    ):
        self.cfg = cfg
        self.method = method
        self.nyul = nyul
        self.adc_map = adc_map
        mc = cfg.model_config(method)
        self.input_size = mc.input_size
        if method == "dce" and nyul is None:
            raise ValueError("DCE processing requires a fitted NyulStandardizer")

        self._train_fn = jax.jit(self._process_train)
        self._eval_fn = jax.jit(self._process_eval)
        self._train_fn_adc = jax.jit(self._process_train_adc)
        self._eval_fn_adc = jax.jit(self._process_eval_adc)

    # -- normalization ------------------------------------------------------
    def _normalize(self, imgs: jnp.ndarray) -> jnp.ndarray:
        if self.method == "dwi":
            # compat: skip+zero the last raw b-value channel (the reference's
            # effective behavior); fixed: z-score every b-value channel (the
            # ADC channel is appended afterwards either way).
            compat = self.cfg.reference_compat
            return dwi_normalize(imgs, skip_last=compat, zero_last=compat)
        return self.nyul.transform(imgs)

    def _append_adc(self, imgs: jnp.ndarray) -> jnp.ndarray:
        if self.method == "dwi" and self.cfg.dwi_add_adc_map and self.adc_map is not None:
            return append_adc(imgs, self.adc_map)
        return imgs

    # -- pipelines ----------------------------------------------------------
    def _process_train(self, rng, imgs):
        x = augment_batch(rng, imgs, self.input_size)
        x = self._normalize(x)
        return self._append_adc(x)

    def _process_eval(self, imgs):
        x = eval_resize(imgs, self.input_size)
        x = self._normalize(x)
        return self._append_adc(x)

    def _process_train_adc(self, rng, imgs, adc):
        # per-sample (batch-aligned) ADC rows — the corrected
        # reference_compat=False path; ADC stays un-augmented per the
        # reference's pipeline order
        x = augment_batch(rng, imgs, self.input_size)
        x = self._normalize(x)
        return append_adc(x, adc)

    def _process_eval_adc(self, imgs, adc):
        x = eval_resize(imgs, self.input_size)
        x = self._normalize(x)
        return append_adc(x, adc)

    def train_batch(self, rng, imgs, adc=None) -> jnp.ndarray:
        if adc is not None:
            return self._train_fn_adc(rng, jnp.asarray(imgs), jnp.asarray(adc))
        return self._train_fn(rng, jnp.asarray(imgs))

    def eval_batch(self, imgs, adc=None) -> jnp.ndarray:
        if adc is not None:
            return self._eval_fn_adc(jnp.asarray(imgs), jnp.asarray(adc))
        return self._eval_fn(jnp.asarray(imgs))

    def eval_split(self, imgs, adc=None, chunk: int = 256):
        """Whole-split eval preprocessing, chunked.

        ``eval_batch`` on an entire split stages the full split on device at
        once — fine at this dataset's scale, an OOM trap at any real one.
        This bounds device residency to one ``chunk`` and reuses a single
        compiled shape by padding the tail chunk (normalization is
        per-sample, so padding rows never affect kept rows).  Returns a host
        numpy array.
        """
        import numpy as np

        n = len(imgs)
        if n <= chunk:
            return np.asarray(self.eval_batch(imgs, adc=adc))
        outs = []
        for i in range(0, n, chunk):
            im = np.asarray(imgs[i:i + chunk])
            ad = np.asarray(adc[i:i + chunk]) if adc is not None else None
            k = len(im)
            if k < chunk:  # pad to the one compiled shape, slice after
                pad = chunk - k
                im = np.concatenate([im, np.repeat(im[-1:], pad, axis=0)])
                if ad is not None:
                    ad = np.concatenate([ad, np.repeat(ad[-1:], pad, axis=0)])
            outs.append(np.asarray(self.eval_batch(im, adc=ad))[:k])
        return np.concatenate(outs)
