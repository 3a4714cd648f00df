"""Central serving-kernel gate registry.

Ten env knobs grew around the Pallas serving kernels and the Nyul
percentile stride as their e2e sweeps landed (r2–r3).  This module makes
``Config`` the primary switchboard for all of them while keeping the env
vars as explicit per-run overrides — the resolution order every gate
function follows is:

1. the knob's env var, when set (sweep/debug override, always wins);
2. the value configured here from ``Config.serving_kernels``
   (:class:`dmf_tpu.config.ServingKernelConfig`), when not ``None``;
3. the measured-winner default baked into the gate function itself
   (possibly platform-dependent, e.g. "on for single-device TPU").

``configure`` is process-level on purpose: the gates are consulted inside
``flax`` module bodies and jit-traced closures where threading a config
object through every call site would churn the entire model API for a
serving-tuning concern.  ``cli.py``/``bench.py`` call ``configure`` once
after building the run's ``Config``; tests use it directly.

The knob table (name, default, and the measurement that set it) lives in
README.md §"Serving kernel knobs".
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Dict, Optional

_configured: Dict[str, Any] = {}


def configure(sk) -> None:
    """Install ``Config.serving_kernels`` as the process-level defaults.

    ``sk`` is a :class:`dmf_tpu.config.ServingKernelConfig` (or any
    dataclass with the same field names); ``None`` fields keep the gate
    functions' measured defaults.
    """
    global _configured
    _configured = {k: v for k, v in dataclasses.asdict(sk).items()
                   if v is not None}


def reset() -> None:
    """Drop configured values (tests)."""
    _configured.clear()


def flag(env: str, field: str) -> Optional[bool]:
    """Resolve a boolean knob: env ``'1'``/other wins, then the configured
    Config field; ``None`` means 'use the gate's measured default'."""
    v = os.environ.get(env)
    if v is not None:
        return v == "1"
    c = _configured.get(field)
    return None if c is None else bool(c)


def text(env: str, field: str) -> Optional[str]:
    """Resolve a string knob (site/channel allowlists)."""
    v = os.environ.get(env)
    if v is not None:
        return v
    c = _configured.get(field)
    return None if c is None else str(c)


def integer(env: str, field: str) -> Optional[int]:
    """Resolve an integer knob (Nyul stride)."""
    v = os.environ.get(env)
    if v is not None:
        return int(v)
    c = _configured.get(field)
    return None if c is None else int(c)
