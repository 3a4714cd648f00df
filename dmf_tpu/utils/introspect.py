"""Model introspection: capture intermediate activations.

Functional replacement for the reference's ``GetWeights`` forward-hook
feature grabber (train.py:926-942), which registers a torch hook on a
named submodule and stashes its output.  In Flax the same capability is
the ``capture_intermediates`` apply option — this wrapper just gives it
the hook-like ergonomics (filter by submodule path substring).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax


def capture_features(module, variables, *args, path_filter: str = "",
                     **kwargs) -> Tuple[Any, Dict[str, Any]]:
    """Run ``module.apply`` capturing every submodule's ``__call__`` output.

    Returns ``(outputs, features)`` where ``features`` maps
    '/'-joined submodule paths to their (first) output, keeping only paths
    containing ``path_filter``.
    """
    outputs, state = module.apply(
        variables, *args, capture_intermediates=True, mutable=["intermediates"],
        **kwargs,
    )
    feats: Dict[str, Any] = {}

    flat = jax.tree_util.tree_flatten_with_path(
        state["intermediates"],
        is_leaf=lambda x: isinstance(x, tuple),
    )[0]
    for path, leaf in flat:
        keys = [str(getattr(p, "key", getattr(p, "idx", ""))) for p in path]
        name = "/".join(k for k in keys if k != "__call__")
        if path_filter in name:
            feats[name] = leaf[0] if isinstance(leaf, tuple) else leaf
    return outputs, feats
