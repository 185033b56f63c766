"""Grafting converted pretrained subtrees into an initialized param tree.

The reference loads pretrained pieces imperatively (torchvision backbones
via `pretrained=True`, CLIP via `clip.load`, `init_from_ckpt` with
ignore_keys — e.g. unet/cond_unet.py swin init, ddm/ddm_const_2.py:
init_from_ckpt). Here params are explicit pytrees, so the equivalent is a
pure function: replace the subtree at `scope` with a converted npz tree
(cli/convert_weights.py output), shape-checked leaf by leaf.

YAML surface (any training CLI):

  model:
    pretrained:
      - {file: swin.npz, scope: params/unet/cond_net}
      - {file: clip.npz, scope: params/unet/text_encoder}
"""

from __future__ import annotations

import logging
from typing import Any, Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

log = logging.getLogger("adm_tpu")


def load_npz_tree(path: str) -> Dict:
    """Load a converter-produced npz ({'params': object-array pytree})."""
    data = np.load(path, allow_pickle=True)
    tree = data["params"].item() if "params" in data else dict(data)
    return jax.tree_util.tree_map(jnp.asarray, tree)


def graft(params: Any, scope: str, subtree: Any) -> Any:
    """Return `params` with the dict subtree at `scope` (slash-separated
    keys, e.g. 'params/unet/cond_net') replaced by `subtree`.

    Every leaf of the existing subtree must have a same-shaped counterpart
    in the replacement (dtype is cast to the existing leaf's) — a wrong
    scope or architecture mismatch fails loudly instead of training a
    half-random model.
    """
    keys: Sequence[str] = [k for k in scope.split("/") if k]
    if not keys:
        raise ValueError("empty scope")

    def descend(node, depth):
        if depth == len(keys):
            _check_compatible(node, subtree, scope)
            return jax.tree_util.tree_map(
                lambda old, new: jnp.asarray(new, old.dtype), node, subtree
            )
        k = keys[depth]
        if not isinstance(node, dict) or k not in node:
            have = sorted(node.keys()) if isinstance(node, dict) else type(node)
            raise KeyError(
                f"scope '{scope}': key '{k}' not found at depth {depth} "
                f"(available: {have})"
            )
        out = dict(node)
        out[k] = descend(node[k], depth + 1)
        return out

    return descend(params, 0)


def _check_compatible(old: Any, new: Any, scope: str) -> None:
    old_leaves = jax.tree_util.tree_leaves_with_path(old)
    new_flat = {
        jax.tree_util.keystr(p): l
        for p, l in jax.tree_util.tree_leaves_with_path(new)
    }
    for p, leaf in old_leaves:
        name = jax.tree_util.keystr(p)
        if name not in new_flat:
            raise KeyError(f"graft '{scope}': missing leaf {name}")
        if tuple(new_flat[name].shape) != tuple(leaf.shape):
            raise ValueError(
                f"graft '{scope}': shape mismatch at {name}: "
                f"{new_flat[name].shape} vs expected {leaf.shape}"
            )
    extra = set(new_flat) - {jax.tree_util.keystr(p) for p, _ in old_leaves}
    if extra:
        raise KeyError(f"graft '{scope}': unexpected leaves {sorted(extra)[:5]}")


def apply_pretrained(params: Any, specs: List[Dict[str, str]]) -> Any:
    """Apply a list of {file, scope} graft specs (model.pretrained YAML)."""
    for spec in specs or []:
        tree = load_npz_tree(spec["file"])
        params = graft(params, spec["scope"], tree)
        log.info("grafted %s into %s", spec["file"], spec["scope"])
    return params
