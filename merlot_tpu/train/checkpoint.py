"""Checkpoint save/restore + warm-start surgery.

Replaces the reference's TF1 Saver/TPUEstimator checkpointing
(utils/neat_config.py:140-143) and its name-intersection warm start
(``get_assignment_map_from_checkpoint``, utils/model_utils.py:388-413,
applied in model/modeling.py:721-738).

  * save/restore uses orbax (async-capable, sharding-aware) over the
    {params, opt_state} pytree, so Adam moments resume exactly like the
    reference's adam_m/adam_v companion variables;
  * ``warm_start`` loads a params-only tree and grafts every leaf whose
    path exists in both trees (shape-checked), with an optional path
    transform hook — the analogue of ``reference_name_transform``;
  * ``keep_checkpoint_max=None`` semantics: nothing is deleted.
"""

from __future__ import annotations

import os
import re
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import numpy as np


def _flatten(tree) -> Dict[str, Any]:
    flat = {}
    for keypath, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        parts = [str(getattr(k, "key", getattr(k, "idx", k))) for k in keypath]
        flat["/".join(parts)] = leaf
    return flat


# ---------------------------------------------------------------------------
# Canonical fused-QKV boundary transforms (TransformerHParams.fused_qkv_params)
#
# The live param tree stores ONE attention/qkv/{kernel [..,H,3H], bias
# [..,3H]} per attention (columns ordered q|k|v — no apply-time concat);
# checkpoints ON DISK always keep the reference-split query/key/value form
# so every existing consumer (TF converter maps, name-map oracle, warm
# starts, downstream eval) reads them unchanged. Both transforms are exact
# (pure concatenation/slicing), so save->restore round-trips bitwise —
# including the Adam m/v trees, which mirror the params structure and are
# transformed by the same structural walk.

def _is_qkv_site(node) -> bool:
    """A module dict that holds a fused qkv projection (and its out_proj
    sibling, so arbitrary user dicts with a 'qkv' key don't match)."""
    return (isinstance(node, dict) and "qkv" in node and "out_proj" in node
            and isinstance(node["qkv"], dict) and "kernel" in node["qkv"])


def _is_split_site(node) -> bool:
    return (isinstance(node, dict) and "out_proj" in node
            and all(k in node and isinstance(node[k], dict)
                    and "kernel" in node[k]
                    for k in ("query", "key", "value")))


def tree_has_fused_qkv(tree) -> bool:
    if _is_qkv_site(tree):
        return True
    if isinstance(tree, dict):
        return any(tree_has_fused_qkv(v) for v in tree.values())
    return False


def fuse_qkv_tree(tree):
    """reference-split on-disk form -> canonical fused live form.

    Any {query,key,value,out_proj} attention site becomes {qkv,out_proj}
    with kernel/bias concatenated on the LAST axis (works for both
    unstacked [H,*] and scan-stacked [L,H,*] layouts)."""
    if _is_split_site(tree):
        q, k, v = tree["query"], tree["key"], tree["value"]
        qkv = {"kernel": np.concatenate(
            [np.asarray(q["kernel"]), np.asarray(k["kernel"]),
             np.asarray(v["kernel"])], axis=-1)}
        if "bias" in q:
            qkv["bias"] = np.concatenate(
                [np.asarray(q["bias"]), np.asarray(k["bias"]),
                 np.asarray(v["bias"])], axis=-1)
        rest = {kk: fuse_qkv_tree(vv) for kk, vv in tree.items()
                if kk not in ("query", "key", "value")}
        return {**rest, "qkv": qkv}
    if isinstance(tree, dict):
        return {kk: fuse_qkv_tree(vv) for kk, vv in tree.items()}
    return tree


def unfuse_qkv_tree(tree):
    """canonical fused live form -> reference-split on-disk form."""
    if _is_qkv_site(tree):
        qkv = tree["qkv"]
        kqs = np.split(np.asarray(qkv["kernel"]), 3, axis=-1)
        parts = {name: {"kernel": kqs[i]}
                 for i, name in enumerate(("query", "key", "value"))}
        if "bias" in qkv:
            bqs = np.split(np.asarray(qkv["bias"]), 3, axis=-1)
            for i, name in enumerate(("query", "key", "value")):
                parts[name]["bias"] = bqs[i]
        rest = {kk: unfuse_qkv_tree(vv) for kk, vv in tree.items()
                if kk != "qkv"}
        return {**rest, **parts}
    if isinstance(tree, dict):
        return {kk: unfuse_qkv_tree(vv) for kk, vv in tree.items()}
    return tree


class CheckpointManager:
    """Step-numbered checkpoints under ``directory/ckpt_{step}``."""

    def __init__(self, directory: str):
        import orbax.checkpoint as ocp
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    def path(self, step: int) -> str:
        return os.path.join(self.directory, f"ckpt_{step}")

    def save(self, step: int, state) -> None:
        # on-disk checkpoints ALWAYS keep the reference-split q/k/v form:
        # a fused_qkv_params live tree is split here (exact slicing) so
        # converters, name maps, warm starts and split-model consumers
        # read every checkpoint unchanged
        if tree_has_fused_qkv(state):
            state = unfuse_qkv_tree(state)
        self._ckptr.save(self.path(step), state)
        self._ckptr.wait_until_finished()

    def restore(self, step: int, template=None):
        if template is not None and tree_has_fused_qkv(template):
            # live tree is canonical-fused, disk is split: raw restore,
            # then concat (exact) back into the fused layout
            return fuse_qkv_tree(self._ckptr.restore(self.path(step)))
        return self._ckptr.restore(self.path(step), target=template)

    def all_steps(self) -> List[int]:
        steps = []
        for name in os.listdir(self.directory):
            m = re.fullmatch(r"ckpt_(\d+)", name)
            if m:
                steps.append(int(m.group(1)))
        return sorted(steps)

    def latest_step(self) -> Optional[int]:
        steps = self.all_steps()
        return steps[-1] if steps else None


def warm_start(params, ckpt_params,
               name_transform: Optional[Callable[[str], str]] = None,
               verbose: bool = True) -> Tuple[Any, List[str]]:
    """Graft every path present in both trees (the name-intersection map).

    Returns (new_params, initialized_paths). Shape mismatches are skipped
    with a warning rather than failing, mirroring the permissive TF1
    behaviour of loading whatever intersects.
    """
    flat_target = _flatten(params)
    flat_src = _flatten(ckpt_params)

    initialized: List[str] = []
    replacements: Dict[str, Any] = {}
    for src_path, leaf in flat_src.items():
        path = name_transform(src_path) if name_transform else src_path
        if path not in flat_target:
            continue
        if tuple(np.shape(leaf)) != tuple(np.shape(flat_target[path])):
            if verbose:
                print(f"warm_start: shape mismatch at {path}: "
                      f"{np.shape(leaf)} vs {np.shape(flat_target[path])}, skipping")
            continue
        replacements[path] = leaf
        initialized.append(path)

    def rebuild(keypath, leaf):
        parts = [str(getattr(k, "key", getattr(k, "idx", k))) for k in keypath]
        path = "/".join(parts)
        if path in replacements:
            return np.asarray(replacements[path]).astype(leaf.dtype) \
                if hasattr(leaf, "dtype") else replacements[path]
        return leaf

    new_params = jax.tree_util.tree_map_with_path(rebuild, params)
    if verbose:
        print(f"warm_start: initialized {len(initialized)}/{len(flat_target)} leaves")
    return new_params, initialized
