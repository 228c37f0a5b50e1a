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
        self._ckptr.save(self.path(step), state)
        self._ckptr.wait_until_finished()

    def restore(self, step: int, template=None):
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
