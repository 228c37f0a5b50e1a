"""AdamW with warmup→linear-decay, regex param overrides, bf16 Adam state.

Parity target: utils/optimization.py (reference). Feature-for-feature:

  * linear warmup to the peak LR then linear decay to 0, pre-scaled so the
    peak equals ``learning_rate`` right after warmup (reference: :94-115);
  * bias correction folded into the LR (:354-358);
  * decoupled weight decay (:394-402);
  * regex→hyperparam ``param_overrides`` (e.g. no weight decay on
    norms/bias); ``learning_rate: 0`` freezes a parameter (:125-157);
  * optional global-norm clipping (:233-239);
  * **bf16 optimizer state** with the sign-bit precision trick for the
    second moment: v >= 0 always, so the sign bit is free — a negative
    stored value means "multiply by 1.00390625 on decode", halving the
    worst-case bf16 quantization error (:266-288).

Not ported: the ``grad²·1e-30`` XLA anti-fusion hack (:362-369) — that
defends against a TF1-XLA rewriter pathology (fusing updates across
variables and pinning all gradients in HBM). Modern XLA under jit with
donated buffers schedules per-variable updates without it.

Implemented as a pure (init, update) pair over pytrees — optax-shaped but
self-contained so hyperparams can resolve per-parameter by path.
"""

from __future__ import annotations

import dataclasses
import re
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

MISSING_PRECISION = 1.00390625  # 1 + 2^-8


def encode_v(v: jnp.ndarray) -> jnp.ndarray:
    """fp32 -> bf16 with the sign bit recording a x1.00390625 correction."""
    b = v.astype(jnp.bfloat16)
    bf = b.astype(jnp.float32)
    err0 = jnp.abs(bf - v)
    err1 = jnp.abs(bf * MISSING_PRECISION - v)
    return jnp.where(err0 <= err1, b, -b)


def decode_v(stored: jnp.ndarray) -> jnp.ndarray:
    sign = jnp.sign(stored.astype(jnp.float32))
    v_abs = jnp.abs(stored).astype(jnp.float32)
    return jnp.where(sign > 0, v_abs, v_abs * MISSING_PRECISION)


@dataclass(frozen=True)
class AdamWConfig:
    learning_rate: float = 3e-4
    num_train_steps: int = 100000
    num_warmup_steps: int = 0
    weight_decay_rate: float = 1e-4
    beta_1: float = 0.9
    beta_2: float = 0.98
    epsilon: float = 1e-6
    clip_norm: float = 1.0          # <= 0 disables (merlot.yaml sets 0)
    use_bfloat16_adam: bool = False
    # per-scope gradnorm telemetry (reference verbose mode,
    # utils/optimization.py:198-231); depth = how many path levels to group by
    verbose: bool = False
    gradnorm_depth: int = 2
    # list of [regex_list, {hyperparam: value}]
    param_overrides: Tuple = ()

    @classmethod
    def from_config(cls, optimizer_section: Dict[str, Any]) -> "AdamWConfig":
        if optimizer_section.get("type", "adam_optimizer") != "adam_optimizer":
            raise ValueError(f"unsupported optimizer {optimizer_section.get('type')}")
        names = {f.name for f in dataclasses.fields(cls)}
        kw = {k: v for k, v in optimizer_section.items() if k in names}
        if "param_overrides" in kw and kw["param_overrides"] is not None:
            kw["param_overrides"] = tuple(
                (tuple(regexes), dict(over)) for regexes, over in kw["param_overrides"])
        else:
            kw["param_overrides"] = ()
        return cls(**kw)


_OVERRIDABLE = ("learning_rate", "weight_decay_rate", "beta_1", "beta_2", "epsilon")


class MerlotAdamW:
    """Per-parameter-hyperparam AdamW. State: {'step', 'm', 'v'}."""

    def __init__(self, cfg: AdamWConfig):
        self.cfg = cfg

    # -- hyperparam resolution (host-side, static per param path) ----------
    def _resolve(self, path: str) -> Dict[str, float]:
        c = self.cfg
        hp = {"learning_rate": c.learning_rate,
              "weight_decay_rate": c.weight_decay_rate,
              "beta_1": c.beta_1, "beta_2": c.beta_2, "epsilon": c.epsilon}
        for regexes, over in c.param_overrides:
            for k in over:
                if k not in _OVERRIDABLE:
                    raise ValueError(f"{k} is not an overridable hyperparameter")
            if any(re.search(rx, path) for rx in regexes):
                hp.update(over)
        return hp

    def _paths(self, params):
        flat = jax.tree_util.tree_flatten_with_path(params)[0]
        out = []
        for keypath, _ in flat:
            parts = [str(getattr(k, "key", getattr(k, "idx", k))) for k in keypath]
            out.append("/".join(parts))
        return out

    # ----------------------------------------------------------------------
    def init(self, params) -> Dict[str, Any]:
        dtype = jnp.bfloat16 if self.cfg.use_bfloat16_adam else jnp.float32
        zeros = lambda p: jnp.zeros(p.shape, dtype)
        return {"step": jnp.zeros((), jnp.int32),
                "m": jax.tree.map(zeros, params),
                "v": jax.tree.map(zeros, params)}

    def lr_scale(self, step: jnp.ndarray) -> jnp.ndarray:
        """Warmup then linear decay; peak = 1.0 right after warmup
        (reference: utils/optimization.py:94-115)."""
        c = self.cfg
        t = step.astype(jnp.float32)
        T = float(c.num_train_steps)
        W = float(c.num_warmup_steps)
        base = T / (T - W + 1.0) if c.num_warmup_steps else 1.0
        decay = base * jnp.maximum(0.0, 1.0 - jnp.minimum(t, T) / T)
        if c.num_warmup_steps:
            return jnp.where(t < W, t / W, decay)
        return decay

    def update(self, grads, state, params):
        """Returns (new_params, new_state, metrics). Frozen params (lr==0)
        pass through untouched, like the reference's tvars filtering."""
        c = self.cfg
        step = state["step"]
        scale = self.lr_scale(step)

        # global-norm clip
        gn_sq = sum(jnp.sum(jnp.square(g.astype(jnp.float32)))
                    for g in jax.tree.leaves(grads))
        global_norm = jnp.sqrt(gn_sq)
        if c.clip_norm > 0.0:
            clip = jnp.minimum(1.0, c.clip_norm / jnp.maximum(global_norm, 1e-12))
            grads = jax.tree.map(lambda g: g * clip.astype(g.dtype), grads)

        t = step.astype(jnp.float32) + 1.0
        paths = self._paths(params)
        flat_p, treedef = jax.tree_util.tree_flatten(params)
        flat_g = treedef.flatten_up_to(grads)
        flat_m = treedef.flatten_up_to(state["m"])
        flat_v = treedef.flatten_up_to(state["v"])

        new_p, new_m, new_v = [], [], []
        for path, p, g, m0, v0 in zip(paths, flat_p, flat_g, flat_m, flat_v):
            hp = self._resolve(path)
            if hp["learning_rate"] == 0.0:  # frozen
                new_p.append(p); new_m.append(m0); new_v.append(v0)
                continue
            b1, b2, eps = hp["beta_1"], hp["beta_2"], hp["epsilon"]
            lr = hp["learning_rate"] * scale
            lr = lr * jnp.sqrt(1.0 - b2 ** t) / (1.0 - b1 ** t)  # bias correction

            g32 = g.astype(jnp.float32)
            m = m0.astype(jnp.float32) if c.use_bfloat16_adam else m0
            v = decode_v(v0) if c.use_bfloat16_adam else v0
            m = b1 * m + (1.0 - b1) * g32
            v = b2 * v + (1.0 - b2) * (jnp.square(g32) + 1e-30)
            upd = m / (jnp.sqrt(v) + eps)
            if hp["weight_decay_rate"] > 0:
                upd = upd + hp["weight_decay_rate"] * p.astype(jnp.float32)
            new_p.append((p.astype(jnp.float32) - lr * upd).astype(p.dtype))
            if c.use_bfloat16_adam:
                new_m.append(m.astype(jnp.bfloat16)); new_v.append(encode_v(v))
            else:
                new_m.append(m); new_v.append(v)

        metrics = {"learning_rate": self.cfg.learning_rate * scale,
                   "gradnorms/_overall": global_norm}
        if c.verbose:
            # per-scope gradient norms + the decoupled weight-decay "loss"
            groups: Dict[str, Any] = {}
            wd_loss = 0.0
            for path, p, g in zip(paths, flat_p, flat_g):
                scope = "/".join(path.split("/")[:c.gradnorm_depth])
                sq = jnp.sum(jnp.square(g.astype(jnp.float32)))
                groups[scope] = groups.get(scope, 0.0) + sq
                hp = self._resolve(path)
                wd_loss = wd_loss + hp["weight_decay_rate"] * 0.5 * jnp.sum(
                    jnp.square(p.astype(jnp.float32)))
            for scope, sq in groups.items():
                metrics[f"gradnorms/{scope}"] = jnp.sqrt(sq)
            metrics["weight_decay_loss"] = wd_loss
        new_state = {"step": step + 1,
                     "m": jax.tree_util.tree_unflatten(treedef, new_m),
                     "v": jax.tree_util.tree_unflatten(treedef, new_v)}
        return jax.tree_util.tree_unflatten(treedef, new_p), new_state, metrics
