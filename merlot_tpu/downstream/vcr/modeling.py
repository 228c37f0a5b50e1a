"""VCR finetuning model: MerlotModel + answer/rationale classifier heads.

Parity target: downstream/vcr/modeling.py (reference).
  * MerlotModel runs with num_texts=4 (image features tiled across the 4
    choices; reference: model/modeling.py:111-122) and no masking;
  * TRAIN: token-0 hidden states reshape to [b, 2(ans|rat), 4, H]; separate
    2-layer MLP heads (dense H/2 + gelu, dense 1 with prior-bias init
    -log((1-pi)/pi), pi=0.25) per mode, with dropout (reference: :77-127);
  * EVAL: a single mode's head ('answer_cls' / 'rationale_cls' — same scopes
    as training, reference: :57-75);
  * loss = softmax-over-4 CE averaged over the image batch (reference:
    :133-143).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from merlot_tpu.models.config import MerlotConfig
from merlot_tpu.models.merlot import MerlotModel
from merlot_tpu.nn.layers import DenseTN
from merlot_tpu.ops.activations import gelu


class VCRClsHead(nn.Module):
    """dense(H/2)+gelu -> dense(1) with prior-bias init, dropout around both."""
    hidden_size: int
    initializer_range: float = 0.02
    dropout_prob: float = 0.1
    bias_pi: float = 0.25

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        x = nn.Dropout(self.dropout_prob)(x, deterministic=deterministic)
        x = gelu(DenseTN(self.hidden_size // 2, dtype=jnp.float32,
                         initializer_range=self.initializer_range,
                         name="mlp0")(x))
        x = nn.Dropout(self.dropout_prob)(x, deterministic=deterministic)
        bias_init = nn.initializers.constant(
            -math.log((1.0 - self.bias_pi) / self.bias_pi))
        return DenseTN(1, dtype=jnp.float32,
                       initializer_range=self.initializer_range,
                       bias_init=bias_init, name="mlp1")(x)


class VCRModel(nn.Module):
    """Joint answer+rationale training / single-mode eval on top of Merlot."""
    cfg: MerlotConfig  # must have num_texts=4

    def setup(self):
        assert self.cfg.num_texts == 4
        self.merlot = MerlotModel(self.cfg, name="merlot")
        self.answer_cls = VCRClsHead(self.cfg.hidden_size,
                                     self.cfg.initializer_range,
                                     self.cfg.hidden_dropout_prob,
                                     name="answer_cls")
        self.rationale_cls = VCRClsHead(self.cfg.hidden_size,
                                        self.cfg.initializer_range,
                                        self.cfg.hidden_dropout_prob,
                                        name="rationale_cls")

    def __call__(self, images: jnp.ndarray, lm_input: jnp.ndarray, *,
                 mode: Optional[str] = None,
                 deterministic: bool = True) -> jnp.ndarray:
        """Logits over 4 choices.

        TRAIN (mode=None): images [b*2,h,w,3], lm_input [b*2*4,184] (ans+rat
        interleaved) -> logits [b*2, 4] (answer rows then rationale rows per
        example, matching the reference's concat+reshape).
        EVAL (mode='answer'|'rationale'): images [b,h,w,3], lm_input
        [b,4,184] or [b*4,184] -> logits [b, 4].
        """
        if lm_input.ndim == 3:
            lm_input = lm_input.reshape(-1, lm_input.shape[-1])

        from merlot_tpu.ops.attention import inference_backend
        backend = "auto" if not deterministic else inference_backend()
        fwd = self.merlot(images, lm_input, mask_input=False,
                          deterministic=deterministic, attn_backend=backend)
        h0 = fwd["encoder_hidden_states"]["lang"][:, 0]  # [n_text, H] fp32
        img_batch = images.shape[0]

        if mode is None:
            # [img_batch, 4, H] -> [b, 2, 4, H]
            per_img = h0.reshape(img_batch, 4, -1)
            per_ex = per_img.reshape(img_batch // 2, 2, 4, per_img.shape[-1])
            ans_h = per_ex[:, 0].reshape(-1, per_ex.shape[-1])
            rat_h = per_ex[:, 1].reshape(-1, per_ex.shape[-1])
            ans_logits = self.answer_cls(ans_h, deterministic).reshape(
                img_batch // 2, 4)
            rat_logits = self.rationale_cls(rat_h, deterministic).reshape(
                img_batch // 2, 4)
            return jnp.concatenate([ans_logits, rat_logits], axis=1).reshape(
                img_batch, 4)
        head = self.answer_cls if mode == "answer" else self.rationale_cls
        return head(h0, deterministic).reshape(img_batch, 4)


def vcr_loss_and_metrics(logits: jnp.ndarray, targets: jnp.ndarray
                         ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Softmax-over-4 CE (sum / img_batch) + accuracy."""
    one_hot = jax.nn.one_hot(targets, 4, dtype=logits.dtype)
    per_ex = -jnp.sum(jax.nn.log_softmax(logits, -1) * one_hot, -1)
    loss = jnp.sum(per_ex) / logits.shape[0]
    acc = jnp.mean((jnp.argmax(logits, -1) == targets).astype(jnp.float32))
    return loss, {"loss": loss, "accuracy": acc}
