"""VCR eval sidecar: poll for new checkpoints, evaluate, write summaries.

The downstream/vcr/validate.py analogue (reference: :23-59): a
checkpoint-watching loop with an overall timeout; each new checkpoint is
evaluated on the single-mode loader and the accuracy logged (eval summary
dir under output_dir/eval). Deleted/unreadable checkpoints are skipped, like
the reference's NotFoundError handling.
"""

from __future__ import annotations

import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from merlot_tpu.core.config import NeatConfig
from merlot_tpu.downstream.vcr.dataloader import vcr_eval_batches
from merlot_tpu.downstream.vcr.modeling import VCRModel
from merlot_tpu.models.config import MerlotConfig
from merlot_tpu.train.checkpoint import CheckpointManager
from merlot_tpu.train.metrics import MetricsLogger


def make_eval_fn(model: VCRModel, mode: str):
    """The jitted single-mode eval closure. Build it ONCE per
    (model, mode) and pass it to evaluate_checkpoint: jax.jit caches by
    function identity, so a fresh closure per checkpoint would recompile
    the full eval program on every polling iteration."""
    return jax.jit(lambda p, img, ids: model.apply(
        {"params": p}, img, ids, mode=mode))


def evaluate_checkpoint(model: VCRModel, params, files, config,
                        batch_size: int, mode: str,
                        max_examples: Optional[int] = None,
                        predictions_path: Optional[str] = None,
                        mesh=None, eval_fn=None) -> float:
    """Accuracy over the eval set; optionally dump per-example predictions
    + log-probs + annot_ids as jsonl (the reference PREDICT-mode export for
    leaderboard submissions, downstream/vcr/modeling.py:195-198).

    Eval is data-parallel over all visible devices (the reference ran this
    sidecar on a whole v3-8): batches whose leading dim divides the data
    axis are sharded across it; ragged tails fall back to replicated
    execution (same results, no padding logic)."""
    import json
    if mesh is None and len(jax.devices()) > 1:
        from merlot_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(data=len(jax.devices()), model=1)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        params = jax.device_put(params, NamedSharding(mesh, P()))
        data_s = NamedSharding(mesh, P("data"))
        ndata = mesh.shape["data"]

        def put(x):
            # device_put straight from host memory (staging via jnp.asarray
            # would transfer to device 0 first, doubling infeed bytes);
            # ragged tails replicate
            arr = np.asarray(x)
            return (jax.device_put(arr, data_s)
                    if arr.shape[0] % ndata == 0 else jnp.asarray(arr))
    else:
        put = jnp.asarray
    if eval_fn is None:
        eval_fn = make_eval_fn(model, mode)
    n_correct = 0
    n_total = 0
    pred_f = open(predictions_path, "w") if predictions_path else None
    for batch in vcr_eval_batches(files, config, batch_size, mode=mode):
        logits = np.asarray(eval_fn(params, put(batch["images"]),
                                    put(batch["lm_input"])))
        pred = np.argmax(logits, -1)
        if pred_f is not None:
            logp = logits - np.log(np.exp(logits - logits.max(-1, keepdims=True))
                                   .sum(-1, keepdims=True)) - logits.max(-1, keepdims=True)
            for i in range(len(pred)):
                pred_f.write(json.dumps({
                    "annot_id": batch["annot_id"][i].decode(),
                    "prediction": int(pred[i]),
                    "label": int(batch["lm_targets"][i]),
                    "log_probs": [float(x) for x in logp[i]]}) + "\n")
        n_correct += int((pred == batch["lm_targets"]).sum())
        n_total += len(pred)
        if max_examples and n_total >= max_examples:
            break
    if pred_f is not None:
        pred_f.close()
    return n_correct / max(n_total, 1)


def watch_and_validate(config: NeatConfig, poll_seconds: float = 60.0):
    model_cfg = MerlotConfig.from_dict(config.model).eval_mode()
    model = VCRModel(model_cfg)
    mode = config.downstream.get("mode", "answer")
    merged = config.merged_data_model()
    merged.update(config.downstream)
    files = config.data.get("val_file_expanded") or []
    timeout = config.validate.get("eval_timeout", 72000)
    max_examples = config.validate.get("eval_samples")

    ckpt = CheckpointManager(os.path.join(config.device["output_dir"],
                                          "checkpoints"))
    logger = MetricsLogger(os.path.join(config.device["output_dir"], "eval"),
                           name="eval")
    seen = set()
    eval_fn = make_eval_fn(model, mode)   # reused across every poll
    t0 = time.time()
    while time.time() - t0 < timeout:
        new_steps = [s for s in ckpt.all_steps() if s not in seen]
        for step in new_steps:
            seen.add(step)
            try:
                state = ckpt.restore(step)
            except Exception as e:  # checkpoint gone mid-poll: skip
                print(f"skipping step {step}: {e}")
                continue
            acc = evaluate_checkpoint(model, state["params"], files, merged,
                                      config.device.get("val_batch_size", 8),
                                      mode, max_examples, eval_fn=eval_fn)
            logger.log(step, {f"{mode}_accuracy": acc})
        if not new_steps:
            time.sleep(poll_seconds)


def main(argv=None):
    config = NeatConfig.from_args("VCR validation sidecar")
    watch_and_validate(config)


if __name__ == "__main__":
    main()
