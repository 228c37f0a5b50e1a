"""VCR finetuning: ``python -m merlot_tpu.downstream.vcr.train config.yaml``.

The downstream/vcr/train.py analogue (reference: :11-24): joint
answer+rationale training from a pretrained checkpoint.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from merlot_tpu.core.config import NeatConfig
from merlot_tpu.data.pretrain_loader import device_put_iterator
from merlot_tpu.downstream.vcr.dataloader import vcr_joint_batches
from merlot_tpu.downstream.vcr.modeling import VCRModel, vcr_loss_and_metrics
from merlot_tpu.models.config import MerlotConfig
from merlot_tpu.parallel.mesh import batch_sharding, make_mesh
from merlot_tpu.train.harness import Trainer
from merlot_tpu.train.optimizer import AdamWConfig, MerlotAdamW
from merlot_tpu.train.train_step import make_loss_train_step


def build_vcr_train(config: NeatConfig):
    model_cfg = MerlotConfig.from_dict(config.model)
    model = VCRModel(model_cfg)
    optimizer = MerlotAdamW(AdamWConfig.from_config(config.optimizer))

    def loss_fn(params, batch, key):
        logits = model.apply({"params": params}, batch["images"],
                             batch["lm_input"], deterministic=False,
                             rngs={"dropout": key})
        return vcr_loss_and_metrics(logits, batch["lm_targets"])

    return model, optimizer, loss_fn


def main(argv=None):
    config = NeatConfig.from_args("VCR finetuning")
    model, optimizer, loss_fn = build_vcr_train(config)

    n = len(jax.devices())
    mesh = make_mesh(data=n, model=1)

    merged = config.merged_data_model()
    merged.update(config.downstream)
    files = config.data.get("train_file_expanded") or []
    if not files:
        raise ValueError("data.train_file matched no files")
    batches = device_put_iterator(
        vcr_joint_batches(files, merged,
                          batch_size=config.device["train_batch_size"]),
        batch_sharding(mesh),
        images_bf16=config.model.get("use_bfloat16", True))

    trainer = Trainer(model, optimizer,
                      output_dir=config.device["output_dir"], mesh=mesh,
                      checkpoint_every=config.device.get("iterations_per_loop", 2500))
    trainer.step_fn = make_loss_train_step(loss_fn, optimizer)

    first = next(batches)
    variables = jax.jit(lambda b: model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        b["images"], b["lm_input"]))(first)
    params = variables["params"]
    opt_state = jax.jit(optimizer.init)(params)

    init_ckpt = config.model.get("init_checkpoint")
    if init_ckpt and trainer.ckpt.latest_step() is None:
        # warm start only on a FRESH run; a crash-resumed run below must
        # keep its own trained weights
        from merlot_tpu.train.checkpoint import warm_start
        import orbax.checkpoint as ocp
        import os
        src = ocp.StandardCheckpointer().restore(os.path.abspath(init_ckpt))
        src_params = src.get("params", src)
        # pretrain tree roots at 'merlot/...' just like VCRModel's
        params, _ = warm_start(params, src_params)
    # crash/preemption recovery from this output_dir's latest checkpoint
    params, opt_state = trainer.resume_or(params, opt_state)

    def stream():
        yield first
        yield from batches

    trainer.run(params, opt_state, stream(),
                num_steps=config.optimizer["num_train_steps"])


if __name__ == "__main__":
    main()
