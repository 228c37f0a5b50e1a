"""Pretraining entry point: ``python -m merlot_tpu.train.pretrain config.yaml``.

The model/train.py analogue (reference: model/train.py:9-26): load the YAML
NeatConfig, build the pretrain model + AdamW from its sections, stream
tfrecords through the async host loader, and run the jitted train step over
the device mesh for optimizer.num_train_steps steps.
"""

from __future__ import annotations

import sys
from typing import Optional

import jax
import jax.numpy as jnp

from merlot_tpu.core.config import NeatConfig
from merlot_tpu.data.pretrain_loader import PretrainLoader, device_put_iterator
from merlot_tpu.models.config import MerlotConfig
from merlot_tpu.models.pretrain import MerlotPretrainModel
from merlot_tpu.parallel.mesh import batch_sharding, make_mesh
from merlot_tpu.train.harness import Trainer
from merlot_tpu.train.optimizer import AdamWConfig, MerlotAdamW


def build_pretrain_setup(config: NeatConfig, mesh: Optional[object] = None):
    """(model, optimizer, loader, mesh) from a NeatConfig."""
    model_cfg = MerlotConfig.from_dict(config.model)
    model = MerlotPretrainModel(model_cfg)
    optimizer = MerlotAdamW(AdamWConfig.from_config(config.optimizer))

    if mesh is None:
        n = len(jax.devices())
        model_par = config.device.get("model_parallelism", 1)
        mesh = make_mesh(data=n // model_par, model=model_par)

    files = config.data.get("train_file_expanded") or []
    loader = None
    if files:
        merged = config.merged_data_model()
        num_hosts = jax.process_count()
        loader = PretrainLoader(
            files, merged,
            batch_size=config.device["train_batch_size"] // num_hosts,
            is_training=True,
            host_id=jax.process_index(), num_hosts=num_hosts,
            num_threads=config.data.get("num_threads", 8),
            shuffle_buffer=config.data.get("shuffle_buffer_size", 256))
    return model, optimizer, loader, mesh


def main(argv=None):
    config = NeatConfig.from_args("MERLOT pretraining")
    model, optimizer, loader, mesh = build_pretrain_setup(config)
    if loader is None:
        raise ValueError("data.train_file matched no files")

    trainer = Trainer(
        model, optimizer, output_dir=config.device["output_dir"], mesh=mesh,
        log_every=config.device.get("log_every", 50),
        checkpoint_every=config.device.get("iterations_per_loop", 1000),
        # device.use_zero1: shard Adam state over the data axis (ZeRO-1);
        # per-chip optimizer memory / data_parallelism, same step math
        zero1=config.device.get("use_zero1", False))

    batches = device_put_iterator(
        iter(loader), batch_sharding(mesh),
        images_bf16=config.model.get("use_bfloat16", True),
        # data.infeed_u8: 1 B/px transfers, dequantized in the backbone
        # (<=1/510/px quantization; see device_put_iterator)
        images_u8=config.data.get("infeed_u8", False))
    first = next(batches)
    params, opt_state = trainer.init_state(
        first, init_checkpoint=config.model.get("init_checkpoint"))

    def with_first():
        yield first
        yield from batches

    params, opt_state = trainer.run(
        params, opt_state, with_first(),
        num_steps=config.optimizer["num_train_steps"])

    # held-out evaluation (the reference EVAL mode) when a val set exists
    val_files = config.data.get("val_file_expanded") or []
    if val_files:
        merged = config.merged_data_model()
        val_loader = PretrainLoader(
            val_files, merged,
            batch_size=config.device.get("val_batch_size", 8),
            is_training=False, num_threads=config.data.get("num_threads", 8),
            shuffle_buffer=0, repeat=False)
        eval_samples = config.validate.get("eval_samples")
        vbs = config.device.get("val_batch_size", 8)
        means = trainer.evaluate(
            params, (jax.device_put(b) for b in val_loader),
            max_batches=(eval_samples // vbs) if eval_samples else None,
            log_step=int(jax.device_get(opt_state["step"])))
        print("eval:", {k: round(v, 4) for k, v in sorted(means.items())})


if __name__ == "__main__":
    main()
