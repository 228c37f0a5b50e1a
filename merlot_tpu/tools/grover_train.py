"""Grover denoiser LM training.

The data/groverdenoise/lm model_fn_builder analogue: next-token training on
fixed-length tfrecord sequences with the x4 target-bonus weighting, AdamW,
checkpoints/metrics via the shared Trainer.

    python -m merlot_tpu.tools.grover_train --config medium.json \
        --train_files 'shards/*.tfrecord' --seq_length 1536 ...
"""

from __future__ import annotations

import argparse
import glob

import jax
import jax.numpy as jnp

from merlot_tpu.models.grover import GroverConfig, GroverLM, grover_lm_loss
from merlot_tpu.tools.grover_data import lm_batches
from merlot_tpu.train.harness import Trainer
from merlot_tpu.train.optimizer import AdamWConfig, MerlotAdamW
from merlot_tpu.train.train_step import make_loss_train_step


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", required=True, help="GroverConfig json")
    ap.add_argument("--train_files", required=True)
    ap.add_argument("--output_dir", required=True)
    ap.add_argument("--seq_length", type=int, default=1536)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--learning_rate", type=float, default=1e-5)
    ap.add_argument("--num_train_steps", type=int, default=80000)
    ap.add_argument("--num_warmup_steps", type=int, default=1000)
    ap.add_argument("--target_bonus", type=float, default=4.0)
    ap.add_argument("--checkpoint_every", type=int, default=5000)
    ap.add_argument("--pp", type=int, default=1,
                    help="pipeline-parallel stages over the first N visible "
                         "devices: the uniform layer stack splits into "
                         "contiguous stages and microbatches stream through "
                         "a GPipe schedule (parallel/pipeline.py); dropout "
                         "keys are threaded per (layer, microbatch)")
    ap.add_argument("--microbatches", type=int, default=0,
                    help="GPipe microbatches (default 4*pp; batch_size "
                         "must divide by it)")
    args = ap.parse_args(argv)

    cfg = GroverConfig.from_json_file(args.config)
    model = GroverLM(cfg)
    optimizer = MerlotAdamW(AdamWConfig(
        learning_rate=args.learning_rate,
        num_train_steps=args.num_train_steps,
        num_warmup_steps=args.num_warmup_steps,
        weight_decay_rate=0.01, beta_2=0.98, clip_norm=1.0,
        param_overrides=((("embed_norm", "mlp_ln", "bias", "gamma", "beta"),
                          {"weight_decay_rate": 0.0}),)))

    if args.pp > 1:
        import numpy as np
        from jax.sharding import Mesh

        from merlot_tpu.models.grover import grover_pipeline_forward
        assert cfg.num_hidden_layers % args.pp == 0, (
            cfg.num_hidden_layers, args.pp)
        mesh = Mesh(np.asarray(jax.devices()[:args.pp]), ("stage",))
        num_mb = args.microbatches or 4 * args.pp
        assert args.batch_size % num_mb == 0, (args.batch_size, num_mb)

        def loss_fn(params, batch, key):
            # params arrive in PP form (stack_grover_params, done ONCE
            # below): stages live one-per-device; no per-step restack.
            # dropout keys are threaded per (layer, microbatch) by the
            # pipeline schedule.
            logits = grover_pipeline_forward(
                {"params": params}, cfg, batch["input_ids"][:, :-1],
                mesh=mesh, num_microbatches=num_mb, dropout_rng=key)
            return grover_lm_loss(logits, batch["input_ids"][:, :-1],
                                  batch["is_target"][:, 1:],
                                  pad_token_id=cfg.pad_token_id,
                                  target_bonus=args.target_bonus)
    else:
        def loss_fn(params, batch, key):
            logits, _ = model.apply({"params": params},
                                    batch["input_ids"][:, :-1],
                                    deterministic=False, rngs={"dropout": key})
            return grover_lm_loss(logits, batch["input_ids"][:, :-1],
                                  batch["is_target"][:, 1:],
                                  pad_token_id=cfg.pad_token_id,
                                  target_bonus=args.target_bonus)

    files = sorted(glob.glob(args.train_files))
    if not files:
        raise ValueError(f"no files match {args.train_files}")
    batches = ({k: jnp.asarray(v) for k, v in b.items()}
               for b in lm_batches(files, args.seq_length, args.batch_size))

    trainer = Trainer(model, optimizer, output_dir=args.output_dir,
                      checkpoint_every=args.checkpoint_every)
    trainer.step_fn = make_loss_train_step(loss_fn, optimizer)

    first = next(batches)
    params = model.init({"params": jax.random.PRNGKey(0),
                         "dropout": jax.random.PRNGKey(1)},
                        first["input_ids"][:, :-1])["params"]
    if args.pp > 1:
        # stack the layer subtrees into the PP form ONCE; checkpoints are
        # written in this form (the serving loader unstacks transparently;
        # manual conversion via grover.unstack_grover_params)
        from merlot_tpu.models.grover import (shard_grover_pp_params,
                                              stack_grover_params)
        params = stack_grover_params({"params": params}, args.pp)["params"]
    opt_state = jax.jit(optimizer.init)(params)
    # crash/preemption recovery: resume from this output_dir's latest
    # checkpoint when one exists (templates above define the tree); THEN
    # place — restore returns host arrays, and mixing restored-unplaced
    # with placed trees trips jit's device check
    params, opt_state = trainer.resume_or(params, opt_state)
    if args.pp > 1:
        from jax.sharding import NamedSharding, PartitionSpec

        def place(tree):
            return shard_grover_pp_params({"params": tree}, mesh)["params"]
        params = place(params)
        opt_state = {"step": jax.device_put(
                         opt_state["step"],
                         NamedSharding(mesh, PartitionSpec())),
                     "m": place(opt_state["m"]), "v": place(opt_state["v"])}

    def stream():
        yield first
        yield from batches

    trainer.run(params, opt_state, stream(), num_steps=args.num_train_steps)


if __name__ == "__main__":
    main()
