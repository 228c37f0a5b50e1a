"""Training harness: the TPUEstimator.train replacement.

Owns the loop around the jitted step: init-or-restore, warm start, host
data iteration with device prefetch, periodic metrics (device_get every
``log_every`` steps — the outfeed analogue), step-numbered checkpoints
(every ``iterations_per_loop`` like the reference, utils/neat_config.py:140),
optional jax.profiler trace capture, and a NaN guard (the reference's only
numerical-safety net was telemetry; we fail fast instead).
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Any, Callable, Dict, Iterator, Optional

import jax
import numpy as np

from merlot_tpu.train.checkpoint import CheckpointManager, warm_start
from merlot_tpu.train.metrics import MetricsLogger
from merlot_tpu.train.optimizer import MerlotAdamW
from merlot_tpu.train.train_step import make_train_step


class Trainer:
    def __init__(self, model, optimizer: MerlotAdamW, output_dir: str,
                 mesh=None, log_every: int = 50,
                 checkpoint_every: int = 1000,
                 profile_dir: Optional[str] = None,
                 profile_steps: Optional[range] = None,
                 seed: int = 0, zero1: bool = False):
        self.model = model
        self.optimizer = optimizer
        self.mesh = mesh
        # ZeRO-1 optimizer-state sharding over the mesh's data axis
        # (parallel.mesh.zero1_partition_spec); needs a mesh.
        self.zero1 = zero1 and mesh is not None
        self.log_every = log_every
        self.checkpoint_every = checkpoint_every
        self.ckpt = CheckpointManager(os.path.join(output_dir, "checkpoints"))
        self.logger = MetricsLogger(output_dir)
        self.profile_dir = profile_dir
        self.profile_steps = profile_steps
        self.seed = seed
        self.step_fn = make_train_step(model, optimizer, mesh=mesh,
                                       zero1=self.zero1)
        # ONE jitted eval closure for the Trainer's lifetime: jax.jit
        # caches by function identity, so building the lambda inside
        # evaluate() would recompile the full eval program on every call —
        # the ckpt-polling validate sidecar calls evaluate() per
        # checkpoint. Per-shape specializations still cache inside jit.
        self.eval_fn = jax.jit(lambda p, b: self.model.apply(
            {"params": p}, b, deterministic=True,
            rngs={"masking": jax.random.PRNGKey(0)})[:2])

    # ------------------------------------------------------------------
    def init_state(self, example_batch, init_checkpoint: Optional[str] = None):
        """Restore latest checkpoint, else fresh init (+ optional warm start
        from a params-only checkpoint path)."""
        from merlot_tpu.train.train_step import init_train_state

        latest = self.ckpt.latest_step()
        params, opt_state = init_train_state(self.model, self.optimizer,
                                             example_batch, seed=self.seed)
        if latest is not None:
            params, opt_state = self.resume_or(params, opt_state)
        elif init_checkpoint:
            print(f"warm starting from {init_checkpoint}")
            import orbax.checkpoint as ocp
            ckptr = ocp.StandardCheckpointer()
            src = ckptr.restore(os.path.abspath(init_checkpoint))
            src_params = src.get("params", src)
            from merlot_tpu.train.checkpoint import (fuse_qkv_tree,
                                                     tree_has_fused_qkv)
            if tree_has_fused_qkv(params) and not tree_has_fused_qkv(src_params):
                # split-form warm-start source (reference-converted or
                # split-trained) into a canonical-fused model: concat the
                # q/k/v triples so the name intersection lines up
                src_params = fuse_qkv_tree(src_params)
            params, _ = warm_start(params, src_params)
        if self.zero1:
            from merlot_tpu.parallel.mesh import shard_opt_state, shard_params
            params = shard_params(params, self.mesh)
            opt_state = shard_opt_state(opt_state, self.mesh)
        return params, opt_state

    def resume_or(self, params, opt_state):
        """Restore the latest checkpoint into the given (params, opt_state)
        TEMPLATES if one exists, else return them unchanged — the
        crash/preemption recovery hook for CLIs that build their own init
        state (grover_train, vcr.train) instead of using init_state.
        Callers applying a warm start must skip it when
        ``self.ckpt.latest_step()`` is not None (resume wins)."""
        latest = self.ckpt.latest_step()
        if latest is None:
            return params, opt_state
        print(f"restoring checkpoint at step {latest}")
        state = self.ckpt.restore(latest,
                                  {"params": params, "opt_state": opt_state})
        return state["params"], state["opt_state"]

    # ------------------------------------------------------------------
    def run(self, params, opt_state, batches: Iterator[Dict[str, Any]],
            num_steps: int, root_key=None):
        if root_key is None:
            root_key = jax.random.PRNGKey(self.seed)
        ctx = self.mesh if self.mesh is not None else contextlib.nullcontext()

        with ctx:
            start_step = int(jax.device_get(opt_state["step"]))
            step = start_step
            t_start = time.time()
            # reset the throughput window — stale state from a previous
            # run() (train -> eval -> resume) would fold the idle wall time
            # between runs into the first logged perf/steps_per_sec
            self._tp_step, self._tp_time = start_step, t_start
            for batch in batches:
                if step >= num_steps:
                    break
                if (self.profile_dir and self.profile_steps
                        and step == self.profile_steps.start):
                    jax.profiler.start_trace(self.profile_dir)
                params, opt_state, metrics = self.step_fn(
                    params, opt_state, batch, root_key)
                step += 1
                if (self.profile_dir and self.profile_steps
                        and step == self.profile_steps.stop):
                    jax.block_until_ready(metrics["loss"])
                    jax.profiler.stop_trace()

                if step % self.log_every == 0 or step == num_steps:
                    host_metrics = jax.device_get(metrics)
                    loss = float(host_metrics["loss"])
                    if not np.isfinite(loss):
                        self.logger.log(step, host_metrics)
                        raise FloatingPointError(
                            f"non-finite loss {loss} at step {step}")
                    # wall-clock throughput over the logging window (the
                    # device_get above is the sync point)
                    now = time.time()
                    window = step - getattr(self, "_tp_step", start_step)
                    if window > 0:
                        host_metrics["perf/steps_per_sec"] = window / (
                            now - getattr(self, "_tp_time", t_start))
                    self._tp_step, self._tp_time = step, now
                    self.logger.log(step, host_metrics)

                if step % self.checkpoint_every == 0 or step == num_steps:
                    # guard the write: a poisoned state must never be
                    # checkpointed, even when checkpoint_every < log_every
                    # (this step's loss is device-resident; one cheap
                    # transfer on the checkpoint boundary only)
                    loss = float(jax.device_get(metrics["loss"]))
                    if not np.isfinite(loss):
                        self.logger.log(step, jax.device_get(metrics))
                        raise FloatingPointError(
                            f"non-finite loss {loss} at step {step}; "
                            f"refusing to checkpoint")
                    self.ckpt.save(step, {"params": jax.device_get(params),
                                          "opt_state": jax.device_get(opt_state)})

            dt = time.time() - t_start
            if step > start_step:
                print(f"trained {step - start_step} steps in {dt:.1f}s "
                      f"({(step - start_step) / dt:.3f} steps/s)")
        return params, opt_state

    # ------------------------------------------------------------------
    def evaluate(self, params, batches: Iterator[Dict[str, Any]],
                 max_batches: Optional[int] = None,
                 log_step: Optional[int] = None) -> Dict[str, float]:
        """Held-out evaluation: mean of every scalar metric over batches
        (the reference EVAL mode's tf.metrics.mean wrapping,
        model/modeling.py:788-800). Deterministic forward, fixed mask rng.
        The jitted closure lives on the Trainer (``self.eval_fn``) so
        repeated calls — the validate sidecar polls checkpoints in a loop —
        reuse the compiled program instead of re-jitting every time."""
        eval_fn = self.eval_fn
        sums: Dict[str, float] = {}
        n = 0
        for i, batch in enumerate(batches):
            if max_batches is not None and i >= max_batches:
                break
            loss, metrics = jax.device_get(eval_fn(params, batch))
            metrics = dict(metrics)
            metrics["loss"] = loss
            for k, v in metrics.items():
                sums[k] = sums.get(k, 0.0) + float(v)
            n += 1
        means = {k: v / max(n, 1) for k, v in sums.items()}
        if log_step is not None and n:
            self.logger.log(log_step, {f"eval/{k}": v
                                       for k, v in means.items()},
                            echo=True)
        return means
