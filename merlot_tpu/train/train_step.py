"""The pjit training step.

Replaces the reference's TPUEstimator harness (model/train.py:17-26 +
utils/optimization.py): one jitted function = forward (3 objectives) +
backward + AdamW update. Parallelism is declarative — params/batch arrive
with NamedShardings (merlot_tpu.parallel.mesh) and GSPMD inserts the
gradient psum / contrastive all-gather over ICI.

TPU-first details:
  * params and optimizer state are donated, so the update is in-place in
    HBM (no double allocation);
  * per-step RNG is folded from a root key + step counter, giving the
    explicit-key analogue of TF's op-level seeds;
  * scalar metrics come back as a small dict — the host decides how often
    to device_get them (the outfeed/host-call analogue).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from merlot_tpu.models.pretrain import MerlotPretrainModel
from merlot_tpu.train.optimizer import MerlotAdamW


def dropout_key(k: jax.Array, impl: str = "rbg") -> jax.Array:
    """Re-key a threefry key for cheap per-element dropout bits.

    Dropout mask generation is pure per-element RNG over
    [B*chunks, S, H]-class tensors; with jax's default threefry impl it
    profiled at ~23 ms/step (~5%) at the flagship B8 shape — 24 fused
    mask-gen sites of ~0.9 ms each (PERF.md round 4). The 'rbg' impl
    keeps threefry-quality key derivation (split/fold_in still threefry
    over the key data) but generates the bits with the TPU's native
    RngBitGenerator. Sampling distribution is unchanged; the stream
    differs, which only reshuffles which units drop — the same freedom
    any RNG-impl choice has. Masking/Gumbel keys stay threefry (tiny
    tensors, and their stream is part of the repo's reproducibility
    story)."""
    from merlot_tpu.ops.sampling import rekey
    return rekey(k, impl)


def make_train_step(model: MerlotPretrainModel, optimizer: MerlotAdamW,
                    donate: bool = True,
                    attn_backend: Optional[str] = None,
                    mesh=None, zero1: bool = False,
                    dropout_rng_impl: str = "rbg") -> Callable:
    """Build the jitted (params, opt_state, batch, root_key) -> ... step.

    attn_backend=None resolves to ops.attention.training_backend():
    fused pallas attention forward+backward in EVERY tower on TPU
    (254.9 -> 271.7 seg/s/chip after the backward VMEM diet, PERF.md
    round 3), XLA on CPU.

    zero1=True (requires mesh) pins the updated optimizer state to the
    ZeRO-1 shardings (parallel.mesh.zero1_partition_spec) and the updated
    params back to the replicated-over-data param shardings: GSPMD then
    lowers grad-allreduce + sliced update + gather to reduce-scatter ->
    local Adam -> all-gather, cutting per-chip Adam-state memory by the
    data-axis size at the same collective volume as plain DP. Inputs
    should arrive pre-placed (shard_params / shard_opt_state) so donation
    can reuse the buffers."""
    if attn_backend is None:
        from merlot_tpu.ops.attention import training_backend
        attn_backend = training_backend()
    if zero1:
        assert mesh is not None, "zero1 sharding needs a mesh"

    def _pin_state(new_params, new_opt_state):
        from merlot_tpu.parallel.mesh import (opt_state_shardings,
                                              param_shardings)
        new_params = jax.lax.with_sharding_constraint(
            new_params, param_shardings(new_params, mesh))
        new_opt_state = jax.lax.with_sharding_constraint(
            new_opt_state, opt_state_shardings(new_opt_state, mesh))
        return new_params, new_opt_state

    def train_step(params, opt_state, batch, root_key):
        step = opt_state["step"]
        key = jax.random.fold_in(root_key, step)
        k_mask, k_drop = jax.random.split(key)
        k_drop = dropout_key(k_drop, dropout_rng_impl)

        def loss_fn(p):
            loss, metrics, _ = model.apply(
                {"params": p}, batch, deterministic=False,
                rngs={"masking": k_mask, "dropout": k_drop},
                attn_backend=attn_backend)
            return loss, metrics

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        new_params, new_opt_state, opt_metrics = optimizer.update(
            grads, opt_state, params)
        if zero1:
            new_params, new_opt_state = _pin_state(new_params, new_opt_state)
        metrics.update(opt_metrics)
        metrics["loss"] = loss
        return new_params, new_opt_state, metrics

    if donate:
        return jax.jit(train_step, donate_argnums=(0, 1))
    return jax.jit(train_step)


def make_loss_train_step(loss_fn: Callable, optimizer: MerlotAdamW,
                         donate: bool = True,
                         dropout_rng_impl: str = "rbg") -> Callable:
    """Train step from an arbitrary ``loss_fn(params, batch, key) ->
    (loss, metrics)`` — used by downstream finetuning (VCR, grover_train),
    where ``key`` feeds dropout only (hence the rbg re-key; see
    ``dropout_key``)."""

    def train_step(params, opt_state, batch, root_key):
        key = jax.random.fold_in(root_key, opt_state["step"])
        key = dropout_key(key, dropout_rng_impl)

        def wrapped(p):
            return loss_fn(p, batch, key)

        (loss, metrics), grads = jax.value_and_grad(wrapped, has_aux=True)(params)
        new_params, new_opt_state, opt_metrics = optimizer.update(
            grads, opt_state, params)
        metrics.update(opt_metrics)
        metrics["loss"] = loss
        return new_params, new_opt_state, metrics

    if donate:
        return jax.jit(train_step, donate_argnums=(0, 1))
    return jax.jit(train_step)


def init_train_state(model: MerlotPretrainModel, optimizer: MerlotAdamW,
                     example_batch, seed: int = 0):
    """Initialize (params, opt_state) for the given batch shapes (jitted)."""
    @jax.jit
    def _init(batch):
        variables = model.init(
            {"params": jax.random.PRNGKey(seed),
             "masking": jax.random.PRNGKey(seed + 1),
             "dropout": jax.random.PRNGKey(seed + 2)},
            batch, deterministic=True)
        return variables["params"]

    params = _init(example_batch)
    opt_state = jax.jit(optimizer.init)(params)
    return params, opt_state
