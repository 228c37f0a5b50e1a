"""GPipe-style pipeline parallelism over a ``stage`` mesh axis.

The reference scales one way only: synchronous data parallelism via
TPUEstimator (SURVEY.md §2.12). This module adds the remaining axis for
models whose layer stack outgrows DP+TP memory (Grover-class decoder LMs,
reference: data/groverdenoise/lm/modeling.py): split the uniform layer
stack into contiguous stages, one per device along a ``stage`` mesh axis,
and stream microbatches through the pipeline with ``ppermute`` hops over
ICI.

TPU-native shape (no schedulers, no send/recv threads):
  * per-stage params are the SAME pytree stacked on a leading [n_stage]
    axis, sharded over ``stage`` — placement is declarative, like every
    other sharding in parallel/mesh.py;
  * the schedule is one ``lax.scan`` over M + n_stage - 1 ticks inside a
    ``shard_map``: every device runs its stage on its in-flight microbatch
    and ``ppermute``s the activation to the next stage — the classic
    fill/drain (GPipe) schedule;
  * **training works through it**: jax differentiates scan + ppermute
    (the transpose of a forward hop is the reverse hop), so ``jax.grad``
    of a loss on the last stage's outputs yields the reverse pipeline
    automatically — no hand-written backward schedule;
  * bubble fraction is the GPipe (n_stage - 1) / (M + n_stage - 1);
    choose M >= 4 * n_stage to keep it under ~20%.

This composes with data parallelism: build a (data, stage) mesh and pass
``data_axis='data'`` — the per-microbatch dim of ``h_mb`` is sharded over
``data`` and the scan runs independently per data shard, with param
cotangents psummed over ``data`` by the shard_map transpose (verified
dp2 x stage4 == sequential fwd+bwd in tests/test_pipeline.py).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
try:                                   # jax >= 0.8
    from jax import shard_map
except ImportError:                    # older jax
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def stack_stage_params(layer_params: Sequence[Any], n_stage: int):
    """[L] per-layer pytrees -> one pytree with leaves [n_stage, L/n_stage,
    ...]: dim 0 is the pipeline stage (shard it over 'stage'), dim 1 the
    within-stage layer (scanned locally). Layers must be shape-uniform
    (true for GroverLM's ``layer{i:02d}`` subtrees and for scan-stacked
    TransformerEncoder towers)."""
    n_layers = len(layer_params)
    assert n_layers % n_stage == 0, (n_layers, n_stage)
    per = n_layers // n_stage
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layer_params)
    return jax.tree.map(
        lambda x: x.reshape((n_stage, per) + x.shape[1:]), stacked)


def stage_param_shardings(stacked, mesh: Mesh, axis: str = "stage"):
    """NamedShardings placing dim 0 of every stacked leaf on ``axis``."""
    def one(leaf):
        return NamedSharding(mesh, P(*((axis,) + (None,) * (leaf.ndim - 1))))
    return jax.tree.map(one, stacked)


def shard_stage_params(stacked, mesh: Mesh, axis: str = "stage"):
    return jax.tree.map(lambda x, s: jax.device_put(x, s),
                        stacked, stage_param_shardings(stacked, mesh, axis))


def pipeline_apply(layer_fn: Callable[..., jnp.ndarray],
                   stacked_params, h_mb: jnp.ndarray, *,
                   mesh: Mesh, axis: str = "stage",
                   rng: Optional[jnp.ndarray] = None,
                   data_axis: Optional[str] = None) -> jnp.ndarray:
    """Run microbatches through the staged layer stack.

    Args:
      layer_fn: pure ``(one_layer_params, h) -> h`` (e.g. a flax
        ``module.apply`` closure; anything replicated — masks, position
        offsets — is closed over). With ``rng`` given the signature is
        ``(one_layer_params, h, key) -> h`` and each key is unique per
        (global layer index, microbatch) — dropout and friends work in
        the pipeline exactly as in a sequential stack.
      stacked_params: output of ``stack_stage_params`` (leaves
        [n_stage, L/n_stage, ...]), placed with ``shard_stage_params``.
      h_mb: [M, mb, ...] microbatched activations, replicated over
        ``axis``.
      data_axis: compose PP with data parallelism on a (data, stage)
        mesh: the per-microbatch dim (dim 1) of ``h_mb`` is sharded over
        this axis and every data shard runs the same schedule on its
        slice (the scan is independent per shard; params are replicated
        over ``data_axis``, so their cotangents are psummed over it by
        the shard_map transpose — the standard DP gradient all-reduce).
        Tested dp2 x stage4 == sequential, fwd and grads
        (tests/test_pipeline.py::test_pipeline_composes_with_data_axis).

    Returns [M, mb, ...]: the last stage's outputs, microbatch order
    preserved. Differentiable in (stacked_params, h_mb).
    """
    n_stage = mesh.shape[axis]
    m = h_mb.shape[0]
    ticks = m + n_stage - 1

    def stage_stack(params_stage, h, key_mb, per):
        # within-stage layers run as a local scan (same program for every
        # stage — that is what makes the stacked layout legal)
        def body(hh, xs):
            one_layer, j = xs
            if rng is None:
                return layer_fn(one_layer, hh), None
            return layer_fn(one_layer, hh,
                            jax.random.fold_in(key_mb, j)), None
        out, _ = jax.lax.scan(body, h, (params_stage, jnp.arange(per)))
        return out

    def per_device(params_local, h_all):
        # params_local leaves [1, per, ...] — this device's stage
        params_stage = jax.tree.map(lambda x: x[0], params_local)
        per = jax.tree_util.tree_leaves(params_stage)[0].shape[0]
        d = jax.lax.axis_index(axis)
        zero = jnp.zeros_like(h_all[0])
        out_buf = jnp.zeros_like(h_all)
        fwd_perm = [(i, i + 1) for i in range(n_stage - 1)]

        def tick(carry, t):
            recv, out_buf = carry
            # stage 0 ingests microbatch t (zeros past the fill phase);
            # later stages consume what the previous tick delivered
            mb_idx = jnp.minimum(t, m - 1)
            x_in0 = jnp.where(t < m,
                              jax.lax.dynamic_index_in_dim(
                                  h_all, mb_idx, keepdims=False),
                              zero)
            x_in = jnp.where(d == 0, x_in0, recv)
            key_mb = None
            if rng is not None:
                # the microbatch flowing through stage d at tick t is
                # t - d; folding (microbatch, stage offset, layer) gives
                # every (layer, microbatch) pair its own key (fill/drain
                # ticks compute with clipped keys but their outputs are
                # discarded by the schedule)
                mb_cur = jnp.clip(t - d, 0, m - 1)
                key_mb = jax.random.fold_in(
                    jax.random.fold_in(rng, mb_cur), d * per)
            y = stage_stack(params_stage, x_in, key_mb, per)
            # the last stage finishes microbatch t - (n_stage - 1)
            done_idx = t - (n_stage - 1)
            store = jnp.logical_and(d == n_stage - 1, done_idx >= 0)
            idx = jnp.clip(done_idx, 0, m - 1)
            cur = jax.lax.dynamic_index_in_dim(out_buf, idx, keepdims=False)
            out_buf = jax.lax.dynamic_update_index_in_dim(
                out_buf, jnp.where(store, y, cur), idx, axis=0)
            recv_next = jax.lax.ppermute(y, axis, fwd_perm)
            return (recv_next, out_buf), None

        (_, out_buf), _ = jax.lax.scan(
            tick, (zero, out_buf), jnp.arange(ticks))
        # [1, M, ...] per device; the global view stacks stages on dim 0
        return out_buf[None]

    # in/out specs: params sharded on dim 0 of every leaf (replicated over
    # data_axis if present); activations replicated over `axis`, with the
    # per-microbatch dim sharded over data_axis when composing with DP
    h_spec = P(None, data_axis) if data_axis else P()
    out_spec = P(axis, None, data_axis) if data_axis else P(axis)
    out = shard_map(
        per_device, mesh=mesh,
        in_specs=(jax.tree.map(lambda _: P(axis), stacked_params), h_spec),
        out_specs=out_spec,
        check_vma=False,
    )(stacked_params, h_mb)
    return out[-1]


def microbatch(x: jnp.ndarray, num_microbatches: int) -> jnp.ndarray:
    """[B, ...] -> [M, B/M, ...]."""
    b = x.shape[0]
    assert b % num_microbatches == 0, (b, num_microbatches)
    return x.reshape((num_microbatches, b // num_microbatches) + x.shape[1:])
