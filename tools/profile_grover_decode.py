"""Per-op device-time profile of ONE Grover serving decode step.

Drives the exact computation the sampler's while_loop body runs (cached
single-token forward + logits head + prefiltered top-p) as a standalone
jitted step at batch B, traces N steps, and aggregates device time per
HLO fusion — the data for the fused-decode-step work (PERF.md round 3).

Usage (on the chip): python tools/profile_grover_decode.py [batch] [steps]
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

import dataclasses

from merlot_tpu.models.grover import (GroverConfig, GroverLM,
                                      cast_params_for_serving, top_p_sample)
from tools.profile_step import parse_trace


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    prefix, max_len = 1024, 1280

    from merlot_tpu.models import grover as grover_mod
    grover_mod.DECODE_ATTN = os.environ.get("GROVER_ATTN", "auto")
    cfg = GroverConfig.from_json_file(
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "configs", "grover_medium.json"))
    cfg = dataclasses.replace(
        cfg, use_bfloat16=True,
        fused_qkv=os.environ.get("GROVER_FUSEQKV", "1") == "1",
        stacked_kv=os.environ.get("GROVER_STACKKV", "1") == "1")
    model = GroverLM(cfg)
    params = cast_params_for_serving(
        jax.jit(lambda: model.init(jax.random.PRNGKey(0),
                                   jnp.zeros((1, 8), jnp.int32)))())
    rng = np.random.default_rng(0)
    ctx = jnp.asarray(rng.integers(100, 50257, (b, prefix)), np.int32)

    cache = model.empty_cache(b, max_len)
    _, cache = jax.jit(lambda p, i, c: model.apply(
        p, i, cache=c, position_offset=0))(params, ctx, cache)

    @functools.partial(jax.jit, donate_argnums=(2,))
    def step(params, tok, cache, pos, key):
        logits, cache = model.apply(params, tok, cache=cache,
                                    position_offset=pos)
        nxt = top_p_sample(key, logits[:, 0], 0.005,
                           k_prefilter=int(os.environ.get("GROVER_KPRE",
                                                          "128")))
        return nxt[:, None], cache

    tok = jnp.full((b, 1), 123, jnp.int32)
    key = jax.random.PRNGKey(1)
    pos = jnp.int32(prefix)
    tok, cache = step(params, tok, cache, pos, key)
    float(np.asarray(tok[0, 0]))

    t0 = time.time()
    for i in range(10):
        tok, cache = step(params, tok, cache, pos + 1 + i, key)
    float(np.asarray(tok[0, 0]))
    print(f"untraced: {(time.time() - t0) / 10 * 1000:.2f} ms/step")

    trace_dir = os.environ.get("PROF_DIR", "/tmp/grover_prof")
    with jax.profiler.trace(trace_dir):
        for i in range(n_steps):
            tok, cache = step(params, tok, cache, pos + 11 + i, key)
        float(np.asarray(tok[0, 0]))
    parse_trace(trace_dir, min_pct=0.3)


if __name__ == "__main__":
    main()
