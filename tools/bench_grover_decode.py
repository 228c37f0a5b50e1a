"""Grover decode (serving-path) throughput bench on the real chip.

The denoiser's production cost is autoregressive decode: grover-medium
(24L/1024H, vocab 50270) with a 1024-token prefix, generating until
end-of-article (reference: data/groverdenoise/run_server.py). This measures
tokens/s for the prefill+decode sampler at several batch sizes and knobs:

  GROVER_BF16=1     serving fast path: bf16-stored matrices + bf16 KV cache
                    (cast_params_for_serving; fp32 master contract unchanged)
  GROVER_KPRE=N     top-p prefilter k (default 128; 0 = reference's full-vocab sort)
  GROVER_BATCHES    comma list, default "1,8"
  GROVER_GEN=N      decode tokens per row (default 192)
  GROVER_PREFIX=N   prefix length (default 1024)
  GROVER_FUSEQKV=1  one [H,3H] qkv matmul per layer (bit-identical; default 1)
  GROVER_STACKKV=1  one stacked [B,L,2H] KV buffer per layer (one cache write
                    per step, kernel reads it directly; default 1)
  GROVER_ATTN=auto  cached-attention backend: auto|xla|pallas (grover.DECODE_ATTN)
  GROVER_PROBS=1    report per-token probs (serving ppl path; default 1).
                    0 = pure-generation mode: skips the per-step
                    logsumexp+gather chain (make_seq2seq_sampler
                    report_probs=False)
  GROVER_TOPP=p     nucleus p (default 0.94). NB with RANDOM weights logits
                    are near-uniform, so the nucleus needs ~p*V tokens: at
                    p=0.94 the prefilter falls back to the full sort every
                    step (the REAL model is peaked and stays on the fast
                    path). Use p<=0.01 to force the fast path with random
                    weights; real-checkpoint serving sees the fast numbers.

Timing uses a host transfer for sync (axon: block_until_ready is a no-op).
Decode-only rate is the SLOPE between two generation lengths (t_hi - t_lo)
/ (gen_hi - gen_lo) — subtracting a separately-timed prefill is too noisy
over the tunnel (prefill variance swamps the decode delta).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from merlot_tpu.models import grover as grover_mod
    from merlot_tpu.models.grover import (GroverConfig, GroverLM,
                                          cast_params_for_serving,
                                          make_seq2seq_sampler)

    bf16 = os.environ.get("GROVER_BF16", "1") == "1"
    fuseqkv = os.environ.get("GROVER_FUSEQKV", "1") == "1"
    stackkv = os.environ.get("GROVER_STACKKV", "1") == "1"
    grover_mod.DECODE_ATTN = os.environ.get("GROVER_ATTN", "auto")
    kpre = int(os.environ.get("GROVER_KPRE", "128"))
    batches = [int(b) for b in
               os.environ.get("GROVER_BATCHES", "1,8").split(",")]
    gen = int(os.environ.get("GROVER_GEN", "192"))
    prefix = int(os.environ.get("GROVER_PREFIX", "1024"))
    topp = float(os.environ.get("GROVER_TOPP", "0.94"))
    report_probs = os.environ.get("GROVER_PROBS", "1") == "1"

    cfg = GroverConfig.from_json_file(
        os.path.join(os.path.dirname(__file__), "..", "configs",
                     "grover_medium.json"))
    cfg = type(cfg)(**{**cfg.__dict__, "use_bfloat16": bf16,
                       "fused_qkv": fuseqkv, "stacked_kv": stackkv})
    model = GroverLM(cfg)

    print(f"grover-medium decode bench: bf16={bf16} k_prefilter={kpre} "
          f"prefix={prefix} gen={gen} fused_qkv={fuseqkv} "
          f"stacked_kv={stackkv} attn={grover_mod.DECODE_ATTN} "
          f"report_probs={report_probs}", flush=True)

    ids0 = jnp.zeros((1, 8), jnp.int32)
    t0 = time.time()
    params = jax.jit(lambda: model.init(jax.random.PRNGKey(0), ids0))()
    if bf16:
        params = cast_params_for_serving(params)
    n_params = sum(np.prod(x.shape) for x in jax.tree_util.tree_leaves(params))
    print(f"init {n_params / 1e6:.0f}M params in {time.time() - t0:.1f}s",
          flush=True)

    rng = np.random.default_rng(0)
    for b in batches:
        ctx = np.asarray(rng.integers(100, 50257, (b, prefix)), np.int32)
        ctx = jnp.asarray(ctx)
        key = jax.random.PRNGKey(1)

        gen_lo = max(8, gen // 6)
        times = {}
        for g in (gen_lo, gen):
            fn = make_seq2seq_sampler(model, max_len=prefix + g,
                                      prefix_len=prefix, p_for_topp=topp,
                                      eos_token=-1, k_prefilter=kpre,
                                      report_probs=report_probs)
            toks, _ = fn(params, ctx, key)       # compile + warm
            float(np.asarray(toks[0, -1]))
            best = float("inf")
            for r in range(5):   # min over reps: the tunnel adds transient
                t0 = time.time()  # latency spikes that a mean absorbs
                toks, _ = fn(params, ctx, jax.random.fold_in(key, r))
                float(np.asarray(toks[0, -1]))
                best = min(best, time.time() - t0)
            times[g] = best
        per_tok = (times[gen] - times[gen_lo]) / (gen - gen_lo)
        prefill = times[gen_lo] - (gen_lo - 1) * per_tok
        print(f"  b{b}: prefill {prefill * 1e3:.0f} ms, decode "
              f"{per_tok * 1e3:.2f} ms/tok = {1.0 / per_tok:.0f} tok/s/row, "
              f"{b / per_tok:.0f} tok/s aggregate "
              f"(t[{gen_lo}]={times[gen_lo] * 1e3:.0f} "
              f"t[{gen}]={times[gen] * 1e3:.0f})", flush=True)


if __name__ == "__main__":
    main()
