"""Benchmark: flagship pretrain training-step throughput on the real chip.

Prints ONE JSON line:
  {"metric": "pretrain_segments_per_sec_per_chip", "value": N,
   "unit": "segments/s/chip", "vs_baseline": R}

The metric is the BASELINE.md north star: frame-caption segments (one
192x352 frame + one 32-token caption chunk) processed per second per chip by
a FULL training step — ViT + lang tower + joint encoder forward, all three
objectives, backward, and the AdamW update (the reference's whole
model_fn+CrossShardOptimizer pipeline, model/modeling.py:671-757).

vs_baseline: the reference publishes no numbers (BASELINE.md), so baselines
are measured: the ratio is against the most recent BENCH_r*.json recorded by
the driver (previous round), or 1.0 on the first round.

All diagnostics go to stderr; stdout is exactly the one JSON line.
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _load_prev_baseline() -> float | None:
    runs = sorted(glob.glob(os.path.join(os.path.dirname(__file__) or ".",
                                         "BENCH_r*.json")))
    for path in reversed(runs):
        try:
            with open(path) as f:
                rec = json.load(f)
            if isinstance(rec, dict) and rec.get("parsed"):
                rec = rec["parsed"]  # the driver wraps the JSON line
            if isinstance(rec, dict) and rec.get("value"):
                return float(rec["value"])
        except Exception:
            continue
    return None


def bench_vit_encode():
    """Secondary metric (BASELINE.json config 2): ViT grid-feature encode
    throughput, frames/sec, single chip. Run with BENCH_MODE=vit."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from __graft_entry__ import _flagship_config
    from merlot_tpu.models.config import MerlotConfig
    from merlot_tpu.nn.transformer import TransformerHParams
    from merlot_tpu.nn.vit import VisionBackbone

    cfg = _flagship_config()
    hp = TransformerHParams(hidden_size=768, num_layers=12, num_heads=12,
                            intermediate_size=3072, hidden_dropout_prob=0.0,
                            dtype=jnp.bfloat16,
                            softmax_fp32=cfg.attention_softmax_fp32)
    vb = VisionBackbone(patch_size=16, hidden_size=768, num_cls_emb=2,
                        resnet_layers=(3, 4, 9), spatial_pool_size=2,
                        vit_hp=hp)
    n_frames = int(os.environ.get("BENCH_VIT_FRAMES", "256"))
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(0, 1, (n_frames, 192, 352, 3)),
                         jnp.float32)
    from merlot_tpu.ops.attention import inference_backend
    backend = os.environ.get("BENCH_ATTN", inference_backend())
    v = jax.jit(lambda x: vb.init(jax.random.PRNGKey(0), x))(images)
    fwd = jax.jit(lambda v, x: vb.apply(v, x, attn_backend=backend)["cls"])
    # host-transfer sync (block_until_ready is a no-op over the tunnel)
    float(fwd(v, images)[0, 0, 0])
    n_iters = 10
    t0 = time.time()
    out = None
    for _ in range(n_iters):
        out = fwd(v, images)
    float(out[0, 0, 0])
    dt = (time.time() - t0) / n_iters
    value = n_frames / dt
    log(f"ViT encode: {dt * 1000:.1f} ms for {n_frames} frames")
    print(json.dumps({"metric": "vit_encode_frames_per_sec", "value": round(value, 1),
                      "unit": "frames/s/chip", "vs_baseline": 1.0}))


def bench_zero_shot():
    """Zero-shot story ordering throughput at the real eval protocol
    (5-segment 384x384 config, x2 duplication). BENCH_MODE=zeroshot."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import yaml
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from merlot_tpu.core.config import NeatConfig
    from merlot_tpu.downstream.sort_story.zero_shot import make_zero_shot_fn
    from merlot_tpu.models.config import MerlotConfig

    cfg = yaml.safe_load(open(
        "/root/reference/model/configs/merlot_5segments.yaml"))
    mc = MerlotConfig.from_dict(NeatConfig.from_dict(cfg).model)
    bs = int(os.environ.get("BENCH_ZS_BATCH", "2"))
    rng = np.random.default_rng(0)
    model, fn, init_fn = make_zero_shot_fn(mc, batch_size=bs, num_chunks=5)
    images = jnp.asarray(rng.uniform(0, 1, (bs, 5, 384, 384, 3)), jnp.float32)
    sents = jnp.asarray(rng.integers(100, 50000, (bs, 5, 32)), jnp.int32)
    params = init_fn(jax.random.PRNGKey(0), images, sents)
    out = fn(params, images, sents)
    float(out["lang_viz_probs"].reshape(-1)[0])
    n = 10
    t0 = time.time()
    for _ in range(n):
        out = fn(params, images, sents)
    float(out["lang_viz_probs"].reshape(-1)[0])
    value = bs / ((time.time() - t0) / n)
    print(json.dumps({"metric": "zero_shot_stories_per_sec",
                      "value": round(value, 2), "unit": "stories/s/chip",
                      "vs_baseline": 1.0}))


def bench_vcr_eval():
    """VCR eval throughput (384x704, 4 choices). BENCH_MODE=vcr."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import yaml
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from merlot_tpu.core.config import NeatConfig
    from merlot_tpu.downstream.vcr.modeling import VCRModel
    from merlot_tpu.models.config import MerlotConfig

    cfg = yaml.safe_load(open("/root/reference/model/configs/merlot_vcr.yaml"))
    mc = MerlotConfig.from_dict(NeatConfig.from_dict(cfg).model)
    b = int(os.environ.get("BENCH_VCR_BATCH", "8"))
    rng = np.random.default_rng(0)
    model = VCRModel(mc)
    images = jnp.asarray(rng.uniform(0, 1, (b, 384, 704, 3)), jnp.float32)
    lm = jnp.asarray(rng.integers(100, 50000, (b, 4, 184)), jnp.int32)
    v = jax.jit(lambda i, l: model.init(jax.random.PRNGKey(0), i, l,
                                        mode="answer"))(images, lm)
    f = jax.jit(lambda v, i, l: model.apply(v, i, l, mode="answer"))
    float(f(v, images, lm).reshape(-1)[0])
    n = 10
    t0 = time.time()
    out = None
    for _ in range(n):
        out = f(v, images, lm)
    float(out.reshape(-1)[0])
    value = b / ((time.time() - t0) / n)
    print(json.dumps({"metric": "vcr_eval_examples_per_sec",
                      "value": round(value, 2), "unit": "examples/s/chip",
                      "vs_baseline": 1.0}))


def bench_grover_decode():
    """Grover-medium serving decode, aggregate tok/s at batch 8 (bf16
    weights/cache, prefiltered top-p with small p so RANDOM weights stay on
    the fast path — the real model is peaked; see
    tools/bench_grover_decode.py). BENCH_MODE=grover."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from merlot_tpu.models.grover import (GroverConfig, GroverLM,
                                          cast_params_for_serving,
                                          make_seq2seq_sampler)

    b = int(os.environ.get("BENCH_GROVER_BATCH", "8"))
    prefix, gen_lo, gen_hi = 1024, 32, 192
    cfg = GroverConfig.from_json_file(
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "configs", "grover_medium.json"))
    import dataclasses as _dc
    cfg = _dc.replace(cfg, use_bfloat16=True)
    model = GroverLM(cfg)
    params = cast_params_for_serving(
        jax.jit(lambda: model.init(jax.random.PRNGKey(0),
                                   jnp.zeros((1, 8), jnp.int32)))())
    rng = np.random.default_rng(0)
    ctx = jnp.asarray(rng.integers(100, 50257, (b, prefix)), np.int32)
    key = jax.random.PRNGKey(1)
    times = {}
    for g in (gen_lo, gen_hi):
        fn = make_seq2seq_sampler(model, max_len=prefix + g,
                                  prefix_len=prefix, p_for_topp=0.005,
                                  eos_token=-1, k_prefilter=1024)
        toks, _ = fn(params, ctx, key)
        float(np.asarray(toks[0, -1]))
        best = float("inf")
        for r in range(5):
            t0 = time.time()
            toks, _ = fn(params, ctx, jax.random.fold_in(key, r))
            float(np.asarray(toks[0, -1]))
            best = min(best, time.time() - t0)
        times[g] = best
    per_tok = (times[gen_hi] - times[gen_lo]) / (gen_hi - gen_lo)
    print(json.dumps({"metric": "grover_decode_tokens_per_sec_aggregate",
                      "value": round(b / per_tok, 1), "unit": "tokens/s/chip",
                      "vs_baseline": round(b / per_tok / 313.0, 3)}))


def main():
    import dataclasses

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import numpy as np

    from __graft_entry__ import _flagship_config, _make_batch
    from merlot_tpu.models.pretrain import MerlotPretrainModel
    from merlot_tpu.train.optimizer import AdamWConfig, MerlotAdamW
    from merlot_tpu.train.train_step import init_train_state, make_train_step

    dev = jax.devices()[0]
    log(f"device: {dev}")

    cfg = _flagship_config()
    _apply_backend_knobs()
    # experiment knobs (defaults = shipping config)
    # defaults = the measured-best training config (PERF.md): unrolled,
    # no remat, bf16 softmax, per-chip batch 8
    cfg = dataclasses.replace(
        cfg,
        scan_layers=os.environ.get("BENCH_SCAN", "0") == "1",
        remat=os.environ.get("BENCH_REMAT", "0") == "1",
        remat_policy=os.environ.get("BENCH_REMAT_POLICY") or None,
        attention_softmax_fp32=os.environ.get("BENCH_SOFTMAX_FP32", "0") == "1",
        fuse_ln_matmul=os.environ.get("BENCH_LN_FUSION", "0") == "1",
        fused_qkv=os.environ.get("BENCH_FUSED_QKV", "0") == "1",
        # canonical fused tree: one attention/qkv param per attention,
        # no apply-time concat (the thing the r4 fused_qkv A/B measured)
        fused_qkv_params=os.environ.get("BENCH_QKV_PARAMS", "0") == "1",
        # stem conv as s2d(2) + 2x2 stride-1 (identical math, wider MXU
        # contraction at the RGB stem)
        stem_space_to_depth=os.environ.get("BENCH_STEM_S2D", "0") == "1")
    batch_sizes = tuple(
        int(x) for x in os.environ.get("BENCH_BATCH", "8,4,2,1").split(","))
    num_chunks = 16
    model = MerlotPretrainModel(cfg)
    optimizer = MerlotAdamW(AdamWConfig(
        learning_rate=3e-4, num_train_steps=460000, num_warmup_steps=10000,
        weight_decay_rate=0.1, beta_2=0.98, clip_norm=0.0,
        use_bfloat16_adam=True,
        param_overrides=((("attn_ln", "mlp_ln", "final_ln", "embed_norm",
                           "/gn", "bias", "beta", "gamma"),
                          {"weight_decay_rate": 0.0}),)))

    value = None
    for batch_size in batch_sizes:
        try:
            log(f"trying per-chip batch={batch_size} ({batch_size * num_chunks} segments)")
            batch = _make_batch(cfg, batch=batch_size, num_chunks=num_chunks)
            t0 = time.time()
            params, opt_state = init_train_state(model, optimizer, batch)
            log(f"  init: {time.time() - t0:.1f}s")
            # default None -> ops.attention.training_backend()
            # ('pallas' in every tower on TPU, the measured-best config)
            step_fn = make_train_step(
                model, optimizer,
                attn_backend=os.environ.get("BENCH_ATTN") or None,
                dropout_rng_impl=os.environ.get("BENCH_DROPOUT_RNG", "rbg"))
            key = jax.random.PRNGKey(0)

            t0 = time.time()
            params, opt_state, metrics = step_fn(params, opt_state, batch, key)
            jax.block_until_ready(metrics["loss"])
            log(f"  compile+first step: {time.time() - t0:.1f}s "
                f"loss={float(metrics['loss']):.3f}")

            # warm (host-transfer sync: block_until_ready is a no-op over
            # the axon tunnel — CLAUDE.md; this must complete before t0)
            params, opt_state, metrics = step_fn(params, opt_state, batch, key)
            float(metrics["loss"])

            n_steps = 8
            t0 = time.time()
            for _ in range(n_steps):
                params, opt_state, metrics = step_fn(params, opt_state, batch, key)
            float(metrics["loss"])
            dt = time.time() - t0
            segments = batch_size * num_chunks * n_steps
            value = segments / dt
            log(f"  {n_steps} steps in {dt:.2f}s -> {value:.2f} segments/s/chip "
                f"({dt / n_steps * 1000:.0f} ms/step)")
            break
        except Exception as e:  # OOM at this batch -> try smaller
            log(f"  batch={batch_size} failed: {type(e).__name__}: {str(e)[:4000]}")
            continue

    if value is None:
        print(json.dumps({"metric": "pretrain_segments_per_sec_per_chip",
                          "value": 0.0, "unit": "segments/s/chip",
                          "vs_baseline": 0.0}))
        sys.exit(1)

    prev = _load_prev_baseline()
    vs = value / prev if prev else 1.0
    print(json.dumps({"metric": "pretrain_segments_per_sec_per_chip",
                      "value": round(value, 3), "unit": "segments/s/chip",
                      "vs_baseline": round(vs, 3)}))


def _apply_backend_knobs():
    """Backend knobs apply to EVERY bench mode (the training main() also
    reads them so standalone callers of main() keep working)."""
    if os.environ.get("BENCH_PALLAS_BWD"):  # 'pallas' | 'xla_recompute'
        import merlot_tpu.ops.pallas_attention as _pa
        _pa.BWD_MODE = os.environ["BENCH_PALLAS_BWD"]
    if os.environ.get("BENCH_GN"):  # 'auto' | 'xla' | 'pallas'
        import merlot_tpu.ops.pallas_groupnorm as _pgn
        _pgn.BACKEND = os.environ["BENCH_GN"]
        _pgn.TRAIN_BACKEND = os.environ["BENCH_GN"]
    if os.environ.get("BENCH_LN_BWD"):  # 'stats' | 'xhat'
        from merlot_tpu.ops import norms as _norms
        _norms.LN_BWD = os.environ["BENCH_LN_BWD"]
    if os.environ.get("BENCH_GN_BWD"):  # 'stats' | 'xhat'
        from merlot_tpu.ops import norms as _norms
        _norms.GN_BWD = os.environ["BENCH_GN_BWD"]


def _wait_for_device(max_wait_s: int = 1800, attempt_s: int = 300) -> None:
    """Block until the TPU answers a trivial op, retrying bounded probes.

    The axon tunnel can wedge for a long stretch (a TPU process killed
    mid-run — CLAUDE.md); while wedged, jax device init in THIS process
    would hang indefinitely and the whole bench run records nothing.
    Probing in a subprocess with a timeout keeps this process clean, and
    retrying converts 'driver happened to bench during a wedge' into
    'bench starts as soon as the device returns'. Raises after
    max_wait_s so the failure is a clear message, not a silent hang."""
    import subprocess
    import time as _t
    probe = ("import jax, jax.numpy as jnp;"
             "jax.config.update('jax_compilation_cache_dir','/tmp/jax_cache');"
             "x = jnp.ones((8, 8), jnp.bfloat16);"
             "print(float((x @ x).reshape(-1)[0]))")
    deadline = _t.time() + max_wait_s
    attempt = 0
    while True:
        attempt += 1
        try:
            r = subprocess.run([sys.executable, "-c", probe],
                               capture_output=True, timeout=attempt_s)
            if r.returncode == 0:
                if attempt > 1:
                    log(f"device answered on probe {attempt}")
                return
            log(f"device probe {attempt} failed rc={r.returncode}: "
                f"{r.stderr.decode(errors='replace')[-300:]}")
        except subprocess.TimeoutExpired:
            log(f"device probe {attempt} timed out after {attempt_s}s "
                "(tunnel wedged?)")
        if _t.time() >= deadline:
            raise RuntimeError(
                f"TPU unreachable after {max_wait_s}s of probing — "
                "not emitting a metric for a dead device")
        _t.sleep(30)


if __name__ == "__main__":
    if os.environ.get("BENCH_NO_DEVICE_WAIT") != "1":
        _wait_for_device()
    _apply_backend_knobs()
    _mode = os.environ.get("BENCH_MODE")
    if _mode == "vit":
        bench_vit_encode()
    elif _mode == "zeroshot":
        bench_zero_shot()
    elif _mode == "vcr":
        bench_vcr_eval()
    elif _mode == "grover":
        bench_grover_decode()
    else:
        main()
