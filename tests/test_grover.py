"""Grover LM: forward/loss, cached-vs-uncached equivalence, seq2seq sampler,
tokenizer layout, denoiser service."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from merlot_tpu.core.tokenizer import get_grover_tokenizer
from merlot_tpu.models.grover import (GroverConfig, GroverLM,
                                      grover_lm_loss, make_seq2seq_sampler,
                                      top_k_sample, top_p_sample)

TINY = GroverConfig(vocab_size=50270, hidden_size=32, num_hidden_layers=2,
                    num_attention_heads=2, intermediate_size=64,
                    max_position_embeddings=64, hidden_dropout_prob=0.0,
                    attention_probs_dropout_prob=0.0)


def test_grover_tokenizer_layout():
    tok = get_grover_tokenizer()
    assert tok.padding == 0
    assert tok.padded_vocab_size == 50270           # matches medium.json
    assert tok.begin_title == 50263 and tok.end_title == 50264
    assert tok.begin_article == 50265 and tok.end_article == 50266
    assert tok.reset_context == 50269
    assert "<|endoftext|>" not in tok.encoder
    # +1 offset roundtrip
    ids = tok.encode("hello world")
    assert tok.decode(ids) == "hello world"
    oh = tok.special_tokens_onehot
    assert len(oh) == 50270 and oh[0] == 1 and oh[50263] == 1 and oh[500] == 0


def test_forward_and_loss(rng):
    model = GroverLM(TINY)
    ids = jnp.asarray(rng.integers(1, 50257, (2, 10)), jnp.int32)
    variables = jax.jit(lambda i: model.init(jax.random.PRNGKey(0), i))(ids)
    logits, cache = jax.jit(lambda v, i: model.apply(v, i))(variables, ids)
    assert logits.shape == (2, 10, 50270)
    assert cache is None
    is_target = jnp.zeros((2, 10), jnp.int32).at[:, 5:].set(1)
    loss, metrics = grover_lm_loss(logits, ids, is_target)
    assert np.isfinite(float(loss))
    assert abs(float(loss) - np.log(50270)) < 1.0  # chance level
    assert float(metrics["trg_loss"]) > float(metrics["ctx_loss"])  # x4 bonus


def test_bf16_head_delta(rng):
    """Quantifies the logits shift from the bf16-operand tied head
    (lm_logits_for_hidden): for use_bfloat16 configs the embedding table
    is rounded to bf16 before the matmul — the reference's bfloat16-getter
    contract — so vs a hypothetical fp32-table head the delta must stay
    within one bf16 rounding of the operands (advisor round-2 note)."""
    from merlot_tpu.models.grover import lm_logits_for_hidden
    table = jnp.asarray(rng.normal(0, 0.02, (503, 32)), jnp.float32)
    h = jnp.asarray(rng.normal(0, 1.0, (4, 7, 32)), jnp.bfloat16)
    cfg = GroverConfig(vocab_size=503, hidden_size=32, num_hidden_layers=1,
                       num_attention_heads=2, intermediate_size=64,
                       max_position_embeddings=16, use_bfloat16=True)
    bf16_head = lm_logits_for_hidden({"params": {"word_embed": table}}, cfg, h)
    fp32_head = jnp.dot(h.astype(jnp.float32), table.T)
    # one bf16 rounding of the table (rel err <= 2^-8) accumulated over H=32
    delta = np.abs(np.asarray(bf16_head - fp32_head))
    scale = np.abs(np.asarray(fp32_head)) + np.sqrt(32) * 0.02
    assert (delta / scale).max() < 2 ** -7
    # and the bf16 head must be exactly what serving computes: bf16 table
    # operand, fp32 accumulate
    manual = jnp.dot(h, table.astype(jnp.bfloat16).T,
                     preferred_element_type=jnp.float32)
    np.testing.assert_array_equal(np.asarray(bf16_head), np.asarray(manual))


def test_cached_decode_matches_full_forward(rng):
    """Prefill+single-step cached logits == full uncached forward logits."""
    model = GroverLM(TINY)
    ids = jnp.asarray(rng.integers(1, 50257, (2, 9)), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), ids)

    full_logits, _ = jax.jit(lambda v, i: model.apply(v, i))(variables, ids)

    cache = model.empty_cache(2, 16)
    pre_logits, cache = jax.jit(
        lambda v, i, c: model.apply(v, i, cache=c, position_offset=0))(
        variables, ids[:, :6], cache)
    np.testing.assert_allclose(np.asarray(pre_logits),
                               np.asarray(full_logits[:, :6]),
                               rtol=2e-4, atol=2e-4)
    # decode tokens 6,7,8 one at a time
    step = jax.jit(lambda v, i, c, o: model.apply(v, i, cache=c,
                                                  position_offset=o))
    for t in range(6, 9):
        logits_t, cache = step(variables, ids[:, t:t + 1], cache, t)
        np.testing.assert_allclose(np.asarray(logits_t[:, 0]),
                                   np.asarray(full_logits[:, t]),
                                   rtol=2e-4, atol=2e-4)


def test_fused_qkv_parity(rng):
    """fuse_qkv_for_serving + fused_qkv=True reproduces the unfused
    logits bit-for-bit (column concat does not change any reduction)."""
    import dataclasses

    from merlot_tpu.models.grover import fuse_qkv_for_serving
    model = GroverLM(TINY)
    ids = jnp.asarray(rng.integers(1, 50257, (2, 9)), jnp.int32)
    variables = jax.jit(lambda i: model.init(jax.random.PRNGKey(0), i))(ids)
    ref, _ = jax.jit(lambda v, i: model.apply(v, i))(variables, ids)

    fused_model = GroverLM(dataclasses.replace(TINY, fused_qkv=True))
    fused_vars = fuse_qkv_for_serving(variables)
    # the fused tree is exactly what a fused-config init would produce
    want = jax.eval_shape(
        lambda: fused_model.init(jax.random.PRNGKey(0), ids))
    got_paths = jax.tree_util.tree_structure(fused_vars)
    assert got_paths == jax.tree_util.tree_structure(want)
    out, _ = jax.jit(lambda v, i: fused_model.apply(v, i))(fused_vars, ids)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    # and through the cached decode path
    cache = fused_model.empty_cache(2, 16)
    pre, cache = jax.jit(lambda v, i, c: fused_model.apply(
        v, i, cache=c, position_offset=0))(fused_vars, ids[:, :6], cache)
    np.testing.assert_allclose(np.asarray(pre), np.asarray(ref[:, :6]),
                               rtol=2e-4, atol=2e-4)


def test_decode_attn_pallas_matches_xla(rng):
    """The fused serving-attention kernel (DECODE_ATTN='pallas', interpret
    mode) matches the einsum path on cached prefill + decode steps."""
    from jax.experimental.pallas import tpu as pltpu

    from merlot_tpu.models import grover as grover_mod
    model = GroverLM(TINY)
    ids = jnp.asarray(rng.integers(1, 50257, (2, 9)), jnp.int32)
    variables = jax.jit(lambda i: model.init(jax.random.PRNGKey(0), i))(ids)

    def drive():
        cache = model.empty_cache(2, 16)
        pre, cache = jax.jit(lambda v, i, c: model.apply(
            v, i, cache=c, position_offset=0))(variables, ids[:, :6], cache)
        outs = [pre]
        step = jax.jit(lambda v, i, c, o: model.apply(v, i, cache=c,
                                                      position_offset=o))
        for t in range(6, 9):
            lt, cache = step(variables, ids[:, t:t + 1], cache, t)
            outs.append(lt)
        return [np.asarray(o) for o in outs]

    assert grover_mod.DECODE_ATTN == "auto"
    ref = drive()                                   # CPU -> einsum path
    grover_mod.DECODE_ATTN = "pallas"
    try:
        with pltpu.force_tpu_interpret_mode():
            got = drive()
    finally:
        grover_mod.DECODE_ATTN = "auto"
    for r, g in zip(ref, got):
        np.testing.assert_allclose(g, r, rtol=2e-4, atol=2e-4)


def test_stacked_kv_matches_flat(rng):
    """cfg.stacked_kv (one [B,L,2H] cache buffer per layer) is a cache
    LAYOUT change only: prefill + decode logits match the flat k/v cache
    on the einsum path, with and without fused_qkv, and on the pallas
    kernel path (interpret mode)."""
    import dataclasses

    from jax.experimental.pallas import tpu as pltpu

    from merlot_tpu.models import grover as grover_mod
    from merlot_tpu.models.grover import fuse_qkv_for_serving

    model = GroverLM(TINY)
    ids = jnp.asarray(rng.integers(1, 50257, (2, 9)), jnp.int32)
    variables = jax.jit(lambda i: model.init(jax.random.PRNGKey(0), i))(ids)

    def drive(m, v):
        cache = m.empty_cache(2, 16)
        pre, cache = jax.jit(lambda vv, i, c: m.apply(
            vv, i, cache=c, position_offset=0))(v, ids[:, :6], cache)
        outs = [pre]
        step = jax.jit(lambda vv, i, c, o: m.apply(vv, i, cache=c,
                                                   position_offset=o))
        for t in range(6, 9):
            lt, cache = step(v, ids[:, t:t + 1], cache, t)
            outs.append(lt)
        return [np.asarray(o) for o in outs]

    ref = drive(model, variables)                   # flat cache, einsum

    stacked = GroverLM(dataclasses.replace(TINY, stacked_kv=True))
    for r, g in zip(ref, drive(stacked, variables)):
        np.testing.assert_allclose(g, r, rtol=2e-5, atol=2e-5)

    both = GroverLM(dataclasses.replace(TINY, stacked_kv=True,
                                        fused_qkv=True))
    fused_vars = fuse_qkv_for_serving(variables)
    for r, g in zip(ref, drive(both, fused_vars)):
        np.testing.assert_allclose(g, r, rtol=2e-5, atol=2e-5)

    # pallas cached-attention kernel reads the stacked buffer directly
    grover_mod.DECODE_ATTN = "pallas"
    try:
        with pltpu.force_tpu_interpret_mode():
            got = drive(both, fused_vars)
    finally:
        grover_mod.DECODE_ATTN = "auto"
    for r, g in zip(ref, got):
        np.testing.assert_allclose(g, r, rtol=2e-4, atol=2e-4)


def test_top_p_semantics():
    # distribution [0.5, 0.3, 0.15, 0.05]; p=0.6 keeps {0, 1} (cumsum 0.5<0.6
    # keeps rank0; 0.8>0.6 excludes rank1? reference keeps cumulative<p ->
    # rank1 has cumsum 0.8 NOT < 0.6 -> excluded; rank0 always kept)
    logits = jnp.log(jnp.asarray([[0.5, 0.3, 0.15, 0.05]] * 2000))
    samples = np.asarray(top_p_sample(jax.random.PRNGKey(0), logits, p=0.6))
    assert set(np.unique(samples)) == {0}
    # p=0.81: cumsum ranks = (0.5, 0.8, 0.95); 0.5<0.81 and 0.8<0.81 keep {0,1}
    samples = np.asarray(top_p_sample(jax.random.PRNGKey(1), logits, p=0.81))
    assert set(np.unique(samples)) == {0, 1}
    # ignore_ids suppresses index 0 entirely
    ign = jnp.asarray([1, 0, 0, 0], bool)
    samples = np.asarray(top_p_sample(jax.random.PRNGKey(2), logits, p=0.999,
                                      ignore_ids=ign))
    assert 0 not in samples
    samples = np.asarray(top_k_sample(jax.random.PRNGKey(3), logits, k=2))
    assert set(np.unique(samples)) <= {0, 1}


def test_top_p_prefilter_matches_full_sort():
    """The lax.top_k prefiltered nucleus path: identical kept set when the
    nucleus fits in k, and bit-identical fallback to the full sort when it
    does not (the lax.cond branch calls the full path with the same key)."""
    from merlot_tpu.models.grover import _top_p_full_sort
    logits = jnp.log(jnp.asarray([[0.5, 0.3, 0.15, 0.05]] * 500))
    # nucleus {0} fits in k=2 (csum[1]=0.8 >= 0.6): fast path, kept set {0}
    s = np.asarray(top_p_sample(jax.random.PRNGKey(0), logits, p=0.6,
                                k_prefilter=2))
    assert set(np.unique(s)) == {0}
    # nucleus {0,1} exactly fills k=2 (csum[1]=0.8 >= 0.81 is False ->
    # cannot prove it fits): fallback must BIT-match the full sort
    s_pre = top_p_sample(jax.random.PRNGKey(1), logits, p=0.81, k_prefilter=2)
    s_full = _top_p_full_sort(jax.random.PRNGKey(1), logits, p=0.81)
    np.testing.assert_array_equal(np.asarray(s_pre), np.asarray(s_full))
    # wide-nucleus random logits, k covers it: kept set == full-sort kept set
    rng = np.random.default_rng(0)
    wide = jnp.asarray(rng.normal(0, 2, (4, 300)), jnp.float32)
    for key in range(20):
        a = np.asarray(top_p_sample(jax.random.PRNGKey(key), wide, p=0.9,
                                    k_prefilter=128))
        probs = np.asarray(jax.nn.softmax(wide, -1))
        for row, tok in enumerate(a):
            order = np.argsort(-probs[row])
            csum = np.cumsum(probs[row][order])
            kept = set(order[(csum < 0.9)]) | {order[0]}
            assert int(tok) in kept


def test_top_p_per_row_mixed_entropy():
    """ADVICE r3 item 3 / VERDICT r3 #6: with rows of mixed entropy in one
    batch, each row's sample must (a) stay inside that row's reference
    kept set and (b) follow the reference's renormalized distribution —
    even though the rows are served by different stages (k, 8k, full
    sort) of the staged per-row fallback."""
    V, k1, p = 256, 8, 0.9          # k2 = 64
    probs = np.full((3, V), 1e-9)
    probs[0, :6] = 0.5 ** np.arange(1, 7)       # peaked: nucleus ~4 < k1
    probs[1, :32] = 1.0 / 32                    # medium: nucleus ~29 in (8, 64]
    probs[2, :] = 1.0 / V                       # wide: nucleus ~230 > 64
    probs /= probs.sum(-1, keepdims=True)
    logits = jnp.asarray(np.log(probs), jnp.float32)

    # reference kept sets + renormalized distributions (pure numpy)
    kept_sets, ref_dists = [], []
    for row in range(3):
        order = np.argsort(-probs[row], kind="stable")
        csum = np.cumsum(probs[row][order])
        keep = (csum < p)
        keep[0] = True
        kept = order[keep]
        kept_sets.append(set(int(t) for t in kept))
        d = np.zeros(V)
        d[kept] = probs[row][kept] / probs[row][kept].sum()
        ref_dists.append(d)
    # the rows really exercise three different stages
    assert len(kept_sets[0]) <= k1
    assert k1 < len(kept_sets[1]) <= 8 * k1
    assert len(kept_sets[2]) > 8 * k1

    n = 1500
    keys = jax.random.split(jax.random.PRNGKey(7), n)
    sample_many = jax.jit(jax.vmap(
        lambda k: top_p_sample(k, logits, p=p, k_prefilter=k1)))
    samples = np.asarray(sample_many(keys))     # [n, 3]
    for row in range(3):
        got = samples[:, row]
        assert set(int(t) for t in np.unique(got)) <= kept_sets[row], \
            f"row {row}: sample outside the reference kept set"
        emp = np.bincount(got, minlength=V) / n
        tv = 0.5 * np.abs(emp - ref_dists[row]).sum()
        # expected TV from pure sampling noise over a K-token support is
        # ~0.5*sqrt(2K/(pi*n)); allow 1.5x that plus slack — still far
        # below the TV of sampling the wrong set or unrenormalized weights
        k_row = len(kept_sets[row])
        tol = 0.75 * np.sqrt(2 * k_row / (np.pi * n)) + 0.02
        assert tv < tol, f"row {row}: TV {tv:.3f} >= tol {tol:.3f}"


def test_seq2seq_sampler_force_feeds_context(rng):
    model = GroverLM(TINY)
    ids0 = jnp.asarray(rng.integers(1, 50257, (2, 8)), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), ids0)

    # context rows: 6 real tokens then pads (to be generated)
    ctx = np.zeros((2, 8), np.int32)
    ctx[:, :6] = np.asarray(rng.integers(1, 50257, (2, 6)))
    # row 0 has an extra forced token at position 7
    ctx[0, 7] = 1234

    sampler = make_seq2seq_sampler(model, max_len=16, prefix_len=6,
                                   p_for_topp=0.95, eos_token=50266)
    tokens, probs = sampler(variables, jnp.asarray(ctx), jax.random.PRNGKey(7))
    tokens = np.asarray(tokens)
    assert tokens.shape == (2, 16)
    np.testing.assert_array_equal(tokens[:, :6], ctx[:, :6])  # prefix kept
    assert tokens[0, 7] == 1234                               # force-fed
    assert (tokens[:, 6] != 0).all()                          # sampled
    probs = np.asarray(probs)
    assert ((probs >= 0) & (probs <= 1)).all()

    # pure-generation mode: identical token stream (the prob chain draws
    # no random bits), probs suppressed (VERDICT r4 #6)
    sampler_np = make_seq2seq_sampler(model, max_len=16, prefix_len=6,
                                      p_for_topp=0.95, eos_token=50266,
                                      report_probs=False)
    tokens2, probs2 = sampler_np(variables, jnp.asarray(ctx),
                                 jax.random.PRNGKey(7))
    np.testing.assert_array_equal(np.asarray(tokens2), tokens)
    assert (np.asarray(probs2) == 0).all()


def test_denoiser_service_roundtrip(tmp_path):
    """Drive the HTTP service end-to-end with a tiny random model."""
    import threading
    import urllib.request
    from http.server import ThreadingHTTPServer
    from merlot_tpu.tools.denoise_server import Denoiser, make_handler

    cfg_path = str(tmp_path / "tiny.json")
    with open(cfg_path, "w") as f:
        json.dump({"vocab_size": 50270, "hidden_size": 32,
                   "num_hidden_layers": 2, "num_attention_heads": 2,
                   "intermediate_size": 64, "max_position_embeddings": 128},
                  f)
    den = Denoiser(cfg_path, None, max_len=64, top_p=0.94, max_ctx=32)
    server = ThreadingHTTPServer(("127.0.0.1", 0),
                                 make_handler(den, str(tmp_path / "log.jsonl")))
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/api/ask",
            data=json.dumps({"noisyasr": "so today were gonna make pasta"}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=300) as resp:
            out = json.loads(resp.read())
        assert "gen" in out and "ppl" in out
        assert isinstance(out["gen"], str)
        # log written
        log = (tmp_path / "log.jsonl").read_text().strip()
        assert "cleanasr" in log
    finally:
        server.shutdown()


def test_grover_tp_decode_matches_single_device():
    """Tensor-parallel serving: grover params sharded over a (data, model)
    mesh produce the same decode-step logits as unsharded execution, and
    the compiled module really lowers to collectives."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from merlot_tpu.parallel.mesh import make_mesh, shard_params

    cfg = GroverConfig(vocab_size=503, hidden_size=32, num_hidden_layers=2,
                       num_attention_heads=4, intermediate_size=64,
                       max_position_embeddings=32)
    model = GroverLM(cfg)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(1, 500, (2, 6)), jnp.int32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), ids)

    step = jax.jit(lambda v, i, c, o: model.apply(v, i, cache=c,
                                                  position_offset=o),
                   static_argnums=3)
    cache = model.empty_cache(2, 16)
    plain_logits, _ = step(variables, ids, cache, 0)

    mesh = make_mesh(data=2, model=4)
    with mesh:
        v_tp = shard_params(variables, mesh)
        # heads are TP-sharded; shard the cache the same way
        cache_s = jax.tree.map(
            lambda x: jax.device_put(
                x, NamedSharding(mesh, P(None, None, "model", None))),
            model.empty_cache(2, 16))
        ids_s = jax.device_put(ids, NamedSharding(mesh, P("data")))
        tp_logits, _ = step(v_tp, ids_s, cache_s, 0)
        lowered = jax.jit(
            lambda v, i, c: model.apply(v, i, cache=c, position_offset=0)
        ).lower(v_tp, ids_s, cache_s).compile()
        hlo = lowered.as_text()
    assert ("all-reduce" in hlo or "all-gather" in hlo
            or "reduce-scatter" in hlo or "collective" in hlo)
    np.testing.assert_allclose(np.asarray(tp_logits),
                               np.asarray(plain_logits), rtol=2e-4, atol=2e-4)


def test_denoiser_dynamic_batching(tmp_path):
    """Concurrent requests coalesce into one batched sampler call: all
    succeed, and the engine served more requests than sampler calls."""
    import threading
    import urllib.request
    from http.server import ThreadingHTTPServer
    from merlot_tpu.tools.denoise_server import Denoiser, make_handler

    cfg_path = str(tmp_path / "tiny.json")
    with open(cfg_path, "w") as f:
        json.dump({"vocab_size": 50270, "hidden_size": 32,
                   "num_hidden_layers": 2, "num_attention_heads": 2,
                   "intermediate_size": 64, "max_position_embeddings": 128},
                  f)
    # wide window so the CPU-slow first compile can't split the batch
    den = Denoiser(cfg_path, None, max_len=64, top_p=0.94, max_ctx=32,
                   batch_window_ms=3000.0, max_batch=4)
    assert den.engine is not None
    server = ThreadingHTTPServer(("127.0.0.1", 0),
                                 make_handler(den, str(tmp_path / "log.jsonl")))
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()

    results, errors = [], []

    def ask(text):
        try:
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/api/ask",
                data=json.dumps({"noisyasr": text}).encode(),
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req, timeout=600) as resp:
                results.append(json.loads(resp.read()))
        except Exception as e:  # pragma: no cover
            errors.append(e)

    try:
        # different context lengths: the batch takes the min-row prefill
        # and force-feeds the longer rows' surplus
        threads = [threading.Thread(
            target=ask, args=(f"recipe number {i} " + "pasta " * i,))
            for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=600)
        assert not errors, errors
        assert len(results) == 4
        assert all("gen" in r and "ppl" in r for r in results)
        # the whole point: fewer sampler calls than requests
        assert den.engine.requests == 4
        assert den.engine.calls < 4, (den.engine.calls, den.engine.requests)
    finally:
        server.shutdown()


def test_denoiser_stats_endpoint(tmp_path):
    import threading
    import urllib.request
    from http.server import ThreadingHTTPServer
    from merlot_tpu.tools.denoise_server import Denoiser, make_handler

    cfg_path = str(tmp_path / "tiny.json")
    with open(cfg_path, "w") as f:
        json.dump({"vocab_size": 50270, "hidden_size": 32,
                   "num_hidden_layers": 2, "num_attention_heads": 2,
                   "intermediate_size": 64, "max_position_embeddings": 128},
                  f)
    den = Denoiser(cfg_path, None, max_len=64, top_p=0.94, max_ctx=32)
    server = ThreadingHTTPServer(("127.0.0.1", 0),
                                 make_handler(den, str(tmp_path / "l.jsonl")))
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/stats", timeout=60) as resp:
            out = json.loads(resp.read())
        assert out["sampler_calls"] == 0 and out["top_p"] == 0.94
    finally:
        server.shutdown()


def test_denoiser_loads_pp_checkpoint(tmp_path):
    """A checkpoint written by a pipeline-parallel training run (stacked
    'stages' form) loads transparently into the serving path."""
    import orbax.checkpoint as ocp

    from merlot_tpu.models.grover import stack_grover_params
    from merlot_tpu.tools.denoise_server import Denoiser

    cfg_path = str(tmp_path / "tiny.json")
    with open(cfg_path, "w") as f:
        json.dump({"vocab_size": 50270, "hidden_size": 32,
                   "num_hidden_layers": 2, "num_attention_heads": 2,
                   "intermediate_size": 64, "max_position_embeddings": 128},
                  f)
    model = GroverLM(GroverConfig(
        vocab_size=50270, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=128))
    ids = jnp.zeros((1, 8), jnp.int32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), ids)
    pp = stack_grover_params(variables, 2)
    ckpt = tmp_path / "ckpt"
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(str(ckpt), {"params": jax.device_get(pp["params"])})
    ckptr.wait_until_finished()

    den = Denoiser(cfg_path, str(ckpt), max_len=64, max_ctx=32,
                   batch_window_ms=0.0)
    assert "layer00" in den.params["params"]
    assert "stages" not in den.params["params"]
    text, ppl = den.denoise("check the weather")
    assert isinstance(text, str) and np.isfinite(ppl) or ppl == float("inf")
