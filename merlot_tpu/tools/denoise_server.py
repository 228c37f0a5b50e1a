"""Grover ASR-denoising service (offline data-cleaning tool).

Parity target: data/groverdenoise/run_server.py (reference). The reference
is a Flask+gevent app around a TF session running ``sample_seq2seq``; this
is a stdlib ThreadingHTTPServer around the jitted JAX sampler (Flask isn't
in the image, and the endpoint contract is tiny):

  POST /api/ask  {"noisyasr": "...", "target": "cleanasr"|"noisyasr"}
    -> {"gen": cleaned_text, "ppl": context_perplexity}

Context format (reference: :52-71): ``<begintitle> noisy <endoftitle>
<beginarticle>`` then generate until ``<endofarticle>`` (nucleus p=0.94,
ctx truncated to the last 1280 tokens). Requests are logged to a JSONL.
"""

from __future__ import annotations

import argparse
import json
import os
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np


def extract_generated_target(output_tokens: np.ndarray, tokenizer,
                             begin_token: int, end_token: int) -> str:
    """Text between the first begin_token and the first end_token after it."""
    toks = list(output_tokens)
    start = toks.index(begin_token) + 1 if begin_token in toks else 0
    try:
        end = toks.index(end_token, start)
    except ValueError:
        end = len(toks)
    return tokenizer.decode([t for t in toks[start:end]
                             if t in tokenizer.decoder]).strip()


class Denoiser:
    """Loads the LM once; denoise() is the whole inference path."""

    def __init__(self, config_path: str, ckpt_path: Optional[str] = None,
                 max_len: int = 1537, top_p: float = 0.94,
                 max_ctx: int = 1280, bf16: bool = False,
                 k_prefilter: int = 1024, tp: int = 1,
                 fuse_qkv: bool = True):
        import dataclasses
        import jax
        from merlot_tpu.core.tokenizer import get_grover_tokenizer
        from merlot_tpu.models.grover import GroverConfig, GroverLM

        self.tok = get_grover_tokenizer()
        self.cfg = GroverConfig.from_json_file(config_path)
        if bf16:  # serving fast path: bf16 matrices + KV cache (~2.5x decode)
            self.cfg = dataclasses.replace(self.cfg, use_bfloat16=True)
        # one [H,3H] qkv matmul per layer instead of three (bit-identical
        # logits; fewer decode-step dispatches). Off under TP: the mesh
        # rules shard the three projections head-wise individually.
        self.fuse_qkv = fuse_qkv and tp == 1
        if self.fuse_qkv:
            # stacked_kv rides along: one [B,L,2H] cache buffer per layer,
            # written as a contiguous slice of the fused qkv output and
            # read directly by the cached-attention kernel (cache layout
            # only — no param change). Off under TP with fused_qkv.
            self.cfg = dataclasses.replace(self.cfg, fused_qkv=True,
                                           stacked_kv=True)
        self.model = GroverLM(self.cfg)
        self.max_len = max_len
        self.top_p = top_p
        self.max_ctx = max_ctx
        self.bf16 = bf16
        self.k_prefilter = k_prefilter
        self._samplers = {}
        self._key = jax.random.PRNGKey(int(time.time()))

        if ckpt_path:
            from merlot_tpu.train.checkpoint import CheckpointManager
            import orbax.checkpoint as ocp
            state = ocp.StandardCheckpointer().restore(os.path.abspath(ckpt_path))
            self.params = {"params": state.get("params", state)}
        else:  # random weights (smoke/serving-harness tests)
            import jax.numpy as jnp
            ids = jnp.zeros((1, 8), jnp.int32)
            self.params = self.model.init(jax.random.PRNGKey(0), ids)
        if self.fuse_qkv:
            from merlot_tpu.models.grover import fuse_qkv_for_serving
            self.params = fuse_qkv_for_serving(self.params)  # no-op if fused
        if bf16:
            from merlot_tpu.models.grover import cast_params_for_serving
            self.params = cast_params_for_serving(self.params)
        if tp > 1:
            # tensor-parallel serving: per-layer matmuls shard over a
            # model axis (parallel/mesh.py grover rules); GSPMD partitions
            # the jitted sampler and inserts the ICI collectives
            from merlot_tpu.parallel.mesh import make_mesh, shard_params
            mesh = make_mesh(data=1, model=tp,
                             devices=jax.devices()[:tp])
            self.params = shard_params(self.params, mesh)

    def _sampler(self, prefix_len: int, eos_token: int):
        from merlot_tpu.models.grover import make_seq2seq_sampler
        key = (prefix_len, eos_token)
        if key not in self._samplers:
            self._samplers[key] = make_seq2seq_sampler(
                self.model, max_len=self.max_len, prefix_len=prefix_len,
                p_for_topp=self.top_p, eos_token=eos_token,
                k_prefilter=self.k_prefilter)
        return self._samplers[key]

    def denoise(self, noisyasr: str, target: str = "cleanasr"):
        import jax
        tok = self.tok
        ctx = [tok.begin_title] + tok.encode(noisyasr)
        if target == "noisyasr":
            eos = tok.end_title
        else:
            ctx += [tok.end_title, tok.begin_article]
            eos = tok.end_article
        ctx = ctx[-self.max_ctx:]

        # bucket prefix lengths to bound recompilation
        prefix_len = max(8, 1 << (len(ctx) - 1).bit_length())
        prefix_len = min(prefix_len, self.max_len - 16)
        padded = np.zeros((1, prefix_len), np.int32)
        # left-fill actual ctx; pad-forcing begins after prefix
        if len(ctx) < prefix_len:
            padded[0, :len(ctx)] = ctx
            # everything after len(ctx) in the prefix must be generated, so
            # shrink the prefix to the context instead
            prefix_len = len(ctx)
            padded = np.asarray([ctx], np.int32)
        else:
            padded[0] = ctx[:prefix_len]

        sampler = self._sampler(prefix_len, eos)
        self._key, sub = jax.random.split(self._key)
        tokens, probs = sampler(self.params, padded, sub)
        tokens = np.asarray(tokens[0])
        probs = np.asarray(probs[0])

        field = "title" if target == "noisyasr" else "article"
        begin = getattr(tok, f"begin_{field}")
        end = getattr(tok, f"end_{field}")
        text = extract_generated_target(tokens, tok, begin, end)
        ctx_p = probs[1:max(len(ctx) - 1, 1) + 1]
        ctx_p = ctx_p[ctx_p > 0]
        ppl = float(np.exp(-np.mean(np.log(ctx_p)))) if len(ctx_p) else float("inf")
        return text, ppl


def make_handler(denoiser: Denoiser, log_path: str):
    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            if self.path != "/api/ask":
                self.send_error(404)
                return
            length = int(self.headers.get("Content-Length", 0))
            instance = json.loads(self.rfile.read(length) or "{}")
            target = instance.get("target", "cleanasr")
            text, ppl = denoiser.denoise(instance.get("noisyasr", ""), target)
            record = {**instance, target: text, "ppl": ppl,
                      "top_p": denoiser.top_p}
            with open(log_path, "a") as f:
                f.write(json.dumps(record) + "\n")
            body = json.dumps({"instance": instance, "gen": text,
                               "ppl": ppl}).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, fmt, *args):
            print(f"[denoise-server] {fmt % args}", flush=True)

    return Handler


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", required=True,
                    help="GroverConfig json (e.g. medium: 24L/1024H)")
    ap.add_argument("--ckpt", default=None, help="orbax checkpoint path")
    ap.add_argument("--port", type=int, default=5000)
    ap.add_argument("--max_len", type=int, default=1537)
    ap.add_argument("--top_p", type=float, default=0.94)
    ap.add_argument("--bf16", action="store_true",
                    help="bf16-stored weights + KV cache (~2.5x decode)")
    ap.add_argument("--k_prefilter", type=int, default=1024,
                    help="top-p sort prefilter (0 = full-vocab sort)")
    ap.add_argument("--tp", type=int, default=1,
                    help="tensor-parallel degree over visible devices")
    ap.add_argument("--no_fuse_qkv", action="store_true",
                    help="keep the three separate q/k/v projections "
                         "(fused [H,3H] is bit-identical and default)")
    ap.add_argument("--log", default="denoise_log.jsonl")
    args = ap.parse_args(argv)

    denoiser = Denoiser(args.config, args.ckpt, max_len=args.max_len,
                        top_p=args.top_p, bf16=args.bf16,
                        k_prefilter=args.k_prefilter, tp=args.tp,
                        fuse_qkv=not args.no_fuse_qkv)
    server = ThreadingHTTPServer(("0.0.0.0", args.port),
                                 make_handler(denoiser, args.log))
    print(f"READY FOR GENERATION on :{args.port}", flush=True)
    server.serve_forever()


if __name__ == "__main__":
    main()
