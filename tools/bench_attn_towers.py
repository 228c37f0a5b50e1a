"""Standalone tower probes for attention-backend A/Bs on the real chip.

Runs fwd+bwd of the ViT tower (S=266, unmasked) and the joint tower
(S=396, masked) at the B8 training shapes with a selectable attention
backend — the decomposition PERF.md uses to attribute train-step deltas
("standalone joint-tower probe pallas 84.9 vs XLA 78.5 ms").

Usage (on the chip):
    python tools/bench_attn_towers.py [xla|pallas] [vit|joint|lang|all]

Timing is host-transfer synced (block_until_ready is a no-op over the
axon tunnel — CLAUDE.md).
"""

from __future__ import annotations

import sys
import time

import numpy as np


def _host_sync(out):
    leaves = [x for x in __import__("jax").tree_util.tree_leaves(out)
              if hasattr(x, "reshape")]
    return float(leaves[0].reshape(-1)[0])


def bench(f, *args, n=8):
    _host_sync(f(*args))  # compile + warm
    _host_sync(f(*args))
    t0 = time.time()
    for _ in range(n):
        out = f(*args)
    _host_sync(out)
    return (time.time() - t0) / n * 1000.0


def main():
    backend = sys.argv[1] if len(sys.argv) > 1 else "pallas"
    which = sys.argv[2] if len(sys.argv) > 2 else "all"
    B = 8

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from merlot_tpu.nn.transformer import (TransformerEncoder,
                                           TransformerHParams)

    hp = TransformerHParams(hidden_size=768, num_layers=12, num_heads=12,
                            intermediate_size=3072, hidden_dropout_prob=0.0,
                            dtype=jnp.bfloat16)
    enc = TransformerEncoder(hp)
    rng = np.random.default_rng(0)
    print(f"backend={backend} B={B}", flush=True)

    def probe(name, bsz, s, masked, collect="none"):
        x = jnp.asarray(rng.standard_normal((bsz, s, 768)), jnp.bfloat16)
        m = jnp.ones((bsz, s, s), jnp.float32) if masked else None
        v = jax.jit(lambda x, m: enc.init(jax.random.PRNGKey(0), x, m))(x, m)

        def loss(v, x, m):
            out = enc.apply(v, x, m, collect=collect,
                            attn_backend=backend)["hidden_state"]
            return jnp.sum(out.astype(jnp.float32) ** 2)

        t_f = bench(jax.jit(lambda v, x, m: enc.apply(
            v, x, m, collect=collect,
            attn_backend=backend)["hidden_state"]), v, x, m)
        t_fb = bench(jax.jit(jax.grad(loss, argnums=0)), v, x, m)
        print(f"{name:14s} fwd {t_f:7.2f} ms   fwd+bwd {t_fb:7.2f} ms",
              flush=True)

    if which in ("vit", "all"):
        probe("vit  [128,266]", B * 16, 266, masked=False)
    if which in ("joint", "all"):
        probe("joint [32,396]", B * 4, 396, masked=True)
    if which in ("lang", "all"):
        probe("lang  [8,512]c", B, 512, masked=True, collect="colsum")


if __name__ == "__main__":
    main()
