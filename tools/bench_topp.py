"""Top-p sampler cost across entropy regimes (the staged per-row fallback).

VERDICT r3 #6 asked for a bench note at mixed-entropy batches: before the
staged fallback, ONE row whose nucleus exceeded k_prefilter forced the
full-vocab sort for the WHOLE batch every step (`jnp.all` gate). Now a
second top-k stage at 8*k serves mid-entropy rows, and only a row whose
nucleus exceeds 8*k triggers the full sort (a regime that indicates a
broken model — see models/grover.py::top_p_sample).

Regimes measured at [B, V=50270] fp32 logits, p=0.94 (serving default):
  peaked   — every row's nucleus fits in the top-1024 prefilter
  mixed    — B-1 peaked rows + 1 mid-entropy row (nucleus ~2.8k: stage 2)
  mid-all  — every row mid-entropy (stage 2 for all)
  uniform1 — B-1 peaked + 1 near-uniform row (nucleus ~47k: full sort;
             the deliberate remaining cliff)
  fullsort — k_prefilter=0 (the reference's literal algorithm, every row)

Timing: jitted sampler, host-transfer sync (axon: block_until_ready is a
no-op), min over reps. Run on the chip: python tools/bench_topp.py [B]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    from merlot_tpu.models.grover import top_p_sample

    b = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    v, p = 50270, 0.94

    rng = np.random.default_rng(0)
    base = rng.standard_normal((b, v)).astype(np.float32)

    def row(nucleus_n):
        """One row whose top-p nucleus needs ~0.94*nucleus_n tokens."""
        r = np.full((v,), -30.0, np.float32)
        r[rng.choice(v, nucleus_n, replace=False)] = \
            rng.standard_normal(nucleus_n).astype(np.float32) * 0.01
        return r

    peaked = base * 0.01
    peaked[:, :400] += 12.0  # nucleus ~376 << 1024
    mixed = peaked.copy()
    mixed[0] = row(3000)     # nucleus ~2.8k: > 1024, <= 8192
    mid_all = np.stack([row(3000) for _ in range(b)])
    uniform1 = peaked.copy()
    uniform1[0] = base[0] * 1e-4  # near-uniform: nucleus ~47k

    cases = [("peaked", peaked, 1024), ("mixed", mixed, 1024),
             ("mid-all", mid_all, 1024), ("uniform1", uniform1, 1024),
             ("fullsort", peaked, 0)]

    for name, logits_np, kpre in cases:
        logits = jnp.asarray(logits_np)
        fn = jax.jit(lambda k, lg, kp=kpre: top_p_sample(k, lg, p,
                                                         k_prefilter=kp))
        key = jax.random.PRNGKey(0)
        int(np.asarray(fn(key, logits))[0])  # compile + warm
        best = float("inf")
        for r in range(20):
            k = jax.random.fold_in(key, r)
            t0 = time.time()
            s = fn(k, logits)
            int(np.asarray(s)[0])
            best = min(best, time.time() - t0)
        print(f"  {name:9s} k_prefilter={kpre:5d}: {best * 1e3:7.3f} ms/call",
              flush=True)


if __name__ == "__main__":
    main()
