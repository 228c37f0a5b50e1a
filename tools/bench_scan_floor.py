"""Measure the per-iteration floor of lax.scan on the axon backend.

Both scan-amortized probes (bench_convs v2, bench_vit_ops) show every
class under ~40 GF pinned at ~0.85-1.0 ms per scan iteration regardless
of FLOPs — a per-ITERATION floor, not the known ~2 ms per-LAUNCH floor.
This probe isolates it:

  1. trivial body (scalar add) at n=30 and n=60 — if time/iter is flat
     across n, the cost is per-iteration, not per-launch;
  2. lang-proj matmul body with an in-body serial CHAIN of R ops
     (R = 1, 8) — the slope (t_8 - t_1)/7 is the true per-op time with
     the floor subtracted out.

Usage (chip): python tools/bench_scan_floor.py
"""

from __future__ import annotations

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    n = 30
    rng = np.random.default_rng(0)

    def timed(fn, *args):
        out = fn(*args)
        float(out)
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            out = fn(*args)
            float(out)
            best = min(best, time.time() - t0)
        return best

    def trivial_scan(length):
        def loop(x):
            def body(acc, _):
                return acc + x.reshape(-1)[0].astype(jnp.float32) * 1e-20, ()
            acc, _ = lax.scan(body, jnp.float32(0), None, length=length)
            return acc
        return jax.jit(loop)

    x1 = jnp.ones((8, 8), jnp.bfloat16)
    for length in (30, 60):
        t = timed(trivial_scan(length), x1)
        print(f"trivial scan n={length}: total {t * 1e3:7.2f} ms, "
              f"per-iter {t / length * 1e3:6.3f} ms", flush=True)

    # lang proj class: [4096,768] @ [768,768], serial chain of R in-body
    m, h = 4096, 768
    x = jnp.asarray(rng.standard_normal((m, h)), jnp.bfloat16)
    ws = [jnp.asarray(rng.standard_normal((h, h)) * 0.02, jnp.bfloat16)
          for _ in range(8)]

    def chain_scan(r):
        def loop(x, *ws):
            def body(acc, _):
                y = x * (1.0 + acc * 1e-30).astype(x.dtype)
                for w in ws[:r]:
                    y = jnp.dot(y, w, preferred_element_type=jnp.bfloat16)
                return acc + y.reshape(-1)[0].astype(jnp.float32) * 1e-20, ()
            acc, _ = lax.scan(body, jnp.float32(0), None, length=n)
            return acc
        return jax.jit(loop)

    gflop = 2 * m * h * h / 1e9
    ts = {}
    for r in (1, 8):
        t = timed(chain_scan(r), x, *ws) / n
        ts[r] = t
        print(f"lang proj chain R={r}: {t * 1e3:6.3f} ms/iter "
              f"({r * gflop / 1e3 / t:5.1f} TF/s naive)", flush=True)
    slope = (ts[8] - ts[1]) / 7
    print(f"slope per-op: {slope * 1e3:6.3f} ms = {gflop / 1e3 / slope:5.1f}"
          f" TF/s; implied per-iter floor {(ts[1] - slope) * 1e3:6.3f} ms")


if __name__ == "__main__":
    main()
