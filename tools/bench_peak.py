"""Pin the actual device peaks (MXU TF/s, HBM GB/s) for the MFU ledger.

The round-5 chain-slope tower probe measured several matmul classes at
175-270 TF/s and ln+res chains at >1.5 TB/s — above the v5e spec sheet
(197 TF/s bf16, ~819 GB/s) this repo had been using as the MFU
denominator. The axon device reports as "TPU v5 lite" but its measured
envelope decides the ledger, not the name. This probe measures:

  1. MXU: one [4096,4096]x[4096,4096] bf16 matmul (137.4 GF, MXU-optimal
     tiling) via the n-slope of a serialized scan (n=10 vs 30, the
     launch constant cancels); |y| between nothing - single op per iter,
     serialized through a scalar carry via the input.
  2. HBM: a [64M] bf16 triad (y = a*x + b, 3x64M*2 bytes = 384 MB per
     iter) via the same n-slope.

Usage (chip): python tools/bench_peak.py
"""

from __future__ import annotations

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    print("device:", jax.devices()[0], getattr(jax.devices()[0],
                                               "device_kind", "?"))
    rng = np.random.default_rng(0)

    def timed(fn, *args):
        out = fn(*args)
        float(out)
        best = float("inf")
        for _ in range(4):
            t0 = time.time()
            out = fn(*args)
            float(out)
            best = min(best, time.time() - t0)
        return best

    def scan_of(step, length):
        def loop(*args):
            def body(acc, _):
                a = list(args)
                # ADDITIVE serialization: a multiplicative scalar commutes
                # through linear ops (|c.z| = |c||z| included), which lets
                # loop-invariant code motion hoist the whole op out of the
                # scan; an additive perturbation cannot be distributed out
                # of a dot, so the op stays in the loop.
                a[0] = a[0] + (acc * 1e-30).astype(a[0].dtype)
                y = step(*a)
                return acc + y.reshape(-1)[0].astype(jnp.float32) * 1e-20, ()
            acc, _ = lax.scan(body, jnp.float32(0), None, length=length)
            return acc
        return jax.jit(loop)

    def nslope(step, *args, n_lo=10, n_hi=30):
        t_lo = timed(scan_of(step, n_lo), *args)
        t_hi = timed(scan_of(step, n_hi), *args)
        return (t_hi - t_lo) / (n_hi - n_lo)

    # R-chain slope: the n-slope above still carries the per-ITERATION
    # serialization stall (scalar carry readout -> broadcast add) in its
    # per-op time; chaining R ops inside the body and taking the R-slope
    # cancels the stall too. Links are abs(dot(.)) so no algebraic
    # rewrite can elide work (probe_envelope session, 2026-08-20:
    # 192.8 TF/s bf16 / 192.2 f32acc at 4096^3 vs 187.3 by n-slope).
    def rslope(mk_step, x, mk_w, n, r_lo=1, r_hi=5):
        def chain(r):
            def loop(x0, *ws):
                def body(acc, _):
                    y = x0 + (acc * 1e-30).astype(x0.dtype)
                    for w_ in ws:
                        y = mk_step(y, w_)
                    return (acc + y.reshape(-1)[0].astype(jnp.float32)
                            * 1e-20), ()
                acc, _ = lax.scan(body, jnp.float32(0), None, length=n)
                return acc
            return jax.jit(loop)
        ts = {}
        for r in (r_lo, r_hi):
            ws = tuple(mk_w(i) for i in range(r))
            ts[r] = timed(chain(r), x, *ws)
        return (ts[r_hi] - ts[r_lo]) / ((r_hi - r_lo) * n)

    # --- MXU peak: big square bf16 matmul, abs() breaks linearity so no
    # algebraic shortcut can skip work across iterations.
    m = 4096
    x = jnp.asarray(rng.standard_normal((m, m)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((m, m)) * 0.02, jnp.bfloat16)

    def mm(x, w):
        return jnp.abs(jnp.dot(x, w, preferred_element_type=jnp.bfloat16))
    gf = 2 * m * m * m / 1e9
    t = nslope(mm, x, w)
    print(f"matmul {m}^3 bf16 (n-slope, incl. iter stall): "
          f"{t * 1e3:7.3f} ms/op -> {gf / 1e3 / t:6.1f} TF/s", flush=True)

    def mk_w(i):
        return jnp.asarray(rng.standard_normal((m, m)) * 0.02, jnp.bfloat16)
    t = rslope(mm, x, mk_w, n=40)
    print(f"matmul {m}^3 bf16 (R-chain, steady-state): "
          f"{t * 1e3:7.3f} ms/op -> {gf / 1e3 / t:6.1f} TF/s", flush=True)

    # fp32-accumulate variant (training uses preferred_element_type f32
    # in places; some parts halve bf16 throughput for f32 accum)
    def mm32(x, w):
        return jnp.abs(jnp.dot(x, w, preferred_element_type=jnp.float32)
                       ).astype(jnp.bfloat16)
    t = nslope(mm32, x, w)
    print(f"matmul {m}^3 bf16->f32acc: {t * 1e3:7.3f} ms/op -> "
          f"{gf / 1e3 / t:6.1f} TF/s", flush=True)

    # --- HBM peak: elementwise triad on 64M bf16 elements. The scalar
    # readout trick fails here: an elementwise op consumed only via
    # y[0] gets sliced to one element by XLA (the first run measured a
    # negative slope). Instead the FULL array is the scan carry — each
    # iteration reads a, reads the carry, writes the new carry, so the
    # loop state forces 3 x nel x 2 bytes of real HBM traffic per iter.
    nel = 64 * 1024 * 1024
    a = jnp.asarray(rng.standard_normal((nel,)), jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((nel,)), jnp.bfloat16)

    def triad_loop(length):
        def loop(a, y0):
            def body(y, _):
                return a * jnp.bfloat16(1.0001) + y, ()
            y, _ = lax.scan(body, y0, None, length=length)
            return y.reshape(-1)[0].astype(jnp.float32)
        return jax.jit(loop)

    gbytes = 3 * nel * 2 / 1e9
    t_lo = timed(triad_loop(10), a, b)
    t_hi = timed(triad_loop(30), a, b)
    t = (t_hi - t_lo) / 20
    print(f"triad 3x{nel >> 20}Mi bf16 (carry-serialized): "
          f"{t * 1e3:7.3f} ms/op -> {gbytes / t:7.1f} GB/s", flush=True)


if __name__ == "__main__":
    main()
