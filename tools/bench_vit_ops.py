"""Per-op-class probes for the transformer towers at pretrain shapes.

The conv analogue (`bench_convs.py` v2) closed the ResNet question by
measuring every conv class against the v5e bf16 peak; this tool does the
same for the remaining ~75% of the step — the three transformer towers
(ViT 128x266, joint 32x396, lang 8x512 at the flagship B8 config;
reference dims: model/configs/merlot.yaml + utils/transformer.py:61-118).
Each distinct matmul class, the pallas attention kernel at each tower
shape, and the LN+residual elementwise chain are timed fwd and fwd+bwd,
scan-amortized (the axon tunnel has a ~2 ms per-launch floor; each timed
unit is ONE jitted lax.scan of N iterations with a serial weight/input
dependence `w * (1 + acc * 1e-30)` — bf16 no-op, opaque to XLA's
simplifier — so iterations can't be CSE'd), and reported as achieved
TF/s against the 197 TF/s v5e bf16 peak (elementwise: GB/s against the
~819 GB/s HBM peak). The per-class numbers times the per-net counts give
the op-class ceiling each PERF.md bucket sits at — the round-5 MFU
ledger's denominator (VERDICT r4 #1/#9).

f+b FLOP convention matches bench_convs: matmul bwd = 2x fwd (dx + dw),
attention bwd = 2.5x fwd (flash recompute), stated per row.

Usage (on the chip): python tools/bench_vit_ops.py [n_iters]
"""

from __future__ import annotations

import sys
import time

import numpy as np

# matmul classes: (name, M, K, N, count_per_step)
# counts: 12 layers/tower; q,k,v,out = 4 proj/layer; mlp in+out = 1 each.
MATMULS = [
    ("vit proj 768x768", 128 * 266, 768, 768, 48),
    ("vit mlp_in 768->3072", 128 * 266, 768, 3072, 12),
    ("vit mlp_out 3072->768", 128 * 266, 3072, 768, 12),
    ("joint proj 768x768", 32 * 396, 768, 768, 48),
    ("joint mlp_in 768->3072", 32 * 396, 768, 3072, 12),
    ("joint mlp_out 3072->768", 32 * 396, 3072, 768, 12),
    ("lang proj 768x768", 8 * 512, 768, 768, 48),
    ("lang mlp_in 768->3072", 8 * 512, 768, 3072, 12),
    ("lang mlp_out 3072->768", 8 * 512, 3072, 768, 12),
    # masked-LM head: 32 joint rows x int(128 * 0.2) = 25 masked positions
    ("lm_head 800x768x50370", 800, 768, 50370, 1),
]

# attention classes: (name, B, S, heads, head_dim, masked, collect, count)
ATTENTION = [
    ("vit attn 128x266", 128, 266, 12, 64, False, "none", 12),
    ("joint attn 32x396", 32, 396, 12, 64, True, "none", 12),
    ("lang attn 8x512", 8, 512, 12, 64, True, "colsum", 12),
]

# elementwise classes: (name, M, H, count) — LN + residual add chain,
# 2 per layer per tower. Bandwidth-bound; reported in GB/s.
ELEMENTWISE = [
    ("vit ln+res [34048,768]", 128 * 266, 768, 24),
    ("joint ln+res [12672,768]", 32 * 396, 768, 24),
    ("lang ln+res [4096,768]", 8 * 512, 768, 24),
]

PEAK_TF = 197e12
PEAK_GBS = 819e9


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    import os as _o
    sys.path.insert(0, _o.path.dirname(_o.path.dirname(
        _o.path.abspath(__file__))))
    from merlot_tpu.ops.attention import attention_core

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 30
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
        return best / n

    def scan_fwd(f, serial_arg=1):
        """f(*args) -> array; iterations serialized through args[serial_arg]."""
        def loop(*args):
            def body(acc, _):
                a = list(args)
                a[serial_arg] = (a[serial_arg]
                                 * (1.0 + acc * 1e-30).astype(a[serial_arg].dtype))
                y = f(*a)
                return acc + y.reshape(-1)[0].astype(jnp.float32) * 1e-20, ()
            acc, _ = lax.scan(body, jnp.float32(0), None, length=n)
            return acc
        return jax.jit(loop)

    def scan_fb(f, serial_arg=1, grad_args=(0, 1)):
        def loop(*args):
            def body(acc, _):
                a = list(args)
                a[serial_arg] = (a[serial_arg]
                                 * (1.0 + acc * 1e-30).astype(a[serial_arg].dtype))

                def loss(*diff):
                    full = list(a)
                    for slot, val in zip(grad_args, diff):
                        full[slot] = val
                    y = f(*full)
                    return jnp.sum(y.astype(jnp.float32) ** 2) * 1e-20
                l, gs = jax.value_and_grad(loss, argnums=tuple(
                    range(len(grad_args))))(*[a[i] for i in grad_args])
                extra = sum(g.reshape(-1)[0].astype(jnp.float32) for g in gs)
                return acc + l + extra, ()
            acc, _ = lax.scan(body, jnp.float32(0), None, length=n)
            return acc
        return jax.jit(loop)

    print(f"scan-amortized ({n} iters/launch), flagship B8 shapes, bf16")
    print(f"{'class':<28} {'GF(fwd)':>8} {'fwd ms':>8} {'TF/s':>6} "
          f"{'f+b ms':>8} {'TF/s':>6} {'xN':>3}")
    tot_fwd = tot_fb = gf_fwd = gf_fb = 0.0

    def mm(x, w):
        return jnp.dot(x, w, preferred_element_type=jnp.bfloat16)

    for name, m, k, nn_, cnt in MATMULS:
        x = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((k, nn_)) * 0.02, jnp.bfloat16)
        gflop = 2 * m * k * nn_ / 1e9
        t_f = timed(scan_fwd(mm), x, w)
        t_b = timed(scan_fb(mm), x, w)
        print(f"{name:<28} {gflop:8.1f} {t_f * 1e3:8.2f} "
              f"{gflop / 1e3 / t_f:6.1f} {t_b * 1e3:8.2f} "
              f"{3 * gflop / 1e3 / t_b:6.1f} {cnt:3d}", flush=True)
        tot_fwd += cnt * t_f
        tot_fb += cnt * t_b
        gf_fwd += cnt * gflop
        gf_fb += cnt * 3 * gflop

    for name, b, s, h, d, masked, collect, cnt in ATTENTION:
        q = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.bfloat16)
        kk = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.bfloat16)
        mask = (jnp.asarray(rng.uniform(0, 1, (b, s, s)) < 0.9, jnp.float32)
                if masked else None)

        def attn(q, kk, v, mask=mask, collect=collect):
            # training config: pallas kernel, bf16 softmax (CLAUDE.md quirk)
            out, extra = attention_core(q, kk, v, mask, collect=collect,
                                        backend="pallas", softmax_fp32=False)
            if extra is not None:
                out = out + extra.astype(out.dtype)[:, :, None, None] * 0
            return out
        gflop = 4 * b * h * s * s * d / 1e9
        t_f = timed(scan_fwd(attn, serial_arg=0), q, kk, v)
        t_b = timed(scan_fb(attn, serial_arg=0, grad_args=(0, 1, 2)),
                    q, kk, v)
        print(f"{name:<28} {gflop:8.1f} {t_f * 1e3:8.2f} "
              f"{gflop / 1e3 / t_f:6.1f} {t_b * 1e3:8.2f} "
              f"{3.5 * gflop / 1e3 / t_b:6.1f} {cnt:3d}", flush=True)
        tot_fwd += cnt * t_f
        tot_fb += cnt * t_b
        gf_fwd += cnt * gflop
        gf_fb += cnt * 3.5 * gflop

    print(f"\n{'elementwise (GB/s vs ~819)':<28} {'GB(fwd)':>8} "
          f"{'fwd ms':>8} {'GB/s':>6} {'f+b ms':>8} {'GB/s':>6} {'xN':>3}")
    ew_fwd = ew_fb = 0.0
    for name, m, hdim, cnt in ELEMENTWISE:
        x = jnp.asarray(rng.standard_normal((m, hdim)), jnp.bfloat16)
        r = jnp.asarray(rng.standard_normal((m, hdim)), jnp.bfloat16)
        g = jnp.ones((hdim,), jnp.float32)
        bvec = jnp.zeros((hdim,), jnp.float32)

        def lnres(x, r, g=g, bvec=bvec):
            h32 = (x + r).astype(jnp.float32)
            mu = jnp.mean(h32, -1, keepdims=True)
            var = jnp.mean(jnp.square(h32 - mu), -1, keepdims=True)
            y = (h32 - mu) * lax.rsqrt(var + 1e-12) * g + bvec
            return y.astype(jnp.bfloat16)
        gbytes = 3 * m * hdim * 2 / 1e9  # read x, r; write y (bf16)
        t_f = timed(scan_fwd(lnres, serial_arg=0), x, r)
        t_b = timed(scan_fb(lnres, serial_arg=0, grad_args=(0, 1)), x, r)
        print(f"{name:<28} {gbytes:8.2f} {t_f * 1e3:8.2f} "
              f"{gbytes / t_f:6.0f} {t_b * 1e3:8.2f} "
              f"{3 * gbytes / t_b:6.0f} {cnt:3d}", flush=True)
        ew_fwd += cnt * t_f
        ew_fb += cnt * t_b

    print(f"\nmatmul+attn sum over step: fwd {tot_fwd * 1e3:.1f} ms "
          f"({gf_fwd / 1e3 / tot_fwd:.1f} TF/s), "
          f"fwd+bwd {tot_fb * 1e3:.1f} ms ({gf_fb / 1e3 / tot_fb:.1f} TF/s)")
    print(f"elementwise ln+res sum: fwd {ew_fwd * 1e3:.1f} ms, "
          f"fwd+bwd {ew_fb * 1e3:.1f} ms")
    print(f"v5e peaks: {PEAK_TF / 1e12:.0f} TF/s bf16, "
          f"{PEAK_GBS / 1e9:.0f} GB/s HBM")


if __name__ == "__main__":
    main()
