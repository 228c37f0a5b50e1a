"""Honest per-conv-class probes at the LiteResNet pretrain shapes.

Times each distinct conv shape of the (3,4,9) LiteResNet standalone —
forward and forward+backward — and prints achieved TF/s against the v5e
bf16 peak (197), plus the whole-net FLOP-weighted expectation. This is
the conv analogue of PERF.md round-2's matmul reality probes: it pins
WHICH conv class eats the ResNet's ~80 ms fwd+bwd (VERDICT r3 #3 / r4 #2)
before any layout experiment is built.

Methodology (v2): the round-4 version timed one dispatch per iteration,
which over the axon tunnel has a ~1.6-2.5 ms per-call floor that swamped
every conv (all 21 classes "measured" ~2 ms regardless of a 40x FLOP
spread). Now each timed unit is ONE jitted lax.scan of N iterations with
a serial data dependence through the WEIGHTS (w * (1 + acc * 1e-30) — a
no-op in bf16 numerics but opaque to XLA's simplifier, so iterations
can't be CSE'd or folded), with a host transfer of the carry for sync.
Per-iteration time is then pure device time at dispatch cost N-amortized.

Usage (on the chip): python tools/bench_convs.py [n_frames] [n_iters]
"""

from __future__ import annotations

import sys
import time

import numpy as np

# every conv of LiteResNet((3,4,9)) at the 192x352 pretrain shape:
# (name, H, W, Cin, Cout, k, stride, count_in_net)
SHAPES = [
    ("stem_conv0", 192, 352, 3, 32, 3, 2, 1),
    ("stem_conv1", 96, 176, 32, 32, 3, 1, 1),
    ("stem_conv2", 96, 176, 32, 64, 3, 1, 1),
    # group1 (filters 64, 48x88)
    ("g1_proj 1x1 64->256", 48, 88, 64, 256, 1, 1, 1),
    ("g1_conv1 1x1 64->64", 48, 88, 64, 64, 1, 1, 1),
    ("g1_conv1 1x1 256->64", 48, 88, 256, 64, 1, 1, 2),
    ("g1_conv2 3x3 64->64", 48, 88, 64, 64, 3, 1, 3),
    ("g1_conv3 1x1 64->256", 48, 88, 64, 256, 1, 1, 3),
    # group2 (filters 128; conv2 runs pre-pool at 48x88 in block0)
    ("g2_proj 1x1 256->512", 24, 44, 256, 512, 1, 1, 1),
    ("g2_conv1 1x1 256->128", 48, 88, 256, 128, 1, 1, 1),
    ("g2_conv1 1x1 512->128", 24, 44, 512, 128, 1, 1, 3),
    ("g2_conv2 3x3 128 @48x88", 48, 88, 128, 128, 3, 1, 1),
    ("g2_conv2 3x3 128 @24x44", 24, 44, 128, 128, 3, 1, 3),
    ("g2_conv3 1x1 128->512", 24, 44, 128, 512, 1, 1, 4),
    # group3 (filters 256; conv2 pre-pool at 24x44 in block0)
    ("g3_proj 1x1 512->1024", 12, 22, 512, 1024, 1, 1, 1),
    ("g3_conv1 1x1 512->256", 24, 44, 512, 256, 1, 1, 1),
    ("g3_conv1 1x1 1024->256", 12, 22, 1024, 256, 1, 1, 8),
    ("g3_conv2 3x3 256 @24x44", 24, 44, 256, 256, 3, 1, 1),
    ("g3_conv2 3x3 256 @12x22", 12, 22, 256, 256, 3, 1, 8),
    ("g3_conv3 1x1 256->1024", 12, 22, 256, 1024, 1, 1, 9),
    ("post_resnet 1x1 1024->768", 12, 22, 1024, 768, 1, 1, 1),
]


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    b = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    rng = np.random.default_rng(0)
    peak = 197e12

    def conv_fn(k, stride):
        def f(x, w):
            if stride > 1:
                pad = k - 1
                x = jnp.pad(x, ((0, 0), (pad // 2, pad - pad // 2),
                                (pad // 2, pad - pad // 2), (0, 0)))
            return lax.conv_general_dilated(
                x, w, (stride, stride), "VALID" if stride > 1 else "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.bfloat16)
        return f

    def timed(fn, *args):
        """One warm (compile) call, then min over 3 timed calls; each call
        is one jitted N-iteration scan, synced by a host transfer."""
        out = fn(*args)
        float(out)
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            out = fn(*args)
            float(out)
            best = min(best, time.time() - t0)
        return best / n

    tot_fwd = tot_bwd = 0.0
    exp_fwd = exp_bwd = 0.0
    print(f"scan-amortized ({n} iters/launch), batch {b} frames")
    print(f"{'conv':<28} {'GF(fwd)':>8} {'fwd ms':>8} {'TF/s':>6} "
          f"{'f+b ms':>8} {'TF/s':>6} {'xN':>3}")
    for name, h, w, cin, cout, k, stride, cnt in SHAPES:
        x = jnp.asarray(rng.standard_normal((b, h, w, cin)), jnp.bfloat16)
        wt = jnp.asarray(rng.standard_normal((k, k, cin, cout)) * 0.05,
                         jnp.bfloat16)
        f = conv_fn(k, stride)
        ho, wo = h // stride, w // stride
        gflop = 2 * k * k * cin * cout * ho * wo * b / 1e9

        def loop_fwd(x, wt, f=f):
            def body(acc, _):
                # (1 + acc*1e-30) == 1.0 in bf16 but is opaque to XLA,
                # so the conv can't be hoisted/CSE'd across iterations;
                # the carry serializes them
                y = f(x, wt * (1.0 + acc * 1e-30).astype(wt.dtype))
                return acc + y.reshape(-1)[0].astype(jnp.float32) * 1e-20, ()
            acc, _ = lax.scan(body, jnp.float32(0), None, length=n)
            return acc

        def loop_fb(x, wt, f=f):
            def one(acc, _):
                def loss(x, wt):
                    y = f(x, wt * (1.0 + acc * 1e-30).astype(wt.dtype))
                    return jnp.sum(y.astype(jnp.float32) ** 2) * 1e-20
                l, (gx, gw) = jax.value_and_grad(loss, argnums=(0, 1))(x, wt)
                # consume sum(|g|), not g[0]: a sliced readout lets
                # slice(dot/conv) rewrites collapse backward matmuls to
                # vector products (bench_vit_ops v2.2 lesson, CLAUDE.md);
                # a nonlinear functional forces the full gradients.
                return acc + l + (jnp.sum(jnp.abs(gx.astype(jnp.float32)))
                                  + jnp.sum(jnp.abs(gw.astype(jnp.float32)))
                                  ) * 1e-10, ()
            acc, _ = lax.scan(one, jnp.float32(0), None, length=n)
            return acc

        t_f = timed(jax.jit(loop_fwd), x, wt)
        t_b = timed(jax.jit(loop_fb), x, wt)
        print(f"{name:<28} {gflop:8.1f} {t_f * 1e3:8.2f} "
              f"{gflop / 1e3 / t_f:6.1f} {t_b * 1e3:8.2f} "
              f"{3 * gflop / 1e3 / t_b:6.1f} {cnt:3d}", flush=True)
        tot_fwd += cnt * t_f
        tot_bwd += cnt * t_b
        exp_fwd += cnt * gflop
        exp_bwd += cnt * 3 * gflop
    print(f"\nsum over net: fwd {tot_fwd * 1e3:.1f} ms "
          f"({exp_fwd / 1e3 / tot_fwd:.1f} TF/s), "
          f"fwd+bwd {tot_bwd * 1e3:.1f} ms "
          f"({exp_bwd / 1e3 / tot_bwd:.1f} TF/s); "
          f"v5e bf16 peak {peak / 1e12:.0f} TF/s")


if __name__ == "__main__":
    main()
