"""Per-op-class probes for the transformer towers at pretrain shapes.

The conv analogue (`bench_convs.py` v2) measured every conv class of the
vision stem; this tool covers the remaining ~75% of the step — the three
transformer towers (ViT 128x266, joint 32x396, lang 8x512 at the
flagship B8 config; reference dims: model/configs/merlot.yaml +
utils/transformer.py:61-118) plus the masked-LM head.

Methodology (v2, CHAIN-SLOPE — supersedes the scan-amortized v1 in git
history): `bench_scan_floor.py` showed the axon launch overhead is a
per-LAUNCH constant C that is neither small (~25 ms this session; the
"~2 ms" in older PERF notes was a different session) nor stable, so
per-iteration scan amortization leaves every class under ~40 GF pinned
at C/n. Instead each timed unit is one jitted lax.scan (n iters, serial
carry dependence so iterations can't be CSE'd) whose BODY applies the op
R times in a serial chain with distinct weights; the per-op time is the
slope (t[R_hi] - t[R_lo]) / ((R_hi - R_lo) * n), which cancels C exactly
(same trick as the decode bench's gen-length slope). Reported as
achieved TF/s against the 197 TF/s v5e bf16 peak (elementwise: GB/s
against the ~819 GB/s HBM peak).

f+b FLOP convention matches bench_convs: matmul bwd = 2x fwd (dx + dw),
attention bwd = 2.5x fwd (flash recompute), stated per op.

Usage (on the chip): python tools/bench_vit_ops.py [n_iters]
"""

from __future__ import annotations

import sys
import time

import numpy as np

# tower matmul classes. The mlp row measures the in+out PAIR (768->3072
# ->768) because that is the chainable unit; its GF/count are per pair.
# proj rows chain square [768,768] matmuls; xN = per-step occurrence.
MATMULS = [
    ("vit proj 768x768", 128 * 266, 48),
    ("joint proj 768x768", 32 * 396, 48),
    ("lang proj 768x768", 8 * 512, 48),
]
MLPS = [
    ("vit mlp pair 768<->3072", 128 * 266, 12),
    ("joint mlp pair 768<->3072", 32 * 396, 12),
    ("lang mlp pair 768<->3072", 8 * 512, 12),
]

# attention classes: (name, B, S, masked, collect, count). Chained via
# q <- prev output (same [B,S,H,D] shape); distinct k/v per link.
ATTENTION = [
    ("vit attn 128x266", 128, 266, False, "none", 12),
    ("joint attn 32x396", 32, 396, True, "none", 12),
    ("lang attn 8x512", 8, 512, True, "colsum", 12),
]

# LN + residual-add chain, 2 per layer per tower; chained via y -> x.
ELEMENTWISE = [
    ("vit ln+res [34048,768]", 128 * 266, 24),
    ("joint ln+res [12672,768]", 32 * 396, 24),
    ("lang ln+res [4096,768]", 8 * 512, 24),
]

H = 768
FF = 3072
HEADS, HEAD_DIM = 12, 64
VOCAB = 50370
PEAK_TF = 197e12
PEAK_GBS = 819e9
R_LO, R_HI = 1, 5


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

    global MATMULS, MLPS, ATTENTION, ELEMENTWISE, H, FF, VOCAB
    global HEADS, HEAD_DIM
    if _o.environ.get("VIT_OPS_TINY") == "1":  # CPU trace-smoke only
        H, FF, VOCAB, HEADS, HEAD_DIM = 64, 128, 512, 2, 32
        MATMULS = [(nm, 64, c) for nm, _, c in MATMULS]
        MLPS = [(nm, 64, c) for nm, _, c in MLPS]
        ATTENTION = [(nm, 2, 16, mk_, co, c)
                     for nm, _, _, mk_, co, c in ATTENTION]
        ELEMENTWISE = [(nm, 64, c) for nm, _, c in ELEMENTWISE]

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

    def scan_chain(step_fn, r, fb, n_loc):
        """One jitted launch: lax.scan of n iters; each body applies
        ``step_fn(y, weights[i]) -> y`` r times with distinct weights.
        fb: also take grads w.r.t. the input and the chain weights.
        EVERY grad leaf's first element folds into the carry so no
        link's dw can be dead-code-eliminated."""
        def loop(x0, *weights):
            def body(acc, _):
                # additive serialization: a multiplicative scalar commutes
                # through the LINEAR proj/lm chains (|c.z|=|c||z| too), so
                # LICM could hoist the chain out of the scan and inflate
                # those rows; an additive perturbation can't be
                # distributed out of a dot.
                x = x0 + (acc * 1e-30).astype(x0.dtype)

                def chain(x, ws):
                    y = x
                    for i in range(r):
                        y = step_fn(y, ws[i])
                    return y

                if fb:
                    def loss(x, ws):
                        y = chain(x, ws)
                        return jnp.sum(y.astype(jnp.float32) ** 2) * 1e-20
                    l, (gx, gws) = jax.value_and_grad(loss, argnums=(0, 1))(
                        x, weights)
                    # v2.2: consume sum(|g|) per leaf, NOT g[0]. A sliced
                    # readout lets slice(dot)->dot(slice) collapse every
                    # backward dW matmul to a vector product (measured:
                    # proj f+b read 250-278 TF/s, above peak); any LINEAR
                    # functional of a dot output is collapsible, abs is
                    # not. The extra |.|-sum passes are elementwise over
                    # the grads and fuse into their producing dots.
                    extra = jnp.sum(jnp.abs(gx.astype(jnp.float32)))
                    for g in jax.tree_util.tree_leaves(gws):
                        extra = extra + jnp.sum(jnp.abs(
                            g.astype(jnp.float32)))
                    return acc + l + extra * 1e-10, ()
                y = chain(x, weights)
                return acc + y.reshape(-1)[0].astype(jnp.float32) * 1e-20, ()
            acc, _ = lax.scan(body, jnp.float32(0), None, length=n_loc)
            return acc
        return jax.jit(loop)

    # v2.1: the slope cancels a launch constant C only when both points
    # sit in the additive regime t = C + compute; for small classes the
    # tunnel OVERLAPS dispatch with device work (t ~ max(C, compute)),
    # which under-counts time and reported >peak TF/s (v2 run, git
    # history). Fix: scale the per-launch iteration count per class so
    # the R_LO point alone carries >= VIT_OPS_TARGET_MS of compute at an
    # OPTIMISTIC speed estimate (overestimating speed only inflates n).
    target_s = float(_o.environ.get("VIT_OPS_TARGET_MS", "150")) / 1e3

    def slope(step_fn, x0, make_w, fb, t_est_s):
        """Per-op seconds via the R-chain slope (launch const cancels)."""
        n_loc = max(n, min(20000, int(np.ceil(
            target_s / (R_LO * max(t_est_s, 1e-7))))))
        ts = {}
        for r in (R_LO, R_HI):
            ws = tuple(make_w(i) for i in range(r))
            ts[r] = timed(scan_chain(step_fn, r, fb, n_loc), x0, *ws)
        return (ts[R_HI] - ts[R_LO]) / ((R_HI - R_LO) * n_loc)

    only = _o.environ.get("VIT_OPS_CLASSES")  # substring filter, e.g. "proj"

    def want(name):
        return only is None or any(s in name for s in only.split(","))

    MATMULS[:] = [c for c in MATMULS if want(c[0])]
    MLPS[:] = [c for c in MLPS if want(c[0])]
    ATTENTION[:] = [c for c in ATTENTION if want(c[0])]
    ELEMENTWISE[:] = [c for c in ELEMENTWISE if want(c[0])]
    run_lm = want("lm_head")

    print(f"chain-slope (R={R_LO}->{R_HI}, {n} iters/launch), "
          f"flagship B8 shapes, bf16")
    print(f"{'class':<28} {'GF(fwd)':>8} {'fwd ms':>8} {'TF/s':>6} "
          f"{'f+b ms':>8} {'TF/s':>6} {'xN':>3}")
    tot_fwd = tot_fb = gf_fwd = gf_fb = 0.0

    def report(name, gflop, t_f, t_b, cnt, bwd_x=3.0):
        nonlocal tot_fwd, tot_fb, gf_fwd, gf_fb
        print(f"{name:<28} {gflop:8.1f} {t_f * 1e3:8.3f} "
              f"{gflop / 1e3 / max(t_f, 1e-9):6.1f} {t_b * 1e3:8.3f} "
              f"{bwd_x * gflop / 1e3 / max(t_b, 1e-9):6.1f} {cnt:3d}",
              flush=True)
        tot_fwd += cnt * t_f
        tot_fb += cnt * t_b
        gf_fwd += cnt * gflop
        gf_fb += cnt * bwd_x * gflop

    # v2.2: abs() between chain links. The additive serialization was
    # not enough: a chip A/B (probe_envelope, git history) measured the
    # LINEAR proj chain at 254 TF/s vs 194 TF/s with abs links — above
    # the 197 TF/s spec peak, i.e. TPU-side XLA algebraically elides
    # part of a purely linear chain (dot reassociation / distributing
    # the broadcast carry — either rewrite is killed by a pointwise
    # nonlinearity, and abs fuses into the dot epilogue for free).
    def proj_step(y, w):
        return jnp.abs(jnp.dot(y, w, preferred_element_type=jnp.bfloat16))

    for name, m, cnt in MATMULS:
        x = jnp.asarray(rng.standard_normal((m, H)), jnp.bfloat16)

        def mk(i):
            return jnp.asarray(
                rng.standard_normal((H, H)) * 0.02, jnp.bfloat16)
        gflop = 2 * m * H * H / 1e9
        t_f = slope(proj_step, x, mk, fb=False, t_est_s=gflop / 250e3)
        t_b = slope(proj_step, x, mk, fb=True, t_est_s=3 * gflop / 250e3)
        report(name, gflop, t_f, t_b, cnt)

    def mlp_step(y, w):
        w_in, w_out = w
        hdn = jnp.dot(y, w_in, preferred_element_type=jnp.bfloat16)
        hdn = jax.nn.gelu(hdn)
        # abs at the pair boundary: gelu already breaks linearity inside
        # the pair, but consecutive pairs meet dot-to-dot (see v2.2 note)
        return jnp.abs(jnp.dot(hdn, w_out,
                               preferred_element_type=jnp.bfloat16))

    for name, m, cnt in MLPS:
        x = jnp.asarray(rng.standard_normal((m, H)), jnp.bfloat16)

        def mk(i):
            return (jnp.asarray(rng.standard_normal((H, FF)) * 0.02,
                                jnp.bfloat16),
                    jnp.asarray(rng.standard_normal((FF, H)) * 0.02,
                                jnp.bfloat16))
        gflop = 2 * 2 * m * H * FF / 1e9
        t_f = slope(mlp_step, x, mk, fb=False, t_est_s=gflop / 250e3)
        t_b = slope(mlp_step, x, mk, fb=True, t_est_s=3 * gflop / 250e3)
        report(name, gflop, t_f, t_b, cnt)

    if run_lm:
        # masked-LM head: 32 joint rows x int(128*0.2) = 25 masked
        # positions. Not chainable (768 -> vocab), so each link
        # re-consumes y; the full-vocab row-sum feeds the next link so no
        # output column can be pruned from the matmul.
        m = 800
        x = jnp.asarray(rng.standard_normal((m, H)), jnp.bfloat16)

        def lm_step(y, w):
            logits = jnp.dot(y, w, preferred_element_type=jnp.bfloat16)
            # abs: sum(dot(y, W)) is rewritable to dot(y, rowsum(W)) —
            # abs makes every logit column load-bearing (v2.2 note) and
            # fuses into the dot epilogue.
            return y + (jnp.sum(jnp.abs(logits).astype(jnp.float32),
                                axis=1, keepdims=True)
                        * 1e-20).astype(y.dtype)

        def mk_lm(i):
            return jnp.asarray(rng.standard_normal((H, VOCAB)) * 0.02,
                               jnp.bfloat16)
        gflop = 2 * m * H * VOCAB / 1e9
        t_f = slope(lm_step, x, mk_lm, fb=False, t_est_s=gflop / 250e3)
        t_b = slope(lm_step, x, mk_lm, fb=True, t_est_s=3 * gflop / 250e3)
        report("lm_head 800x768x50370", gflop, t_f, t_b, 1)

    for name, b, s, masked, collect, cnt in ATTENTION:
        q = jnp.asarray(rng.standard_normal((b, s, HEADS, HEAD_DIM)),
                        jnp.bfloat16)
        mask = (jnp.asarray(rng.uniform(0, 1, (b, s, s)) < 0.9, jnp.float32)
                if masked else None)

        backend = ("xla" if _o.environ.get("VIT_OPS_TINY") == "1"
                   else "pallas")

        def attn_step(y, w, mask=mask, collect=collect, backend=backend):
            kk, v = w
            # training config: pallas kernel, bf16 softmax (CLAUDE.md quirk)
            out, extra = attention_core(y, kk, v, mask, collect=collect,
                                        backend=backend, softmax_fp32=False)
            if extra is not None:
                out = out + (extra.astype(out.dtype)[:, :, None, None]
                             * jnp.bfloat16(1e-20))
            return out

        def mk_kv(i):
            return (jnp.asarray(rng.standard_normal((b, s, HEADS, HEAD_DIM)),
                                jnp.bfloat16),
                    jnp.asarray(rng.standard_normal((b, s, HEADS, HEAD_DIM)),
                                jnp.bfloat16))
        gflop = 4 * b * HEADS * s * s * HEAD_DIM / 1e9
        t_f = slope(attn_step, q, mk_kv, fb=False, t_est_s=gflop / 60e3)
        t_b = slope(attn_step, q, mk_kv, fb=True, t_est_s=3.5 * gflop / 60e3)
        report(name, gflop, t_f, t_b, cnt, bwd_x=3.5)

    print(f"\n{'elementwise (GB/s vs ~819)':<28} {'GB(fwd)':>8} "
          f"{'fwd ms':>8} {'GB/s':>6} {'f+b ms':>8} {'GB/s':>6} {'xN':>3}"
          f"   (f+b col = VMEM-fused chain, lower bound on time)")
    ew_fwd = ew_fb = 0.0
    for name, m, cnt in ELEMENTWISE:
        x = jnp.asarray(rng.standard_normal((m, H)), jnp.bfloat16)

        def ln_step(y, w):
            r, g, bvec = w
            h32 = (y + r).astype(jnp.float32)
            mu = jnp.mean(h32, -1, keepdims=True)
            var = jnp.mean(jnp.square(h32 - mu), -1, keepdims=True)
            out = (h32 - mu) * lax.rsqrt(var + 1e-12) * g + bvec
            return out.astype(jnp.bfloat16)

        def mk_ln(i):
            return (jnp.asarray(rng.standard_normal((m, H)), jnp.bfloat16),
                    jnp.ones((H,), jnp.float32) * (1.0 + 0.01 * i),
                    jnp.zeros((H,), jnp.float32))
        gbytes = 3 * m * H * 2 / 1e9  # read x, r; write y (bf16)
        # v2.2 fwd: R-chained ln+res links fuse VMEM-resident (the v2 run
        # read 1.6-2.8 TB/s — above HBM peak), so the fwd number instead
        # comes from an n-slope whose carry is the FULL array: each scan
        # iteration must read the carry + r from HBM and write the new
        # carry, i.e. exactly the 3-pass traffic gbytes accounts for.
        # f+b keeps the R-chain and is labeled a VMEM-fused bound
        # (reverse-diff of an n-long serial chain stores n carries).
        w_ln = mk_ln(0)

        def ew_loop(length):
            def loop(y0, r_in):
                def body(y, _):
                    return ln_step(y, (r_in,) + w_ln[1:]), ()
                y, _ = lax.scan(body, y0, None, length=length)
                return y.reshape(-1)[0].astype(jnp.float32)
            return jax.jit(loop)

        n_lo = max(8, int(np.ceil(target_s / max(gbytes / 900, 1e-7))))
        t_lo = timed(ew_loop(n_lo), x, w_ln[0])
        t_hi = timed(ew_loop(3 * n_lo), x, w_ln[0])
        t_f = (t_hi - t_lo) / (2 * n_lo)
        t_b = slope(ln_step, x, mk_ln, fb=True, t_est_s=3 * gbytes / 1600)
        print(f"{name:<28} {gbytes:8.2f} {t_f * 1e3:8.3f} "
              f"{gbytes / max(t_f, 1e-9):6.0f} {t_b * 1e3:8.3f} "
              f"{3 * gbytes / max(t_b, 1e-9):6.0f} {cnt:3d}", flush=True)
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
