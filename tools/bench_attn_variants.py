"""Decompose the pallas attention forward's time at flagship shapes.

The round-5 per-op probe (bench_vit_ops v2) put the attention classes at
25-46 TF/s fwd while every matmul class sits near the measured 187 TF/s
device peak (bench_peak) — attention is ~76 ms of the 403 ms step, the
largest remaining distance-to-ceiling bucket. Before touching the
production kernel, this tool measures WHERE the time goes with ablated
kernel variants at the exact training shapes/dtypes:

  prod       production attention_core (pallas, bf16 softmax = training)
  sm_f32     production with fp32 softmax (softmax dtype delta)
  xla        attention_core backend='xla' (is the kernel even winning?)
  mm_only    local kernel, softmax REMOVED (scores scaled+cast -> PV):
             isolates DMA + the two MXU matmuls per head
  no_max     local kernel, softmax without max-subtraction:
             the max-reduce + subtract pass cost
  diet       local kernel, full softmax, but: mask cast hoisted out of
             the head loop + additive penalty precomputed once (2 ops vs
             3 per masked element), row-valid/colsum scaffolding hoisted,
             per-head slice writes into o_ref (no output concat temp)
  diet_ilv   diet + software-stagger: head h's softmax is emitted AFTER
             head h+1's QK^T matmul, exposing MXU/VPU overlap to the
             Mosaic scheduler explicitly

All local variants produce the production output (diet bit-compares in
the test suite's tolerance; mm_only/no_max are measurement-only ablations
whose outputs are wrong on purpose — their value is their TIME).

Method: chain-slope exactly like bench_vit_ops v2 (q <- prev output,
distinct k/v per link, slope between R=1 and R=5 chains inside one
n-iter lax.scan launch; cancels the ~25 ms axon launch constant).
Forward only — the backward gets its own pass once the forward
decomposition says which ablation pays.

Usage (chip): python tools/bench_attn_variants.py [n_iters]
  ATTN_VAR_CLASSES=vit,joint,lang  ATTN_VAR_ONLY=prod,diet ...
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

HEADS, HEAD_DIM = 12, 64
MASK_PENALTY = 1e10
PEAK_TF = 187e12  # measured, bench_peak round 5

# (name, B, S, masked, collect)
CLASSES = [
    ("vit", 128, 266, False, "none"),
    ("joint", 32, 396, True, "none"),
    ("lang", 8, 512, True, "colsum"),
]

R_LO, R_HI = 1, 5


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from merlot_tpu.ops.attention import attention_core

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    rng = np.random.default_rng(0)
    tiny = os.environ.get("ATTN_VAR_TINY") == "1"  # CPU trace smoke
    global HEADS, HEAD_DIM, CLASSES
    if tiny:
        HEADS, HEAD_DIM = 2, 32
        CLASSES = [(nm, 2, 16, mk, co) for nm, _, _, mk, co in CLASSES]

    DT = jnp.float32 if tiny else jnp.bfloat16

    cls_filter = os.environ.get("ATTN_VAR_CLASSES")
    var_filter = os.environ.get("ATTN_VAR_ONLY")

    def want_cls(nm):
        return cls_filter is None or nm in cls_filter.split(",")

    def want_var(nm):
        return var_filter is None or nm in var_filter.split(",")

    # ------------------------------------------------------------------
    # local kernel: one program per (batch, q-block=whole Sq at these
    # shapes), all heads in-kernel — same structure as the production
    # _attn_kernel (merlot_tpu/ops/pallas_attention.py:70) with ablation
    # flags. sm bf16 = training default.
    # ------------------------------------------------------------------
    def make_local(b, s, masked, collect, *, do_softmax=True, do_max=True,
                   hoist=False, slice_writes=False, stagger=False):
        hd = HEADS * HEAD_DIM
        scale = 1.0 / (HEAD_DIM ** 0.5)
        collect_colsum = collect == "colsum"

        def kernel(q_ref, k_ref, v_ref, *rest):
            if masked:
                mask_ref, o_ref = rest[0], rest[1]
                c_ref = rest[2] if collect_colsum else None
            else:
                o_ref = rest[0]
                c_ref = rest[1] if collect_colsum else None
            qq = q_ref[0]
            kk = k_ref[0]
            vv = v_ref[0]
            sm_dtype = qq.dtype

            mm_h = pen = None
            if masked:
                if hoist:
                    mm_h = mask_ref[0].astype(sm_dtype)
                    pen = jnp.asarray(-MASK_PENALTY, sm_dtype) * (1 - mm_h)

            def score_of(h):
                sl = slice(h * HEAD_DIM, (h + 1) * HEAD_DIM)
                sc = jax.lax.dot_general(
                    qq[:, sl], kk[:, sl], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32) * scale
                sc = sc.astype(sm_dtype)
                if masked:
                    if hoist:
                        sc = sc * mm_h + pen
                    else:
                        m0 = mask_ref[0].astype(sm_dtype)
                        sc = sc * m0 - jnp.asarray(
                            MASK_PENALTY, sm_dtype) * (1 - m0)
                return sc

            def soft(sc):
                if not do_softmax:
                    return sc
                if do_max:
                    return jax.nn.softmax(sc, axis=-1)
                e = jnp.exp(sc)
                return e / jnp.sum(e, axis=-1, keepdims=True)

            def pv_of(h, probs):
                sl = slice(h * HEAD_DIM, (h + 1) * HEAD_DIM)
                return jax.lax.dot_general(
                    probs.astype(qq.dtype), vv[:, sl],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)

            colsum_acc = None

            def colsum_add(probs):
                nonlocal colsum_acc
                p32 = probs.astype(jnp.float32)
                part = jnp.sum(p32, axis=0, keepdims=True)
                colsum_acc = part if colsum_acc is None \
                    else colsum_acc + part

            outs = []
            if stagger:
                scores = [None] * HEADS
                scores[0] = score_of(0)
                for h in range(HEADS):
                    if h + 1 < HEADS:
                        scores[h + 1] = score_of(h + 1)
                    probs = soft(scores[h])
                    scores[h] = None
                    if collect_colsum:
                        colsum_add(probs)
                    ctx = pv_of(h, probs).astype(o_ref.dtype)
                    if slice_writes:
                        o_ref[0, :, h * HEAD_DIM:(h + 1) * HEAD_DIM] = ctx
                    else:
                        outs.append(ctx)
            else:
                for h in range(HEADS):
                    probs = soft(score_of(h))
                    if collect_colsum:
                        colsum_add(probs)
                    ctx = pv_of(h, probs).astype(o_ref.dtype)
                    if slice_writes:
                        o_ref[0, :, h * HEAD_DIM:(h + 1) * HEAD_DIM] = ctx
                    else:
                        outs.append(ctx)
            if not slice_writes:
                o_ref[0] = jnp.concatenate(outs, axis=1)
            if collect_colsum:
                c_ref[0] = jnp.broadcast_to(colsum_acc / HEADS,
                                            (8, colsum_acc.shape[1]))

        in_specs = [pl.BlockSpec((1, s, hd), lambda bi: (bi, 0, 0)),
                    pl.BlockSpec((1, s, hd), lambda bi: (bi, 0, 0)),
                    pl.BlockSpec((1, s, hd), lambda bi: (bi, 0, 0))]
        if masked:
            in_specs.append(pl.BlockSpec((1, s, s), lambda bi: (bi, 0, 0)))
        out_shapes = [jax.ShapeDtypeStruct((b, s, hd), jnp.bfloat16)]
        out_specs = [pl.BlockSpec((1, s, hd), lambda bi: (bi, 0, 0))]
        if collect_colsum:
            out_shapes.append(jax.ShapeDtypeStruct((b, 8, s), jnp.float32))
            out_specs.append(pl.BlockSpec((1, 8, s), lambda bi: (bi, 0, 0)))

        def call(q4, k4, v4, mask):
            q3 = q4.reshape(b, s, hd)
            k3 = k4.reshape(b, s, hd)
            v3 = v4.reshape(b, s, hd)
            args = [q3, k3, v3]
            if masked:
                args.append(mask.astype(jnp.float32))
            outs = pl.pallas_call(
                kernel, grid=(b,), in_specs=in_specs, out_specs=out_specs,
                out_shape=out_shapes,
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel",)),
            )(*args)
            ctx = outs[0].reshape(b, s, HEADS, HEAD_DIM)
            extra = outs[1][:, 0, :] if collect_colsum else None
            return ctx, extra
        return call

    # ------------------------------------------------------------------
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

    def scan_chain(step_fn, r, x0, mk_w):
        ws = [mk_w(i) for i in range(r)]

        def loop(x0, *weights):
            def body(acc, _):
                x = x0 + (acc * 1e-30).astype(x0.dtype)
                for w in weights:
                    x = step_fn(x, w)
                return acc + x.reshape(-1)[0].astype(jnp.float32) * 1e-20, ()
            acc, _ = lax.scan(body, jnp.float32(0), None, length=n)
            return acc
        return jax.jit(loop), ws

    def slope(step_fn, x0, mk_w):
        ts = {}
        for r in (R_LO, R_HI):
            fn, ws = scan_chain(step_fn, r, x0, mk_w)
            ts[r] = timed(fn, x0, *ws)
        return (ts[R_HI] - ts[R_LO]) / ((R_HI - R_LO) * n)

    print(f"attention fwd variants, chain-slope R={R_LO}->{R_HI}, "
          f"n={n}; TF/s vs measured peak 187")
    print(f"{'class':<6} {'variant':<9} {'GF':>6} {'fwd ms':>8} {'TF/s':>6}")

    for cname, b, s, masked, collect in CLASSES:
        if not want_cls(cname):
            continue
        q = jnp.asarray(rng.standard_normal((b, s, HEADS, HEAD_DIM)),
                        DT)
        mask = (jnp.asarray(rng.uniform(0, 1, (b, s, s)) < 0.9, jnp.float32)
                if masked else None)
        gflop = 4 * b * HEADS * s * s * HEAD_DIM / 1e9

        def mk_kv(i):
            return (jnp.asarray(
                rng.standard_normal((b, s, HEADS, HEAD_DIM)), DT),
                jnp.asarray(
                rng.standard_normal((b, s, HEADS, HEAD_DIM)), DT))

        def wrap(core):
            def step(y, w, core=core):
                kk, v = w
                out, extra = core(y, kk, v, mask)
                if extra is not None:
                    out = out + (extra.astype(out.dtype)[:, :, None, None]
                                 * DT(1e-20))
                return out
            return step

        be = "xla" if tiny else "pallas"
        variants = [
            ("prod", lambda q4, k4, v4, m: attention_core(
                q4, k4, v4, m, collect=collect, backend=be,
                softmax_fp32=False)),
            ("sm_f32", lambda q4, k4, v4, m: attention_core(
                q4, k4, v4, m, collect=collect, backend=be,
                softmax_fp32=True)),
            ("xla", lambda q4, k4, v4, m: attention_core(
                q4, k4, v4, m, collect=collect, backend="xla",
                softmax_fp32=False)),
        ]
        if not tiny:
            variants += [
                ("mm_only", make_local(b, s, masked, collect,
                                       do_softmax=False)),
                ("no_max", make_local(b, s, masked, collect, do_max=False)),
                ("diet", make_local(b, s, masked, collect, hoist=True,
                                    slice_writes=True)),
                ("diet_ilv", make_local(b, s, masked, collect, hoist=True,
                                        slice_writes=True, stagger=True)),
            ]
        if not tiny and os.environ.get("ATTN_VAR_CHECK") == "1":
            # correctness spot-check: diet/diet_ilv must match prod
            # (bf16-tolerance); mm_only/no_max are ablations, skipped.
            kk0, v0 = mk_kv(0)
            ref, ref_ex = jax.jit(lambda *a: attention_core(
                *a, collect=collect, backend="pallas",
                softmax_fp32=False))(q, kk0, v0, mask)
            for vname, core in variants:
                if vname not in ("diet", "diet_ilv"):
                    continue
                got, got_ex = jax.jit(core)(q, kk0, v0, mask)
                np.testing.assert_allclose(
                    np.asarray(got, np.float32), np.asarray(ref, np.float32),
                    rtol=2e-2, atol=2e-2, err_msg=f"{cname}/{vname} ctx")
                if ref_ex is not None:
                    np.testing.assert_allclose(
                        np.asarray(got_ex), np.asarray(ref_ex),
                        rtol=2e-4, atol=2e-4,
                        err_msg=f"{cname}/{vname} colsum")
                print(f"{cname:<6} {vname:<9} matches prod", flush=True)

        for vname, core in variants:
            if not want_var(vname):
                continue
            t = slope(wrap(core), q, mk_kv)
            print(f"{cname:<6} {vname:<9} {gflop:6.1f} {t * 1e3:8.3f} "
                  f"{gflop / 1e3 / t:6.1f}", flush=True)


if __name__ == "__main__":
    main()
