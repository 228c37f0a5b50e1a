"""Logit-level parity harness: reference TF model vs our JAX model.

North star #1 (BASELINE.md): bit-faithful MerlotModel outputs. Two modes:

1. **Random-init composition parity (works today, no network):**
   tools/tf1_name_oracle.reference_forward_dump runs the reference's OWN
   code — fp32 inference forward + both allpairs temporal heads, the exact
   PREDICT path of downstream/sort_story/get_zero_shot_logits.py:58-84 —
   from its own random init, and dumps weights+inputs+outputs.
   ``compare_forward_dump`` converts those weights through
   merlot_tf_name_map, replays the inputs through our model, and reports
   max-abs/rel differences on ``encoder_hidden_states`` and
   ``allpairs_temporal_logits``. This verifies every numerics decision *in
   composition* (WS epsilon order, GN variance form, mask semantics, PE
   indexing, pooling), not just per-op.

2. **Released-checkpoint parity (fires the moment network exists):**
   ``python -m merlot_tpu.tools.checkpoint_parity --checkpoint PATH`` runs
   the same dump with the reference graph restored from the real
   gs://merlot checkpoint (download via tools/download_checkpoint.py),
   then the same comparison. One command, no other changes needed.

The dump step must run in a SUBPROCESS when mode 1/2 is driven from Python
that also uses TF2 (the oracle shim disables v2 behavior process-wide).
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
from typing import Dict, Optional

import numpy as np

REFERENCE_CONFIG = "/root/reference/model/configs/merlot.yaml"


def run_reference_dump(out_npz: str, config_overrides: Optional[Dict] = None,
                       batch_size: int = 1,
                       config_path: str = REFERENCE_CONFIG,
                       restore_ckpt: Optional[str] = None,
                       timeout: int = 1200) -> None:
    """Run the TF-side forward dump in a fresh subprocess."""
    cmd = [sys.executable, "-m", "merlot_tpu.tools.tf1_name_oracle",
           "--forward-dump", out_npz, "--config", config_path,
           "--batch-size", str(batch_size)]
    if config_overrides:
        cmd += ["--overrides", json.dumps(config_overrides)]
    if restore_ckpt:
        cmd += ["--restore-ckpt", restore_ckpt]
    subprocess.run(cmd, check=True, timeout=timeout,
                   stdout=subprocess.DEVNULL)


def compare_forward_dump(npz_path: str,
                         config_overrides: Optional[Dict] = None,
                         config_path: str = REFERENCE_CONFIG,
                         ) -> Dict[str, Dict[str, float]]:
    """Convert the dump's weights, replay its inputs through our model, and
    return {output_name: {max_abs, max_rel, ref_scale}}."""
    import jax
    import jax.numpy as jnp
    import yaml

    # on TPU, fp32 matmuls default to fast bf16 passes (~1e-1 error at
    # depth); parity needs true fp32 everywhere. No-op on CPU.
    jax.config.update("jax_default_matmul_precision", "highest")

    from merlot_tpu.core.config import NeatConfig
    from merlot_tpu.models.config import MerlotConfig
    from merlot_tpu.models.merlot import MerlotModel
    from merlot_tpu.tools.convert_tf_checkpoint import (convert_arrays,
                                                        merlot_tf_name_map)

    dump = np.load(npz_path)
    tf_arrays = {k[4:]: dump[k] for k in dump.files if k.startswith("var:")}
    ref_outs = {k[4:]: dump[k] for k in dump.files if k.startswith("out:")}
    images = jnp.asarray(dump["in:images"])
    input_ids = jnp.asarray(dump["in:input_ids"])
    shuffled = jnp.asarray(dump["in:shuffled_idx_img"])

    with open(config_path) as f:
        raw = yaml.safe_load(f)
    model_d = dict(NeatConfig.from_dict(raw).model)
    model_d["use_bfloat16"] = False  # fp32 parity, both sides
    if config_overrides:
        model_d.update(config_overrides)
    cfg = MerlotConfig.from_dict(model_d).eval_mode()

    name_map = merlot_tf_name_map(cfg, root="merlot")
    converted = convert_arrays(tf_arrays, name_map, verbose=False)["merlot"]

    model = MerlotModel(cfg)
    group = cfg.num_chunks_in_group or input_ids.shape[1]

    def run(mdl):
        fwd = mdl(images, input_ids, mask_input=False,
                  shuffled_idx_img=shuffled, deterministic=True,
                  attn_backend="xla")
        s = fwd["shapes"]
        h_lang = fwd["encoder_hidden_states"]["lang"].reshape(
            s["B"], group, s["lang_chunk_len"], cfg.hidden_size)[:, :, 0]
        h_viz = fwd["encoder_hidden_states"]["viz"].reshape(
            s["B"], group, s["viz_chunk_len"], cfg.hidden_size)[:, :, 0]
        out = {"hidden_lang": fwd["encoder_hidden_states"]["lang"],
               "hidden_viz": fwd["encoder_hidden_states"]["viz"]}
        for name, xa in (("lang_viz", h_lang), ("viz_viz", h_viz)):
            out[f"allpairs_{name}"] = mdl.temporal_logits(xa, h_viz,
                                                          which=name)
        out["lm_logits8"] = mdl.lm_logits(
            fwd["encoder_hidden_states"]["lang"].reshape(
                -1, cfg.hidden_size)[:8])
        return out

    # our setup() declares every param eagerly (incl. the langonly tower the
    # reference only builds when mask_input=True), so merge the converted
    # weights over a random-init template; unmatched leaves are never read
    # on this path.
    template = jax.jit(lambda: model.init(
        jax.random.PRNGKey(0), method=lambda mdl: run(mdl)))()["params"]
    import flax
    template = flax.core.unfreeze(template)

    from merlot_tpu.train.checkpoint import warm_start
    params, loaded = warm_start(template, converted, verbose=False)
    params = jax.tree.map(jnp.asarray, params)

    ours = jax.jit(lambda p: model.apply({"params": p},
                                         method=lambda mdl: run(mdl)))(params)

    report: Dict[str, Dict[str, float]] = {}
    for name, ref_v in ref_outs.items():
        our_v = np.asarray(ours[name], np.float32).reshape(ref_v.shape)
        diff = np.abs(our_v - ref_v.astype(np.float32))
        scale = float(np.abs(ref_v).max())
        report[name] = {
            "max_abs": float(diff.max()),
            "max_rel": float((diff / (np.abs(ref_v) + 1e-6)).max()),
            "ref_scale": scale,
        }
    return report


VCR_CONFIG = "/root/reference/model/configs/merlot_vcr.yaml"


def compare_vcr_forward_dump(npz_path: str,
                             config_overrides: Optional[Dict] = None,
                             config_path: str = VCR_CONFIG
                             ) -> Dict[str, Dict[str, float]]:
    """VCR-shaped parity: the reference's num_texts=4 eval forward + answer
    head vs our VCRModel after weight conversion."""
    import flax
    import jax
    import jax.numpy as jnp
    import yaml

    jax.config.update("jax_default_matmul_precision", "highest")

    from merlot_tpu.core.config import NeatConfig
    from merlot_tpu.downstream.vcr.modeling import VCRModel
    from merlot_tpu.models.config import MerlotConfig
    from merlot_tpu.tools.convert_tf_checkpoint import (convert_arrays,
                                                        merlot_tf_name_map)
    from merlot_tpu.train.checkpoint import warm_start

    dump = np.load(npz_path)
    tf_arrays = {k[4:]: dump[k] for k in dump.files if k.startswith("var:")}
    images = jnp.asarray(dump["in:images"])
    lm_input = jnp.asarray(dump["in:input_ids"])

    with open(config_path) as f:
        raw = yaml.safe_load(f)
    model_d = dict(NeatConfig.from_dict(raw).model)
    model_d["use_bfloat16"] = False
    if config_overrides:
        model_d.update(config_overrides)
    cfg = MerlotConfig.from_dict(model_d).eval_mode()

    name_map = merlot_tf_name_map(cfg, root="merlot",
                                  include_vcr_heads=True)
    converted = convert_arrays(tf_arrays, name_map, verbose=False)

    model = VCRModel(cfg)
    template = flax.core.unfreeze(jax.jit(lambda: model.init(
        jax.random.PRNGKey(0), images, lm_input,
        mode="answer"))()["params"])
    params, _ = warm_start(template, converted, verbose=False)
    logits = jax.jit(lambda p: model.apply(
        {"params": p}, images, lm_input, mode="answer"))(
        jax.tree.map(jnp.asarray, params))

    report: Dict[str, Dict[str, float]] = {}
    ref_v = dump["out:answer_logits"].astype(np.float32)
    our_v = np.asarray(logits, np.float32).reshape(ref_v.shape)
    diff = np.abs(our_v - ref_v)
    report["answer_logits"] = {"max_abs": float(diff.max()),
                               "ref_scale": float(np.abs(ref_v).max())}
    return report


GROVER_CONFIG = "/root/reference/data/groverdenoise/lm/configs/medium.json"


def compare_grover_forward_dump(npz_path: str,
                                config_path: str = GROVER_CONFIG
                                ) -> Dict[str, Dict[str, float]]:
    """Grover analogue of compare_forward_dump: convert the reference
    GroverModel's dumped random-init weights and replay its inputs through
    our GroverLM; returns max-diff stats for hidden states and LM logits."""
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_default_matmul_precision", "highest")

    from merlot_tpu.models.grover import GroverConfig, GroverLM
    from merlot_tpu.tools.convert_tf_checkpoint import (convert_arrays,
                                                        grover_tf_name_map)

    dump = np.load(npz_path)
    tf_arrays = {k[4:]: dump[k] for k in dump.files if k.startswith("var:")}
    ids = jnp.asarray(dump["in:input_ids"])
    b, s = ids.shape

    gc = GroverConfig.from_json_file(config_path)
    name_map = grover_tf_name_map(gc.num_hidden_layers, root="")
    params = jax.tree.map(jnp.asarray,
                          convert_arrays(tf_arrays, name_map, verbose=False))

    model = GroverLM(gc)
    logits, _, hidden = jax.jit(lambda p: model.apply(
        {"params": p}, ids, deterministic=True, return_hidden=True))(params)

    report: Dict[str, Dict[str, float]] = {}
    for name, ours in (("logits", logits), ("hidden", hidden)):
        key = "logits_flat" if name == "logits" else "hidden_flat"
        ref_v = dump[f"out:{key}"].astype(np.float32)
        our_v = np.asarray(ours, np.float32).reshape(ref_v.shape)
        diff = np.abs(our_v - ref_v)
        report[name] = {"max_abs": float(diff.max()),
                        "ref_scale": float(np.abs(ref_v).max())}
    return report


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", default=None,
                    help="restore the reference graph from this TF ckpt "
                         "(released-weights mode)")
    ap.add_argument("--config", default=REFERENCE_CONFIG)
    ap.add_argument("--overrides", default=None,
                    help="JSON model-config overrides (tiny-shape runs)")
    ap.add_argument("--npz", default="/tmp/ref_forward_dump.npz")
    ap.add_argument("--reuse-dump", action="store_true",
                    help="skip the TF step; compare an existing dump")
    ap.add_argument("--tol", type=float, default=2e-2,
                    help="max-abs tolerance on the allpairs logits")
    args = ap.parse_args()
    overrides = json.loads(args.overrides) if args.overrides else None

    if not args.reuse_dump:
        run_reference_dump(args.npz, overrides, config_path=args.config,
                           restore_ckpt=args.checkpoint)
    report = compare_forward_dump(args.npz, overrides,
                                  config_path=args.config)
    ok = True
    for name, r in sorted(report.items()):
        print(f"{name:24s} max_abs={r['max_abs']:.3e} "
              f"max_rel={r['max_rel']:.3e} ref_scale={r['ref_scale']:.3f}")
        if name.startswith("allpairs") and r["max_abs"] > args.tol:
            ok = False
    print("PARITY OK" if ok else "PARITY FAILED")
    raise SystemExit(0 if ok else 1)


if __name__ == "__main__":
    main()
