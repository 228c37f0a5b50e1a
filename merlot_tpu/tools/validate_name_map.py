"""Validate the TF->ours converter name maps against the reference graphs.

The strongest available proof short of the (network-unreachable) released
checkpoint: tools/tf1_name_oracle.py builds the reference's OWN pretraining
graph (model/modeling.py) and Grover LM graph (data/groverdenoise/lm/
modeling.py) under a tf.compat.v1 shim and enumerates every variable; this
module asserts the converter maps (tools/convert_tf_checkpoint.py) are an
exact bijection from those names onto our flax param trees, shape-for-shape.
Because TPUEstimator checkpoints store plain variable names, the oracle's
names ARE the released checkpoint's names — so a green run here means
convert_tf_checkpoint will restore gs://merlot weights loss-lessly the
moment the bytes are obtainable (see tools/checkpoint_parity.py for the
staged logit-level harness).

CLI:  python -m merlot_tpu.tools.validate_name_map [--report PARITY.md]
"""

from __future__ import annotations

import argparse
from typing import Dict, List, Tuple

REFERENCE_CONFIG = "/root/reference/model/configs/merlot.yaml"
GROVER_CONFIG = "/root/reference/data/groverdenoise/lm/configs/medium.json"


def _flatten_shapes(tree, prefix: Tuple[str, ...] = ()) -> Dict[str, tuple]:
    out: Dict[str, tuple] = {}
    if hasattr(tree, "shape"):
        out["/".join(prefix)] = tuple(tree.shape)
        return out
    for k, v in tree.items():
        out.update(_flatten_shapes(v, prefix + (k,)))
    return out


def our_merlot_shapes(mc) -> Dict[str, tuple]:
    """Param-path -> shape for MerlotPretrainModel at config ``mc``
    (jax.eval_shape: no memory, no compile)."""
    import jax
    import jax.numpy as jnp

    from merlot_tpu.models.pretrain import MerlotPretrainModel

    model = MerlotPretrainModel(mc)
    b, chunks = 1, mc.num_chunks_in_group
    batch = {
        "images": jnp.zeros((b * chunks, *mc.image_size, 3), jnp.float32),
        "input_ids": jnp.zeros((b, chunks, 32), jnp.int32),
        "shuffled_idx_img": jnp.zeros((b * chunks,), jnp.int32),
        "video_src_ids": jnp.zeros((b, chunks), jnp.int32),
    }
    shapes = jax.eval_shape(lambda: model.init(
        {"params": jax.random.PRNGKey(0), "masking": jax.random.PRNGKey(1)},
        batch, deterministic=True))
    return _flatten_shapes(shapes["params"])


def our_grover_shapes(gc) -> Dict[str, tuple]:
    import jax
    import jax.numpy as jnp

    from merlot_tpu.models.grover import GroverLM

    model = GroverLM(gc)
    ids = jnp.zeros((1, 8), jnp.int32)
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), ids, deterministic=True))
    return _flatten_shapes(shapes["params"])


def check_bijection(tf_vars: List[Tuple[str, tuple]],
                    name_map: Dict[str, str],
                    our_shapes: Dict[str, tuple],
                    skip_tf: frozenset = frozenset()) -> List[str]:
    """Returns a list of problems (empty == exact shape-checked bijection)."""
    problems: List[str] = []
    tf_shapes = {n: s for n, s in tf_vars}
    uncovered_ours = dict(our_shapes)

    for tf_name in tf_shapes:
        if tf_name in skip_tf:
            continue
        if tf_name not in name_map:
            problems.append(f"TF var not in map: {tf_name} {tf_shapes[tf_name]}")
    for tf_name, our_path in name_map.items():
        if tf_name not in tf_shapes:
            problems.append(f"map key not a TF var: {tf_name}")
            continue
        if our_path not in our_shapes:
            problems.append(f"map target missing in our tree: {our_path}")
            continue
        if tuple(tf_shapes[tf_name]) != uncovered_ours.pop(our_path, None):
            problems.append(
                f"shape mismatch {tf_name} {tf_shapes[tf_name]} -> "
                f"{our_path} {our_shapes[our_path]}")
    for our_path, shape in uncovered_ours.items():
        problems.append(f"our param not covered by map: {our_path} {shape}")
    return problems


def validate_all(report_path: str | None = None) -> Dict[str, dict]:
    """Run both oracles, validate both maps, optionally write a report."""
    import yaml

    from merlot_tpu.core.config import NeatConfig
    from merlot_tpu.models.config import MerlotConfig
    from merlot_tpu.models.grover import GroverConfig
    from merlot_tpu.tools.convert_tf_checkpoint import (grover_tf_name_map,
                                                        merlot_tf_name_map)
    from merlot_tpu.tools.tf1_name_oracle import (grover_reference_variables,
                                                  reference_variables)

    results: Dict[str, dict] = {}

    with open(REFERENCE_CONFIG) as f:
        cfg = yaml.safe_load(f)
    mc = MerlotConfig.from_dict(NeatConfig.from_dict(cfg).model)
    tf_vars = reference_variables(REFERENCE_CONFIG, include_vcr_heads=True)
    name_map = merlot_tf_name_map(mc, include_vcr_heads=False)
    ours = our_merlot_shapes(mc)
    vcr_vars = frozenset(n for n, _ in tf_vars if n.endswith(
        ("classifier_mlp0/kernel", "classifier_mlp0/bias",
         "classifier_mlp1/kernel", "classifier_mlp1/bias")))
    problems = check_bijection(tf_vars, name_map, ours, skip_tf=vcr_vars)
    # the VCR heads map onto the downstream model's head tree, checked by
    # key-name membership only (our head tree needs a VCR config to build)
    vcr_map = {k: v for k, v in merlot_tf_name_map(
        mc, include_vcr_heads=True).items() if k not in name_map}
    for tf_name in sorted(vcr_vars):
        if tf_name not in vcr_map:
            problems.append(f"VCR head var not in map: {tf_name}")
    results["merlot"] = {
        "tf_vars": len(tf_vars), "mapped": len(name_map) + len(vcr_map),
        "our_params": len(ours), "problems": problems,
    }

    gc = GroverConfig.from_json_file(GROVER_CONFIG)
    g_vars = grover_reference_variables(GROVER_CONFIG)
    g_map = grover_tf_name_map(gc.num_hidden_layers, root="")
    g_ours = our_grover_shapes(gc)
    results["grover"] = {
        "tf_vars": len(g_vars), "mapped": len(g_map),
        "our_params": len(g_ours),
        "problems": check_bijection(g_vars, g_map, g_ours),
    }

    if report_path:
        _write_report(report_path, results)
    return results


def _write_report(path: str, results: Dict[str, dict]) -> None:
    lines = [
        "# Checkpoint name-map parity report",
        "",
        "Generated by `python -m merlot_tpu.tools.validate_name_map"
        " --report PARITY.md`.",
        "",
        "The reference's own graph builders (imported read-only under a",
        "tf.compat.v1 shim — tools/tf1_name_oracle.py) were instantiated at",
        "the released configs and every `tf.global_variables()` name+shape",
        "compared against the converter maps in",
        "tools/convert_tf_checkpoint.py. TPUEstimator checkpoints store",
        "exactly these names, so this validates the restore path for the",
        "released gs://merlot weights without network access.",
        "",
        "| model | TF vars | map entries | our params | problems |",
        "|---|---|---|---|---|",
    ]
    for k, r in results.items():
        lines.append(f"| {k} | {r['tf_vars']} | {r['mapped']} | "
                     f"{r['our_params']} | {len(r['problems'])} |")
    for k, r in results.items():
        if r["problems"]:
            lines.append(f"\n## {k} problems\n")
            lines += [f"- {p}" for p in r["problems"]]
    lines.append("")
    with open(path, "w") as f:
        f.write("\n".join(lines))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--report", default=None)
    args = ap.parse_args()
    results = validate_all(args.report)
    ok = True
    for k, r in results.items():
        status = "OK" if not r["problems"] else f"{len(r['problems'])} PROBLEMS"
        print(f"{k}: tf_vars={r['tf_vars']} mapped={r['mapped']} "
              f"our_params={r['our_params']} -> {status}")
        for p in r["problems"][:50]:
            print("  !", p)
        ok = ok and not r["problems"]
    raise SystemExit(0 if ok else 1)


if __name__ == "__main__":
    main()
