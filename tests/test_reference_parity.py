"""Composition-level parity against the reference's OWN TF graph.

Round-1's TF-oracle test re-expressed the reference math by hand (blind to
shared misreadings); these tests instead run the reference's own code
(/root/reference/model/modeling.py) via the tf.compat.v1 shim in a
subprocess (tools/tf1_name_oracle.py) and compare:

  * variable names+shapes against the converter maps — exact bijection at
    the released configs (merlot.yaml + grover medium.json);
  * a full fp32 inference forward (encoder_hidden_states + both
    allpairs_temporal_logits heads, the zero-shot PREDICT path) at a tiny
    config — the reference's random-init weights converted through the name
    map must reproduce its outputs through our model.

The TF side always runs in a subprocess: the shim rebinds
sys.modules['tensorflow'] and disables v2 behavior process-wide.
"""

import os
import subprocess
import sys

TINY = {
    "hidden_size": 64, "num_attention_heads": 4, "intermediate_size": 128,
    "num_hidden_layers": 2, "num_vision_transformer_hidden_layers": 2,
    "num_lang_transformer_hidden_layers": 2, "image_size": [64, 96],
    "resnet_layers": [1, 1, 1], "num_chunks_in_group": 4,
}


def _cpu_env():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # Without the pool-IPs trigger this image's sitecustomize skips axon
    # registration entirely. Registration touches the TPU tunnel at import
    # time EVEN under JAX_PLATFORMS=cpu, and a wedged tunnel blocks it for
    # minutes — these CPU-only oracle subprocesses then die on the 420 s
    # timeout with the work never started (observed round 3).
    env.pop("PALLAS_AXON_POOL_IPS", None)
    return env


def test_name_maps_bijective_on_reference_graphs():
    """merlot_tf_name_map / grover_tf_name_map == the reference graphs'
    variable sets, shape-checked both ways, at the released full configs."""
    r = subprocess.run(
        [sys.executable, "-m", "merlot_tpu.tools.validate_name_map"],
        capture_output=True, text=True, env=_cpu_env(), timeout=420)
    assert r.returncode == 0, f"\nSTDOUT:\n{r.stdout}\nSTDERR:\n{r.stderr[-2000:]}"
    assert "merlot: tf_vars=605" in r.stdout
    assert "grover: tf_vars=388" in r.stdout


def test_grover_forward_parity_vs_reference_code(tmp_path):
    """Reference GroverModel random-init fp32 forward == our GroverLM after
    name-map weight conversion (tiny config; 4e-6 at the real 24L medium
    config, recorded in PARITY.md)."""
    import json

    from merlot_tpu.tools.checkpoint_parity import compare_grover_forward_dump

    cfg_path = str(tmp_path / "tiny_grover.json")
    with open(cfg_path, "w") as f:
        json.dump({"vocab_size": 5027, "hidden_size": 64,
                   "num_hidden_layers": 3, "num_attention_heads": 4,
                   "intermediate_size": 128, "max_position_embeddings": 128,
                   "hidden_dropout_prob": 0.1,
                   "attention_probs_dropout_prob": 0.1,
                   "initializer_range": 0.02}, f)
    npz = str(tmp_path / "grover_dump.npz")
    r = subprocess.run(
        [sys.executable, "-m", "merlot_tpu.tools.tf1_name_oracle",
         "--grover-forward-dump", npz, "--config", cfg_path,
         "--batch-size", "2", "--seq-len", "24"],
        capture_output=True, text=True, env=_cpu_env(), timeout=420)
    assert r.returncode == 0, r.stderr[-2000:]
    report = compare_grover_forward_dump(npz, cfg_path)
    for name, stats in report.items():
        assert stats["max_abs"] < 1e-4, (name, stats)


def test_forward_parity_vs_reference_code(tmp_path):
    """Reference random-init fp32 forward == ours after weight conversion."""
    from merlot_tpu.tools.checkpoint_parity import (compare_forward_dump,
                                                    run_reference_dump)
    npz = str(tmp_path / "dump.npz")
    run_reference_dump(npz, TINY, timeout=420)
    report = compare_forward_dump(npz, TINY)
    assert set(report) == {"hidden_lang", "hidden_viz", "lm_logits8",
                           "allpairs_lang_viz", "allpairs_viz_viz"}
    for name, r in report.items():
        assert r["max_abs"] < 5e-3, (name, r)


def test_vcr_forward_parity_vs_reference_code(tmp_path):
    """Reference VCR eval forward (num_texts=4 image duplication + answer
    head, downstream/vcr/modeling.py:40-76) == ours after conversion."""
    import json

    from merlot_tpu.tools.checkpoint_parity import compare_vcr_forward_dump

    overrides = dict(TINY)
    overrides.pop("num_chunks_in_group")
    npz = str(tmp_path / "vcr_dump.npz")
    r = subprocess.run(
        [sys.executable, "-m", "merlot_tpu.tools.tf1_name_oracle",
         "--vcr-forward-dump", npz,
         "--config", "/root/reference/model/configs/merlot_vcr.yaml",
         "--overrides", json.dumps(overrides), "--batch-size", "2"],
        capture_output=True, text=True, env=_cpu_env(), timeout=420)
    assert r.returncode == 0, r.stderr[-2000:]
    report = compare_vcr_forward_dump(npz, overrides)
    assert report["answer_logits"]["max_abs"] < 2e-3, report
