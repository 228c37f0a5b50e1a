"""True multi-process jax.distributed execution (VERDICT r1 item 5).

Two OS processes join one jax.distributed cluster (4 virtual CPU devices
each), shard input files per-host (reference: model/dataloader.py:146-167),
assemble the global batch across processes, and run one train step with
cross-process gradient collectives. The loss must equal a single-process
8-device run on the same global batch bit-for-bit.

Runs in subprocesses (jax.distributed can only initialize once per
process); ~3 min on the 1-core host.
"""

import os
import subprocess
import sys


def test_two_process_training_matches_single(tmp_path):
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # workers set their own platform
    r = subprocess.run(
        [sys.executable, "-m", "merlot_tpu.tools.multiprocess_smoke",
         "--num-procs", "2", "--workdir", str(tmp_path / "mp")],
        capture_output=True, text=True, env=env, timeout=840)
    assert r.returncode == 0, f"\nSTDOUT:\n{r.stdout}\nSTDERR:\n{r.stderr[-3000:]}"
    assert "MULTIPROCESS SMOKE OK" in r.stdout
