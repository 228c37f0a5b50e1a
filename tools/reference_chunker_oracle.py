"""Run the REFERENCE's offline text pipeline on its own example video data.

Imports /root/reference/data/process.py (read-only oracle) under light
shims — editdistance/tslearn/ftfy are not in this image, so they are backed
by merlot_tpu's own primitives (edit_distance, dtw_path, fix_text), which
are unit-tested separately; what this oracle validates is the
ORCHESTRATION: subtitle cleanup, DTW alignment plumbing, and the greedy
<=31-token chunk-commit logic, on the reference's real
data/example_video/WAaKRUoY6Io.grover.json.

Prints one JSON document: the reference implementation's chunk list.
tests/test_process.py compares merlot_tpu's chunker output field by field.
"""

import json
import sys
import types

REFERENCE_ROOT = "/root/reference"
EXAMPLE = f"{REFERENCE_ROOT}/data/example_video/WAaKRUoY6Io.grover.json"


def install_shims():
    sys.path.insert(0, REFERENCE_ROOT)
    repo_root = "/root/repo"
    if repo_root not in sys.path:
        sys.path.insert(0, repo_root)

    from merlot_tpu.data.process import dtw_path, edit_distance

    ed = types.ModuleType("editdistance")
    ed.eval = lambda a, b: edit_distance(a, b)
    sys.modules["editdistance"] = ed

    ts = types.ModuleType("tslearn")
    tsm = types.ModuleType("tslearn.metrics")

    def dtw_path_from_metric(cost, metric="precomputed"):
        assert metric == "precomputed"
        path = dtw_path(cost)
        score = float(sum(cost[i, j] for i, j in path))
        return path, score

    tsm.dtw_path_from_metric = dtw_path_from_metric
    ts.metrics = tsm
    sys.modules["tslearn"] = ts
    sys.modules["tslearn.metrics"] = tsm

    # merlot's fix_text itself defers to ftfy when importable, so the shim
    # must be the identity (both sides then apply the same no-op repair)
    ft = types.ModuleType("ftfy")
    ft.ftfy = lambda text: text
    sys.modules["ftfy"] = ft

    sk = types.ModuleType("skvideo")
    sk.io = types.ModuleType("skvideo.io")
    sys.modules["skvideo"] = sk
    sys.modules["skvideo.io"] = sk.io

    gc = types.ModuleType("google.cloud")
    gc.storage = types.ModuleType("google.cloud.storage")
    sys.modules.setdefault("google", types.ModuleType("google"))
    sys.modules["google.cloud"] = gc
    sys.modules["google.cloud.storage"] = gc.storage

    tq = types.ModuleType("tqdm")
    tq.tqdm = lambda x, *a, **k: x
    sys.modules["tqdm"] = tq

    dm = types.ModuleType("demoji")
    dm.findall = lambda text: {}  # only used by clean_description (untested path)
    sys.modules["demoji"] = dm


def main():
    install_shims()
    import os
    os.chdir(f"{REFERENCE_ROOT}/data")  # module-level open() of the example

    # data/process.py is a SCRIPT: importing it would run the whole shard
    # writer (and fail on the absent .mp4). Execute only the prefix up to
    # the first driver function — everything needed for chunking.
    with open(f"{REFERENCE_ROOT}/data/process.py") as f:
        src = f.read()
    cut = src.index("def video_chunk_iterator")
    ns: dict = {"__name__": "ref_process_prefix"}
    exec(compile(src[:cut], "reference/data/process.py", "exec"), ns)

    with open(EXAMPLE) as f:
        item = json.load(f)
    chunks = ns["split_video_into_chunks"](item)
    out = [{
        "start": int(c["start_idx"]) if "start_idx" in c else int(c.get("start", -1)),
        "end": int(c["end_idx"]) if "end_idx" in c else int(c.get("end", -1)),
        "clean_enc": [int(t) for t in (c.get("cleantext_enc")
                                       if "cleantext_enc" in c
                                       else c.get("clean_enc", []))],
        "noisy_enc": [int(t) for t in (c.get("noisytext_enc")
                                       if "noisytext_enc" in c
                                       else c.get("noisy_enc", []))],
        "is_eoc": bool(c.get("is_eoc", False)),
        "mean_timestep": float(c.get("mean_timestep", -1.0)),
    } for c in chunks]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
