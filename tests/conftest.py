"""Test harness config: force an 8-device virtual CPU mesh.

Per SURVEY.md §4: multi-chip sharding is exercised on
``xla_force_host_platform_device_count=8`` CPU so CI needs no TPU; the
driver separately compile-checks the TPU path via __graft_entry__.
Must run before any jax import.
"""

import os

# The session env pins JAX_PLATFORMS=axon (the tunneled TPU chip); tests
# must run on the virtual CPU mesh. The axon plugin ignores the env var,
# so force the platform through jax.config before any backend init.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
# persistent compile cache: repeat suite runs skip the big CPU compiles
_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(_repo, ".jax_cache_cpu"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def vqa_root_full(tmp_path_factory):
    """Reference-format dataset dir covering ALL 10 tasks (subprocess
    tests can't monkeypatch the task list, so the full layout is
    required). Tiny: 12 train / 4 val / 4 test per task."""
    import json

    from vqacl_tpu.cl.tasks import ALL_TASKS
    from vqacl_tpu.data.features import write_h5

    root = tmp_path_factory.mktemp("vqa_full")
    rng = np.random.default_rng(0)
    (root / "vqa" / "Partition_Q").mkdir(parents=True)
    (root / "COCO" / "features").mkdir(parents=True)
    ques_map, cate_map, h5_records = {}, {}, []
    qid = 0
    for t_idx, task in enumerate(ALL_TASKS):
        for split in ("karpathy_train", "karpathy_val", "karpathy_test"):
            n = 12 if "train" in split else 4
            items = []
            for _ in range(n):
                img_id = f"COCO_val2014_{qid:012d}"
                c = int(rng.integers(0, 80))
                cate_map[img_id] = c
                ques_map[str(qid)] = t_idx
                ans = f"ans{c % 3}"
                items.append({"img_id": img_id, "question_id": qid,
                              "sent": f"what is category {c}",
                              "label": {ans: 1.0},
                              "answers": [{"answer": ans}] * 10,
                              "question_type": "what is",
                              "answer_type": "other"})
                feats = np.full((36, 2048), c / 80.0, np.float32)
                boxes = rng.uniform(0, 50, (36, 4)).astype(np.float32)
                boxes[:, 2:] += boxes[:, :2]
                h5_records.append((img_id, {"features": feats,
                                            "boxes": boxes.clip(0, 100),
                                            "img_h": 100, "img_w": 100}))
                qid += 1
            with open(root / "vqa" / "Partition_Q"
                      / f"{split}_{task}.json", "w") as f:
                json.dump(items, f)
    with open(root / "QuesId_task_map.json", "w") as f:
        json.dump(ques_map, f)
    with open(root / "ImgId_cate_map.json", "w") as f:
        json.dump(cate_map, f)
    write_h5(str(root / "COCO" / "features" / "val2014_obj36.h5"),
             h5_records)
    return str(root)
