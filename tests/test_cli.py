"""CLI arg → Config mapping (reference flag spellings)."""

from vqacl_tpu.cli.args import parse_config

import pytest

pytestmark = pytest.mark.slow  # full-pipeline / compile-heavy (>5 s)


def test_reference_launch_flags_translate():
    # the reference's VQACL_train.sh invocation, verbatim flags
    cfg = parse_config([
        "--train", "karpathy_train", "--valid", "karpathy_val",
        "--test", "karpathy_test", "--batch_size", "80",
        "--valid_batch_size", "100", "--epochs", "3", "--lr", "1e-4",
        "--warmup_ratio", "0.1", "--clip_grad_norm", "5",
        "--from_scratch", "--memory", "--m_size", "5000",
        "--comp_cate", "G-1", "--now_train", "--output", "snap/test",
    ])
    assert cfg.train.batch_size == 80
    assert cfg.train.valid_batch_size == 100
    assert cfg.train.epochs == 3
    assert cfg.train.lr == 1e-4
    assert cfg.train.clip_grad_norm == 5.0
    assert cfg.train.from_scratch
    assert cfg.train.memory and cfg.train.m_size == 5000
    assert cfg.train.comp_cate == "G-1"
    assert cfg.output == "snap/test"
    assert cfg._cli.now_train


def test_tpu_flags():
    cfg = parse_config(["--mesh_dp", "4", "--mesh_tp", "2",
                        "--dtype", "float32", "--remat",
                        "--device_cache", "--use_memory_loss"])
    assert cfg.mesh.dp == 4 and cfg.mesh.tp == 2
    assert cfg.mesh.dtype == "float32" and cfg.mesh.remat
    assert cfg.data.device_cache
    assert cfg.train.use_memory_loss


def test_yaml_roundtrip(tmp_path):
    from vqacl_tpu.utils.config import Config
    cfg = parse_config(["--lr", "3e-4", "--m_size", "123"])
    path = str(tmp_path / "cfg.yaml")
    cfg.save(path)
    cfg2 = Config.load(path)
    assert cfg2.train.lr == 3e-4
    assert cfg2.train.m_size == 123
    assert cfg2.model.d_model == cfg.model.d_model


def test_resolve_fused_attention_auto():
    """auto → True only on single-device TPU; explicit values untouched."""
    from vqacl_tpu.utils.config import (ModelConfig,
                                        resolve_fused_attention)

    m = ModelConfig()
    assert m.fused_attention == "auto"
    resolve_fused_attention(m, n_devices=1)   # CPU test env → False
    assert m.fused_attention is False

    m = ModelConfig(fused_attention=True)
    resolve_fused_attention(m, n_devices=8)
    assert m.fused_attention is True          # explicit wins

    m = ModelConfig()
    resolve_fused_attention(m, n_devices=8)   # multi-device → False
    assert m.fused_attention is False


def test_sigterm_writes_emergency_checkpoint(tmp_path, vqa_root_full):
    """SIGTERM mid-training (preemption/eviction) must exit non-zero
    AFTER writing an *_EMERGENCY checkpoint (cli signal handler →
    SystemExit → trainer's BaseException emergency-save path)."""
    import signal
    import subprocess
    import sys
    import time

    out = tmp_path / "snap"
    proc = subprocess.Popen(
        [sys.executable, "-u", "-m", "vqacl_tpu.cli.vqacl_train",
         "--platform", "cpu", "--dataset_root", vqa_root_full,
         "--output", str(out), "--tiny_model", "--batch_size", "8",
         "--valid_batch_size", "8", "--epochs", "50", "--m_size", "20",
         "--lr", "1e-3", "--now_train"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
    # whole-test watchdog: if the subprocess goes silent at any phase
    # the blocking readline/read would hang the suite (no pytest-timeout
    # configured) — killing the process EOFs the pipe and unblocks us.
    import threading
    killer = threading.Timer(700, proc.kill)
    killer.daemon = True
    killer.start()
    try:
        # wait until the first group is actually training
        started = False
        for line in proc.stdout:
            if "-- group" in line:
                started = True
                break
        assert started, "training never started"
        time.sleep(2)
        proc.send_signal(signal.SIGTERM)
        proc.stdout.read()        # drain to let it exit
        rc = proc.wait(timeout=300)
    finally:
        killer.cancel()
        if proc.poll() is None:
            proc.kill()
    assert rc != 0
    emergency = list(out.glob("*_EMERGENCY.npz"))
    assert emergency, f"no emergency checkpoint in {list(out.iterdir())}"
