"""Kinetics 3D-ResNeXt-101 motion backbone (vision/resnext3d.py).

The upstream app_mot motion half comes from 3D-ResNets-PyTorch's
``resnext-101-kinetics.pth`` (consumed at nextqa_data.py:127-149).
These tests pin the JAX rebuild against an in-test torch transcription
of that architecture (numeric oracle through the converter), the
converter's full-101 layout, and the extraction integration.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vqacl_tpu.vision import resnext3d as rx

pytestmark = pytest.mark.slow  # full-pipeline / compile-heavy (>5 s)

TINY_STAGES = [(1, 32, 1), (2, 64, 2)]   # block0 identity + projection paths


# ---------------------------------------------------------------------------
# torch reference (transcribed ResNeXt-3D semantics, kenshohara layout)
# ---------------------------------------------------------------------------

def _make_torch(stages, cardinality=32, seed=0):
    import torch
    import torch.nn as nn

    class Bottleneck(nn.Module):
        def __init__(self, cin, planes, stride, downsample):
            super().__init__()
            mid = cardinality * (planes // 32)
            self.conv1 = nn.Conv3d(cin, mid, 1, bias=False)
            self.bn1 = nn.BatchNorm3d(mid)
            self.conv2 = nn.Conv3d(mid, mid, 3, stride=stride, padding=1,
                                   groups=cardinality, bias=False)
            self.bn2 = nn.BatchNorm3d(mid)
            self.conv3 = nn.Conv3d(mid, planes * 2, 1, bias=False)
            self.bn3 = nn.BatchNorm3d(planes * 2)
            self.relu = nn.ReLU()
            self.downsample = downsample

        def forward(self, x):
            r = x if self.downsample is None else self.downsample(x)
            y = self.relu(self.bn1(self.conv1(x)))
            y = self.relu(self.bn2(self.conv2(y)))
            return self.relu(self.bn3(self.conv3(y)) + r)

    class Net(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv3d(3, 64, 7, stride=(1, 2, 2), padding=3,
                                   bias=False)
            self.bn1 = nn.BatchNorm3d(64)
            self.relu = nn.ReLU()
            self.maxpool = nn.MaxPool3d(3, stride=2, padding=1)
            self.n_stages = len(stages)
            cin = 64
            for i, (n, planes, stride) in enumerate(stages):
                blocks = []
                cout = planes * 2
                for b in range(n):
                    s = stride if b == 0 else 1
                    down = None
                    if b == 0 and (cin != cout or s != 1):
                        down = nn.Sequential(
                            nn.Conv3d(cin, cout, 1, stride=s, bias=False),
                            nn.BatchNorm3d(cout))
                    blocks.append(Bottleneck(cin if b == 0 else cout,
                                             planes, s, down))
                setattr(self, f"layer{i + 1}", nn.Sequential(*blocks))
                cin = cout
            self.fc = nn.Linear(cin, 7)

        def forward(self, x):                       # NCDHW
            x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
            for i in range(self.n_stages):
                x = getattr(self, f"layer{i + 1}")(x)
            return x.mean(dim=(2, 3, 4))            # pooled features

    torch.manual_seed(seed)
    net = Net()
    with torch.no_grad():
        for m in net.modules():
            if isinstance(m, nn.Conv3d):
                m.weight.normal_(0, 0.1)
            elif isinstance(m, nn.BatchNorm3d):
                m.weight.normal_(1.0, 0.2)
                m.bias.normal_(0, 0.1)
                m.running_mean.normal_(0, 0.2)
                m.running_var.uniform_(0.5, 2.0)
    return net.eval()


def test_oracle_vs_torch():
    """Converted tiny torch net == JAX forward (identity AND projection
    shortcuts, grouped conv, BN folding, explicit torch padding)."""
    import torch
    net = _make_torch(TINY_STAGES)
    params = rx.from_torch_state_dict(
        {k: v.numpy() for k, v in net.state_dict().items()},
        stages=TINY_STAGES)
    x = np.random.default_rng(0).normal(
        size=(2, 8, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        want = net(torch.from_numpy(x).permute(0, 4, 1, 2, 3)).numpy()
    got = np.asarray(rx.resnext3d_features(
        params, jnp.asarray(x), stages=TINY_STAGES))
    assert got.shape == want.shape == (2, 128)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_torch_checkpoint_load(tmp_path):
    """torch.save round trip incl. the DataParallel ``module.`` prefix
    and the {'state_dict': ...} wrapper of the published checkpoint."""
    import torch
    net = _make_torch(TINY_STAGES, seed=1)
    sd = {f"module.{k}": v for k, v in net.state_dict().items()}
    path = str(tmp_path / "resnext-tiny-kinetics.pth")
    torch.save({"arch": "resnext-101", "state_dict": sd}, path)
    params = rx.load_torch_checkpoint(path, stages=TINY_STAGES)
    x = np.random.default_rng(1).normal(
        size=(1, 8, 16, 16, 3)).astype(np.float32)
    with torch.no_grad():
        want = net(torch.from_numpy(x).permute(0, 4, 1, 2, 3)).numpy()
    got = np.asarray(rx.resnext3d_features(
        params, jnp.asarray(x), stages=TINY_STAGES))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def _full_101_state_dict():
    sd = {}

    def conv_bn(ck, bk, o, i, k):
        sd[f"{ck}.weight"] = np.zeros((o, i, k, k, k), np.float32)
        sd[f"{bk}.weight"] = np.ones((o,), np.float32)
        sd[f"{bk}.bias"] = np.zeros((o,), np.float32)
        sd[f"{bk}.running_mean"] = np.zeros((o,), np.float32)
        sd[f"{bk}.running_var"] = np.ones((o,), np.float32)

    conv_bn("conv1", "bn1", 64, 3, 7)
    cin = 64
    for si, (n, planes, stride) in enumerate(rx.R3D101_STAGES):
        mid = rx.CARDINALITY * (planes // 32)
        cout = planes * rx.EXPANSION
        for b in range(n):
            pre = f"layer{si + 1}.{b}"
            conv_bn(f"{pre}.conv1", f"{pre}.bn1",
                    mid, cin if b == 0 else cout, 1)
            conv_bn(f"{pre}.conv2", f"{pre}.bn2",
                    mid, mid // rx.CARDINALITY, 3)
            conv_bn(f"{pre}.conv3", f"{pre}.bn3", cout, mid, 1)
            if b == 0:
                conv_bn(f"{pre}.downsample.0", f"{pre}.downsample.1",
                        cout, cin, 1)
        cin = cout
    sd["fc.weight"] = np.zeros((400, 2048), np.float32)
    sd["fc.bias"] = np.zeros((400,), np.float32)
    return sd


def test_full_101_converter_layout():
    """The converter consumes every entry of a full resnext-101-kinetics
    layout (3/4/23/3 blocks, grouped [mid, mid/32] conv2, fc dropped)
    and produces kernels in DHWIO with the right shapes."""
    params = rx.from_torch_state_dict(_full_101_state_dict())
    assert params["stem"]["w"].shape == (7, 7, 7, 3, 64)
    st2 = params["stage_2"]                         # 23-block stage
    assert len(st2) == 23
    assert st2["block_0"]["conv2"]["w"].shape == (3, 3, 3, 16, 512)
    assert st2["block_0"]["shortcut"]["w"].shape == (1, 1, 1, 512, 1024)
    assert "shortcut" not in st2["block_1"]
    assert params["stage_3"]["block_2"]["conv3"]["w"].shape == \
        (1, 1, 1, 1024, 2048)


def test_converter_rejects_unknown_keys():
    sd = _full_101_state_dict()
    sd["layer5.0.conv1.weight"] = np.zeros((1,), np.float32)
    with pytest.raises(ValueError, match="unconsumed"):
        rx.from_torch_state_dict(sd)


def test_preprocess_clip_mean():
    x = np.full((4, 8, 8, 3), 128, np.uint8)
    y = rx.preprocess_clip(x)
    np.testing.assert_allclose(
        y[0, 0, 0], 128 - np.asarray(rx.KINETICS_MEAN_RGB), rtol=1e-6)


def test_load_clips_consecutive(tmp_path):
    from vqacl_tpu.vision import video
    arr = np.arange(40, dtype=np.uint8)[:, None, None, None] * \
        np.ones((1, 6, 6, 3), np.uint8)
    np.save(tmp_path / "v.npy", arr)
    clips = video.load_clips(str(tmp_path / "v.npy"), n_clips=4, clip_len=8)
    assert clips.shape == (4, 8, 6, 6, 3)
    vals = clips[:, :, 0, 0, 0].astype(np.int64)
    # consecutive frames inside each clip (clamped at the boundaries)
    assert np.all(np.diff(vals, axis=1) >= 0)
    assert np.all(np.diff(vals, axis=1) <= 1)
    inner = vals[1]                                  # away from boundaries
    np.testing.assert_array_equal(np.diff(inner), np.ones(7))
    # clips are centered on the uniform sample points
    centers = video.sample_indices(40, 4)
    np.testing.assert_array_equal(vals[:, 4], centers)


def test_extract_videos_with_motion_backbone(tmp_path):
    """End-to-end: appearance via the 2D backbone + motion via a tiny
    3D ResNeXt; a static clip yields (near-)constant motion rows."""
    from vqacl_tpu.vision import frcnn, video

    rng = np.random.default_rng(3)
    moving = rng.integers(0, 255, size=(32, 24, 24, 3), dtype=np.uint8)
    static = np.tile(moving[:1], (32, 1, 1, 1))
    np.save(tmp_path / "vid_mov.npy", moving)
    np.save(tmp_path / "vid_sta.npy", static)

    backbone = frcnn.init_frcnn(jax.random.PRNGKey(0))
    motion = rx.init_resnext3d(jax.random.PRNGKey(1), stages=TINY_STAGES)
    table = video.extract_videos(
        backbone, video.enumerate_video_sources(str(tmp_path)),
        side=32, motion_params=motion, motion_stages=TINY_STAGES,
        motion_side=16)
    feat = table["vid_mov"]
    assert feat.shape == (16, 2048 + 128)
    app, mot = feat[:, :2048], feat[:, 2048:]
    assert np.abs(app).max() > 0 and np.abs(mot).max() > 0
    smot = table["vid_sta"][:, 2048:]
    np.testing.assert_allclose(smot, np.tile(smot[:1], (16, 1)),
                               rtol=1e-4, atol=1e-4)
    assert np.abs(mot - mot[0]).max() > 1e-4
