"""Temporal checkpoint ingestion fidelity (round-1 VERDICT missing #3).

The reference loads user torch->ONNX temporal checkpoints
(temporal_detector.py:179-319). Here the contract is a torch state dict with
the documented module naming, carried as .pt / flat .npz / weights-.onnx.
These tests build independent torch mirrors of each temporal family, export
their state dicts through every carrier format, load them through the
engine/loader, and require output equality with torch's own forward.
"""

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from realtime_analytics_tpu.models.temporal import build_temporal
from realtime_analytics_tpu.models.weights import (
    load_temporal_checkpoint,
    temporal_params_from_state_dict,
    temporal_state_dict_from_params,
)

NC = 12
CLIP = (2, 8, 32, 32, 3)  # [N, T, H, W, C]


class TorchCNNLSTM(nn.Module):
    """Mirror of models/temporal.py:CNNLSTM (documented checkpoint layout)."""

    def __init__(self, nc=NC, feat=256, hidden=256, pooling="avg"):
        super().__init__()
        self.c1 = nn.Conv2d(3, 64, 3, stride=2, padding=1)
        self.c2 = nn.Conv2d(64, 128, 3, stride=2, padding=1)
        self.c3 = nn.Conv2d(128, 256, 3, stride=2, padding=1)
        self.proj = nn.Linear(256, feat)
        self.lstm = nn.LSTM(feat, hidden, batch_first=True)
        self.fc = nn.Linear(hidden, nc)
        self.pooling = pooling

    def forward(self, clips):  # [N, T, H, W, C] float
        n, t = clips.shape[:2]
        x = clips.reshape(n * t, *clips.shape[2:]).permute(0, 3, 1, 2)
        y = torch.relu(self.c1(x))
        y = nn.functional.max_pool2d(y, 2, stride=2)
        y = torch.relu(self.c2(y))
        y = torch.relu(self.c3(y))
        y = y.mean(dim=(2, 3))
        y = torch.relu(self.proj(y)).reshape(n, t, -1)
        hs, _ = self.lstm(y)  # [N, T, H]
        pooled = hs.mean(dim=1) if self.pooling == "avg" else hs[:, -1]
        return self.fc(pooled)


class TorchConvGRU(nn.Module):
    """Mirror of models/temporal.py:ConvGRU."""

    def __init__(self, nc=NC, hc=64, pooling="avg"):
        super().__init__()
        self.stem = nn.Conv2d(3, hc, 3, stride=2, padding=1)
        self.zr = nn.Conv2d(2 * hc, 2 * hc, 3, padding=1)
        self.hcand = nn.Conv2d(2 * hc, hc, 3, padding=1)
        self.head = nn.Conv2d(hc, 2 * hc, 3, stride=2, padding=1)
        self.fc = nn.Linear(2 * hc, nc)
        self.hc = hc
        self.pooling = pooling

    def forward(self, clips):
        n, t = clips.shape[:2]
        x = clips.reshape(n * t, *clips.shape[2:]).permute(0, 3, 1, 2)
        enc = torch.relu(self.stem(x))
        enc = nn.functional.max_pool2d(enc, 2, stride=2)
        enc = enc.reshape(n, t, *enc.shape[1:])
        h = torch.zeros(n, self.hc, enc.shape[3], enc.shape[4])
        hs = []
        for i in range(t):
            x_t = enc[:, i]
            zr = torch.sigmoid(self.zr(torch.cat([x_t, h], dim=1)))
            z, r = torch.chunk(zr, 2, dim=1)
            cand = torch.tanh(self.hcand(torch.cat([x_t, r * h], dim=1)))
            h = (1.0 - z) * h + z * cand
            hs.append(h)
        hs = torch.stack(hs)  # [T, N, C, h, w]
        pooled = hs.mean(dim=0) if self.pooling == "avg" else hs[-1]
        y = torch.relu(self.head(pooled))
        y = y.mean(dim=(2, 3))
        return self.fc(y)


class TorchCNN3D(nn.Module):
    """Mirror of models/temporal.py:CNN3D."""

    def __init__(self, nc=NC, w=64):
        super().__init__()
        self.c1 = nn.Conv3d(3, w, 3, padding=1)
        self.c2 = nn.Conv3d(w, w * 2, 3, padding=1)
        self.c3 = nn.Conv3d(w * 2, w * 4, 3, padding=1)
        self.c4 = nn.Conv3d(w * 4, w * 4, 3, padding=1)
        self.fc = nn.Linear(w * 4, nc)

    def forward(self, clips):  # [N, T, H, W, C]
        x = clips.permute(0, 4, 1, 2, 3)  # NCDHW, time = depth
        y = torch.relu(self.c1(x))
        y = nn.functional.max_pool3d(y, (1, 2, 2))
        y = torch.relu(self.c2(y))
        y = nn.functional.max_pool3d(y, (2, 2, 2))
        y = torch.relu(self.c3(y))
        y = nn.functional.max_pool3d(y, (2, 2, 2))
        y = torch.relu(self.c4(y))
        y = y.mean(dim=(2, 3, 4))
        return self.fc(y)


class TorchSlowFast(nn.Module):
    """Mirror of models/temporal.py:SlowFast."""

    def __init__(self, nc=NC, alpha=4, sw=64, fw=8):
        super().__init__()
        self.alpha = alpha
        for path, w in (("slow", sw), ("fast", fw)):
            setattr(self, f"{path}_c1", nn.Conv3d(3, w, (1, 3, 3), padding=(0, 1, 1)))
            setattr(self, f"{path}_c2", nn.Conv3d(w, w * 2, 3, padding=1))
            setattr(self, f"{path}_c3", nn.Conv3d(w * 2, w * 4, 3, padding=1))
        self.fc = nn.Linear(sw * 4 + fw * 4, nc)

    def state_dict_mapped(self):
        sd = self.state_dict()
        return {k.replace("slow_", "slow.").replace("fast_", "fast."): v
                for k, v in sd.items()}

    def _pathway(self, name, x):
        y = torch.relu(getattr(self, f"{name}_c1")(x))
        y = nn.functional.max_pool3d(y, (1, 2, 2))
        y = torch.relu(getattr(self, f"{name}_c2")(y))
        y = nn.functional.max_pool3d(y, (1, 2, 2))
        y = torch.relu(getattr(self, f"{name}_c3")(y))
        return y.mean(dim=(2, 3, 4))

    def forward(self, clips):
        x = clips.permute(0, 4, 1, 2, 3)
        slow = self._pathway("slow", x[:, :, :: self.alpha])
        fast = self._pathway("fast", x)
        return self.fc(torch.cat([slow, fast], dim=1))


MIRRORS = {
    "cnn_lstm": TorchCNNLSTM,
    "conv_gru": TorchConvGRU,
    "3d_cnn": TorchCNN3D,
    "slow_fast": TorchSlowFast,
}


def _state_dict(tm):
    if hasattr(tm, "state_dict_mapped"):
        sd = tm.state_dict_mapped()
    else:
        sd = tm.state_dict()
    return {k: v.detach().cpu().numpy() for k, v in sd.items()}


@pytest.mark.parametrize("model_type", list(MIRRORS))
def test_torch_state_dict_matches_jax_forward(model_type):
    torch.manual_seed(7)
    tm = MIRRORS[model_type]().eval()
    jm = build_temporal(model_type, NC, "avg")
    params = temporal_params_from_state_dict(jm, _state_dict(tm))

    clip = np.random.default_rng(0).normal(0, 1, CLIP).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(clip)).numpy()
    got = np.asarray(jm.apply(params, jnp.asarray(clip)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("carrier", ["pt", "npz", "onnx"])
def test_checkpoint_carriers_load_identically(tmp_path, carrier):
    torch.manual_seed(3)
    tm = TorchCNNLSTM().eval()
    sd = _state_dict(tm)
    path = tmp_path / f"cnn_lstm.{carrier}"
    if carrier == "pt":
        torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, path)
    elif carrier == "npz":
        np.savez(path, **sd)
    else:
        from realtime_analytics_tpu.models.onnx_lite import write_onnx_initializers

        write_onnx_initializers(str(path), sd)

    jm = build_temporal("cnn_lstm", NC, "avg")
    params = load_temporal_checkpoint(jm, str(path))
    assert params is not None, f"{carrier} carrier failed to load"

    clip = np.random.default_rng(1).normal(0, 1, CLIP).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(clip)).numpy()
    got = np.asarray(jm.apply(params, jnp.asarray(clip)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_engine_loads_onnx_checkpoint(tmp_path):
    """End-to-end: the temporal ENGINE (sliding-window predict) consumes a
    weights-.onnx checkpoint — the reference's user-checkpoint flow."""
    import time as _time

    from realtime_analytics_tpu.config import DetectorConfig, StreamConfig
    from realtime_analytics_tpu.engine.temporal import JaxTemporalEngine
    from realtime_analytics_tpu.models.onnx_lite import write_onnx_initializers
    from realtime_analytics_tpu.types import FramePacket, TemporalDetection

    torch.manual_seed(5)
    tm = TorchCNNLSTM().eval()
    path = tmp_path / "user_model.onnx"
    write_onnx_initializers(str(path), _state_dict(tm))

    cfg = DetectorConfig(
        model_path=str(path), model_type="cnn_lstm", backend="jax",
        sequence_length=4, num_action_classes=NC, input_size=[32, 32],
        confidence_threshold=1e-6, precision="fp32",
    )
    eng = JaxTemporalEngine(cfg)
    stream = StreamConfig(name="s", url="synthetic://")
    rng = np.random.default_rng(0)
    dets = []
    for i in range(4):
        frame = rng.integers(0, 256, (48, 64, 3), dtype=np.uint8)
        dets = eng.predict(FramePacket(stream, frame, i, _time.time()))
    assert dets and isinstance(dets[0], TemporalDetection)
    # loaded (not random-init) weights: engine params equal the mapped ones
    jm = build_temporal("cnn_lstm", NC, "avg")
    want = temporal_params_from_state_dict(jm, _state_dict(tm))
    got_leaf = np.asarray(eng.params["fc"]["b"], dtype=np.float32)
    np.testing.assert_allclose(got_leaf, np.asarray(want["fc"]["b"]), rtol=1e-5)


def test_state_dict_roundtrip_inverse():
    """params -> torch-named -> params is the identity (export path)."""
    jm = build_temporal("conv_gru", NC, "avg")
    params = jm.init_params(jax.random.PRNGKey(0))
    sd = temporal_state_dict_from_params(jm, params)
    back = temporal_params_from_state_dict(jm, sd)
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(params),
        jax.tree_util.tree_leaves_with_path(back),
    ):
        assert jax.tree_util.keystr(pa) == jax.tree_util.keystr(pb)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_clip_buffer_resets_on_resolution_change():
    # RTSP renegotiation mid-buffer (no reconnect detected): a mixed-shape
    # clip cannot stack — the buffer restarts at the new resolution
    from realtime_analytics_tpu.config import DetectorConfig, StreamConfig
    from realtime_analytics_tpu.engine.temporal import JaxTemporalEngine
    from realtime_analytics_tpu.types import FramePacket

    eng = JaxTemporalEngine(DetectorConfig(
        model_path="missing.npz", model_type="cnn_lstm",
        input_size=[32, 32], sequence_length=3, sequence_stride=1,
        temporal_overlap=0.0, num_action_classes=4, warmup=False,
    ))
    s = StreamConfig(name="c", url="synthetic://")

    def pkt(i, hw):
        return FramePacket(s, np.zeros((*hw, 3), np.uint8), i, float(i))

    assert eng.buffer_packet(pkt(0, (48, 64))) is None
    assert eng.buffer_packet(pkt(1, (48, 64))) is None
    # resolution change resets the window — no clip completes at frame 2
    assert eng.buffer_packet(pkt(2, (32, 32))) is None
    assert eng.buffer_packet(pkt(3, (32, 32))) is None
    seq = eng.buffer_packet(pkt(4, (32, 32)))
    assert seq is not None and len(seq) == 3
    assert all(p.frame.shape == (32, 32, 3) for p in seq)
