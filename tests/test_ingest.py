"""Ingest tests: synthetic sources, stream pacing/reconnect, frame filters."""

import asyncio

import numpy as np
import pytest

from realtime_analytics_tpu.config import FFmpegSimulatorConfig, StreamConfig
from realtime_analytics_tpu.ingest.ffmpeg_simulator import (
    FFmpegStreamError,
    FFmpegStreamSimulator,
)
from realtime_analytics_tpu.ingest.synthetic import SyntheticSource
from realtime_analytics_tpu.ingest.video_stream import StreamSourceError, VideoStream
from realtime_analytics_tpu.utils.frame_filter import (
    MotionFilter,
    MotionFilterConfig,
    apply_roi,
    downsample,
    roi_mask,
)


def test_synthetic_source_determinism():
    a = SyntheticSource(width=64, height=48, boxes=2, seed=3)
    b = SyntheticSource(width=64, height=48, boxes=2, seed=3)
    for _ in range(5):
        ok_a, fa = a.read()
        ok_b, fb = b.read()
        assert ok_a and ok_b
        np.testing.assert_array_equal(fa, fb)
    assert fa.shape == (48, 64, 3) and fa.dtype == np.uint8


def test_synthetic_url_params():
    src = SyntheticSource.from_url(
        "synthetic://?width=100&height=50&boxes=1&frames=2&seed=9"
    )
    assert src.width == 100 and src.height == 50
    assert src.read()[0] and src.read()[0]
    assert src.read() == (False, None)  # frames exhausted


def test_video_stream_yields_monotonic_frame_ids():
    async def run():
        cfg = StreamConfig(
            name="s", url="synthetic://?frames=5", warmup_seconds=0, max_retries=0
        )
        ids = []
        async with VideoStream(cfg) as vs:
            async for pkt in vs.frames():
                ids.append(pkt.frame_id)
                assert pkt.stream is cfg
                assert pkt.frame.dtype == np.uint8
        return ids

    assert asyncio.run(run()) == [0, 1, 2, 3, 4]


def test_video_stream_pacing():
    async def run():
        import time

        cfg = StreamConfig(
            name="s", url="synthetic://?frames=4", warmup_seconds=0,
            target_fps=50, max_retries=0,
        )
        t0 = time.perf_counter()
        async with VideoStream(cfg) as vs:
            async for _ in vs.frames():
                pass
        return time.perf_counter() - t0

    elapsed = asyncio.run(run())
    assert elapsed >= 0.06  # 4 frames at 50 fps => >= 3 sleeps of 20 ms


def test_video_stream_gives_up_after_max_retries():
    async def run():
        cfg = StreamConfig(
            name="s", url="synthetic://?frames=100&fail_after=2",
            warmup_seconds=0, reconnect_backoff=0.01, max_retries=1,
        )
        got = []
        async with VideoStream(cfg) as vs:
            async for pkt in vs.frames():
                got.append(pkt.frame_id)
        return got

    assert asyncio.run(run()) == [0, 1]  # then fails, retries once, gives up


def test_video_stream_unopenable_raises():
    async def run():
        cfg = StreamConfig(name="s", url="synthetic://?frames=0&fail_after=0",
                           warmup_seconds=0)
        # a file path that does not exist, without cv2 scheme: synthetic works,
        # so use open() on missing file via VideoStream on bogus scheme
        vs = VideoStream(StreamConfig(name="x", url="/nonexistent/file.mp4",
                                      warmup_seconds=0))
        with pytest.raises(StreamSourceError):
            await vs.open()

    asyncio.run(run())


def test_motion_filter_gates_static_frames():
    mf = MotionFilter(MotionFilterConfig(enable=True, threshold=0.02))
    frame = np.zeros((64, 64, 3), dtype=np.uint8)
    assert mf.should_process(frame)  # first frame always processes
    assert not mf.should_process(frame)  # static scene -> skip
    moved = frame.copy()
    moved[10:40, 10:40] = 255
    assert mf.should_process(moved)  # big change -> process
    mf.reset()
    assert mf.should_process(frame)


def test_motion_filter_disabled_passes_everything():
    mf = MotionFilter(MotionFilterConfig(enable=False))
    frame = np.zeros((8, 8, 3), dtype=np.uint8)
    assert mf.should_process(frame) and mf.should_process(frame)


def test_roi_masks_outside_pixels():
    frame = np.full((40, 40, 3), 200, dtype=np.uint8)
    poly = [[(0, 0), (19, 0), (19, 19), (0, 19)]]
    out = apply_roi(frame, poly)
    assert out[5, 5].tolist() == [200, 200, 200]  # inside kept
    assert out[30, 30].tolist() == [0, 0, 0]  # outside blacked out
    mask = roi_mask((40, 40), poly)
    assert mask.sum() == pytest.approx(20 * 20, rel=0.1)


def test_roi_numpy_fallback_matches_cv2_on_polygons(monkeypatch):
    """The no-cv2 rasterizer must handle edges with y1 < y0 (descending):
    round-1 advisor found max(y1-y0, 1e-12) destroyed the signed slope."""
    from realtime_analytics_tpu.utils import frame_filter as ff

    polys = [
        [[(5, 30), (30, 5), (55, 30)]],            # triangle, one descending edge
        [[(10, 10), (50, 20), (40, 50), (5, 40)]],  # convex quad
        [[(0, 0), (59, 0), (59, 59), (0, 59)]],     # rectangle
    ]
    def morph(m, reduce_fn):
        p = np.pad(m, 1, mode="constant" if reduce_fn is np.min else "edge")
        h, w = m.shape
        return reduce_fn(
            np.stack([p[i:i + h, j:j + w] for i in range(3) for j in range(3)]),
            axis=0,
        )

    for poly in polys:
        want = ff.roi_mask((60, 60), poly)  # cv2 path
        monkeypatch.setattr(ff, "_HAS_CV2", False)
        got = ff.roi_mask((60, 60), poly)
        monkeypatch.setattr(ff, "_HAS_CV2", True)
        # rasterizers may differ on boundary pixels only: the fallback must
        # cover every strict-interior pixel and add nothing outside a 1-px
        # dilation (the round-1 bug misfilled whole interior spans)
        interior = morph(want, np.min).astype(bool)
        outer = morph(want, np.max).astype(bool)
        got = got.astype(bool)
        assert (interior & ~got).sum() == 0, f"{poly}: interior pixels missing"
        assert (got & ~outer).sum() == 0, f"{poly}: pixels outside polygon"


def test_downsample_shape():
    frame = np.zeros((100, 200, 3), dtype=np.uint8)
    out = downsample(frame, 0.5)
    assert out.shape == (50, 100, 3)
    assert downsample(frame, 1.0) is frame


def test_ffmpeg_simulator_command_shape():
    stream = StreamConfig(name="cam", url="rtsp://127.0.0.1:8554/cam")
    sim = FFmpegStreamSimulator(
        stream,
        FFmpegSimulatorConfig(enabled=True, input="demo.mp4", loop=True),
    )
    cmd = sim._build_command()
    assert cmd[0] == "ffmpeg"
    assert "-stream_loop" in cmd and "-re" in cmd
    assert "-listen" in cmd
    assert cmd[-1] == "rtsp://0.0.0.0:8554/cam"
    assert "-tune" in cmd  # libx264 zerolatency defaults


def test_ffmpeg_simulator_rejects_non_rtsp():
    stream = StreamConfig(name="cam", url="rtmp://h/p")
    sim = FFmpegStreamSimulator(
        stream, FFmpegSimulatorConfig(enabled=True, input="x.mp4")
    )
    with pytest.raises(FFmpegStreamError, match="RTSP"):
        sim._build_listen_url()
