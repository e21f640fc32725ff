"""Temporal clip-aligned cross-stream batching.

With ``temporal_clip_window_ms > 0`` the batcher splits temporal inference:
frame buffering happens inline per tick (cheap host work, frames that don't
complete a clip resolve [] immediately), and *ready clips* are parked up to
the window so clips from streams whose frames arrived in different batcher
ticks still run as ONE device clip batch. The reference runs every clip
alone (temporal_detector.py:104-120); arrival grouping (window 0) only
batches clips that happen to land in the same tick.
"""

import asyncio
import threading
import time

import numpy as np
import pytest

from realtime_analytics_tpu.config import PipelineConfig, StreamConfig
from realtime_analytics_tpu.engine.batcher import InferenceBatcher
from realtime_analytics_tpu.types import Detection, FramePacket


class FakeTemporalEngine:
    """Duck-typed temporal engine: a clip is ready every ``clip_every``
    frames per stream; records clip-batch sizes."""

    def __init__(self, clip_every=3, buckets=(8,)):
        self.clip_every = clip_every
        self._counts = {}
        self.clip_batches = []
        self._lock = threading.Lock()

        class _Cfg:
            resolved_buckets = list(buckets)

        self.config = _Cfg()

    def buffer_packet(self, packet):
        name = packet.stream.name
        n = self._counts.get(name, 0) + 1
        self._counts[name] = n
        if n % self.clip_every == 0:
            return [packet] * 2  # a fake 2-frame sequence ending at packet
        return None

    def predict_clips(self, sequences):
        with self._lock:
            self.clip_batches.append(len(sequences))
        return [
            [Detection(seq[-1].stream.name, seq[-1].frame_id, 7, 0.9,
                       (0.0, 0.0, 1.0, 1.0))]
            for seq in sequences
        ]

    def predict_packets(self, packets):  # arrival-grouped fallback path
        results = []
        ready = []
        for p in packets:
            seq = self.buffer_packet(p)
            results.append(seq)
            if seq is not None:
                ready.append(seq)
        dets = iter(self.predict_clips(ready)) if ready else iter(())
        return [next(dets) if r is not None else [] for r in results]


def packet(stream_name, frame_id):
    stream = StreamConfig(name=stream_name, url="mem://", batch_size=4)
    return FramePacket(
        stream, np.zeros((4, 4, 3), np.uint8), frame_id, time.time()
    )


def _run(coro):
    return asyncio.run(coro)


def test_clips_from_different_ticks_coalesce_into_one_device_batch():
    engine = FakeTemporalEngine(clip_every=1)  # every frame completes a clip

    async def run():
        b = InferenceBatcher(engine, max_batch=16, batch_window_ms=1,
                             temporal_clip_window_ms=80)
        await b.start()
        # submit 4 streams' clip-enders staggered over ~30 ms: several
        # batcher ticks, one clip flush
        tasks = []
        for i in range(4):
            tasks.append(asyncio.ensure_future(b.submit(packet(f"s{i}", 1))))
            await asyncio.sleep(0.008)
        results = await asyncio.gather(*tasks)
        await b.stop()
        return results

    results = _run(run())
    assert engine.clip_batches == [4], engine.clip_batches
    for i, dets in enumerate(results):
        assert len(dets) == 1 and dets[0].stream_name == f"s{i}"


def test_non_clip_frames_resolve_immediately_with_empty():
    engine = FakeTemporalEngine(clip_every=100)  # no clip ever completes

    async def run():
        b = InferenceBatcher(engine, max_batch=8, batch_window_ms=1,
                             temporal_clip_window_ms=500)
        await b.start()
        t0 = time.perf_counter()
        dets = await b.submit(packet("s0", 1))
        waited = time.perf_counter() - t0
        await b.stop()
        return dets, waited

    dets, waited = _run(run())
    assert dets == []
    assert waited < 0.4  # did NOT wait for the 500 ms clip window


def test_flush_on_bucket_threshold_before_window():
    engine = FakeTemporalEngine(clip_every=1, buckets=(2,))

    async def run():
        b = InferenceBatcher(engine, max_batch=16, batch_window_ms=1,
                             temporal_clip_window_ms=10_000)
        await b.start()
        t0 = time.perf_counter()
        r = await asyncio.gather(
            b.submit(packet("s0", 1)), b.submit(packet("s1", 1))
        )
        elapsed = time.perf_counter() - t0
        await b.stop()
        return r, elapsed

    r, elapsed = _run(run())
    assert elapsed < 5.0  # flushed at bucket size 2, not the 10 s window
    assert engine.clip_batches and engine.clip_batches[0] == 2
    assert all(len(dets) == 1 for dets in r)


def test_window_zero_keeps_arrival_grouping():
    engine = FakeTemporalEngine(clip_every=1)

    async def run():
        b = InferenceBatcher(engine, max_batch=16, batch_window_ms=1,
                             temporal_clip_window_ms=0)
        await b.start()
        r1 = await b.submit(packet("s0", 1))
        r2 = await b.submit(packet("s1", 1))
        await b.stop()
        return r1, r2

    r1, r2 = _run(run())
    # separate ticks -> separate clip batches (reference-like behavior)
    assert engine.clip_batches == [1, 1]
    assert len(r1) == 1 and len(r2) == 1


def test_shutdown_sheds_pending_clips():
    engine = FakeTemporalEngine(clip_every=1)

    async def run():
        b = InferenceBatcher(engine, max_batch=16, batch_window_ms=1,
                             temporal_clip_window_ms=10_000)
        await b.start()
        fut = asyncio.ensure_future(b.submit(packet("s0", 1)))
        await asyncio.sleep(0.05)  # clip parked, window far away
        await b.stop()
        return await fut

    result = _run(run())
    assert result is None  # shed, not a clean zero-detection result
    assert engine.clip_batches == []


def test_clip_stats_recorded():
    engine = FakeTemporalEngine(clip_every=1)

    async def run():
        b = InferenceBatcher(engine, max_batch=16, batch_window_ms=1,
                             temporal_clip_window_ms=30)
        await b.start()
        await asyncio.gather(*(b.submit(packet(f"s{i}", 1)) for i in range(3)))
        await b.stop()
        return b.stats.snapshot()

    snap = _run(run())
    assert snap["clip_batches"] >= 1
    assert snap["clips"] == 3
    assert snap["frames"] == 3


def test_config_knob_validation():
    cfg = PipelineConfig(streams=[StreamConfig(name="s", url="mem://")])
    cfg.temporal_clip_window_ms = -1
    with pytest.raises(Exception):
        cfg.validate()


def test_real_engine_exposes_clip_api():
    """The coalescing path duck-types on buffer_packet/predict_clips; the
    real temporal engine must expose both."""
    from realtime_analytics_tpu.engine.temporal import JaxTemporalEngine

    assert callable(getattr(JaxTemporalEngine, "buffer_packet"))
    assert callable(getattr(JaxTemporalEngine, "predict_clips"))
