"""Batcher pipelining: overlapping batches must never contain the same
stream concurrently (per-stream frame ordering), and depth is capped."""

import asyncio
import threading
import time

import numpy as np

from realtime_analytics_tpu.config import StreamConfig
from realtime_analytics_tpu.engine.batcher import InferenceBatcher
from realtime_analytics_tpu.types import FramePacket


class SlowFakeEngine:
    """Records which streams are inside concurrently-running batches."""

    def __init__(self, delay=0.03):
        self.delay = delay
        self._lock = threading.Lock()
        self._active_streams = set()
        self.max_concurrent_batches = 0
        self._active_batches = 0
        self.violations = []
        self.batches = []

    def predict_packets(self, packets):
        names = [p.stream.name for p in packets]
        with self._lock:
            overlap = self._active_streams & set(names)
            if overlap:
                self.violations.append(overlap)
            self._active_streams |= set(names)
            self._active_batches += 1
            self.max_concurrent_batches = max(
                self.max_concurrent_batches, self._active_batches
            )
            self.batches.append(sorted(names))
        time.sleep(self.delay)
        with self._lock:
            self._active_streams -= set(names)
            self._active_batches -= 1
        return [[] for _ in packets]


def packet(stream_name, frame_id, batch_size=4):
    stream = StreamConfig(name=stream_name, url="mem://", batch_size=batch_size)
    return FramePacket(
        stream, np.zeros((8, 8, 3), np.uint8), frame_id, time.time()
    )


def test_pipelined_batches_overlap_but_streams_never_do():
    engine = SlowFakeEngine()

    async def run():
        b = InferenceBatcher(engine, max_batch=2, batch_window_ms=2,
                             pipeline_depth=2)
        await b.start()
        # 4 streams x 3 frames each, submitted by concurrent workers that
        # pipeline their own submissions (batch_size allows it)
        async def worker(name):
            for i in range(3):
                await b.submit(packet(name, i))

        await asyncio.gather(*(worker(f"s{k}") for k in range(4)))
        await b.stop()

    asyncio.run(run())
    assert engine.violations == [], f"stream ordering violated: {engine.violations}"
    assert engine.max_concurrent_batches == 2  # pipelining actually happened
    assert sum(len(b) for b in engine.batches) == 12


def test_pipeline_depth_one_serializes():
    engine = SlowFakeEngine()

    async def run():
        b = InferenceBatcher(engine, max_batch=4, batch_window_ms=2,
                             pipeline_depth=1)
        await b.start()
        await asyncio.gather(*(b.submit(packet(f"s{k}", 0)) for k in range(6)))
        await b.stop()

    asyncio.run(run())
    assert engine.max_concurrent_batches == 1
    assert engine.violations == []


def test_deferred_frames_eventually_processed():
    engine = SlowFakeEngine(delay=0.02)

    async def run():
        b = InferenceBatcher(engine, max_batch=1, batch_window_ms=1,
                             pipeline_depth=2)
        await b.start()
        # same stream back to back: second frame must defer, then process
        s = StreamConfig(name="only", url="mem://", batch_size=4)
        p1 = FramePacket(s, np.zeros((8, 8, 3), np.uint8), 1, time.time())
        p2 = FramePacket(s, np.zeros((8, 8, 3), np.uint8), 2, time.time())
        r = await asyncio.gather(b.submit(p1), b.submit(p2))
        await b.stop()
        return r

    results = asyncio.run(run())
    assert len(results) == 2
    assert engine.violations == []
    assert sum(len(b) for b in engine.batches) == 2
