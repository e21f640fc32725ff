"""Eager frame completion (round-3 latency fix).

Before round 3 a frame's completion (tracker update, sink publish, latency
stamp) ran lazily from the NEXT frame's ``_process_packet`` call — adding a
constant one-frame-interval (+40 ms at 25 FPS) to every frame's end-to-end
latency. The completer coroutine now finishes each frame the moment its
batcher future resolves, in strict frame order. These tests pin that:

* a completed inference is finished WITHOUT another frame arriving;
* order is preserved even when a later frame's future resolves first;
* the per-stream in-flight cap still paces the read loop.
"""

import asyncio
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent))
from test_adaptive_fps import make_worker  # noqa: E402

from realtime_analytics_tpu.types import Detection, FramePacket  # noqa: E402


def packet(worker, fid):
    return FramePacket(
        worker.stream, np.zeros((32, 32, 3), np.uint8), fid, float(fid)
    )


class ManualBatcher:
    """submit_nowait() returns futures the test resolves explicitly."""

    def __init__(self):
        self.futures = {}

    def submit_nowait(self, pkt):
        fut = asyncio.get_running_loop().create_future()
        self.futures[pkt.frame_id] = fut
        return fut


def _start_completer(w):
    w._completer = asyncio.create_task(w._completion_loop())


async def _stop_completer(w):
    w._completer.cancel()
    try:
        await w._completer
    except asyncio.CancelledError:
        pass


def det(fid):
    return [Detection("s", fid, 0, 0.9, (1.0, 1.0, 20.0, 20.0))]


def test_completion_does_not_wait_for_next_frame():
    w = make_worker(dict(target_fps=25, batch_size=2))
    w.batcher = ManualBatcher()

    async def run():
        _start_completer(w)
        await w._process_packet(packet(w, 0))
        await asyncio.sleep(0.01)
        w.batcher.futures[0].set_result(det(0))
        # no second frame is ever submitted — completion must still land
        for _ in range(100):
            if w.health.total_frames:
                break
            await asyncio.sleep(0.005)
        await _stop_completer(w)

    asyncio.run(run())
    assert w.health.total_frames == 1
    assert len(w.health.recent_processing_times) == 1
    # the latency stamp reflects the ~10 ms resolution time, not +1 frame
    assert w.health.recent_processing_times[0] < 0.5


def test_completion_order_preserved_under_out_of_order_results():
    w = make_worker(dict(target_fps=25, batch_size=3))
    w.batcher = ManualBatcher()
    finished = []
    orig = w._finish_packet

    async def spy(pkt, t_start, dets):
        finished.append(pkt.frame_id)
        await orig(pkt, t_start, dets)

    w._finish_packet = spy

    async def run():
        _start_completer(w)
        for fid in range(3):
            await w._process_packet(packet(w, fid))
        await asyncio.sleep(0.01)
        # resolve LAST first: completion must still run 0, 1, 2
        w.batcher.futures[2].set_result(det(2))
        await asyncio.sleep(0.02)
        assert finished == []  # 2 done but 0/1 outstanding: nothing finishes
        w.batcher.futures[1].set_result(det(1))
        w.batcher.futures[0].set_result(det(0))
        for _ in range(100):
            if len(finished) == 3:
                break
            await asyncio.sleep(0.005)
        await _stop_completer(w)

    asyncio.run(run())
    assert finished == [0, 1, 2]


def test_inflight_cap_paces_read_loop():
    w = make_worker(dict(target_fps=25, batch_size=2))
    w.batcher = ManualBatcher()

    async def run():
        _start_completer(w)
        await w._process_packet(packet(w, 0))
        await w._process_packet(packet(w, 1))
        # third enqueue must block on the 2-slot cap until a result lands
        third = asyncio.create_task(w._process_packet(packet(w, 2)))
        await asyncio.sleep(0.02)
        blocked = not third.done()
        w.batcher.futures[0].set_result(det(0))
        await asyncio.wait_for(third, timeout=2.0)
        w.batcher.futures[1].set_result(det(1))
        w.batcher.futures[2].set_result(det(2))
        for _ in range(100):
            if w.health.total_frames == 3:
                break
            await asyncio.sleep(0.005)
        await _stop_completer(w)
        return blocked

    blocked = asyncio.run(run())
    assert blocked  # cap actually paced the read loop
    assert w.health.total_frames == 3
