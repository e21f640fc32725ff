"""Multi-chip stream-sharding launcher (round-1 VERDICT #10).

``run_pipeline --shards K`` starts K pipeline processes that split the
stream list round-robin and publish to ONE shared eventbus — the process
topology for a multi-chip TPU host (one pipeline per chip, docs/deployment).
The integration test runs the real launcher with 2 shards over 4 synthetic
streams on the CPU backend and asserts every stream's events reach the bus.
"""

import asyncio
import json
import os
import subprocess
import sys

import pytest
import yaml

from realtime_analytics_tpu.config import load_config
from realtime_analytics_tpu.scripts.run_pipeline import shard_config

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BUS_PORT = 19411


def _config_dict(n_streams=4, frames=40):
    return {
        "streams": [
            {
                "name": f"cam-{i}",
                "url": f"synthetic://?width=96&height=64&frames={frames}&seed={i}",
                "target_fps": 30,
                "warmup_seconds": 0.0,
                "max_retries": 0,
                "batch_size": 2,
            }
            for i in range(n_streams)
        ],
        "detector": {
            "model_path": "__random__.pt",
            "confidence_threshold": 0.005,
            "input_size": [64, 64],
            "max_batch_size": 2,
            "batch_buckets": [2],
            "precision": "fp32",
            "warmup": False,
            "pre_nms_topk": 64,
            "max_detections": 8,
        },
        "tracker": {"min_hits": 1},
        "kafka": {
            "enabled": True,
            "transport": "eventbus",
            "bootstrap_servers": f"127.0.0.1:{BUS_PORT}",
            "topic": "analytics.events",
            "include_frames": False,
        },
        "prometheus": {"enabled": False},
        "snapshots": {"enabled": False},
        "stats_interval_seconds": 60,
    }


def test_shard_config_splits_round_robin(tmp_path):
    path = tmp_path / "c.yaml"
    path.write_text(yaml.safe_dump(_config_dict(5)))
    got = {}
    for i in range(2):
        cfg = shard_config(load_config(str(path)), i, 2)
        got[i] = [s.name for s in cfg.streams]
    assert got[0] == ["cam-0", "cam-2", "cam-4"]
    assert got[1] == ["cam-1", "cam-3"]


def test_shard_config_offsets_prometheus_port(tmp_path):
    d = _config_dict(4)
    d["prometheus"] = {"enabled": True, "port": 9400}
    path = tmp_path / "c.yaml"
    path.write_text(yaml.safe_dump(d))
    assert shard_config(load_config(str(path)), 0, 2).prometheus.port == 9400
    assert shard_config(load_config(str(path)), 1, 2).prometheus.port == 9401


@pytest.mark.slow
def test_launcher_runs_two_shards_one_bus(tmp_path):
    """De-flake notes: the streams are ENDLESS and the launcher is SIGTERM'd
    once the bus has shown all four streams (60-frame streams raced the
    subscriber against the bus's no-replay semantics). Round-3 second flake:
    the message window was a fixed budget from subscriber-connect, but on a
    loaded 1-core box the two shard processes can spend minutes in
    import+engine init before "Pipeline started" — the old 120 s window
    expired exactly as events began to flow. The window now opens only
    after BOTH shards log "Pipeline started" (readiness-gated, not
    sleep-gated), so host load shifts the deadline instead of eating it."""
    import signal as _signal
    import time as _time

    path = tmp_path / "c.yaml"
    path.write_text(yaml.safe_dump(_config_dict(4, frames=0)))

    out_path = tmp_path / "launcher.log"
    with open(out_path, "w") as out_f:
        proc = subprocess.Popen(
            [sys.executable, "-m",
             "realtime_analytics_tpu.scripts.run_pipeline",
             "--config", str(path), "--shards", "2", "--broker",
             "--duration", "600", "--log-level", "INFO"],
            cwd=REPO, env=dict(os.environ),
            stdout=out_f, stderr=subprocess.STDOUT, text=True,
        )

    def log_text():
        return out_path.read_text(errors="replace")

    # readiness gate: both shard pipelines up (slow on a loaded box:
    # two python imports + engine builds; generous cap, normally seconds)
    deadline = _time.monotonic() + 600
    while log_text().count("Pipeline started") < 2:
        if proc.poll() is not None:
            pytest.fail(f"launcher exited rc={proc.returncode} before both "
                        f"shards started:\n{log_text()[-2000:]}")
        if _time.monotonic() > deadline:
            proc.send_signal(_signal.SIGTERM)
            proc.communicate(timeout=120)
            pytest.fail(f"shards not up in 600s:\n{log_text()[-2000:]}")
        _time.sleep(0.5)

    streams_seen = set()

    async def consume():
        from realtime_analytics_tpu.sinks.eventbus import EventBusSubscriber

        sub = EventBusSubscriber("127.0.0.1", BUS_PORT, "analytics.events")
        for _ in range(300):  # broker lives inside shard 0 and is up by now
            try:
                await sub.connect()
                break
            except OSError:
                await asyncio.sleep(0.2)
        else:
            return
        try:
            # both pipelines are live and the streams are endless: events
            # flow continuously, this window only covers bus latency
            async with asyncio.timeout(120):
                async for payload in sub.messages():
                    if payload and "stream" in payload:
                        streams_seen.add(payload["stream"])
                    if len(streams_seen) == 4:
                        return
        except TimeoutError:
            pass
        finally:
            await sub.close()

    try:
        asyncio.run(consume())
    finally:
        # graceful stop: the supervisor forwards SIGTERM to both shards
        proc.send_signal(_signal.SIGTERM)
        proc.communicate(timeout=120)

    out = log_text()
    assert streams_seen == {"cam-0", "cam-1", "cam-2", "cam-3"}, (
        f"bus saw {streams_seen}; launcher output tail:\n{out[-2000:]}"
    )
    assert "shard 0/2: serving 2 streams" in out
    assert "shard 1/2: serving 2 streams" in out
    assert proc.returncode == 0, out[-2000:]


@pytest.mark.slow
def test_shard_restart_revives_crashed_shard(tmp_path):
    """--shard-restart: a shard killed mid-run comes back and resumes
    publishing (the in-process analog of docker restart: unless-stopped)."""
    import signal as _signal
    import time as _time

    path = tmp_path / "c.yaml"
    path.write_text(yaml.safe_dump(_config_dict(2, frames=0)))  # endless

    proc = subprocess.Popen(
        [sys.executable, "-m", "realtime_analytics_tpu.scripts.run_pipeline",
         "--config", str(path), "--shards", "2", "--broker", "--shard-restart",
         "--duration", "300", "--log-level", "INFO"],
        cwd=REPO, env=dict(os.environ),
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    def shard1_pids():
        # scoped to DIRECT CHILDREN of the launcher (-P): a bare pattern
        # match could catch unrelated processes on a shared box
        # note: pattern must not start with "--" (pgrep option parsing)
        out = subprocess.run(
            ["pgrep", "-P", str(proc.pid), "-f", "shard-index 1"],
            capture_output=True, text=True,
        )
        return [int(p) for p in out.stdout.split() if p.strip()]

    killed = False
    deadline = _time.time() + 100
    try:
        # shard 1 spawns only after shard 0's broker binds — poll for it
        while _time.time() < deadline and not killed:
            _time.sleep(2.0)
            for pid in shard1_pids():
                os.kill(pid, _signal.SIGKILL)
                killed = True
        assert killed, "never found the shard-1 child to kill"
        # wait for the supervisor to notice + restart (5 s backoff + spawn).
        # Generous deadline: on a loaded 1-core box the supervisor's event
        # loop can be starved for tens of seconds (full-suite flake,
        # round-3) — the assertion is about WHETHER it revives, not how
        # fast; --duration 300 keeps the launcher alive well past it
        revived = False
        deadline = _time.time() + 90
        while _time.time() < deadline and not revived:
            _time.sleep(2.0)
            revived = bool(shard1_pids())
        assert revived, "shard 1 was not restarted"
    finally:
        proc.send_signal(_signal.SIGTERM)
        out, _ = proc.communicate(timeout=60)
    assert "restarting in 5 s" in out, out[-2000:]
