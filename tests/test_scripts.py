"""CLI/scripts tests: logging suite, config generator, encoding checker."""

import json
import logging

import yaml

from realtime_analytics_tpu.config import config_from_dict
from realtime_analytics_tpu.scripts.check_encoding import scan
from realtime_analytics_tpu.scripts.gen_streams import build_config
from realtime_analytics_tpu.scripts.logging_setup import (
    ColoredFormatter,
    JsonFormatter,
    setup_logging,
)


def _record(level=logging.INFO, msg="hello %s", args=("world",)):
    return logging.LogRecord("t", level, "f.py", 1, msg, args, None)


def test_json_formatter_emits_valid_json():
    out = json.loads(JsonFormatter().format(_record()))
    assert out["level"] == "INFO"
    assert out["message"] == "hello world"
    assert "ts" in out


def test_colored_formatter_wraps_with_ansi():
    f = ColoredFormatter("%(levelname)s %(message)s")
    text = f.format(_record(logging.ERROR, "boom", ()))
    assert text.startswith("\033[31m") and text.endswith("\033[0m")


def test_setup_logging_rotating_file(tmp_path):
    log_file = tmp_path / "p.log"
    setup_logging(level="DEBUG", log_file=str(log_file), log_format="detailed")
    logging.getLogger("x").warning("written to file")
    for h in logging.getLogger().handlers:
        h.flush()
    assert "written to file" in log_file.read_text()
    # reset to defaults for other tests
    setup_logging(level="WARNING")


def test_gen_streams_config_is_valid():
    raw = build_config(32, "rtsp://127.0.0.1:{port}/cam-{i:02d}", 8554, 25.0,
                       synthetic=False)
    # round-trips through YAML and validates
    cfg = config_from_dict(yaml.safe_load(yaml.safe_dump(raw)))
    assert len(cfg.streams) == 32
    assert cfg.streams[0].url == "rtsp://127.0.0.1:8554/cam-00"
    assert cfg.streams[31].url == "rtsp://127.0.0.1:8585/cam-31"
    assert cfg.detector.max_batch_size == 32

    synth = build_config(4, "", 0, 10.0, synthetic=True)
    cfg2 = config_from_dict(synth)
    assert cfg2.streams[0].url.startswith("synthetic://")


def test_check_encoding(tmp_path):
    (tmp_path / "good.py").write_text("x = 'ok'\n", encoding="utf-8")
    (tmp_path / "bom.md").write_bytes(b"\xef\xbb\xbfhello")
    (tmp_path / "bad.txt").write_bytes(b"\xff\xfe invalid \x80")
    report = scan(tmp_path)
    assert report["checked"] == 3
    issues = {i["file"]: i["issue"] for i in report["issues"]}
    assert issues["bom.md"] == "utf8-bom"
    assert "invalid-utf8" in issues["bad.txt"]
    assert "good.py" not in issues
