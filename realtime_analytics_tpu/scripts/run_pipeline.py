"""``realtime-analytics`` CLI: run the pipeline from a YAML config.

Flag parity with the reference (scripts/run_pipeline.py:23-60), plus
``--broker`` to spawn the in-repo eventbus broker in-process when the config
uses the eventbus transport (single-box demos without Kafka).
"""

from __future__ import annotations

import argparse
import asyncio
import logging
import sys

from .logging_setup import add_logging_args, setup_logging

logger = logging.getLogger("realtime_analytics_tpu.cli")


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        prog="realtime-analytics",
        description="TPU-native multi-stream realtime video analytics pipeline",
    )
    parser.add_argument("--config", required=True, help="pipeline YAML config path")
    parser.add_argument(
        "--broker", action="store_true",
        help="start the in-process eventbus broker (when transport=eventbus)",
    )
    parser.add_argument(
        "--duration", type=float, default=None,
        help="run for N seconds then exit (default: run until SIGINT/SIGTERM)",
    )
    parser.add_argument(
        "--jax-profile", default=None, metavar="DIR",
        help="capture a jax.profiler trace of the run into DIR",
    )
    add_logging_args(parser)
    return parser


async def _amain(args) -> int:
    from ..config import load_config
    from ..pipeline import AnalyticsPipeline

    config = load_config(args.config)

    broker = None
    if args.broker and config.kafka.enabled and config.kafka.transport == "eventbus":
        from ..sinks.eventbus import EventBusBroker

        host, _, port = config.kafka.bootstrap_servers.partition(":")
        broker = EventBusBroker(host or "127.0.0.1", int(port or 9192))
        await broker.start()

    from ..utils.profiling import jax_trace

    pipeline = AnalyticsPipeline(config)
    try:
        with jax_trace(args.jax_profile):
            if args.duration:
                await pipeline.run_for(args.duration)
            else:
                await pipeline.run_forever()
    finally:
        if broker is not None:
            await broker.stop()
    return 0


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    setup_logging(
        level=args.log_level,
        log_file=args.log_file,
        log_format=args.log_format,
        rotate=args.log_rotate or bool(args.log_file),
        no_color=args.no_color,
    )
    try:
        rc = asyncio.run(_amain(args))
    except KeyboardInterrupt:
        logger.info("interrupted — shut down cleanly")
        rc = 0
    # An XLA compile in a worker thread cannot be cancelled; if one is still
    # in flight after the pipeline stopped, don't let its non-daemon thread
    # hang the interpreter shutdown forever.
    import threading

    lingering = [
        t for t in threading.enumerate()
        if t is not threading.main_thread() and not t.daemon and t.is_alive()
    ]
    if lingering:
        logger.warning(
            "forcing exit with %d worker thread(s) still busy (in-flight "
            "device compile); state was already flushed", len(lingering),
        )
        import os

        logging.shutdown()
        os._exit(rc)
    return rc


if __name__ == "__main__":
    sys.exit(main())
