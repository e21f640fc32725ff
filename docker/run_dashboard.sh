#!/usr/bin/env bash
set -euo pipefail
ARGS=(--host "${DASHBOARD_HOST:-0.0.0.0}" --port "${DASHBOARD_PORT:-8080}")
if [ -n "${DASHBOARD_CONFIG:-}" ]; then ARGS+=(--config "$DASHBOARD_CONFIG"); fi
if [ -n "${KAFKA_BOOTSTRAP:-}" ]; then ARGS+=(--kafka-bootstrap "$KAFKA_BOOTSTRAP"); fi
if [ -n "${KAFKA_TOPIC:-}" ]; then ARGS+=(--kafka-topic "$KAFKA_TOPIC"); fi
if [ -n "${EVENT_TRANSPORT:-}" ]; then ARGS+=(--transport "$EVENT_TRANSPORT"); fi
exec realtime-analytics-dashboard "${ARGS[@]}" "$@"
