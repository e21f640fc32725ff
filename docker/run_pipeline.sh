#!/usr/bin/env bash
set -euo pipefail
CONFIG="${PIPELINE_CONFIG:-/app/config/pipeline-sim.yaml}"
[ -f "$CONFIG" ] || { echo "config not found: $CONFIG" >&2; exit 1; }
exec realtime-analytics --config "$CONFIG" --broker "$@"
