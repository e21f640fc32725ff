#!/usr/bin/env bash
# Spawn N looping ffmpeg RTSP listeners (one camera simulator per port),
# for multi-stream demos without real cameras.
#
#   ./scripts/rtsp-multistream.sh <video-file> [count] [base-port]
#
# Stream i serves rtsp://127.0.0.1:$((base_port+i))/cam-$(printf %02d $i)

set -euo pipefail

VIDEO="${1:?usage: rtsp-multistream.sh <video-file> [count] [base-port]}"
COUNT="${2:-4}"
BASE_PORT="${3:-8554}"

command -v ffmpeg >/dev/null || { echo "ffmpeg not found" >&2; exit 1; }
[ -f "$VIDEO" ] || { echo "video file not found: $VIDEO" >&2; exit 1; }

PIDS=()
cleanup() {
  echo "stopping ${#PIDS[@]} simulators..."
  for pid in "${PIDS[@]}"; do kill "$pid" 2>/dev/null || true; done
  wait 2>/dev/null || true
}
trap cleanup EXIT INT TERM

for ((i = 0; i < COUNT; i++)); do
  port=$((BASE_PORT + i))
  name=$(printf "cam-%02d" "$i")
  url="rtsp://0.0.0.0:${port}/${name}"
  ffmpeg -nostdin -loglevel warning \
    -stream_loop -1 -re -i "$VIDEO" \
    -c:v libx264 -preset veryfast -tune zerolatency -an \
    -f rtsp -rtsp_transport tcp -muxdelay 0.1 -listen 1 "$url" &
  PIDS+=($!)
  echo "simulator $name on rtsp://127.0.0.1:${port}/${name} (pid ${PIDS[-1]})"
done

echo "serving ${COUNT} RTSP streams; ctrl-c to stop"
wait
