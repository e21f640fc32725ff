# TPU-VM image for the realtime analytics pipeline + dashboard.
# On Cloud TPU VMs, base this on a jax[tpu]-capable image; ffmpeg/libgl are
# for host-side capture/decode/encode (the TPU never touches raw video I/O).

FROM python:3.11-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        build-essential ffmpeg libgl1 libglib2.0-0 \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY pyproject.toml README.md ./
COPY realtime_analytics_tpu ./realtime_analytics_tpu
COPY config ./config
COPY scripts ./scripts

# jax[tpu] must match the TPU runtime; pin per deployment.
RUN pip install --no-cache-dir ".[full]" \
    && pip install --no-cache-dir "jax[tpu]" \
         -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    || pip install --no-cache-dir .

ENV PIPELINE_CONFIG=/app/config/pipeline-sim.yaml \
    DASHBOARD_HOST=0.0.0.0 \
    DASHBOARD_PORT=8080

COPY docker/run_pipeline.sh docker/run_dashboard.sh /app/docker/
RUN chmod +x /app/docker/*.sh

CMD ["/app/docker/run_pipeline.sh"]
