# Demo deployment image (counterpart of reference demo/Dockerfile).
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends g++ make \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY pyproject.toml README.md MANIFEST.in ./
COPY faster_qwen3_tts_tpu ./faster_qwen3_tts_tpu
COPY native ./native
COPY servers ./servers

# TPU hosts: swap jax[cpu] for the libtpu wheel matching your runtime.
RUN pip install --no-cache-dir -e ".[server,hf]" "jax[cpu]" \
    && make -C native

EXPOSE 7860
ENV JAX_PLATFORMS=""
CMD ["python", "servers/demo_server.py", "--host", "0.0.0.0", "--port", "7860"]
