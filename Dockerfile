# Single image for the engine server and all control-plane services
# (the reference builds one python-slim image per service; one image with
# per-deployment commands is simpler and keeps versions in lockstep).
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
    g++ make git curl && rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY pyproject.toml ./
COPY vllm_backend_public_tpu ./vllm_backend_public_tpu
COPY native ./native
COPY configs ./configs

# TPU hosts: jax[tpu]; CPU dev/CI: plain jax
ARG JAX_VARIANT=tpu
RUN pip install --no-cache-dir \
    "jax[${JAX_VARIANT}]" aiohttp pydantic pyyaml safetensors \
    transformers numpy requests && \
    pip install --no-cache-dir -e .

EXPOSE 8000-8005
CMD ["python", "-m", "vllm_backend_public_tpu.server", "--help"]
