# cortex_tpu server image.
# Parity: reference Dockerfile (single static binary); here the engine is
# a Python package with an on-demand-compiled C++ helper, so the image is
# a slim python base + the package. For TPU serving, swap the base for
# your TPU-enabled JAX image and drop the CPU pin.
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends g++ \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY cortex_tpu/ cortex_tpu/
COPY sdks/python/ sdks/python/
COPY pyproject.toml README.md ./

# CPU JAX by default; use the TPU extra on TPU VMs
RUN pip install --no-cache-dir "jax[cpu]" aiohttp grpcio protobuf \
    cryptography numpy && pip install --no-cache-dir -e .

ENV CORTEX_DATA_DIR=/data
VOLUME /data
EXPOSE 9090 9091

ENTRYPOINT ["python", "-m", "cortex_tpu"]
CMD ["--data-dir", "/data", "serve"]
