# syntax=docker/dockerfile:1.6
# Serving image for the sic_tpu framework — the deploy surface the
# reference ships (reference: Dockerfile:1-47, built+pushed by
# gitlab-ci.yml:16-57).  Differences are deliberate:
#   - the service is the stdlib-HTTP in-process server (sic_tpu/service),
#     no uvicorn/fastapi dependency;
#   - the native rANS coder self-builds from source at image build
#     (sic_tpu/cpp/build.py content-hashed g++ compile) instead of a CMake
#     tree of prebuilt .so files;
#   - default compute backend is CPU jax; for TPU serving install the
#     libtpu wheel at deploy time (the base layers are identical).
FROM python:3.12-slim-bookworm

RUN --mount=type=cache,target=/var/cache/apt,sharing=locked \
    --mount=type=cache,target=/var/lib/apt,sharing=locked \
    apt-get update && apt-get install -y --no-install-recommends \
      g++ zstd \
 && rm -rf /var/lib/apt/lists/*

WORKDIR /app

# install the package (jax/flax/optax/orbax via pyproject deps)
COPY pyproject.toml README.md ./
COPY sic_tpu/ ./sic_tpu/
COPY webapp.py ./webapp.py
RUN --mount=type=cache,target=/root/.cache/pip \
    pip install --no-cache-dir .

# pre-build the native rANS coder so first-request latency excludes the
# compile; load_library() is the same content-hashed entry the runtime uses
RUN python -c "from sic_tpu.cpp.build import load_library; load_library()" \
 && python -c "from sic_tpu.container.c2df import pack_c2df; print('ok')"

# service configuration (reference: webapp.py:11-22 env surface)
ENV JAX_PLATFORMS=cpu \
    CKPT_PATH="" \
    BASE_CONFIG="" \
    INDEX_DIR=/data/index \
    MEDIA_ROOT=/data \
    PREVIEW_CACHE=/tmp/sic_previews

EXPOSE 8000
CMD ["python", "webapp.py", "--host", "0.0.0.0", "--port", "8000"]
