# Build/runtime environment for speech2text_tpu (parity with reference
# Dockerfile.build:1-58, which pins CUDA 11.6 + torch 1.13.1 + k2 + lhotse;
# the TPU rebuild needs only the JAX TPU stack + a C++ toolchain for
# runtime/).
#
# Usage:
#   docker build -t speech2text-tpu .
#   docker run --privileged --net=host -it speech2text-tpu  # on a TPU VM
FROM python:3.11-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        build-essential cmake ninja-build git \
    && rm -rf /var/lib/apt/lists/*

# JAX with the TPU runtime (libtpu via the Google releases index), plus the
# training/runtime deps this repo imports. Versions float intentionally:
# the package uses only stable public APIs (jax.sharding, pjit, pallas,
# optax, orbax.checkpoint, flax.linen).
RUN pip install --no-cache-dir \
        "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
        flax optax orbax-checkpoint chex einops numpy pyyaml absl-py pytest

WORKDIR /workspace/speech2text_tpu
COPY . .

# C++ deployment runtime (lexicon trie + ARPA LM + CTC lexicon beam):
RUN cmake -S runtime -B runtime/build -G Ninja \
        -DCMAKE_BUILD_TYPE=Release \
    && cmake --build runtime/build

# Smoke: import the package and list tests (full suite needs a host with
# XLA CPU/TPU devices; see run_tests.sh)
RUN python -c "import speech2text_tpu" && python -m pytest tests --collect-only -q | tail -1

CMD ["/bin/bash"]
