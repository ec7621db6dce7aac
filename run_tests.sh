#!/usr/bin/env bash
# Full test battery: Python suite (virtual 8-CPU mesh), C++ runtime tests,
# and the multi-chip dry run.
#
# Tiers (the full battery exceeds 10 min on a 1-core host):
#   QUICK=1 ./run_tests.sh   — core-numerics only (`pytest -m quick`: loss
#                              kernels vs torch oracles, decoding, tokenizer,
#                              ScaledAdam-vs-reference oracle) + C++ ctest.
#   ./run_tests.sh           — everything (python full, C++, multichip dryrun).
#   SANITIZE=1 ./run_tests.sh — adds ASan/UBSan C++ builds.
set -euo pipefail
cd "$(dirname "$0")"

if [[ "${QUICK:-0}" != "0" ]]; then
    echo "== Python quick tier (core numerics) =="
    JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/jax_cache} \
        python -m pytest tests/ -q -m quick
    echo "== C++ runtime =="
    cmake -S runtime -B runtime/build -G Ninja >/dev/null
    ninja -C runtime/build >/dev/null
    ctest --test-dir runtime/build --output-on-failure
    exit 0
fi

echo "== Python test suite =="
JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/jax_cache} \
    python -m pytest tests/ -q

echo "== C++ runtime =="
cmake -S runtime -B runtime/build -G Ninja >/dev/null
ninja -C runtime/build >/dev/null
ctest --test-dir runtime/build --output-on-failure

if [[ "${SANITIZE:-0}" != "0" ]]; then
    echo "== C++ runtime (ASan+UBSan) =="
    cmake -S runtime -B runtime/build-asan -G Ninja \
        -DASR_RT_SANITIZE=address >/dev/null
    ninja -C runtime/build-asan >/dev/null
    ctest --test-dir runtime/build-asan --output-on-failure
    cmake -S runtime -B runtime/build-ubsan -G Ninja \
        -DASR_RT_SANITIZE=undefined >/dev/null
    ninja -C runtime/build-ubsan >/dev/null
    ctest --test-dir runtime/build-ubsan --output-on-failure
fi

echo "== multi-chip dry run (8 virtual devices) =="
python __graft_entry__.py
