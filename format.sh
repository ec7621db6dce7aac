#!/usr/bin/env bash
# Code formatting (parity with reference format.sh:9-20, which runs yapf
# google-style + clang-format Google + cmake-format). This repo uses the
# tools available in the environment: autopep8/pycodestyle conventions via
# `python -m autopep8` when present, else reports style with pycodestyle;
# clang-format for runtime C++ when installed.
set -euo pipefail
cd "$(dirname "$0")"

PY_FILES=$(git ls-files '*.py')

if python -c "import autopep8" 2>/dev/null; then
  python -m autopep8 --in-place --max-line-length 79 ${PY_FILES}
  echo "autopep8: done"
elif python -c "import pycodestyle" 2>/dev/null; then
  python -m pycodestyle --max-line-length=79 ${PY_FILES} || true
else
  echo "no python formatter available (autopep8/pycodestyle not installed)"
fi

if command -v clang-format >/dev/null 2>&1; then
  find runtime -name '*.cc' -o -name '*.h' | xargs -r clang-format -i \
    --style=Google
  echo "clang-format: done"
else
  echo "clang-format not installed; skipping C++"
fi
