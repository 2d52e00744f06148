#!/bin/sh
# CI entry point (reference: test.sh): build the native runtime if a
# toolchain is present, then run the suite on the CPU backend with an
# 8-device virtual host platform (conftest.py sets the backend).
set -e
cd "$(dirname "$0")"
if command -v g++ >/dev/null 2>&1; then
    sh native/build.sh || echo "native build failed; numpy fallback paths"
fi
python -m pytest tests/ -q "$@"
