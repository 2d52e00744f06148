#!/bin/sh
# Build the native IO extension in-place.
set -e
cd "$(dirname "$0")"
PYINC=$(python -c "import sysconfig; print(sysconfig.get_paths()['include'])")
EXT=$(python -c "import sysconfig; print(sysconfig.get_config_var('EXT_SUFFIX'))")
g++ -O3 -march=native -shared -fPIC -std=c++17 \
    -I"$PYINC" fastio.cpp -o "../pygraphblas_tpu/_fastio$EXT"
echo "built pygraphblas_tpu/_fastio$EXT"
