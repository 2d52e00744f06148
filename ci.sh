#!/bin/sh
# Full CI pipeline (reference: github_test.sh + test.sh + doctest.sh):
# native build, pytest suite (CPU backend, 8 virtual devices), doctest
# conformance corpus, demo gallery, and the multichip dryrun.
set -e
cd "$(dirname "$0")"

echo "== native build =="
if command -v g++ >/dev/null 2>&1; then
    sh native/build.sh
else
    echo "no g++; numpy fallback paths will be used"
fi

echo "== pytest (includes doctest corpus + demo gallery) =="
python -m pytest tests/ -q "$@"

echo "== multichip dryrun (8 virtual devices) =="
# jax.config (not the env var): some environments prepend their own
# platform to JAX_PLATFORMS, which would grab the session
XLA_FLAGS=--xla_force_host_platform_device_count=8 \
python -c "import jax; jax.config.update('jax_platforms', 'cpu'); \
import __graft_entry__ as g; g.dryrun_multichip(8); print('dryrun ok')"

echo "CI OK"
