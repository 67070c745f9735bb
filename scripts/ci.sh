#!/usr/bin/env bash
# CI for libwave_tpu (the analog of the reference's
# scripts/ci/ci_run.bash:6-19: -Werror build + ctest).
#
#   scripts/ci.sh         fast loop: native -Werror + TSAN smoke, fast tests
#   scripts/ci.sh full    additionally runs the slow (jit-compile-heavy)
#                         test subset
#
# Tests run on the virtual 8-device CPU mesh (tests/conftest.py).
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== native: -Wall -Wextra -Werror build =="
g++ -O2 -std=c++17 -Wall -Wextra -Werror -shared -fPIC \
    native/wave_native.cpp -o /tmp/ci_wave_native.so -lpthread

echo "== native: ThreadSanitizer smoke (threaded kNN + concurrent CSV) =="
g++ -O1 -g -std=c++17 -fsanitize=thread \
    native/wave_native.cpp native/tsan_smoke.cpp \
    -o /tmp/ci_tsan_smoke -lpthread
/tmp/ci_tsan_smoke

echo "== pytest (fast subset) =="
PYTHONPATH= JAX_PLATFORMS=cpu python -m pytest tests/ -q -m "not slow" -x

if [[ "${1:-}" == "full" ]]; then
    echo "== pytest (slow subset) =="
    PYTHONPATH= JAX_PLATFORMS=cpu python -m pytest tests/ -q -m "slow"
fi

echo "CI OK"
