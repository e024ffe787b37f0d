#!/bin/bash
# AddressSanitizer pass over the native fast paths (the analog of the
# reference's `make asan=1`, Makefile:10-13): rebuilds the three C++ libs
# with -fsanitize=address into a scratch dir and runs the native-heavy test
# files under LD_PRELOAD'd libasan.
#
# Usage: scripts/asan_check.sh [pytest args...]
set -euo pipefail
ROOT="$(cd "$(dirname "$0")/.." && pwd)"
SCRATCH="$(mktemp -d /tmp/rb3t_asan.XXXXXX)"
trap 'rm -rf "$SCRATCH"' EXIT

cp -r "$ROOT/ropebwt3_tpu" "$SCRATCH/ropebwt3_tpu"
cp -r "$ROOT/tests" "$SCRATCH/tests"
rm -f "$SCRATCH"/ropebwt3_tpu/native/_*.so

for src in rld_codec bwasw_core sais; do
  g++ -O1 -g -fsanitize=address -fno-omit-frame-pointer -march=native \
      -std=c++17 -shared -fPIC -pthread \
      -o "$SCRATCH/ropebwt3_tpu/native/_${src}.so" \
      "$SCRATCH/ropebwt3_tpu/native/${src}.cpp"
done

LIBASAN="$(g++ -print-file-name=libasan.so)"
cd "$SCRATCH"
LD_PRELOAD="$LIBASAN" \
ASAN_OPTIONS="detect_leaks=0:abort_on_error=1" \
PYTHONPATH="$SCRATCH" JAX_PLATFORMS=cpu \
python -m pytest tests/test_native_sw.py tests/test_ssa_props.py \
    tests/test_formats.py tests/test_rank.py -q -x "$@"
echo "[asan] native libs clean"
