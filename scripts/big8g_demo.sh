#!/bin/sh
# Runs the full 8 Gsym capacity demo once the index exists:
# sidecar build -> ref timing -> mem golden -> chip runblock demo.
set -e
cd "$(dirname "$0")/.."
while [ ! -f .bench/big8g/idx.fmd ]; do sleep 60; done
echo "[demo] index present; building v2 sidecar via load_index (stat)"
PYTHONPATH= JAX_PLATFORMS=cpu python -m ropebwt3_tpu stat .bench/big8g/idx.fmd > /dev/null
echo "[demo] reference timing (solo)"
python scripts/scale_bench.py ref big8g
echo "[demo] mem golden"
RB3TPU_SLOW_TESTS=1 python -m pytest tests/test_big_scale.py::test_mem_golden_8gsym_index -x -q
echo "[demo] chip runblock demo"
python scripts/rb_chip.py big8g 100000
echo "[demo] DONE"
