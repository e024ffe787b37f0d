#!/bin/sh
# Post-artifact sequence for an official bench session: runs strictly
# sequentially so every reference timing is recorded SOLO.
set -e
cd "$(dirname "$0")/.."
while ! grep -q "all artifacts done" /tmp/regen.log 2>/dev/null; do sleep 30; done
echo "[endgame] artifacts ready; big8g demo"
sh scripts/big8g_demo.sh
echo "[endgame] solo reference timings (s640/mtb13/big2g)"
for s in s640 mtb13 big2g; do
  PYTHONPATH= JAX_PLATFORMS=cpu NUMPY_MADVISE_HUGEPAGE=0 python scripts/scale_bench.py ref "$s"
done
echo "[endgame] DONE"
