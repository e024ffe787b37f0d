#!/bin/sh
# Post-artifact sequence for an official bench session: runs strictly
# sequentially so every reference timing is recorded SOLO.
# Waits on regen_artifacts.sh's sentinel (max 3 h), then times references.
set -e
cd "$(dirname "$0")/.."
if [ ! -f .bench/.regen_done ]; then
  echo "[endgame] waiting for .bench/.regen_done (run scripts/regen_artifacts.sh first) ..."
  waited=0
  while [ ! -f .bench/.regen_done ]; do
    sleep 30
    waited=$((waited + 30))
    if [ "$waited" -ge 10800 ]; then
      echo "[endgame] ERROR: no .bench/.regen_done after 3 h; bailing" >&2
      exit 1
    fi
  done
fi
echo "[endgame] artifacts ready; big8g demo"
sh scripts/big8g_demo.sh
echo "[endgame] solo reference timings (s640/mtb13/big2g)"
for s in s640 mtb13 big2g; do
  PYTHONPATH= JAX_PLATFORMS=cpu NUMPY_MADVISE_HUGEPAGE=0 python scripts/scale_bench.py ref "$s"
done
echo "[endgame] DONE"
