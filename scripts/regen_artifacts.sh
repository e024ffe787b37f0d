#!/bin/sh
# Regenerate every .bench artifact on a fresh host (fresh-VM bootstrap).
# Corpora + OUR-CLI index builds only; reference timings are recorded
# separately (solo) so build contention never contaminates them.
set -e
cd "$(dirname "$0")/.."
export NUMPY_MADVISE_HUGEPAGE=0 PYTHONPATH= JAX_PLATFORMS=cpu
echo "=== 64M bench corpus + index"
python -c "import bench; fa,_,_=bench.ensure_corpus(); bench.ensure_index(fa)"
for s in s640 mtb13 big2g big8g; do
  echo "=== $s gen"
  python scripts/scale_bench.py gen "$s"
  echo "=== $s build"
  python scripts/scale_bench.py build "$s"
done
echo "=== all artifacts done"
