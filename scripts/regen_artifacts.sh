#!/bin/sh
# Regenerate every .bench artifact on a fresh host (fresh-VM bootstrap).
# Corpora + OUR-CLI index builds + query-time sidecars only; reference
# timings are recorded separately (solo, scripts/endgame.sh) so build
# contention never contaminates them.
# Writes .bench/.regen_done on success — endgame.sh polls that sentinel.
set -e
cd "$(dirname "$0")/.."
export NUMPY_MADVISE_HUGEPAGE=0 PYTHONPATH= JAX_PLATFORMS=cpu
rm -f .bench/.regen_done
echo "=== 64M bench corpus + index"
python -c "import bench; fa,_,_=bench.ensure_corpus(); bench.ensure_index(fa)"
python -c "
import bench
from ropebwt3_tpu.ops.smem_native import pline_table
from ropebwt3_tpu.ops import runblock
f = bench.ensure_dense('.bench/idx.fmd'); pline_table(f); runblock.from_dense_np(f)
"
for s in s640 mtb13 big2g big8g; do
  echo "=== $s gen"
  python scripts/scale_bench.py gen "$s"
  echo "=== $s build"
  python scripts/scale_bench.py build "$s"
  echo "=== $s sidecars (dense/pline/rb)"
  python scripts/scale_bench.py sidecar "$s"
done
date > .bench/.regen_done
echo "=== all artifacts done"
