"""ropebwt3_tpu — a TPU-native FM-index engine with the capabilities of lh3/ropebwt3.

Brand-new design in JAX/XLA/Pallas: the run-length BWT is decoded into dense,
blockwise occurrence-checkpoint tables resident in (sharded) HBM; rank /
bidirectional extension / SMEM scans / alignment DP run as batched JAX
computations (Pallas kernels on the hot path); construction uses a
prefix-doubling suffix-array builder plus a batched interleave-rank BWT merge.

On-disk formats (FMD/FMR/BRE/SSA/plain) and stdout formats (mem BED, sw PAF,
hapdiv tables) are bit-compatible with ropebwt3 v3.10-r281.

NB: jax is imported lazily (see _jax_setup) — on this machine every jax import
attaches to the tunneled TPU, which serializes across processes; host-only
commands (stat, get, format conversion, ...) must not pay that.
"""

__version__ = "0.1.0"

# numpy madvise(MADV_HUGEPAGE) makes first-touch page faults ~100x slower on
# some virtualized hosts (THP assembly under lazily-populated VM memory);
# measured 15-170 MB/s vs ~2 GB/s fill bandwidth on this machine.  Disable it
# for every array numpy allocates from here on (and via env for any numpy
# imported later in subprocesses).
import os as _os

_os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")
try:  # pragma: no cover - numpy private API, best effort
    import numpy as _np

    _np._core.multiarray._set_madvise_hugepage(False)
except Exception:
    pass

_jax_ready = False


def _jax_setup():
    """Import jax and enable x64 (int64 BWT offsets for terabase indexes).
    Call this before using any jax-backed module."""
    global _jax_ready
    if _jax_ready:
        return
    import os

    import jax

    jax.config.update("jax_enable_x64", True)
    # Persistent compilation cache: identical programs recompile per process
    # on this runtime (remote compiles run 2 s-40 min), so cache aggressively.
    try:
        cache_dir = os.environ.get("RB3TPU_CACHE", os.path.join(os.path.expanduser("~"), ".cache", "rb3tpu_xla"))
        if cache_dir.lower() in ("", "0", "off", "none"):  # RB3TPU_CACHE=0 disables
            cache_dir = None
        if cache_dir is not None:
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
            jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax or plugin without persistent-cache support
    _jax_ready = True
