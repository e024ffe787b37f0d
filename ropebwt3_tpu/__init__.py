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

_jax_ready = False


def _jax_setup():
    """Import jax and enable x64 (int64 BWT offsets for terabase indexes).
    Call this before using any jax-backed module."""
    global _jax_ready
    if _jax_ready:
        return
    import jax

    jax.config.update("jax_enable_x64", True)
    _jax_ready = True
