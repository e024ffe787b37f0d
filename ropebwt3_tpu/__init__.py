"""ropebwt3_tpu — a TPU-native FM-index engine with the capabilities of lh3/ropebwt3.

Brand-new design in JAX/XLA/Pallas: the run-length BWT is decoded into dense,
blockwise occurrence-checkpoint tables resident in (sharded) HBM; rank /
bidirectional extension / SMEM scans / alignment DP run as batched JAX
computations (Pallas kernels on the hot path); construction uses a
prefix-doubling suffix-array builder plus a batched interleave-rank BWT merge.

On-disk formats (FMD/FMR/BRE/SSA/plain) and stdout formats (mem BED, sw PAF,
hapdiv tables) are bit-compatible with ropebwt3 v3.10-r281.
"""

__version__ = "0.1.0"

# Explicit-dtype policy: we enable x64 so int64 BWT offsets exist for
# terabase-scale indexes; every array in this package declares its dtype
# explicitly, so float compute stays f32/bf16.
import jax as _jax

_jax.config.update("jax_enable_x64", True)
