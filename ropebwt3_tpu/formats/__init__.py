"""Bit-exact codecs for ropebwt3's on-disk formats.

- fmd:  "RLD\\3" Elias-delta run-length FM-index (rld0.c) — the interchange format
- fmr:  "RB\\2" mrope B+-tree dump (mrope.c/rope.c/rle.c)
- bre:  "BRE\\1" portable run-length BWT (bre.c)
- ssa:  "SSA\\1" sampled suffix array (ssa.c)

All codecs speak *runs*: a pair of numpy arrays (symbols uint8, lengths int64)
describing the run-length BWT. Dense <-> runs conversion lives in index/.
"""

from . import fmd  # noqa: F401
