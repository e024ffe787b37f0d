"""CLI glue for the BWA-SW / hapdiv alignment engine."""

from __future__ import annotations


def run_sw_cli(f, files, is_line, sw_opts) -> int:
    raise NotImplementedError("sw: BWA-SW engine lands in align/bwasw.py")


def run_hapdiv_cli(f, files, is_line, sw_opts, k, w) -> int:
    raise NotImplementedError("hapdiv: BWA-SW engine lands in align/bwasw.py")
