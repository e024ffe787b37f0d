"""Sequence input: FASTA/FASTQ (optionally gzipped), line mode, and the
``.len.gz`` sequence-name/length sidecar.

Mirrors the behavior of the reference reader (io.c:60-155): batch reads
concatenate nt6-encoded sequences each followed by a 0 separator, optionally
followed by the reverse complement of each sequence.
"""

from __future__ import annotations

import gzip
import io
import sys
from dataclasses import dataclass
from typing import Iterator

import numpy as np

from .nt6 import char2nt6, revcomp


def _open_maybe_gzip(fn: str):
    if fn == "-":
        raw = sys.stdin.buffer
    else:
        raw = open(fn, "rb")
    head = raw.peek(2) if hasattr(raw, "peek") else b""
    if fn != "-":
        if raw.read(2) == b"\x1f\x8b":
            raw.seek(0)
            return io.BufferedReader(gzip.GzipFile(fileobj=raw))
        raw.seek(0)
        return raw
    if head[:2] == b"\x1f\x8b":
        return io.BufferedReader(gzip.GzipFile(fileobj=raw))
    return raw


@dataclass
class SeqRecord:
    name: str | None
    seq: bytes  # raw ASCII, not yet nt6-encoded


def read_seqs(fn: str, is_line: bool = False) -> Iterator[SeqRecord]:
    """Yield records from FASTA/FASTQ/line input, like rb3_seq_read1."""
    fp = _open_maybe_gzip(fn)
    if is_line:
        for line in fp:
            yield SeqRecord(None, line.rstrip(b"\n").rstrip(b"\r"))
        return
    # FASTX autodetect, kseq-style: '>' FASTA, '@' FASTQ.
    name = None
    seq_parts: list[bytes] = []
    line = fp.readline()
    while line:
        if line.startswith(b">"):
            if name is not None:
                yield SeqRecord(name, b"".join(seq_parts))
            name = line[1:].split()[0].decode() if len(line) > 1 else ""
            seq_parts = []
            line = fp.readline()
        elif line.startswith(b"@"):
            if name is not None:
                yield SeqRecord(name, b"".join(seq_parts))
                name, seq_parts = None, []
            qname = line[1:].split()[0].decode() if len(line) > 1 else ""
            seq = fp.readline().rstrip(b"\n").rstrip(b"\r")
            plus = fp.readline()
            if plus.startswith(b"+"):
                fp.readline()  # quality
                yield SeqRecord(qname, seq)
                line = fp.readline()
            else:  # malformed; treat as FASTA-ish
                name, seq_parts = qname, [seq]
                line = plus
        else:
            seq_parts.append(line.rstrip(b"\n").rstrip(b"\r"))
            line = fp.readline()
    if name is not None:
        yield SeqRecord(name, b"".join(seq_parts))


def read_batch_nt6(
    records: Iterator[SeqRecord],
    max_len: int,
    is_for: bool = True,
    is_rev: bool = True,
) -> tuple[int, np.ndarray]:
    """Read a batch like rb3_seq_read (io.c:104-125): returns (n_seq, buffer)
    where buffer holds nt6 codes with a 0 after every sequence; for each input
    sequence the forward strand (if is_for) then its reverse complement (if
    is_rev) is appended, each 0-terminated. Stops once total length exceeds
    max_len (if positive)."""
    assert is_for or is_rev
    parts: list[np.ndarray] = []
    zero = np.zeros(1, dtype=np.uint8)
    n_seq, tot = 0, 0
    for rec in records:
        s = char2nt6(rec.seq)
        if is_for:
            parts.append(s)
            parts.append(zero)
            tot += len(s) + 1
            n_seq += 1
        if is_rev:
            parts.append(revcomp(s))
            parts.append(zero)
            tot += len(s) + 1
            n_seq += 1
        if max_len > 0 and tot > max_len:
            break
    if n_seq == 0:
        return 0, np.zeros(0, dtype=np.uint8)
    return n_seq, np.concatenate(parts)


@dataclass
class SeqNames:
    """Parsed ``.len.gz`` file: names and lengths (io.c:161-204)."""

    names: list[str]
    lens: np.ndarray  # int64

    @property
    def n_seq(self) -> int:
        return len(self.names)


def read_sid(fn: str) -> SeqNames:
    names: list[str] = []
    lens: list[int] = []
    with _open_maybe_gzip(fn) as fp:
        for line in fp:
            fields = line.split()
            if len(fields) >= 2:
                try:
                    ln = int(fields[1])
                except ValueError:
                    continue
                if ln > 0:
                    names.append(fields[0].decode())
                    lens.append(ln)
    return SeqNames(names, np.asarray(lens, dtype=np.int64))
