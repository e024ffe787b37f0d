"""Progress tracing in the reference's format (misc.c:116-157):
``[M::<func>::<realtime>*<%cpu>] message`` lines on stderr at verbosity >= 3,
plus the final Version/CMD/Real-time footer (main.c:73-80).
"""

from __future__ import annotations

import inspect
import os
import resource
import sys
import time

verbose = int(os.environ.get("RB3TPU_VERBOSE", "3"))
_t0 = time.time()


def realtime() -> float:
    return time.time() - _t0


def cputime() -> float:
    ru = resource.getrusage(resource.RUSAGE_SELF)
    rc = resource.getrusage(resource.RUSAGE_CHILDREN)
    return ru.ru_utime + ru.ru_stime + rc.ru_utime + rc.ru_stime


def percent_cpu() -> float:
    rt = realtime()
    return cputime() / rt if rt > 0 else 0.0


def peak_rss_gb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0 / 1024.0


def info(fmt: str, *args, func: str | None = None) -> None:
    if verbose < 3:
        return
    if func is None:
        func = inspect.stack()[1].function
    msg = fmt % args if args else fmt
    sys.stderr.write(f"[M::{func}::{realtime():.3f}*{percent_cpu():.2f}] {msg}\n")


def footer(argv: list[str], version: str) -> None:
    if verbose < 3:
        return
    sys.stderr.write(f"[M::main] Version: {version}\n")
    sys.stderr.write("[M::main] CMD: " + " ".join(["rb3tpu"] + argv) + "\n")
    sys.stderr.write(f"[M::main] Real time: {realtime():.3f} sec; CPU: {cputime():.3f} sec; Peak RSS: {peak_rss_gb():.3f} GB\n")
