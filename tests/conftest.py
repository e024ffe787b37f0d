import os
import shutil
import subprocess
import sys

# CPU-only JAX with an 8-device virtual mesh for sharding tests.  The machine
# environment pins JAX_PLATFORMS=axon (a tunneled TPU that serializes across
# processes and pays remote-compile latency) and a sitecustomize on PYTHONPATH
# registers that plugin at interpreter start — too early for conftest to undo.
# Re-exec pytest once with a scrubbed environment.
if os.environ.get("RB3TPU_TEST_REEXEC") != "1":
    env = dict(os.environ)
    env["RB3TPU_TEST_REEXEC"] = "1"
    # save the ambient env so the gated real-TPU smoke test
    # (tests/test_tpu_smoke.py, RB3TPU_TPU_TESTS=1) can hand it back to its
    # CLI subprocesses — those are the only test processes allowed to attach
    env["RB3TPU_ORIG_PYTHONPATH"] = env.get("PYTHONPATH", "")
    env["RB3TPU_ORIG_JAX_PLATFORMS"] = env.get("JAX_PLATFORMS", "")
    env["PYTHONPATH"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8").strip()
    os.execve(sys.executable, [sys.executable, "-m", "pytest"] + sys.argv[1:], env)

import numpy as np
import pytest

# tests marked `slow` (compile-cliff / daemon-lifecycle / 2-process-build
# cases whose feature is also covered by a fast sibling) run only with
# RB3TPU_SLOW_TESTS=1 — keeps the default suite under ~5 min solo
# (VERDICT r4 item 8; it had crept to ~18-25 min)


def pytest_collection_modifyitems(config, items):
    if os.environ.get("RB3TPU_SLOW_TESTS") == "1":
        return
    skip = pytest.mark.skip(reason="slow (set RB3TPU_SLOW_TESTS=1)")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


REF_SRC = "/root/reference"
REF_BIN_DIR = "/tmp/rb3_ref_bin"
REF_BIN = os.path.join(REF_BIN_DIR, "ropebwt3")


@pytest.fixture(scope="session")
def ref_bin():
    """Reference ropebwt3 binary, compiled once from the read-only checkout."""
    if not os.path.exists(REF_BIN):
        if not os.path.isdir(REF_SRC):
            pytest.skip("reference source not available")
        shutil.copytree(REF_SRC, REF_BIN_DIR, dirs_exist_ok=True)
        subprocess.run(["make", "-j8"], cwd=REF_BIN_DIR, check=True, capture_output=True)
    return REF_BIN


def run_ref(ref_bin, args, input=None):
    r = subprocess.run([ref_bin] + args, input=input, capture_output=True, check=True)
    return r.stdout


def run_ours(args, input=None, extra_env=None):
    # CLI subprocesses must not attach to the tunneled TPU (serializes across
    # processes machine-wide); scrub to the CPU backend.
    env = dict(os.environ)
    env["PYTHONPATH"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    if extra_env:
        env.update(extra_env)
    r = subprocess.run([sys.executable, "-m", "ropebwt3_tpu"] + args, input=input, capture_output=True, env=env)
    assert r.returncode == 0, r.stderr.decode()
    return r.stdout


@pytest.fixture(scope="session")
def corpus(tmp_path_factory):
    """Small synthetic pangenome + mutated reads."""
    d = tmp_path_factory.mktemp("corpus")
    rng = np.random.default_rng(42)
    base = rng.integers(0, 4, 8000)
    fa = d / "genomes.fa"
    with open(fa, "w") as f:
        for i in range(8):
            s = base.copy()
            mut = rng.random(len(s)) < 0.01
            s[mut] = rng.integers(0, 4, mut.sum())
            f.write(f">s{i}\n" + "".join("ACGT"[c] for c in s) + "\n")
    reads = d / "reads.fa"
    genome = "".join("ACGT"[c] for c in base)
    with open(reads, "w") as f:
        for i in range(60):
            st = rng.integers(0, len(genome) - 150)
            r = list(genome[st : st + 150])
            for j in range(len(r)):
                if rng.random() < 0.03:
                    r[j] = "ACGT"[rng.integers(0, 4)]
            f.write(f">r{i}\n{''.join(r)}\n")
    return d


@pytest.fixture(scope="session")
def ref_index(ref_bin, corpus):
    """Reference-built FMD (+ssa +len.gz) for the corpus."""
    import gzip

    fmd = corpus / "idx.fmd"
    subprocess.run([ref_bin, "build", "-do", str(fmd), str(corpus / "genomes.fa")], check=True, capture_output=True)
    subprocess.run([ref_bin, "ssa", "-o", str(fmd) + ".ssa", str(fmd)], check=True, capture_output=True)
    with gzip.open(str(fmd) + ".len.gz", "wt") as f:
        name = None
        for line in open(corpus / "genomes.fa"):
            line = line.strip()
            if line.startswith(">"):
                name = line[1:].split()[0]
            elif line and name:
                f.write(f"{name}\t{len(line)}\n")
                name = None
    return fmd
