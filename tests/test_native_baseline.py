"""Native C++ baseline: builds, matches golden LD values where the Rust
semantics coincide with Python's (flat weights, biallelic, no unknowns)."""

import json
import shutil
import subprocess
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
NATIVE = REPO / "native"

pytestmark = pytest.mark.skipif(
    shutil.which("g++") is None, reason="no C++ toolchain"
)


@pytest.fixture(scope="module")
def baseline_exe():
    exe = NATIVE / "weighted_ld_baseline"
    subprocess.run(["make", "-C", str(NATIVE)], check=True, capture_output=True)
    assert exe.exists()
    return exe


def _write(tmp, seqs):
    p = tmp / "in.fasta"
    p.write_text("".join(f">s{i}\n{s}\n" for i, s in enumerate(seqs)))
    return p


def test_t5_golden(baseline_exe, tmp_path):
    from .fixtures import ALL_FASTAS

    f = _write(tmp_path, ALL_FASTAS["t5"])
    out = subprocess.run(
        [str(baseline_exe), "--fasta-input", str(f), "--r2-threshold", "0"],
        capture_output=True, text=True, check=True,
    ).stdout
    rows = [r.split("\t") for r in out.strip().splitlines()[1:]]
    assert rows == [["0", "1", "-0.250", "0.500", "1.000"]]


def test_t1_golden(baseline_exe, tmp_path):
    from .fixtures import ALL_FASTAS, GOLDEN

    f = _write(tmp_path, ALL_FASTAS["t1"])
    out = subprocess.run(
        [str(baseline_exe), "--fasta-input", str(f), "--r2-threshold", "0"],
        capture_output=True, text=True, check=True,
    ).stdout
    rows = [r.split("\t") for r in out.strip().splitlines()[1:]]
    assert len(rows) == len(GOLDEN["t1"]["pairs"])
    for r in rows:
        assert (float(r[2]), float(r[3]), float(r[4])) == (-0.25, 0.5, 1.0)


def test_bench_mode(baseline_exe):
    out = subprocess.run(
        [str(baseline_exe), "--bench", "100", "256"],
        capture_output=True, text=True, check=True, timeout=120,
    ).stdout
    stats = json.loads(out.strip())
    assert stats["n_pairs"] == 256 * 255 // 2
    assert stats["pairs_per_s"] > 0
