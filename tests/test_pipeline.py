"""End-to-end pipeline parity: full FASTA/VCF runs vs golden TSV rows."""

import io
import os

import numpy as np
import pytest

from weightedld_tpu.io.writer import PAIR_HEADER, write_pairs
from weightedld_tpu.pipeline import WldConfig, run

from .fixtures import ALL_FASTAS, GOLDEN, T7_GOLDEN, T7_PATH, write_fasta


@pytest.mark.parametrize("name", ["example", "t3", "t4"])
def test_end_to_end_fasta(tmp_path, name):
    path = tmp_path / f"{name}.fasta"
    write_fasta(path, ALL_FASTAS[name])
    res = run(path)
    got = {
        (int(a), int(b)): (round(float(d), 4), round(float(dp), 4), round(float(r2), 4))
        for a, b, d, dp, r2 in zip(
            res.records.pos_a, res.records.pos_b,
            res.records.d, res.records.d_prime, res.records.r2,
        )
    }
    exp = {(a, b): (d, dp, r2) for a, b, d, dp, r2 in GOLDEN[name]["pairs"]}
    assert set(got) == set(exp)
    for k in exp:
        np.testing.assert_allclose(got[k], exp[k], atol=2e-4)


def test_unweighted_flag(tmp_path):
    path = tmp_path / "t5.fasta"
    write_fasta(path, ALL_FASTAS["t5"])
    res = run(path, WldConfig(unweighted=True))
    assert (res.weights == 1.0).all()
    # t5 is flat-weight by design, so results match the weighted run.
    assert round(float(res.records.d[0]), 4) == -0.25


def test_writer_format(tmp_path):
    path = tmp_path / "t5.fasta"
    write_fasta(path, ALL_FASTAS["t5"])
    res = run(path)
    buf = io.StringIO()
    write_pairs(res.records, buf)
    lines = buf.getvalue().strip().split("\n")
    assert lines[0] == PAIR_HEADER
    assert lines[1].split("\t")[:2] == ["0", "1"]
    # Python round()-style shortest repr: "-0.25", not "-0.2500".
    assert lines[1].split("\t")[2] == "-0.25"


@pytest.mark.skipif(not os.path.exists(T7_PATH), reason="reference fixture absent")
def test_end_to_end_t7_vcf():
    res = run(T7_PATH)
    got = {
        (int(a), int(b)): (round(float(d), 4), round(float(dp), 4), round(float(r2), 4))
        for a, b, d, dp, r2 in zip(
            res.records.pos_a, res.records.pos_b,
            res.records.d, res.records.d_prime, res.records.r2,
        )
    }
    exp = {(a, b): (d, dp, r2) for a, b, d, dp, r2 in T7_GOLDEN["pairs"]}
    assert set(got) == set(exp)
    for k in exp:
        np.testing.assert_allclose(got[k], exp[k], atol=2e-4)
