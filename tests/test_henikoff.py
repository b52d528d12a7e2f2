"""Henikoff weighting parity (ref test.py:37-67, SURVEY.md Appendix A)."""

import jax.numpy as jnp
import numpy as np
import pytest

from weightedld_tpu.core.encode import encode_alignment
from weightedld_tpu.core.henikoff import henikoff_weights
from weightedld_tpu.core.sites import compute_variable_sites

from .fixtures import ALL_FASTAS, GOLDEN, random_alignment
from .oracle import oracle_henikoff


def _encode(seqs):
    return encode_alignment([s.encode() for s in seqs])


@pytest.mark.parametrize("name", sorted(GOLDEN))
def test_golden_weights(name):
    # CLI-path convention: weights computed on the LD-masked alignment
    # (WeightedLD.py:303,397).
    aln = _encode(ALL_FASTAS[name])
    _, ld = compute_variable_sites(jnp.asarray(aln), 0.8, 0.02)
    trimmed = aln[:, np.asarray(ld)]
    w = np.asarray(henikoff_weights(jnp.asarray(trimmed)))
    np.testing.assert_allclose(w, GOLDEN[name]["weights"], atol=2e-4)


def test_paper_example():
    # Henikoff & Henikoff 1994 example -> [0.5, 0.5, 0.5, 0.5, 1.0]
    # (ref test.py:37-47).
    aln = _encode(["AAAAA", "AAAAA", "CCCCC", "CCCCC", "TTTTT"])
    w = np.asarray(henikoff_weights(jnp.asarray(aln)))
    np.testing.assert_allclose(w, [0.5, 0.5, 0.5, 0.5, 1.0], atol=1e-6)


def test_most_unique_gets_max_weight():
    # The most divergent sequence (indel-bearing) weighs exactly 1.0
    # (ref test.py:49-67).
    for name in ("t2", "t3"):
        aln = _encode(ALL_FASTAS[name])
        w = np.asarray(henikoff_weights(jnp.asarray(aln)))
        assert w.max() == pytest.approx(1.0)


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_weights_match_oracle(seed):
    rng = np.random.default_rng(seed)
    aln = random_alignment(rng, n_seqs=23, n_sites=31)
    # Guard against all-ambiguous columns (oracle divides by zero there,
    # mirroring the reference's NaN behaviour) — masked inputs in practice.
    aln[0] = np.where((aln < 5).sum(axis=0) == 0, 0, aln[0])
    w_o = oracle_henikoff(aln)
    w = np.asarray(henikoff_weights(jnp.asarray(aln)))
    np.testing.assert_allclose(w, w_o, rtol=2e-5, atol=2e-6)


def test_paper_variant_divergence_demo():
    # SURVEY.md A.9: on the full example.fasta the Python and Rust formulas
    # genuinely diverge — the ambiguous-base sequence flips from lowest to
    # highest weight.  Our paper-variant reproduces the Rust column.
    from weightedld_tpu.core.henikoff import henikoff_weights_paper

    aln = _encode(ALL_FASTAS["example"])
    py = np.asarray(henikoff_weights(jnp.asarray(aln)))
    paper = np.asarray(henikoff_weights_paper(jnp.asarray(aln)))
    np.testing.assert_allclose(
        py, [1.0, 0.4758, 0.4758, 0.4758, 0.9597,
             0.3548, 0.3548, 0.3548, 0.3548, 0.3548], atol=2e-4)
    np.testing.assert_allclose(
        paper, [0.633, 0.3119, 0.3119, 0.3119, 0.4954,
                0.2661, 0.2661, 0.2661, 0.2661, 1.0], atol=2e-4)


def test_chunked_large_path_matches():
    from weightedld_tpu.core.henikoff import henikoff_weights_large

    rng = np.random.default_rng(9)
    aln = random_alignment(rng, 50, 300)
    aln[0] = np.where((aln < 5).sum(axis=0) == 0, 0, aln[0])
    ref = np.asarray(henikoff_weights(jnp.asarray(aln)))
    got = np.asarray(henikoff_weights_large(aln, site_chunk=64))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-6)


def test_ambiguous_mean_imputation():
    # A code-5 cell receives the site-mean contribution over concrete alleles
    # (WeightedLD.py:141-145).
    aln = _encode(["AC", "Ay", "TC"])
    w = np.asarray(henikoff_weights(jnp.asarray(aln)))
    w_o = oracle_henikoff(aln)
    np.testing.assert_allclose(w, w_o, rtol=1e-5)
