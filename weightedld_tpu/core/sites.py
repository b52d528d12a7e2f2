"""Variable-site masking (vectorized XLA ops).

Parity contract — reference ``WeightedLD.py:44-98`` (``compute_variable_sites``):

* ``concrete_fraction`` counts codes < 4 only (gaps do NOT count as coverage).
* ``sufficient_data``  = ``concrete_fraction > min_acgt``  (strict ``>``).
* Symbol histogram runs over codes 0..4 (gap DOES count as an allele).
* ``minor`` = sum of all non-major allele counts (NOT just the dominant
  minor — that is the Rust variant, ``lib.rs:324-328``; see ``max_minor``).
* ``has_min_variability`` = ``minor_fraction >= min_variability`` (``>=``).
* Returns ``(hk_mask, ld_mask)`` = ``(sufficient_data,
  sufficient_data & has_min_variability)``.

``max_minor`` reproduces the Rust-only flag (``main.rs:37-42``,
``lib.rs:331``): when set below 1.0 it additionally requires the *dominant*
minor fraction ``<= max_minor``.  Default ``1.0`` is a no-op, matching
Python semantics.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .encode import N_ALLELES, N_CONCRETE


def site_histogram(alignment: jnp.ndarray) -> jnp.ndarray:
    """Per-site allele counts over codes 0..4.

    One reduction per code rather than a single [N, S, 5] one-hot so peak
    intermediate memory stays O(N*S) even for pod-scale alignments.

    Args:
        alignment: ``[n_seqs, n_sites]`` int8 code matrix.
    Returns:
        ``[n_sites, 5]`` int32 counts.
    """
    cols = [
        (alignment == alignment.dtype.type(s)).sum(axis=0, dtype=jnp.int32)
        for s in range(N_ALLELES)
    ]
    return jnp.stack(cols, axis=1)


@partial(jax.jit, static_argnames=("max_minor",))
def compute_variable_sites(
    alignment: jnp.ndarray,
    min_acgt: float,
    min_variability: float,
    max_minor: float = 1.0,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Return ``(hk_mask, ld_mask)`` boolean site masks.

    See module docstring for the exact parity semantics.
    """
    n_seqs = alignment.shape[0]
    counts = site_histogram(alignment)                       # [S, 5]

    # Coverage from the histogram (codes 0..3) — no extra O(N*S) scan.
    concrete = counts[:, :N_CONCRETE].sum(axis=1)            # [S]
    sufficient_data = concrete / n_seqs > min_acgt

    major = counts.max(axis=1)
    total = counts.sum(axis=1)
    minor = total - major
    has_variation = minor > 0
    minor_fraction = jnp.where(
        has_variation, minor / jnp.maximum(major + minor, 1), 0.0
    )
    has_min_variability = minor_fraction >= min_variability

    ld_mask = sufficient_data & has_min_variability

    if max_minor < 1.0:
        # Rust-style dominant-minor upper bound (lib.rs:324-331).
        sorted_counts = jnp.sort(counts, axis=1)
        dom_minor = sorted_counts[:, -2]
        dom_frac = jnp.where(
            has_variation, dom_minor / jnp.maximum(major + dom_minor, 1), 0.0
        )
        ld_mask = ld_mask & (dom_frac <= max_minor)

    return sufficient_data, ld_mask


def site_histogram_host(alignment) -> "np.ndarray":
    """``[S, N_ALLELES]`` per-site allele counts over codes 0..4 — the
    numpy twin of :func:`site_histogram`, shared by the host f64 mask path
    and analyses needing per-site stats (prune's MAF)."""
    import numpy as np

    alignment = np.asarray(alignment)
    return np.stack(
        [(alignment == s).sum(axis=0) for s in range(N_ALLELES)], axis=1
    )


def site_histogram_host_site_major(codes_sm, n_sites: int, n_seqs: int,
                                   row_chunk: int = 4096) -> "np.ndarray":
    """``[n_sites, N_ALLELES]`` per-site allele counts from a SITE-MAJOR
    (possibly padded) buffer — the streaming-ingest twin of
    :func:`site_histogram_host`, chunked over site rows so peak temporaries
    stay bounded for chromosome-scale matrices."""
    import numpy as np

    counts = np.zeros((n_sites, N_ALLELES), dtype=np.int64)
    for lo in range(0, n_sites, row_chunk):
        hi = min(lo + row_chunk, n_sites)
        blk = codes_sm[lo:hi, :n_seqs]
        for c in range(N_ALLELES):
            counts[lo:hi, c] = (blk == c).sum(axis=1)
    return counts


def site_fractions_host(counts, n_seqs: int):
    """Per-site fractions (float64) from ``[S, 5]`` allele counts: the
    quantities the reference's masks are judged on (``WeightedLD.py:68,
    79-87``).  Returns ``(coverage, major, total, minor_fraction)`` —
    concrete-ACGT fraction, major count, 0..4 total, all-minor fraction
    (0.0 at invariant sites).  Shared by the mask path and the
    ``site_stats`` diagnostic report so the math cannot drift."""
    import numpy as np

    coverage = counts[:, :N_CONCRETE].sum(axis=1) / n_seqs
    major = counts.max(axis=1)
    total = counts.sum(axis=1)
    minor = total - major
    minor_fraction = np.zeros(counts.shape[0], dtype=np.float64)
    nz = minor > 0
    minor_fraction[nz] = minor[nz] / total[nz]   # major + minor == total
    return coverage, major, total, minor_fraction


def compute_variable_sites_host(
    alignment,
    min_acgt: float,
    min_variability: float,
    max_minor: float = 1.0,
    counts=None,
):
    """Float64 host (NumPy) twin of :func:`compute_variable_sites`.

    Bit-exact with the reference at threshold boundaries: the jitted f32
    version can flip sites whose coverage/variability fraction lands
    EXACTLY on the threshold (XLA strength-reduces the division to a
    reciprocal multiply, e.g. 36/40 = 0.9 > 0.9 evaluates True in f32 but
    False in the reference's f64).  The ingest pipeline uses this version;
    the jnp one serves on-device pipelines where the input never visits
    the host.
    """
    import numpy as np

    alignment = np.asarray(alignment)
    n_seqs = alignment.shape[0]
    if counts is None:  # callers with a histogram in hand pass it in
        counts = site_histogram_host(alignment)
    return compute_variable_sites_from_counts(
        counts, n_seqs, min_acgt, min_variability, max_minor)


def compute_variable_sites_from_counts(
    counts,
    n_seqs: int,
    min_acgt: float,
    min_variability: float,
    max_minor: float = 1.0,
):
    """:func:`compute_variable_sites_host` from a precomputed ``[S, 5]``
    histogram alone — the streaming-FASTA ingest's mask stage, where the
    ``[N, S]`` matrix is never materialized (only per-site counts are)."""
    import numpy as np

    counts = np.asarray(counts)
    coverage, major, total, minor_fraction = site_fractions_host(
        counts, n_seqs)
    sufficient_data = coverage > min_acgt
    has_min_variability = minor_fraction >= min_variability

    ld_mask = sufficient_data & has_min_variability
    if max_minor < 1.0:
        nz = total - major > 0
        sorted_counts = np.sort(counts, axis=1)
        dom = sorted_counts[:, -2]
        dom_frac = np.zeros(counts.shape[0], dtype=np.float64)
        dom_frac[nz] = dom[nz] / np.maximum(major[nz] + dom[nz], 1)
        ld_mask = ld_mask & (dom_frac <= max_minor)
    return sufficient_data, ld_mask


@partial(jax.jit, static_argnames=())
def compute_variable_sites_rust(
    alignment: jnp.ndarray,
    min_acgt: float,
    min_variability: float,
    max_minor: float = 0.5,
) -> jnp.ndarray:
    """The reference *Rust* site filter as a single combined mask
    (``is_site_of_interest``, ``lib.rs:310-338`` + ``main.rs:139``):

    * coverage: ``acgt_count > ceil(min_acgt * n_seqs)`` (count, not
      fraction — off-by-one vs Python on non-multiples, SURVEY.md §2.4.4);
    * variability on the DOMINANT minor only:
      ``min_variability <= min_cnt/(min_cnt+maj_cnt) <= max_minor``.

    Offered as an alternative; the default pipeline uses Python semantics.
    """
    n_seqs = alignment.shape[0]
    counts = site_histogram(alignment)                       # [S, 5]

    acgt = counts[:, :N_CONCRETE].sum(axis=1)
    min_count = jnp.ceil(min_acgt * n_seqs).astype(jnp.int32)
    covered = acgt > min_count

    order = jnp.sort(counts, axis=1)
    maj = order[:, -1]
    dom = order[:, -2]
    frac = jnp.where(dom > 0, dom / jnp.maximum(maj + dom, 1), 0.0)
    return covered & (frac >= min_variability) & (frac <= max_minor)
