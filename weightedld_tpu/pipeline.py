"""End-to-end pipeline glue: ingest -> mask -> weight -> LD.

Mirrors the reference driver (``WeightedLD.py:287-308,382-402``):

* FASTA path: compute both masks, trim the alignment to the **LD** mask, and
  compute Henikoff weights on the LD-trimmed alignment (the HK mask is
  computed but unused by the reference CLI — ``WeightedLD.py:303,397``).
  ``weight_mask="hk"`` selects the reference *test-suite* convention instead
  (weights on the HK-masked alignment, ``test.py:43-44``).
* VCF path: no site masking, weights on the full haplotype matrix
  (``WeightedLD.py:385-388``).
* ``--unweighted`` uses unit weights (``WeightedLD.py:391-394``).
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from .core.henikoff import (
    henikoff_weights_host,
    henikoff_weights_large,
    henikoff_weights_paper,
)
from .core.ld_dense import LdRecords, extract_records, ld_all_pairs_dense
from .core.sites import compute_variable_sites_host
from .io.fasta import read_fasta
from .io.vcf import read_vcf

# Above this many cells, weighting runs in site chunks (bounded memory).
_LARGE_CELLS = 200_000_000


def _weights_for(alignment_np: np.ndarray, variant: str = "python") -> np.ndarray:
    # Pod-scale inputs take the site-chunked paths FIRST (bounded device
    # memory) — for both formula variants; a full-matrix f64/jit pass on a
    # 1e9-cell alignment would materialize several [N, S] temporaries.
    if alignment_np.size > _LARGE_CELLS:
        return np.asarray(henikoff_weights_large(alignment_np,
                                                 variant=variant))
    if variant == "paper":
        return np.asarray(henikoff_weights_paper(jnp.asarray(alignment_np)))
    # Ingest default: the f64 host twin — weights bit-equal to the executed
    # reference (WeightedLD.py:101-151), making the weights TSV parity
    # unconditional.  The device/serving paths stay f32 (LdSession's
    # weights=None on-device variant, the chunked pod path above).
    return henikoff_weights_host(alignment_np)


@dataclass
class WldConfig:
    """Union of the reference Python and Rust flag sets (SURVEY.md §5)."""

    min_acgt: float = 0.8          # WeightedLD.py:409
    min_variability: float = 0.02  # WeightedLD.py:412
    unweighted: bool = False       # WeightedLD.py:414
    max_minor: float = 1.0         # Rust-only, main.rs:37-42 (1.0 = off)
    r2_threshold: float | None = None  # Rust-only, main.rs:45-49 (None = all)
    weight_mask: str = "ld"        # "ld" (CLI parity) or "hk" (test.py parity)
    weighting: str = "python"      # "python" (WeightedLD.py) or "paper"
                                   # (Henikoff-1994 / Rust variant)
    chrom: str | None = None       # VCF only: keep one chromosome's records
                                   # (the reference ignores CHROM, mixing
                                   # whole-genome POS into one axis)
    fasta_reader: str = "python"   # "python" (BioPython semantics: wrapped
                                   # records concatenated, WeightedLD.py:34)
                                   # or "rust" (the Rust binary's line-based
                                   # reader, io/fasta.py:read_fasta_rust)
    region: str | None = None      # VCF only: "CHR" or "CHR:START-END"
                                   # (1-based inclusive POS window,
                                   # io.vcf.parse_region); exclusive with
                                   # `chrom`
    keep_samples: tuple[str, ...] | None = None     # restrict the analysis
                                   # to these sequence/sample names (FASTA
                                   # record names; VCF #CHROM header sample
                                   # columns — both haplotypes of a kept
                                   # sample are kept)
    exclude_samples: tuple[str, ...] | None = None  # drop these names
                                   # (applied after keep_samples)


def _sample_row_mask(row_names: list[str],
                     keep: tuple[str, ...] | None,
                     exclude: tuple[str, ...] | None) -> np.ndarray:
    """Boolean row mask from keep/exclude name sets, with typo safety:
    every named sample must exist in the input (plink-style subsetting is
    silent on unknown names, which hides misspellings; this is not).
    ``keep`` restricts, then ``exclude`` drops; row ORDER is preserved.
    Capability beyond the reference (which has no sample handling)."""
    known = set(row_names)
    for group, flag in ((keep, "keep_samples"), (exclude, "exclude_samples")):
        unknown = sorted(set(group or ()) - known)
        if unknown:
            raise ValueError(
                f"{flag}: unknown sample name(s): {', '.join(unknown)}")
    mask = np.ones(len(row_names), dtype=bool)
    if keep is not None:
        ks = set(keep)
        mask &= np.fromiter((n in ks for n in row_names), dtype=bool,
                            count=len(row_names))
    if exclude is not None:
        es = set(exclude)
        mask &= np.fromiter((n not in es for n in row_names), dtype=bool,
                            count=len(row_names))
    if int(mask.sum()) < 2:
        raise ValueError(
            "fewer than 2 sequences remain after sample subsetting")
    return mask


def _vcf_row_names(path: str | Path, n_haps: int) -> list[str]:
    """Per-ROW sample names for a VCF alignment: row ``k`` belongs to
    sample ``(n_haps-1-k) // 2`` under the reference's rot90 row order
    (``WeightedLD.py:375``; diploid phased split ``WeightedLD.py:356``).
    Haploid files (one haplotype per sample) map row ``k`` to sample
    ``n_haps-1-k``.  Mixed ploidy has no consistent row->sample mapping
    and is rejected."""
    from .io.vcf import vcf_sample_names

    names = vcf_sample_names(path)
    if n_haps == 2 * len(names):
        return [names[(n_haps - 1 - k) // 2] for k in range(n_haps)]
    if n_haps == len(names):
        return [names[n_haps - 1 - k] for k in range(n_haps)]
    raise ValueError(
        f"cannot map {n_haps} haplotype rows to {len(names)} header "
        "samples (mixed ploidy?); sample subsetting needs uniformly "
        "diploid or uniformly haploid records"
    )


def _wants_subset(cfg: WldConfig) -> bool:
    return cfg.keep_samples is not None or cfg.exclude_samples is not None


def _subset_vcf_rows(path: str | Path, alignment: np.ndarray,
                     cfg: WldConfig) -> np.ndarray:
    """Apply cfg's sample subsetting to a VCF haplotype matrix (no-op when
    no subsetting is requested) — the single definition of the subsetting
    sequence so the prepare/cross/site_stats paths cannot drift."""
    if not _wants_subset(cfg):
        return alignment
    mask = _sample_row_mask(_vcf_row_names(path, alignment.shape[0]),
                            cfg.keep_samples, cfg.exclude_samples)
    return alignment[mask]


def _read_fasta_subset(path: str | Path, cfg: WldConfig) -> np.ndarray:
    """FASTA ingest honouring cfg.fasta_reader and cfg's sample subsetting
    (names are only materialized when subsetting asks for them)."""
    if cfg.fasta_reader == "rust":
        from .io.fasta import read_fasta_rust, read_fasta_rust_with_names

        if not _wants_subset(cfg):
            return read_fasta_rust(path)
        alignment, names = read_fasta_rust_with_names(path)
    elif cfg.fasta_reader == "python":
        from .io.fasta import read_fasta_with_names

        if not _wants_subset(cfg):
            return read_fasta(path)
        alignment, names = read_fasta_with_names(path)
    else:
        raise ValueError(
            f"fasta_reader must be 'python' or 'rust', got "
            f"{cfg.fasta_reader!r}"
        )
    return alignment[_sample_row_mask(names, cfg.keep_samples,
                                      cfg.exclude_samples)]


def _resolve_vcf_filters(cfg: WldConfig):
    """``(chrom, pos_range)`` from cfg.chrom / cfg.region (exclusive)."""
    if cfg.region is None:
        return cfg.chrom, None
    if cfg.chrom is not None:
        raise ValueError("chrom and region are mutually exclusive "
                         "(a region names its chromosome)")
    from .io.vcf import parse_region

    return parse_region(cfg.region)


@dataclass
class PipelineResult:
    alignment: np.ndarray          # LD-trimmed [N, S_kept] codes
    site_map: np.ndarray           # [S_kept] original site indices / positions
    weights: np.ndarray            # [N]
    hk_mask: np.ndarray | None = None
    ld_mask: np.ndarray | None = None
    records: LdRecords | None = None


def prepare_fasta(path: str | Path, cfg: WldConfig,
                  timer=None) -> PipelineResult:
    from .runtime.profiling import StageTimer

    timer = timer or StageTimer()
    if cfg.region is not None:
        raise ValueError("region only applies to VCF input (FASTA has no "
                         "chromosome/position columns)")
    with timer.stage("ingest"):
        alignment = _read_fasta_subset(path, cfg)
    with timer.stage("mask"):
        # Host f64 masks: bit-exact with the reference at threshold
        # boundaries (see compute_variable_sites_host).
        hk_mask, ld_mask = compute_variable_sites_host(
            alignment, cfg.min_acgt, cfg.min_variability, cfg.max_minor
        )

        trimmed = alignment[:, ld_mask]
        site_map = np.where(ld_mask)[0].astype(np.int64)

    with timer.stage("weights"):
        if cfg.unweighted:
            weights = np.ones(alignment.shape[0], dtype=np.float32)
        elif cfg.weight_mask == "hk":
            weights = _weights_for(alignment[:, hk_mask], cfg.weighting)
        else:
            weights = _weights_for(trimmed, cfg.weighting)

    return PipelineResult(
        alignment=trimmed,
        site_map=site_map,
        weights=weights,
        hk_mask=hk_mask,
        ld_mask=ld_mask,
    )


def prepare_vcf(path: str | Path, cfg: WldConfig,
                timer=None) -> PipelineResult:
    from .runtime.profiling import StageTimer

    timer = timer or StageTimer()
    chrom, pos_range = _resolve_vcf_filters(cfg)
    with timer.stage("ingest"):
        alignment, site_map = read_vcf(path, chrom=chrom, pos_range=pos_range)
        alignment = _subset_vcf_rows(path, alignment, cfg)
    with timer.stage("weights"):
        if cfg.unweighted:
            weights = np.ones(alignment.shape[0], dtype=np.float32)
        else:
            weights = _weights_for(alignment, cfg.weighting)
    return PipelineResult(alignment=alignment, site_map=site_map, weights=weights)


def regions_overlap(spec_a: str, spec_b: str) -> bool:
    """Whether two ``CHR[:LO-HI]`` regions can share a site (same
    chromosome with intersecting — or unbounded — POS windows).  Used to
    refuse ``--cross-regions`` whose blocks would duplicate sites."""
    from .io.vcf import parse_region

    ca, ra = parse_region(spec_a)
    cb, rb = parse_region(spec_b)
    if ca != cb:
        return False
    if ra is None or rb is None:
        return True
    return ra[0] <= rb[1] and rb[0] <= ra[1]


def prepare_vcf_cross(path: str | Path, cfg: WldConfig,
                      spec_a: str, spec_b: str,
                      timer=None) -> tuple[PipelineResult, int]:
    """Inter-region preparation for a rectangular (cross-only) LD scan:
    ingest region A and region B of one VCF, lay the alignment out as
    A ++ B, and return ``(result, n_a)`` — ``n_a`` is the layout split for
    ``DriverConfig.cross_split`` (pairs with one endpoint in each block).

    Weights are Henikoff over the COMBINED A++B haplotype matrix (the
    analyzed site set, consistent with the VCF pipeline's no-masking
    semantics, ``WeightedLD.py:385-388``); sample subsetting applies to
    both blocks.  Overlapping regions are refused (duplicated sites would
    pair against their own copies).  Capability beyond the reference.
    """
    from .io.vcf import parse_region
    from .runtime.profiling import StageTimer

    timer = timer or StageTimer()
    if cfg.chrom is not None or cfg.region is not None:
        raise ValueError("cross-regions is exclusive with chrom/region "
                         "(it names its own two regions)")
    if regions_overlap(spec_a, spec_b):
        raise ValueError(
            f"cross regions {spec_a!r} and {spec_b!r} overlap — their "
            "sites would pair against their own copies; pick disjoint "
            "POS windows (or different chromosomes)")
    ca, ra = parse_region(spec_a)
    cb, rb = parse_region(spec_b)
    with timer.stage("ingest"):
        # One full read per region (read_vcf reuse); a single-pass
        # two-block classifier would halve chromosome-scale ingest but
        # needs a dedicated reader mode — acceptable tradeoff while cross
        # runs target locus-sized regions.
        aln_a, sm_a = read_vcf(path, chrom=ca, pos_range=ra)
        aln_b, sm_b = read_vcf(path, chrom=cb, pos_range=rb)
        if aln_a.shape[0] != aln_b.shape[0]:
            raise ValueError(
                f"regions decode different haplotype counts "
                f"({aln_a.shape[0]} vs {aln_b.shape[0]}) — mixed-ploidy "
                "records?")
        if _wants_subset(cfg):
            mask = _sample_row_mask(_vcf_row_names(path, aln_a.shape[0]),
                                    cfg.keep_samples, cfg.exclude_samples)
            aln_a, aln_b = aln_a[mask], aln_b[mask]
        alignment = np.concatenate([aln_a, aln_b], axis=1)
        site_map = np.concatenate([sm_a, sm_b])
    with timer.stage("weights"):
        if cfg.unweighted:
            weights = np.ones(alignment.shape[0], dtype=np.float32)
        else:
            weights = _weights_for(alignment, cfg.weighting)
    return PipelineResult(alignment=alignment, site_map=site_map,
                          weights=weights), int(aln_a.shape[1])


def prepare(path: str | Path, cfg: WldConfig | None = None,
            timer=None) -> PipelineResult:
    """Dispatch on file suffix like the reference driver (``WeightedLD.py:385``).

    ``timer`` (a :class:`runtime.profiling.StageTimer`) collects per-stage
    wall-clock spans — ingest / mask / weights — the analog of the Rust
    binary's ``Instant`` spans (``main.rs:128-210``)."""
    cfg = cfg or WldConfig()
    if str(path).endswith((".vcf", ".vcf.gz")):
        return prepare_vcf(path, cfg, timer=timer)
    return prepare_fasta(path, cfg, timer=timer)


def run(path: str | Path, cfg: WldConfig | None = None) -> PipelineResult:
    """Full pipeline with the dense engine; fills ``result.records``."""
    cfg = cfg or WldConfig()
    res = prepare(path, cfg)
    stats = ld_all_pairs_dense(jnp.asarray(res.alignment), jnp.asarray(res.weights))
    res.records = extract_records(stats, res.site_map, cfg.r2_threshold)
    return res


def site_stats(path: str | Path, cfg: WldConfig | None = None) -> dict:
    """Per-site diagnostic report over ALL input sites, before any mask —
    explains why each site was kept or dropped (capability beyond the
    reference, whose masking is silent, ``WeightedLD.py:44-98``).

    Returns a dict of equal-length arrays:

    - ``site``: original column index (FASTA) or POS (VCF; ``cfg.chrom``
      respected).
    - ``coverage``: concrete A/C/G/T fraction (gap excluded,
      ``WeightedLD.py:68``).
    - ``major_code``: most frequent code over 0..4, smallest code on ties
      — the deterministic rule this framework uses everywhere (= the Rust
      reference, ``lib.rs:126-140``, and the Python comment's stated
      intent; the Python reference's own tie ORDER is unspecified —
      unstable ``np.argsort``, see ``core/paircore.py``).
    - ``minor_fraction``: all-minor fraction over codes 0..4
      (``WeightedLD.py:79-87``); 0.0 at invariant sites.
    - ``hk`` / ``ld``: the mask verdicts at ``cfg`` thresholds
      (``compute_variable_sites_host``).  For VCF input these are
      INFORMATIONAL ONLY — the reference applies no masking on that path
      (``WeightedLD.py:385-388``) and neither does this pipeline.
    """
    import numpy as np

    from .core.sites import site_fractions_host, site_histogram_host

    cfg = cfg or WldConfig()
    if str(path).endswith((".vcf", ".vcf.gz")):
        chrom, pos_range = _resolve_vcf_filters(cfg)
        alignment, site_map = read_vcf(path, chrom=chrom,
                                       pos_range=pos_range)
        alignment = _subset_vcf_rows(path, alignment, cfg)
    else:
        if cfg.region is not None:
            raise ValueError("region only applies to VCF input (FASTA has "
                             "no chromosome/position columns)")
        alignment = _read_fasta_subset(path, cfg)
        site_map = np.arange(alignment.shape[1], dtype=np.int64)
    n_seqs = alignment.shape[0]
    counts = site_histogram_host(alignment)              # ONE [S, 5] scan
    coverage, _major, _total, minor_fraction = site_fractions_host(
        counts, n_seqs)
    major_code = counts.argmax(axis=1)                   # argmax: ties -> low
    hk, ld = compute_variable_sites_host(
        alignment, cfg.min_acgt, cfg.min_variability, cfg.max_minor,
        counts=counts,
    )
    return {
        "site": np.asarray(site_map),
        "coverage": coverage,
        "major_code": major_code.astype(np.int64),
        "minor_fraction": minor_fraction,
        "hk": hk,
        "ld": ld,
    }
