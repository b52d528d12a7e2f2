"""Multi-sample VCF ingestion.

Reimplements the observable semantics of the reference's VCF path
(``WeightedLD.py:311-379``) with a sane column-wise parser instead of
whole-line regex munging.  Semantics preserved:

* Header: first line containing ``#CHROM``; everything after it is data.
* Requires a multi-sample file (> 12 tab columns on the first data line).
* Phased diploid genotypes ``a|b`` split into two haploid rows.
* Unphased genotypes ``a/b`` become missing (the reference rewrites any
  ``x/y`` to ``.|.``, ``WeightedLD.py:355``).
* ``.`` alleles become code 4 (missing) — half-calls like ``.|1`` keep the
  known allele (``WeightedLD.py:358``).
* ``site_map`` is the POS column as int64 (``WeightedLD.py:369``) — parsed
  separately, which fixes the reference's uint8 overflow crash on
  numpy >= 1.24 (``WeightedLD.py:372``).
* Row order: the reference's ``np.rot90`` (``WeightedLD.py:375``) reverses
  haplotype order relative to sample order; we reproduce that so per-sequence
  weight vectors match element-wise.
* Allele codes are REF=0, ALT1=1, ALT2=2, ... in the same code space as
  FASTA; note the reference's collision of ALT4 with the missing code 4 and
  ALT5+ with the ambiguous code 5 is inherited by design (parity).
* No site masking is applied on the VCF path (``WeightedLD.py:385-388``).

Extensions beyond the reference: genotype fields may carry ``:``-separated
FORMAT subfields (only the leading GT is read), haploid calls ``a`` are
accepted as a single haplotype, fully-missing diploid calls ``.|.``
decode as two missing haplotypes — the reference's strip regex
(``WeightedLD.py:352``) deletes such fields outright and crashes on the
empty token — and INFO/annotation fields containing ``digit|digit``
(e.g. ``AF=1|2``) parse correctly, where the reference's pipe-cleanup
misses them, shifts its column indexing, and crashes (both verified by
executing it: ``tests/test_reference_execution_parity.py``).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from ..core.encode import ALIGNMENT_DTYPE, GAP


class VcfError(ValueError):
    pass


def _parse_allele(tok: str) -> int:
    if tok == "." or tok == "":
        return GAP
    try:
        v = int(tok)
    except ValueError as e:
        raise VcfError(f"bad allele {tok!r}") from e
    if v > 5 or v < 0:
        # The 6-code alphabet is 0..5; larger ALT indices would alias
        # arbitrary codes and silently corrupt weighting/LD (the reference
        # crashes here), and negative indices would flow through as
        # out-of-alphabet int8 codes.  Fail fast instead.
        raise VcfError(
            f"allele index {v} exceeds the supported alphabet (ALT1..ALT3 "
            "map to codes 1..3; ALT4/ALT5 alias the missing/ambiguous codes "
            "4/5 for reference parity; ALT6+ is unsupported)"
        )
    return v


def _fast_parse_gt_block(block: str) -> np.ndarray | None:
    """Vectorized decode of a line's genotype region for the common
    fixed-width case: every field is exactly ``x?y`` with single-character
    alleles (``x|y``, ``x/y``, ``.|.``, ...), tab separated.

    Returns the decoded int8 haplotype row, or None to fall back to the
    general per-field parser (multi-digit alleles, FORMAT subfields,
    haploid calls).  ~100x faster than per-field Python on 1000-Genomes
    scale lines (2,504 samples).
    """
    m = len(block) + 1
    if m % 4 != 0:
        return None
    arr = np.frombuffer(block.encode("ascii", "replace"), dtype=np.uint8)
    a1, sep, a2 = arr[0::4], arr[1::4], arr[2::4]
    tabs = arr[3::4]
    if tabs.size and not (tabs == ord("\t")).all():
        return None
    phased = sep == ord("|")
    unphased = sep == ord("/")
    if not (phased | unphased).all():
        return None
    dot = ord(".")
    # Single digits 0..5 only: larger allele indices fall back to the
    # general parser, which rejects them with a clear error.
    ok1 = (a1 == dot) | ((a1 >= ord("0")) & (a1 <= ord("5")))
    ok2 = (a2 == dot) | ((a2 >= ord("0")) & (a2 <= ord("5")))
    if not (ok1.all() and ok2.all()):
        return None
    v1 = np.where(a1 == dot, GAP, a1 - ord("0"))
    v2 = np.where(a2 == dot, GAP, a2 - ord("0"))
    # Unphased -> both haplotypes missing (WeightedLD.py:355).
    v1 = np.where(unphased, GAP, v1)
    v2 = np.where(unphased, GAP, v2)
    row = np.empty(2 * len(v1), dtype=ALIGNMENT_DTYPE)
    row[0::2] = v1
    row[1::2] = v2
    return row


def read_vcf(path: str | Path,
             chrom: str | None = None) -> tuple[np.ndarray, np.ndarray]:
    """Read a multi-sample VCF into ``(alignment, site_map)``.

    Args:
        chrom: keep only records whose CHROM column equals this value
            (the reference ignores CHROM entirely, so whole-genome VCFs
            mix chromosomes into one POS axis; per-chromosome analyses —
            ld_decay, prune — need this filter).  The filtered path uses
            the Python reader.

    Returns:
        alignment: ``[n_haplotypes, n_sites]`` int8 code matrix.
        site_map: ``[n_sites]`` int64 POS values.

    Dispatches to the native mmap/OpenMP parser (``native/wldio.cpp``) when
    built — same semantics and error messages; ``WLD_NATIVE_IO=0`` forces
    the Python path (the parity oracle in tests/test_native_io.py).
    """
    if chrom is not None:
        return read_vcf_python(path, chrom=chrom)
    from . import native

    if native.available():
        return native.read_vcf_native(path)
    return read_vcf_python(path)


def _variant_lines(path: str | Path) -> tuple[int, list[str]]:
    """Shared ingest front half: decode (universal newlines, like the
    reference's text-mode read), locate the ``#CHROM`` header, apply the
    reference's trailing-line drop, and strip blank lines.  Returns
    ``(header_idx, data_lines)`` — the header's 0-based line index feeds
    the 1-based line numbers in parse errors.

    Parity quirk (WeightedLD.py:365): the reference unconditionally deletes
    the final line, assuming a trailing blank.  On files without a trailing
    newline this silently drops the last record (verified on the t7
    fixture: 6 records on disk, 5 parsed).  Reproduced as-is.
    """
    from .fasta import _open_maybe_gzip

    with _open_maybe_gzip(path) as fh:
        text = fh.read().decode("utf-8", "replace")
    # The whole decompressed text is materialized (reference parity needs
    # the trailing-line quirk over the full split); for repeated
    # whole-genome --chrom work, prefer pre-splitting per chromosome or
    # --save-prepared per chromosome.
    lines = text.replace("\r\n", "\n").replace("\r", "\n").split("\n")
    del text

    header_idx = None
    for i, line in enumerate(lines):
        if "#CHROM" in line:
            header_idx = i
            break
    if header_idx is None:
        raise VcfError(f"{path}: no #CHROM header line found")

    data_lines = lines[header_idx + 1 :]
    if data_lines:
        del data_lines[-1]
    data_lines = [ln for ln in data_lines if ln.strip()]
    if not data_lines:
        raise VcfError(f"{path}: no variant records")
    return header_idx, data_lines


def list_chromosomes(path: str | Path) -> list[str]:
    """Distinct CHROM values of the variant records, in first-appearance
    order — the valid arguments for ``read_vcf(chrom=...)`` / ``--chrom``.

    Applies the same parsing quirks as :func:`read_vcf` (trailing-line
    drop), so every listed chromosome is guaranteed to yield records under
    the filter.  Only the CHROM column is inspected; this is the cheap way
    to drive a per-chromosome analysis loop over a whole-genome VCF
    (capability beyond the reference, which has no CHROM handling at all,
    ``WeightedLD.py:361-362``)."""
    seen: set[str] = set()
    out: list[str] = []
    for ln in _variant_lines(path)[1]:
        c = ln.split("\t", 1)[0]
        if c not in seen:
            seen.add(c)
            out.append(c)
    return out


def read_vcf_python(path: str | Path,
                    chrom: str | None = None) -> tuple[np.ndarray, np.ndarray]:
    """Pure-Python fallback/oracle for :func:`read_vcf`."""
    header_idx, data_lines = _variant_lines(path)
    if len(data_lines[0].split("\t")) <= 12:
        raise VcfError(
            f"{path}: too few sample columns — is this a multi-sample VCF?"
        )

    positions: list[int] = []
    site_rows: list[np.ndarray] = []
    n_haps = None

    def check_width(row, lineno):
        nonlocal n_haps
        if n_haps is None:
            n_haps = len(row)
        elif len(row) != n_haps:
            raise VcfError(
                f"{path}:{lineno}: inconsistent haplotype count "
                f"({len(row)} vs {n_haps})"
            )

    for lineno, line in enumerate(data_lines, header_idx + 2):
        cols = line.split("\t", 9)
        if len(cols) < 10:
            raise VcfError(f"{path}:{lineno}: fewer than 10 columns")
        if chrom is not None and cols[0] != chrom:
            continue
        positions.append(int(cols[1]))

        fast = _fast_parse_gt_block(cols[9])
        if fast is not None:
            check_width(fast, lineno)
            site_rows.append(fast)
            continue

        haps: list[int] = []
        for field in cols[9].split("\t"):
            gt = field.split(":", 1)[0]
            if "|" in gt:
                a, b = gt.split("|", 1)
                haps.append(_parse_allele(a))
                haps.append(_parse_allele(b))
            elif "/" in gt:
                # Unphased: haplotype unknown -> both missing (WeightedLD.py:355)
                haps.append(GAP)
                haps.append(GAP)
            else:
                haps.append(_parse_allele(gt))

        row = np.asarray(haps, dtype=np.int16)
        check_width(row, lineno)
        site_rows.append(row.astype(ALIGNMENT_DTYPE))

    if not positions:
        raise VcfError(f"{path}: no variant records on chromosome {chrom!r}")
    site_map = np.asarray(positions, dtype=np.int64)
    mat = np.stack(site_rows, axis=0)                 # [n_sites, n_haps]
    # rot90 parity: haplotype rows in reverse order (WeightedLD.py:375).
    alignment = np.ascontiguousarray(mat.T[::-1])
    return alignment, site_map
