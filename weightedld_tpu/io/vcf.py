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

from ..core.encode import ALIGNMENT_DTYPE, GAP, UNKNOWN


class VcfError(ValueError):
    pass


def parse_region(spec: str) -> tuple[str, tuple[int, int] | None]:
    """Parse a samtools/tabix-style region ``CHR`` or ``CHR:START-END`` into
    ``(chrom, pos_range)`` — ``pos_range`` is a 1-based INCLUSIVE ``(lo, hi)``
    over the POS column, or None for a whole-chromosome region.

    Capability beyond the reference (which has no region handling at all,
    ``WeightedLD.py:311-379``); the filter semantics match ``--chrom`` plus a
    POS window, so ``CHR`` alone is exactly ``--chrom CHR``.  A range needs
    a ``-`` in the tail — samtools' open ends (``CHR:START-`` = to the end,
    ``CHR:-END`` = from the start) and digit-grouping commas
    (``chr1:44,890,000-44,890,200``) are accepted; any other trailing
    ``:...`` is part of the chromosome name (``HLA-A*01:01`` is a name,
    not a range; samtools disambiguates against its reference index, which
    a VCF filter does not have) — the LAST ``:`` splits.
    """
    chrom, sep, rng = spec.rpartition(":")
    if not sep:
        return spec, None
    lo_s, dash, hi_s = rng.partition("-")
    try:
        if not dash:
            raise ValueError
        lo_s = lo_s.replace(",", "")
        hi_s = hi_s.replace(",", "")
        lo = int(lo_s) if lo_s else 0
        hi = int(hi_s) if hi_s else (1 << 62)
    except ValueError:
        # No numeric START-END tail: the whole spec is a chromosome name.
        return spec, None
    if not chrom:
        raise VcfError(f"bad region {spec!r}: empty chromosome name")
    if lo < 0 or hi < lo:
        raise VcfError(f"bad region {spec!r}: need 0 <= START <= END")
    return chrom, (lo, hi)


def vcf_sample_names(path: str | Path) -> list[str]:
    """Sample names from the ``#CHROM`` header line (columns 10+), in file
    order — the valid arguments for sample subsetting (``--keep-samples`` /
    ``--exclude-samples``).  Streaming; only the header is read.

    Haplotype mapping: sample ``i`` owns file-order haplotypes ``2i`` and
    ``2i+1`` (phased diploid split, ``WeightedLD.py:356``); the alignment's
    ROW order is the reference's ``np.rot90`` reversal (``WeightedLD.py:375``),
    so alignment row ``k`` belongs to sample ``(n_haps-1-k) // 2``.

    Header detection is the substring test ``"#CHROM" in line`` — the same
    framing the readers inherit from the reference (``WeightedLD.py:320``),
    so the names always align with the records; a meta line that MENTIONS
    ``#CHROM`` in free text would confuse both equally (reference parity).
    """
    import io as _io

    from .fasta import _open_maybe_gzip

    with _open_maybe_gzip(path) as raw:
        fh = _io.TextIOWrapper(raw, encoding="utf-8", errors="replace",
                               newline=None)
        for line in fh:
            body = line.rstrip("\n")
            if "#CHROM" in body:
                cols = body.split("\t")
                if len(cols) < 10:
                    raise VcfError(
                        f"{path}: #CHROM header has no sample columns")
                return [c.strip() for c in cols[9:] if c.strip()]
    raise VcfError(f"{path}: no #CHROM header line found")


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
             chrom: str | None = None,
             pos_range: tuple[int, int] | None = None,
             ) -> tuple[np.ndarray, np.ndarray]:
    """Read a multi-sample VCF into ``(alignment, site_map)``.

    Args:
        chrom: keep only records whose CHROM column equals this value
            (the reference ignores CHROM entirely, so whole-genome VCFs
            mix chromosomes into one POS axis; per-chromosome analyses —
            ld_decay, prune — need this filter).  The filtered path uses
            the Python reader.
        pos_range: 1-based inclusive ``(lo, hi)`` POS window (the
            ``--region CHR:START-END`` filter; see :func:`parse_region`).

    Returns:
        alignment: ``[n_haplotypes, n_sites]`` int8 code matrix.
        site_map: ``[n_sites]`` int64 POS values.

    Dispatches to the native mmap/OpenMP parser (``native/wldio.cpp``) when
    built — same semantics and error messages; ``WLD_NATIVE_IO=0`` forces
    the Python path (the parity oracle in tests/test_native_io.py).
    """
    if chrom is not None or pos_range is not None:
        return read_vcf_python(path, chrom=chrom, pos_range=pos_range)
    from . import native

    if native.available():
        return native.read_vcf_native(path)
    return read_vcf_python(path)


def _iter_variant_lines(path: str | Path):
    """Streaming ingest front half: yield ``(lineno, line)`` for every
    variant record, decoding incrementally (chunked gzip inflate via the
    text wrapper — the whole file is NEVER materialized), locating the
    ``#CHROM`` header, applying the reference's trailing-line drop, and
    skipping blank lines.  ``lineno`` is 1-based for parse errors.

    Parity quirk (WeightedLD.py:365): the reference unconditionally deletes
    the final element of ``text.split("\\n")``.  When the file ends with a
    newline that element is the empty string (blank, dropped anyway); when
    it does not, the LAST RECORD is silently dropped (verified on the t7
    fixture: 6 records on disk, 5 parsed).  The streaming equivalent —
    reproduced as-is — is to hold each line until its successor arrives
    and, at EOF, emit the held line only if it was newline-terminated.
    Universal-newline decoding matches the reference's text-mode
    ``\\r\\n``/``\\r`` -> ``\\n`` handling.
    """
    import io as _io

    from .fasta import _open_maybe_gzip

    with _open_maybe_gzip(path) as raw:
        fh = _io.TextIOWrapper(raw, encoding="utf-8", errors="replace",
                               newline=None)
        in_data = False
        held = None            # (lineno, stripped_line, had_newline)
        lineno = 0
        for line in fh:
            lineno += 1
            had_nl = line.endswith("\n")
            body = line[:-1] if had_nl else line
            if not in_data:
                if "#CHROM" in body:
                    in_data = True
                continue
            if held is not None and held[1].strip():
                yield held[0], held[1]
            held = (lineno, body, had_nl)
        if not in_data:
            raise VcfError(f"{path}: no #CHROM header line found")
        # Trailing-line drop: the held (final) line survives only when the
        # file ended with a newline (it was followed by the split's empty
        # last element in the reference's framing).
        if held is not None and held[2] and held[1].strip():
            yield held[0], held[1]




def list_chromosomes(path: str | Path) -> list[str]:
    """Distinct CHROM values of the variant records, in first-appearance
    order — the valid arguments for ``read_vcf(chrom=...)`` / ``--chrom``.

    Applies the same parsing quirks as :func:`read_vcf` (trailing-line
    drop), so every listed chromosome is guaranteed to yield records under
    the filter.  Only the CHROM column is inspected, streaming (O(1)
    memory); this is the cheap way to drive a per-chromosome analysis
    loop over a whole-genome VCF (capability beyond the reference, which
    has no CHROM handling at all, ``WeightedLD.py:361-362``)."""
    seen: set[str] = set()
    out: list[str] = []
    for _lineno, ln in _iter_variant_lines(path):
        c = ln.split("\t", 1)[0]
        if c not in seen:
            seen.add(c)
            out.append(c)
    if not out:
        # Match the readers (and the pre-streaming behaviour): a header-only
        # file is an error, not an empty listing.
        raise VcfError(f"{path}: no variant records")
    return out


def site_annotations(
    path: str | Path,
    chrom: str | None = None,
    pos_range: tuple[int, int] | None = None,
) -> tuple[np.ndarray, list[str], list[str]]:
    """Streaming ``(positions, chroms, ids)`` over the SAME record set the
    readers keep (chrom/region filters, trailing-line quirk included):
    the VCF CHROM and ID columns per kept record, aligned with the
    readers' ``site_map`` — the identity source for PLINK-style pair
    output (``--out-format plink``).  O(records) memory; no genotypes
    are decoded."""
    positions: list[int] = []
    chroms: list[str] = []
    ids: list[str] = []
    first = True
    for lineno, line in _iter_variant_lines(path):
        if first:
            _check_multisample(path, line)
            first = False
        # Same column validation as _decode_record, so the annotation set
        # can never drift from the record set the readers keep.
        cols = line.split("\t", 9)
        if len(cols) < 10:
            raise VcfError(f"{path}:{lineno}: fewer than 10 columns")
        if chrom is not None and cols[0] != chrom:
            continue
        pos = int(cols[1])
        if pos_range is not None \
                and not (pos_range[0] <= pos <= pos_range[1]):
            continue
        positions.append(pos)
        chroms.append(cols[0])
        ids.append(cols[2] if cols[2] else ".")
    if first:
        raise VcfError(f"{path}: no variant records")
    if not positions:
        raise VcfError(_no_records_msg(path, chrom, pos_range))
    return np.asarray(positions, dtype=np.int64), chroms, ids


def site_annotations_multi(
    path: str | Path,
    filters: list[tuple[str | None, tuple[int, int] | None]],
) -> list[tuple[np.ndarray, list[str], list[str]]]:
    """:func:`site_annotations` for several (chrom, pos_range) filters in
    ONE streaming pass — the ``--cross-regions --out-format plink`` path,
    which would otherwise scan the file once per region.  Returns one
    ``(positions, chroms, ids)`` tuple per filter; a filter matching no
    records raises the same error the single-filter form does."""
    outs = [([], [], []) for _ in filters]
    first = True
    for lineno, line in _iter_variant_lines(path):
        if first:
            _check_multisample(path, line)
            first = False
        cols = line.split("\t", 9)
        if len(cols) < 10:
            raise VcfError(f"{path}:{lineno}: fewer than 10 columns")
        pos = int(cols[1])
        for (chrom, pos_range), (ps, cs, ids) in zip(filters, outs):
            if chrom is not None and cols[0] != chrom:
                continue
            if pos_range is not None \
                    and not (pos_range[0] <= pos <= pos_range[1]):
                continue
            ps.append(pos)
            cs.append(cols[0])
            ids.append(cols[2] if cols[2] else ".")
    if first:
        raise VcfError(f"{path}: no variant records")
    for (chrom, pos_range), (ps, _cs, _ids) in zip(filters, outs):
        if not ps:
            raise VcfError(_no_records_msg(path, chrom, pos_range))
    return [(np.asarray(ps, dtype=np.int64), cs, ids)
            for ps, cs, ids in outs]


def _decode_record(path, lineno, line, chrom, pos_range=None):
    """Parse one variant line -> ``(pos, row int8)`` or None (chrom/region
    filtered).  Shared by the row-list and streaming readers."""
    cols = line.split("\t", 9)
    if len(cols) < 10:
        raise VcfError(f"{path}:{lineno}: fewer than 10 columns")
    if chrom is not None and cols[0] != chrom:
        return None
    pos = int(cols[1])
    if pos_range is not None and not (pos_range[0] <= pos <= pos_range[1]):
        return None

    fast = _fast_parse_gt_block(cols[9])
    if fast is not None:
        return pos, fast

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
    return pos, np.asarray(haps, dtype=np.int16).astype(ALIGNMENT_DTYPE)


def _check_multisample(path, line):
    if len(line.split("\t")) <= 12:
        raise VcfError(
            f"{path}: too few sample columns — is this a multi-sample VCF?"
        )


def _no_records_msg(path, chrom, pos_range=None):
    where = f" on chromosome {chrom!r}" if chrom is not None else ""
    if pos_range is not None:
        where += f" in POS range {pos_range[0]}-{pos_range[1]}"
    return f"{path}: no variant records{where}"


def scan_vcf(path: str | Path,
             chrom: str | None = None,
             pos_range: tuple[int, int] | None = None,
             ) -> tuple[int, np.ndarray]:
    """Streaming pass 1 of the two-pass site-major ingest: ``(n_haplotypes,
    site_map)`` without materializing any genotypes (O(records) memory —
    the POS list only).  The first matching record is decoded once to
    learn the haplotype count; every record is re-validated in pass 2.
    ``pos_range`` is a 1-based inclusive POS window (see
    :func:`parse_region`)."""
    positions: list[int] = []
    n_haps = None
    first = True
    for lineno, line in _iter_variant_lines(path):
        if first:
            _check_multisample(path, line)
            first = False
        cols = line.split("\t", 2)
        if chrom is not None and cols[0] != chrom:
            continue
        if len(cols) < 3:
            raise VcfError(f"{path}:{lineno}: fewer than 10 columns")
        pos = int(cols[1])
        if pos_range is not None \
                and not (pos_range[0] <= pos <= pos_range[1]):
            continue
        positions.append(pos)
        if n_haps is None:
            rec = _decode_record(path, lineno, line, chrom, pos_range)
            n_haps = len(rec[1])
    if first:
        raise VcfError(f"{path}: no variant records")
    if not positions:
        raise VcfError(_no_records_msg(path, chrom, pos_range))
    return n_haps, np.asarray(positions, dtype=np.int64)


def read_vcf_site_major(
    path: str | Path,
    chrom: str | None = None,
    s_pad: int | None = None,
    n_pad: int | None = None,
    scan: tuple[int, np.ndarray] | None = None,
    pos_range: tuple[int, int] | None = None,
    row_mask: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray, int]:
    """Two-pass streaming ingest straight into the engine's padded
    SITE-MAJOR layout: ``(codes [s_pad, n_pad] int8, site_map, n_kept)``
    — ``n_kept`` is the number of haplotype COLUMNS in the buffer: the
    file's haplotype count, or ``row_mask.sum()`` under sample
    subsetting.

    ``row_mask``: boolean over ALIGNMENT rows (the rot90-reversed
    haplotype order — row ``k`` is haplotype ``n_haps-1-k``); False rows
    are dropped while decoding, so the buffer holds only the kept rows
    (``runtime.ingest.prepare_vcf_streamed`` resolves it from the header
    sample names).

    Pass 1 (:func:`scan_vcf`) learns the shape; the output buffer is then
    allocated ONCE (UNKNOWN-padded, the kernel's layout contract) and pass
    2 decodes each record directly into its row — peak host memory is the
    padded output matrix itself, vs ~3x for the row-list reader (decoded
    rows + [S, N] stack + the [N, S] transpose).  That bounds chromosome-
    scale ``.vcf.gz`` ingest (tens of GB decompressed) at one matrix.
    Gzip input inflates incrementally (no whole-stream materialization,
    unlike the reference's ``WeightedLD.py:314`` whole-file read).

    Semantics are identical to :func:`read_vcf` — same record set
    (trailing-line quirk included), same codes; row s column k holds
    haplotype ``n_haps-1-k`` (the reference's ``np.rot90`` order,
    ``WeightedLD.py:375``), so ``codes[:S, :N].T[::-1]... == alignment``
    — i.e. ``codes[s, k] == alignment[k, s]`` for the row-list reader's
    ``alignment``.  Verified bit-identical in tests/test_vcf.py.

    ``s_pad``/``n_pad`` (defaults: no padding) must be the engine's
    resolved tile/seq-chunk multiples so the buffer feeds
    ``LdSession`` zero-copy (see ``runtime.ingest.prepare_vcf_streamed``).
    ``scan`` passes a precomputed :func:`scan_vcf` result (skips pass 1;
    pass 2 still re-validates every record against it).
    """
    n_haps, site_map = scan if scan is not None \
        else scan_vcf(path, chrom, pos_range)
    if row_mask is not None:
        # Boolean over ALIGNMENT rows (reversed haplotype order — the
        # rot90 row k is haplotype n_haps-1-k): sample subsetting applied
        # while decoding, so the buffer holds only the kept rows.
        row_mask = np.asarray(row_mask, dtype=bool)
        if len(row_mask) != n_haps:
            raise ValueError("row_mask length must equal n_haplotypes")
    n_kept = n_haps if row_mask is None else int(row_mask.sum())
    s = len(site_map)
    s_pad = s if s_pad is None else s_pad
    n_pad = n_kept if n_pad is None else n_pad
    if s_pad < s or n_pad < n_kept:
        raise ValueError(f"padding smaller than data: {(s_pad, n_pad)} < "
                         f"{(s, n_kept)}")
    out = np.full((s_pad, n_pad), UNKNOWN, dtype=ALIGNMENT_DTYPE)
    i = 0
    for lineno, line in _iter_variant_lines(path):
        rec = _decode_record(path, lineno, line, chrom, pos_range)
        if rec is None:
            continue
        pos, row = rec
        if len(row) != n_haps:
            raise VcfError(
                f"{path}:{lineno}: inconsistent haplotype count "
                f"({len(row)} vs {n_haps})"
            )
        if i >= s or pos != site_map[i]:
            raise VcfError(f"{path}: file changed between ingest passes")
        rev = row[::-1]               # rot90 parity: reversed haplotypes
        out[i, :n_kept] = rev if row_mask is None else rev[row_mask]
        i += 1
    if i != s:
        raise VcfError(f"{path}: file changed between ingest passes")
    return out, site_map, n_kept


def read_vcf_python(path: str | Path,
                    chrom: str | None = None,
                    pos_range: tuple[int, int] | None = None,
                    ) -> tuple[np.ndarray, np.ndarray]:
    """Pure-Python fallback/oracle for :func:`read_vcf`."""
    positions: list[int] = []
    site_rows: list[np.ndarray] = []
    n_haps = None
    first = True

    for lineno, line in _iter_variant_lines(path):
        if first:
            _check_multisample(path, line)
            first = False
        rec = _decode_record(path, lineno, line, chrom, pos_range)
        if rec is None:
            continue
        pos, row = rec
        if n_haps is None:
            n_haps = len(row)
        elif len(row) != n_haps:
            raise VcfError(
                f"{path}:{lineno}: inconsistent haplotype count "
                f"({len(row)} vs {n_haps})"
            )
        positions.append(pos)
        site_rows.append(row)

    if first:
        raise VcfError(f"{path}: no variant records")
    if not positions:
        raise VcfError(_no_records_msg(path, chrom, pos_range))
    site_map = np.asarray(positions, dtype=np.int64)
    mat = np.stack(site_rows, axis=0)                 # [n_sites, n_haps]
    # rot90 parity: haplotype rows in reverse order (WeightedLD.py:375).
    alignment = np.ascontiguousarray(mat.T[::-1])
    return alignment, site_map
