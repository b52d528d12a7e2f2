"""FASTA ingestion.

BioPython-free, multi-line-record capable (the reference's Rust reader,
``rust/weighted_ld/src/lib.rs:277-307``, does *not* concatenate wrapped
sequence lines; the Python reference uses BioPython which does,
``WeightedLD.py:21-41``).  We follow the Python/BioPython behaviour: a record
is every line between one ``>`` header and the next, concatenated;
whitespace-only lines are ignored.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from ..core.encode import encode_alignment


def read_fasta_with_names(path: str | Path) -> tuple[np.ndarray, list[str]]:
    """Read a FASTA alignment into ``([n_seqs, n_sites] int8 codes, names)``.

    Parity: encoding identical to reference ``WeightedLD.py:34-40``
    (lowercase, a/c/g/t/- -> 0..4, everything else -> 5).

    Dispatches to the native mmap/OpenMP parser (``native/wldio.cpp``) when
    built — same semantics and error messages; ``WLD_NATIVE_IO=0`` forces
    this Python path (the parity oracle in tests/test_native_io.py).
    """
    from . import native

    if native.available():
        return native.read_fasta_native(path)
    return read_fasta_with_names_python(path)


def _open_maybe_gzip(path: str | Path):
    """Binary handle; transparently inflates gzip inputs (magic 1f 8b)."""
    with open(path, "rb") as probe:
        magic = probe.read(2)
    # Re-open by PATH, not by handing gzip the raw handle:
    # GzipFile.close() does not close a caller-supplied fileobj, which
    # leaked one fd per .gz ingest.
    if magic == b"\x1f\x8b":
        import gzip

        return gzip.open(path, "rb")
    return open(path, "rb")


def _iter_fasta_raw(path: str | Path):
    """THE FASTA framing (BioPython / reference-Python semantics,
    ``WeightedLD.py:21-41``), defined once: yield ``(name, raw_bytes)`` per
    record with one record resident at a time.  Wrapped sequence lines
    concatenate, whitespace-only lines are skipped, data before the first
    ``>`` header is an error, a header with no sequence lines yields
    ``b""``.  Both the batch reader and the streaming ingest build on this
    generator, so batch-vs-streamed framing cannot drift.  Gzip inputs
    inflate incrementally."""
    name = None
    current: list[bytes] = []
    with _open_maybe_gzip(path) as fh:
        for raw_line in fh:
            line = raw_line.strip()
            if not line:
                continue
            if line.startswith(b">"):
                if name is not None:
                    yield name, b"".join(current)
                    current.clear()
                name = line[1:].decode("utf-8", "replace").strip()
            else:
                if name is None:
                    raise ValueError(
                        f"{path}: sequence data before first '>' header")
                current.append(line)
    if name is not None:
        yield name, b"".join(current)


def read_fasta_with_names_python(
    path: str | Path,
) -> tuple[np.ndarray, list[str]]:
    """Pure-Python fallback/oracle for :func:`read_fasta_with_names`."""
    names: list[str] = []
    rows: list[bytes] = []
    for name, raw in _iter_fasta_raw(path):
        names.append(name)
        rows.append(raw)

    if not rows or not any(rows):
        # `not any(rows)` catches header-only files: each empty record is a
        # b"" row, which would otherwise yield an [N, 0] alignment and NaN
        # weights downstream instead of a clean ingest error.
        raise ValueError(f"{path}: no sequences found")
    return encode_alignment(rows), names


def read_fasta(path: str | Path) -> np.ndarray:
    """Like :func:`read_fasta_with_names`, codes only."""
    return read_fasta_with_names(path)[0]


# The Rust binary's per-character map (lib.rs:53-63): BOTH cases of acgt
# plus '-' are known; EVERYTHING else — including '\n'/'\r', which its
# line-based reader never strips — is Unknown.
_RUST_LUT = np.full(256, 5, dtype=np.int8)  # UNKNOWN
for _ch, _code in (("a", 0), ("c", 1), ("g", 2), ("t", 3), ("-", 4)):
    _RUST_LUT[ord(_ch)] = _code
    _RUST_LUT[ord(_ch.upper())] = _code


def read_fasta_rust(path: str | Path) -> np.ndarray:
    """The reference RUST binary's FASTA semantics, reproduced exactly
    (``lib.rs:277-307``) — the ``--fasta-reader rust`` / ``--compat rust``
    ingest for byte-parity against that binary:

    * every non-``>`` line is its OWN sequence — wrapped FASTA records are
      NOT concatenated (each wrap line becomes a separate row);
    * the line's terminator is kept: ``line.chars()`` includes ``'\\n'``
      (and ``'\\r'`` on CRLF files), which maps to Unknown — so every row
      ends in an Unknown column (monomorphic, masked out downstream, which
      is why unwrapped outputs still match the Python semantics);
    * unequal row lengths abort (``SiteSet::from_multi_sequence``,
      lib.rs:180 — e.g. a final line without a trailing newline, or
      wrapped records), mirrored here as ``ValueError``;
    * blank lines are rows too (a lone ``'\\n'`` is a length-1 sequence —
      and therefore usually a ragged abort, exactly like the binary).
    """
    return read_fasta_rust_with_names(path)[0]


def read_fasta_rust_with_names(
        path: str | Path) -> tuple[np.ndarray, list[str]]:
    """:func:`read_fasta_rust` plus per-row names.  The Rust reader labels
    each non-header line with the most recent ``>`` header
    (``lib.rs:287-304``); lines before any header get an empty name."""
    rows: list[np.ndarray] = []
    names: list[str] = []
    name = ""
    with _open_maybe_gzip(path) as fh:
        for raw_line in fh:
            if raw_line.startswith(b">"):
                name = raw_line[1:].decode("utf-8", "replace").strip()
                continue
            rows.append(_RUST_LUT[np.frombuffer(raw_line, dtype=np.uint8)])
            names.append(name)
    if not rows:
        raise ValueError(f"{path}: no sequences found")
    n_sites = len(rows[0])
    for i, r in enumerate(rows):
        if len(r) != n_sites:
            raise ValueError(
                f"{path}: sequence {i} has {len(r)} symbols, expected "
                f"{n_sites} (the Rust reader does not concatenate wrapped "
                "FASTA lines and keeps line terminators; lib.rs:180)"
            )
    return np.stack(rows, axis=0), names


def iter_fasta_rows(path: str | Path):
    """Stream ``(record_index, encoded int8 row)`` per FASTA record with
    ONE record resident at a time — the front half of the two-pass
    streaming ingest (:func:`scan_fasta` / :func:`read_fasta_site_major`).

    Framing comes from the shared :func:`_iter_fasta_raw` generator (the
    batch reader builds on the same one): wrapped sequence lines
    concatenate, whitespace-only lines are skipped, data before the first
    ``>`` header is an error; a header with no sequence lines yields a
    length-0 row (the caller's rectangularity check then rejects it unless
    every record is empty, which the caller reports as "no sequences
    found").  Gzip inputs inflate incrementally.
    """
    from ..core.encode import encode_sequence_bytes

    for idx, (_name, raw) in enumerate(_iter_fasta_raw(path)):
        yield idx, encode_sequence_bytes(raw)


def fasta_names(path: str | Path) -> list[str]:
    """Record names in file order, streaming (one record resident)."""
    return [name for name, _raw in _iter_fasta_raw(path)]


def scan_fasta(path: str | Path,
               block_rows: int = 1024,
               keep_samples: tuple[str, ...] | None = None,
               exclude_samples: tuple[str, ...] | None = None,
               ) -> tuple[int, int, np.ndarray, np.ndarray | None]:
    """Streaming pass 1 of the two-pass FASTA ingest: ``(n_seqs, n_sites,
    counts [S, 5], row_mask)`` — per-site allele histograms over codes
    0..4 — without ever materializing the ``[N, S]`` matrix (peak memory:
    one ``[block_rows, S]`` row block).  Validates rectangularity with the
    batch reader's error wording; every record is re-validated in pass 2.

    ``keep_samples``/``exclude_samples``: sample subsetting by record
    name, decided per record DURING this pass (no extra file pass) —
    skipped records contribute to neither ``n_seqs`` nor ``counts``
    (subset-before-masks, the batch pipeline's semantics).  Unknown names
    and <2 survivors are errors (the pipeline's typo safety), validated
    from the names this pass collects; the returned ``row_mask`` (bool
    per record, file order; None without subsetting) drives pass 2.
    Rectangularity is still validated over EVERY record (the batch
    reader rejects ragged inputs before subsetting)."""
    from ..core.encode import encode_sequence_bytes
    from ..core.sites import site_histogram_host

    subsetting = keep_samples is not None or exclude_samples is not None
    ks = set(keep_samples) if keep_samples is not None else None
    es = set(exclude_samples) if exclude_samples is not None else None
    names: list[str] = []
    n_sites = None
    n_seqs = 0
    counts = None
    block: list[np.ndarray] = []

    def flush():
        nonlocal counts
        if block:
            h = site_histogram_host(np.stack(block, axis=0)).astype(np.int64)
            counts = h if counts is None else counts + h
            block.clear()

    for idx, (name, raw) in enumerate(_iter_fasta_raw(path)):
        row = encode_sequence_bytes(raw)
        if n_sites is None:
            n_sites = len(row)
        elif len(row) != n_sites:
            raise ValueError(
                f"ragged alignment: sequence {idx} has length {len(row)}, "
                f"expected {n_sites}"
            )
        if subsetting:
            names.append(name)
            if (ks is not None and name not in ks) \
                    or (es is not None and name in es):
                continue
        n_seqs += 1
        block.append(row)
        if len(block) >= block_rows:
            flush()
    flush()
    row_mask = None
    if subsetting and names:
        # Validation AND the pass-2 mask from the same semantics: raises on
        # unknown names / <2 survivors; its mask equals the per-record
        # decisions above by construction.
        from ..pipeline import _sample_row_mask

        row_mask = _sample_row_mask(names, keep_samples, exclude_samples)
    if (n_sites or 0) == 0 or (not subsetting and n_seqs == 0):
        raise ValueError(f"{path}: no sequences found")
    return n_seqs, n_sites, counts, row_mask


def read_fasta_site_major(
    path: str | Path,
    ld_mask: np.ndarray,
    s_pad: int | None = None,
    n_pad: int | None = None,
    scan: tuple[int, int] | None = None,
    row_mask: np.ndarray | None = None,
) -> np.ndarray:
    """Streaming pass 2: decode each record straight into its COLUMN of a
    padded site-major buffer holding only the LD-kept sites — ``codes[s, k]
    == trimmed_alignment[k, s]`` (the engine's :class:`SiteMajorCodes`
    layout contract; UNKNOWN padding).  ``scan`` is pass 1's ``(n_seqs,
    n_sites)`` (with ``row_mask``: n_seqs = the KEPT count); any drift
    between passes (file changed) is an error.  ``row_mask`` skips
    records exactly like :func:`scan_fasta`'s."""
    from ..core.encode import ALIGNMENT_DTYPE, UNKNOWN

    ld_mask = np.asarray(ld_mask, dtype=bool)
    n_seqs, n_sites = scan if scan is not None else (None, None)
    if n_sites is not None and len(ld_mask) != n_sites:
        raise ValueError("ld_mask length must equal the scanned n_sites")
    s_kept = int(ld_mask.sum())
    s_pad = s_kept if s_pad is None else s_pad
    if n_seqs is None:
        raise ValueError("read_fasta_site_major needs the scan result")
    n_pad = n_seqs if n_pad is None else n_pad
    if s_pad < s_kept or n_pad < n_seqs:
        raise ValueError(f"padding smaller than data: {(s_pad, n_pad)} < "
                         f"{(s_kept, n_seqs)}")
    out = np.full((s_pad, n_pad), UNKNOWN, dtype=ALIGNMENT_DTYPE)
    # Rows land in a small [B, s_kept] row-major block that transposes into
    # the site-major buffer once per block — a per-row strided column write
    # (stride n_pad) measured ~2x slower on chromosome-scale inputs.
    block_rows = 256
    block = np.empty((block_rows, s_kept), dtype=ALIGNMENT_DTYPE)
    k = 0
    b = 0
    full_keep = bool(ld_mask.all())
    for idx, row in iter_fasta_rows(path):
        if row_mask is not None and (idx >= len(row_mask)
                                     or not row_mask[idx]):
            if idx >= len(row_mask) or len(row) != n_sites:
                raise ValueError(
                    f"{path}: file changed between ingest passes")
            continue
        if len(row) != n_sites or k + b >= n_seqs:
            raise ValueError(f"{path}: file changed between ingest passes")
        block[b] = row if full_keep else row[ld_mask]
        b += 1
        if b == block_rows:
            out[:s_kept, k:k + b] = block.T
            k += b
            b = 0
    if b:
        out[:s_kept, k:k + b] = block[:b].T
        k += b
    if k != n_seqs:
        raise ValueError(f"{path}: file changed between ingest passes")
    return out
