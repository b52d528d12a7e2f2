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


def read_fasta_with_names_python(
    path: str | Path,
) -> tuple[np.ndarray, list[str]]:
    """Pure-Python fallback/oracle for :func:`read_fasta_with_names`."""
    names: list[str] = []
    rows: list[bytes] = []
    current: list[bytes] = []

    def flush() -> None:
        if names and len(rows) < len(names):
            rows.append(b"".join(current))
        current.clear()

    with _open_maybe_gzip(path) as fh:
        for raw_line in fh:
            line = raw_line.strip()
            if not line:
                continue
            if line.startswith(b">"):
                flush()
                names.append(line[1:].decode("utf-8", "replace").strip())
            else:
                if not names:
                    raise ValueError(f"{path}: sequence data before first '>' header")
                current.append(line)
    flush()

    if not rows or not any(rows):
        # `not any(rows)` catches header-only files: flush() appends b"" for
        # each empty record, which would otherwise yield an [N, 0] alignment
        # and NaN weights downstream instead of a clean ingest error.
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
