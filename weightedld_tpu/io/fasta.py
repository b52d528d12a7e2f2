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
