"""TSV output writers.

Parity: the Python reference prints ``posa posb D D' R2`` tab-separated with
``round(x, 4)`` formatting to stdout (``WeightedLD.py:176,282-284``); the Rust
reference writes 3-dp TSV files plus an optional per-sequence weights TSV
(``main.rs:70-119``).  We expose both: :func:`write_pairs` defaults to the
Python format, and :func:`write_weights` covers the Rust-only weights dump.
"""

from __future__ import annotations

import io
import sys
from typing import IO, Mapping, NamedTuple

import numpy as np

from ..core.ld_dense import LdRecords

PAIR_HEADER = "posa\tposb\tD\tD'\tR2"

# PLINK --r2 dprime column order (CHR_A BP_A SNP_A CHR_B BP_B SNP_B R2 DP),
# tab-separated, plus a trailing D column (PLINK has no signed-D output;
# name-based parsers ignore extras).  Capability beyond the reference.
PLINK_PAIR_HEADER = "CHR_A\tBP_A\tSNP_A\tCHR_B\tBP_B\tSNP_B\tR2\tDP\tD"


class PairAnnot(NamedTuple):
    """Per-site identity for PLINK-style pair output: position ->
    chromosome name / SNP id (from the VCF CHROM and ID columns via
    ``io.vcf.site_annotations``, or synthesized for FASTA input).

    ``chrom_of_b``/``id_of_b``: separate maps for the pair's SECOND
    endpoint (``--cross-regions``, where block A and block B may live on
    different chromosomes and legitimately share POS values); None = use
    the first-endpoint maps (the all-pairs case)."""

    chrom_of: Mapping[int, str]
    id_of: Mapping[int, str]
    chrom_of_b: Mapping[int, str] | None = None
    id_of_b: Mapping[int, str] | None = None


def pair_header(annot: "PairAnnot | None") -> str:
    return PLINK_PAIR_HEADER if annot is not None else PAIR_HEADER


def open_text_output(path):
    """Text handle for TSV output; a ``.gz`` suffix writes gzip-compressed
    (symmetric with the readers' transparent gzip input support), and
    ``-`` means stdout (the ``--site-stats -`` convention, uniformly —
    previously ``--weights-output -`` wrote a literal file named ``-``).

    ``mtime=0`` keeps the gzip header free of the wall clock, so identical
    runs produce byte-identical .gz files (deterministic outputs are an
    advertised property of this framework)."""
    if str(path) == "-":
        return _StdoutText()
    if str(path).endswith(".gz"):
        return _DeterministicGzipText(path)
    return open(path, "w")


class _StdoutText:
    """Context-manager stdout wrapper whose close() does NOT close stdout
    (callers uniformly ``with open_text_output(...)``)."""

    def write(self, s):
        return sys.stdout.write(s)

    def flush(self):
        sys.stdout.flush()

    def close(self):
        sys.stdout.flush()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class _DeterministicGzipText(io.TextIOWrapper):
    """Gzip text writer with no mtime and no embedded filename in the
    header: identical runs produce byte-identical .gz files."""

    def __init__(self, path):
        import gzip

        self._raw = open(path, "wb")
        gz = gzip.GzipFile(
            filename="", fileobj=self._raw, mode="wb", mtime=0
        )
        super().__init__(gz, encoding="utf-8")

    def close(self):
        try:
            super().close()  # flushes and closes the GzipFile
        finally:
            self._raw.close()


class GzipMemberWriter:
    """Checkpoint-compatible gzip TSV writer: the text written between
    ``flush()`` calls becomes ONE independent deterministic gzip member
    (mtime 0, no filename), and concatenated members form a single valid
    gzip stream (RFC 1952 multi-member — ``gzip.open`` and zcat decode
    them seamlessly).  A resume can therefore truncate the file at any
    recorded member boundary (``tell()`` right after ``flush()``) — the
    byte-offset semantics checkpointed output needs, which a single gzip
    stream cannot offer (``run_to_tsv`` uses this for ``--checkpoint``
    with a ``.gz`` pair output).

    Text streams through an incremental ``zlib`` compressor as it is
    written (host memory stays O(write chunk), not O(segment) — a
    no-threshold checkpoint segment can carry millions of records), and
    the member header is deferred until a segment's first byte: empty
    segments write no member, so the byte stream depends only on the
    records themselves and a resumed run byte-equals an uninterrupted
    one."""

    # RFC 1952 header: magic, deflate, no flags, mtime 0, XFL=2 (max
    # compression, matching gzip.compress at level 9), OS=255 (unknown).
    _HEADER = b"\x1f\x8b\x08\x00\x00\x00\x00\x00\x02\xff"

    def __init__(self, path, append_at: int | None = None):
        if append_at is None:
            self._f = open(path, "wb")
        else:
            self._f = open(path, "r+b")
            self._f.truncate(append_at)
            self._f.seek(append_at)
        self._comp = None  # per-member compressor (None = no open member)
        self._crc = 0
        self._size = 0

    def write(self, s: str) -> int:
        import zlib

        data = s.encode("utf-8")
        if not data:
            return 0
        if self._comp is None:
            self._comp = zlib.compressobj(9, zlib.DEFLATED, -15)
            self._crc = 0
            self._size = 0
            self._f.write(self._HEADER)
        self._crc = zlib.crc32(data, self._crc)
        self._size += len(data)
        out = self._comp.compress(data)
        if out:
            self._f.write(out)
        return len(s)

    def flush(self) -> None:
        import struct

        if self._comp is not None:
            self._f.write(self._comp.flush())
            self._f.write(struct.pack("<II", self._crc,
                                      self._size & 0xFFFFFFFF))
            self._comp = None
        self._f.flush()

    def tell(self) -> int:
        """Current member boundary — call right after :meth:`flush`."""
        return self._f.tell()

    def close(self) -> None:
        try:
            self.flush()
        finally:
            self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def _fmt(x: float, ndigits: int) -> str:
    # Python's print(round(x, 4)) semantics: shortest float repr.
    return repr(round(float(x), ndigits))


def write_pairs(
    records: LdRecords,
    out: IO[str] | None = None,
    ndigits: int = 4,
    header: bool = True,
    annot: PairAnnot | None = None,
) -> None:
    out = out if out is not None else sys.stdout
    if header:
        out.write(pair_header(annot) + "\n")
    if annot is not None:
        # PLINK-style rows (CHR/BP/SNP per endpoint).  Positions absent
        # from the maps (shouldn't happen — the maps come from the same
        # ingest) degrade to chromosome "0" / id "." rather than crashing.
        # This branch is a per-row Python loop (the native formatter covers
        # only the tsv layout): the per-record dict lookups dominate, so a
        # native plink formatter would need the identity columns resolved
        # host-side anyway — chromosome-scale outputs preferring write
        # speed over identity columns should use the default tsv format.
        co, io_ = annot.chrom_of, annot.id_of
        cob = annot.chrom_of_b if annot.chrom_of_b is not None else co
        iob = annot.id_of_b if annot.id_of_b is not None else io_
        buf: list[str] = []
        for pa, pb, d, dp, r2 in zip(
            records.pos_a, records.pos_b, records.d, records.d_prime,
            records.r2,
        ):
            pa, pb = int(pa), int(pb)
            buf.append(
                f"{co.get(pa, '0')}\t{pa}\t{io_.get(pa, '.')}\t"
                f"{cob.get(pb, '0')}\t{pb}\t{iob.get(pb, '.')}\t"
                f"{_fmt(r2, ndigits)}\t{_fmt(dp, ndigits)}\t{_fmt(d, ndigits)}"
            )
            if len(buf) >= 4096:
                out.write("\n".join(buf) + "\n")
                buf.clear()
        if buf:
            out.write("\n".join(buf) + "\n")
        return
    from . import native

    if native.available() and 0 <= ndigits <= 100:
        # Native formatter (native/wldio.cpp): identical bytes, ~10x faster
        # on multi-million-record outputs; chunked to bound buffer size.
        # (Negative ndigits — Python round-to-tens — stays on the Python
        # path, as does ndigits > 100.)
        chunk = 1 << 18
        for lo in range(0, len(records.pos_a), chunk):
            hi = lo + chunk
            out.write(
                native.format_pairs_native(
                    records.pos_a[lo:hi], records.pos_b[lo:hi],
                    records.d[lo:hi], records.d_prime[lo:hi],
                    records.r2[lo:hi], ndigits,
                )
            )
        return
    buf: list[str] = []
    for pa, pb, d, dp, r2 in zip(
        records.pos_a, records.pos_b, records.d, records.d_prime, records.r2
    ):
        buf.append(
            f"{pa}\t{pb}\t{_fmt(d, ndigits)}\t{_fmt(dp, ndigits)}\t{_fmt(r2, ndigits)}"
        )
        if len(buf) >= 4096:
            out.write("\n".join(buf) + "\n")
            buf.clear()
    if buf:
        out.write("\n".join(buf) + "\n")


def write_weights(weights: np.ndarray, out: IO[str], ndigits: int = 6) -> None:
    """Per-sequence weights TSV (ref ``main.rs:70-80``): ``index weight``."""
    out.write("sequence\tweight\n")
    from . import native

    if native.available() and 0 <= ndigits <= 100:
        out.write(native.format_weights_native(np.asarray(weights), ndigits))
        return
    for i, w in enumerate(np.asarray(weights)):
        out.write(f"{i}\t{round(float(w), ndigits)}\n")


SITE_STATS_HEADER = "site\tcoverage\tmajor_code\tminor_fraction\thk\tld"


def write_site_stats(stats: dict, out: IO[str], ndigits: int = 4,
                     header: bool = True) -> None:
    """Per-site diagnostic TSV (``pipeline.site_stats``): one row per input
    site with the coverage / minor-fraction values the masks are judged on
    and the hk/ld verdicts (0/1)."""
    if header:
        out.write(SITE_STATS_HEADER + "\n")
    site = stats["site"]
    cov = stats["coverage"]
    mc = stats["major_code"]
    mf = stats["minor_fraction"]
    hk = stats["hk"]
    ld = stats["ld"]
    for i in range(len(site)):
        out.write(
            f"{site[i]}\t{round(float(cov[i]), ndigits)}\t{int(mc[i])}\t"
            f"{round(float(mf[i]), ndigits)}\t{int(hk[i])}\t{int(ld[i])}\n"
        )
