"""FASTA as a first-class Spark data source (Python Data Source API,
Spark 4): ``spark.read.format("fasta").load(path_or_glob)``.

SURVEY §4 lists "FASTA as a custom DataSource" as the one optional
custom-source candidate; sources/fasta.py's ``lineSep="\\n>"`` text
-scan remains the default ingest path (pure JVM parse), and this
DataSource is the pluggable-catalog form of the same reader — usable
from SQL (``CREATE TABLE ... USING fasta`` semantics via
``spark.read.format``), with its own split planning.

Split planning (the 100 TB property): plain FASTA files are divided
into ~``split_mb`` byte ranges at PLANNING time; each task seeks to
its range start, skips forward to the first record header at or after
it, and parses records whose header byte offset lies inside the range
(a record spanning the range end is completed by reading past it —
the classic splittable text-record contract, so one multi-GB file
fans out across the cluster with no driver parse). ``.gz``/``.xz``
are not seekable: one partition per file.

Reference parity: record grammar as sonar.open_file/SeqIO
(/root/reference/sonar.py:496-509) — header line ``>accession desc``,
sequence = concatenated following lines, accession = first token.
"""

from __future__ import annotations

import glob as _glob
import os

from pyspark.sql.datasource import (DataSource, DataSourceReader,
                                    DataSourceWriter, InputPartition,
                                    WriterCommitMessage)

_SCHEMA = "accession string, description string, sequence string"
_TEXT_EXT = (".fasta", ".fa", ".fna")


class FastaPartition(InputPartition):
    def __init__(self, path: str, start: int, end: int):
        self.path, self.start, self.end = path, start, end


class FastaDataSource(DataSource):
    """``spark.dataSource.register(FastaDataSource)`` then
    ``spark.read.format("fasta").option("split_mb", 64).load(paths)``."""

    @classmethod
    def name(cls) -> str:
        return "fasta"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema) -> "FastaReader":
        return FastaReader(self.options)

    def writer(self, schema, overwrite: bool) -> "FastaWriter":
        return FastaWriter(self.options, overwrite)


class FastaReader(DataSourceReader):
    def __init__(self, options):
        self._paths = options.get("path")
        self._split_bytes = int(float(options.get("split_mb", "64")) * 2 ** 20)

    def partitions(self):
        paths = []
        for p in str(self._paths).split(","):
            p = p.strip()
            if any(c in p for c in "*?["):
                hits = sorted(_glob.glob(p))
                if not hits:
                    # parity with the explicit-path branch (which fails
                    # in os.path.getsize): a typo'd glob must error, not
                    # silently yield an empty DataFrame
                    raise FileNotFoundError(f"glob matched no files: {p!r}")
            else:
                hits = [p]
            paths.extend(hits)
        parts = []
        for p in paths:
            size = os.path.getsize(p)
            if p.endswith(_TEXT_EXT) and size > self._split_bytes:
                start = 0
                while start < size:
                    end = min(start + self._split_bytes, size)
                    parts.append(FastaPartition(p, start, end))
                    start = end
            else:
                parts.append(FastaPartition(p, 0, -1))  # whole file
        return parts

    def read(self, part: FastaPartition):
        if part.path.endswith(".gz"):
            import gzip
            fh = gzip.open(part.path, "rt")
        elif part.path.endswith(".xz"):
            import lzma
            fh = lzma.open(part.path, "rt")
        else:
            fh = open(part.path, "rb")
        try:
            if part.end == -1:
                yield from self._parse_stream(
                    fh if "b" not in getattr(fh, "mode", "rt") else
                    (line.decode() for line in fh))
                return
            yield from self._parse_range(fh, part.start, part.end)
        finally:
            fh.close()

    @staticmethod
    def _parse_stream(lines):
        header, seq = None, []
        for line in lines:
            line = line.rstrip("\r\n")
            if line.startswith(">"):
                if header is not None:
                    yield FastaReader._record(header, seq)
                header, seq = line[1:], []
            elif header is not None:
                seq.append(line.strip())
        if header is not None:
            yield FastaReader._record(header, seq)

    @staticmethod
    def _parse_range(fh, start: int, end: int):
        # ownership rule: a task parses every record whose '>' byte
        # offset o satisfies start <= o < end (offset 0 belongs to the
        # first range); it reads PAST end to finish its last record.
        # Positioning: seek to start-1 and consume one line — if byte
        # start-1 is the previous line's newline this consumes exactly
        # that newline and leaves us AT start (so a record whose header
        # begins exactly on the boundary is owned, not skipped); if
        # start lands mid-line it consumes the partial line.  Plain
        # fh.seek(start); fh.readline() would drop boundary-aligned
        # records: this task skips them, the previous one refuses them.
        if start > 0:
            fh.seek(start - 1)
            fh.readline()
        else:
            fh.seek(0)
        header, seq = None, []
        while True:
            off = fh.tell()
            line = fh.readline()
            if not line:
                break
            if line.startswith(b">"):
                if header is not None:
                    yield FastaReader._record(header, seq)
                    header = None
                if off >= end:                 # next range owns this record
                    break
                header = line[1:].rstrip(b"\r\n").decode()
                seq = []
            elif header is not None:
                seq.append(line.strip().decode())
        if header is not None:
            yield FastaReader._record(header, seq)

    @staticmethod
    def _record(header: str, seq: list[str]):
        acc = header.split(" ", 1)[0]
        return (acc, header, "".join(seq))


class FastaCommit(WriterCommitMessage):
    def __init__(self, path: str):
        self.path = path


class FastaWriter(DataSourceWriter):
    """``df.write.format("fasta").save(dir)`` — the restore sink (S7)
    as a real output format: each task writes one ``part-*.fasta``
    shard of ``>accession description\nsequence`` records (wrapped at
    ``line_width``, default 70 like Biopython's FastaIO), so a restore
    of N genomes lands as a sharded FASTA directory with no driver
    collect."""

    def __init__(self, options, overwrite: bool):
        self._dir = options.get("path")
        self._width = int(options.get("line_width", "70"))
        self._overwrite = overwrite
        import os
        import shutil
        if overwrite and os.path.isdir(self._dir):
            shutil.rmtree(self._dir)
        os.makedirs(self._dir, exist_ok=True)

    def write(self, iterator) -> "FastaCommit":
        import os
        import uuid
        w = self._width
        # shards stay dot-invisible until COMMIT: a failed/retried/
        # speculative task must not leave a visible duplicate, so the
        # task only writes its tmp file and reports the path; the
        # driver-side commit() renames the winning attempts, abort()
        # removes the losers (the DataSourceWriter two-phase contract).
        tmp = os.path.join(self._dir, f".part-{uuid.uuid4().hex}.fasta.tmp")
        with open(tmp, "w") as fh:
            for row in iterator:
                d = row.asDict()
                acc, desc = d.get("accession"), d.get("description")
                # never drop the key column: a description that does not
                # lead with the accession gets it prepended, so a write/
                # read round trip always preserves accession
                if not desc:
                    header = acc
                elif desc.split(" ", 1)[0] == acc:
                    header = desc
                else:
                    header = f"{acc} {desc}"
                seq = d["sequence"]
                fh.write(f">{header}\n")
                for i in range(0, len(seq), w):
                    fh.write(seq[i:i + w] + "\n")
        return FastaCommit(tmp)

    def commit(self, messages) -> None:
        import os
        for m in messages:
            final = m.path[: -len(".tmp")].replace("/.part-", "/part-")
            os.rename(m.path, final)

    def abort(self, messages) -> None:
        import os
        for m in messages:
            try:
                os.remove(m.path)
            except OSError:
                pass


def register(spark) -> None:
    """Idempotently register the ``fasta`` format on this session."""
    spark.dataSource.register(FastaDataSource)
