"""Executor-parallel ZIP-member CSV source (Spark 4 Python DataSource).

The reference's feeds arrive as ZIP archives of ~27 per-state CSVs
(`extract.py:38-44`). ZIPs aren't splittable, so `sources/ingest.py` keeps
the UNPACK on the driver/landing zone; this module removes that bottleneck
for the common many-members / many-archives case: each (archive, member)
pair becomes one Spark input partition, and executors read their member
directly out of the archive via the ZIP central directory — no extraction
step, no landing-dir copy, parallelism = Σ members across archives.

Implementation notes (scale-relevant):
- `partitions()` lists members from each archive's central directory on
  the driver (metadata-only: a few KiB per archive, no data read).
- `read(partition)` opens ONE member stream and parses it with
  pyarrow.csv in streaming mode, yielding Arrow RecordBatches — the
  entire row path stays in C/Arrow; Python touches only batch handles
  (the Python DataSource API transfers Arrow batches zero-copy).
- A 100 TB corpus of ZIPs therefore scans at (members × batch) grain
  with per-member admission control, the same shape the multimodal
  reader uses. One giant member still caps at single-task parallelism —
  that's the format's limit (central-directory entries are the atoms),
  which is why `sinks.compact` re-lands hot feeds as parquet after first
  read.
- MEASURED trade-off (tools/zip_scale_probe.py, 16 zips × 16 members ×
  20k rows, warm): zipcsv 5.8 s vs extract-then-JVM-CSV 2.8 s (serial
  unzip itself only 0.14 s on local SSD). Spark's vectorized JVM CSV
  parser beats pyarrow-through-Python-workers ~2× when the landing zone
  is fast local disk, so on such hosts PREFER ingest.py's extract path.
  zipcsv wins where the landing write is the bottleneck or impossible:
  object-store feeds (extract doubles the I/O and needs a staging
  bucket), space-constrained hosts, or very wide archive fleets where
  the per-archive serial unzip (linear in bytes) dominates. It also
  pays the session's Python-worker cold start once (~5 s on this box) —
  irrelevant on a long-lived cluster, visible in a cold benchmark.
- All columns surface as strings (TSE CSVs carry no typed schema; the
  typed boundary is `operators/core.cast_columns`, same as the reference
  pipeline). Delimiter/encoding default to the TSE dialect (';',
  latin-1).
"""

from __future__ import annotations

import zipfile
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StringType, StructField, StructType

from politicamente_etl_spark.sources.readers import prune_consolidated


class ZipMemberPartition(InputPartition):
    def __init__(self, archive: str, member: str):
        self.archive = archive
        self.member = member


def _list_members(
    paths: Sequence[str], prefix: str | None, year: int | None
) -> list[tuple[str, str]]:
    """(archive, member) pairs across archives, consolidated-file pruning
    applied per archive when a prefix/year is configured."""
    out: list[tuple[str, str]] = []
    for p in paths:
        with zipfile.ZipFile(p) as z:
            names = [n for n in z.namelist() if n.lower().endswith(".csv")]
        if prefix is not None and year is not None:
            names = prune_consolidated(names, prefix, int(year))
        out.extend((p, n) for n in sorted(names))
    return out


def _option_paths(options) -> list[str]:
    """The archive list from either the 'path' or 'paths' spelling —
    shared by schema inference and the reader so both fail the same way
    (a clear ValueError) when neither is given."""
    paths = options.get("path") or options.get("paths")
    if not paths:
        raise ValueError("zipcsv: 'path' option is required")
    return paths.split(",") if isinstance(paths, str) else list(paths)


def _read_header(archive: str, member: str, delimiter: str, encoding: str) -> list[str]:
    with zipfile.ZipFile(archive) as z, z.open(member) as f:
        header = f.readline().decode(encoding).rstrip("\r\n")
    return [c.strip('"') for c in header.split(delimiter)]


class ZipCsvReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self.schema = schema
        self.delimiter = options.get("delimiter", ";")
        self.encoding = options.get("encoding", "latin-1")
        self.validate_headers = (
            str(options.get("validate_headers", "false")).lower() == "true"
        )
        self.paths = _option_paths(options)
        self.members = _list_members(
            self.paths, options.get("prefix"), options.get("year")
        )

    def partitions(self) -> Sequence[InputPartition]:
        return [ZipMemberPartition(a, m) for a, m in self.members]

    def read(self, partition: ZipMemberPartition) -> Iterator:
        import pyarrow as pa
        import pyarrow.csv as pacsv

        cols = [f.name for f in self.schema.fields]
        if self.validate_headers:
            # Surface schema drift loudly instead of null-filling: a
            # member whose header is missing resolved columns (or carries
            # extras) raises with the exact delta, per-member.
            have = set(
                _read_header(
                    partition.archive, partition.member,
                    self.delimiter, self.encoding,
                )
            )
            missing = [c for c in cols if c not in have]
            extra = sorted(have - set(cols))
            if missing or extra:
                raise ValueError(
                    f"zipcsv: header drift in {partition.archive}!"
                    f"{partition.member}: missing={missing} extra={extra}"
                )
        convert = pacsv.ConvertOptions(
            column_types={c: pa.string() for c in cols},
            include_columns=cols,
            include_missing_columns=True,
        )
        parse = pacsv.ParseOptions(delimiter=self.delimiter)
        read = pacsv.ReadOptions(encoding=self.encoding)
        with zipfile.ZipFile(partition.archive) as z, z.open(
            partition.member
        ) as f:
            reader = pacsv.open_csv(
                f, read_options=read, parse_options=parse, convert_options=convert
            )
            for batch in reader:
                if batch.num_rows:
                    yield batch


class ZipCsvDataSource(DataSource):
    """``spark.read.format("zipcsv").schema(...).option("path", ...)`` —
    member-parallel CSV-in-ZIP scan. Options: path (comma-separated
    archive paths), delimiter (default ';'), encoding (default latin-1),
    prefix+year (enable the reference's consolidated-file pruning),
    validate_headers (default false).

    Schema resolution is FIRST-MEMBER-WINS: when no explicit schema is
    given, column names come from the first member's header only. Later
    members with reordered headers are realigned by name; members with
    missing columns are null-filled and extra columns dropped — silently
    by default (TSE feeds are homogeneous per archive). Set
    ``validate_headers=true`` to instead fail fast with the per-member
    missing/extra column delta."""

    @classmethod
    def name(cls) -> str:
        return "zipcsv"

    def schema(self):
        # Infer column names from the first member's header when the user
        # gave no schema; everything is a string column (typed casts are a
        # downstream, Catalyst-visible concern).
        members = _list_members(
            _option_paths(self.options),
            self.options.get("prefix"),
            self.options.get("year"),
        )
        if not members:
            raise ValueError("zipcsv: no CSV members found")
        a, m = members[0]
        names = _read_header(
            a, m, self.options.get("delimiter", ";"),
            self.options.get("encoding", "latin-1"),
        )
        return StructType([StructField(n, StringType()) for n in names])

    def reader(self, schema: StructType) -> DataSourceReader:
        return ZipCsvReader(schema, dict(self.options))


def register_zipcsv(spark) -> None:
    """Idempotent registration of the zipcsv format on a session."""
    spark.dataSource.register(ZipCsvDataSource)
