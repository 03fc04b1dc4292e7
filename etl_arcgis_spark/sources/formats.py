"""Interchange format support — CSV / JSON-lines / ORC next to parquet.

The reference ingests a REST JSON feed and emits JSON (task.ts:418,
457); an engine replacing it must read and write the common interchange
formats with *schema fidelity*, not just parquet. This module gives
every fixture table a lossless round-trip through each format, with the
per-format quirks handled in exactly one place:

- **csv**: schema NEVER inferred on read (inference is a full extra
  pass over the data and guesses types); explicit ``schema`` required.
  Timestamps serialized ISO-8601 with microseconds; quote/escape set so
  embedded delimiters and newlines survive; null vs empty-string
  distinction preserved via a dedicated null token.
- **json** (JSON Lines): one object per line so the file stays
  SPLITTABLE — multiline JSON arrays force a single reader at 100 TB.
  Explicit schema on read (inference samples and widens types).
- **orc**: columnar with predicate pushdown, same class as parquet;
  included so a user can land on either columnar format.

At 100 TB: csv/json are ingest/egress formats only — convert to
parquet/orc at the boundary and run queries on the columnar copy.
``spark.sql.files.maxPartitionBytes`` splits large text files; gzip'd
text is NOT splittable (one task per file), so prefer uncompressed or
zstd-in-frames at the landing zone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

FORMATS = ("csv", "json", "orc", "parquet")

# CSV tokens chosen so NULL != '' survives the round-trip: nulls write
# as _NULL_, empty strings write as quoted "" (the writer's default
# emptyValue) which the reader maps back to ''. Do NOT set emptyValue:
# it is asymmetric — on read it would REPLACE empty fields with the
# token literally.
_CSV_OPTS = {
    "header": "true",
    "nullValue": "_NULL_",
    "quote": '"',
    "escape": '"',
    "multiLine": "true",  # values containing newlines round-trip
    "timestampFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX",
}

_JSON_OPTS = {
    "timestampFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX",
}


def write_table(df: DataFrame, path: str, fmt: str, mode: str = "overwrite") -> None:
    """Write ``df`` to ``path`` in ``fmt`` with round-trip-safe options."""
    if fmt not in FORMATS:
        raise ValueError(f"unknown format {fmt!r}; expected one of {FORMATS}")
    w = df.write.mode(mode)
    if fmt == "csv":
        w = w.options(**_CSV_OPTS)
    elif fmt == "json":
        w = w.options(**_JSON_OPTS)
    w.format(fmt).save(path)


def read_table(
    spark: SparkSession, path: str, fmt: str, schema: StructType | None = None
) -> DataFrame:
    """Read ``path`` as ``fmt``. Text formats REQUIRE an explicit schema
    (csv/json inference is an extra data pass and type-lossy); columnar
    formats carry their own."""
    if fmt not in FORMATS:
        raise ValueError(f"unknown format {fmt!r}; expected one of {FORMATS}")
    r = spark.read
    if fmt in ("csv", "json"):
        if schema is None:
            raise ValueError(f"{fmt} read requires an explicit schema")
        r = r.schema(schema)
        r = r.options(**(_CSV_OPTS if fmt == "csv" else _JSON_OPTS))
    return r.format(fmt).load(path)
