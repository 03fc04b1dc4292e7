"""``arcgis_sim`` — a Python Data Source modeling the reference's
ArcGIS FeatureServer connector surface (SURVEY.md §2 A1/A5/A17/A19).

The reference scans a remote layer by paging the REST ``query``
endpoint (esri-dump ITER, config task.ts:399-414, fetch task.ts:418),
ships a SQL-92 ``where`` server-side (task.ts:406-408), derives the
layer schema from remote field metadata (task.ts:57-82), authenticates
through a brokered token with a TTL cache (task.ts:92-135), and submits
feature batches back (task.ts:455-457).

This source rebuilds that contract on Spark's public extension point,
with a local JSONL file standing in for the feature server:

- **Partitioned paged scan** (A1): one ``InputPartition`` per OID page
  (``pageSize`` option) — where the reference pages *serially*, Spark
  reads every page in parallel. At 100 TB against a real server this is
  the difference between a connector and an engine: page ranges are the
  unit of parallelism, retry, and locality.
- **Filter pushdown** (A3 via ``pushFilters``): equality/range/null/In
  filters are absorbed into the per-page read (enable
  ``spark.sql.python.filterPushdown.enabled``); everything else is
  returned to Catalyst to evaluate above the scan.
- **Schema inference** (A5): ``schema()`` reads the layer's field
  metadata (first record), mirroring ``dumper.schema()``.
- **Token broker with TTL cache** (A19): refreshed when within a
  5-minute margin of expiry. (The reference *intends* 5 minutes but
  computes +5 seconds — ``task.ts:107`` — a latent bug noted in
  SURVEY.md and deliberately not reproduced.)
- **Batch sink** (A17): an append writer emitting one JSONL chunk per
  partition with a commit barrier (≅ chunked submit + allSettled,
  task.ts:358,457).
- **Streaming sink** (A17 ≅ the outgoing flow, task.ts:155-361): a
  ``DataSourceStreamWriter`` landing each micro-batch as batch-stamped
  chunks with an idempotent per-epoch commit marker — exactly-once
  over checkpoint replay, which the reference's raw HTTP submit lacks.
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass
from itertools import islice

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    IsNotNull,
    LessThan,
    LessThanOrEqual,
    DataSourceStreamWriter,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

FORMAT_NAME = "arcgis_sim"


class TokenBroker:
    """A19: brokered auth token with TTL cache (task.ts:92-135).

    ``margin_s`` is honestly five minutes — the reference's comment says
    5 minutes but its arithmetic yields 5 seconds (task.ts:107); we
    implement the stated intent, not the bug.
    """

    def __init__(self, ttl_s: float = 3600.0, margin_s: float = 300.0):
        self.ttl_s = ttl_s
        self.margin_s = margin_s
        self._token: str | None = None
        self._expires: float = 0.0
        self.mint_count = 0

    def token(self) -> str:
        now = time.time()
        if self._token is None or now + self.margin_s >= self._expires:
            self.mint_count += 1
            self._token = f"tok-{self.mint_count}"
            self._expires = now + self.ttl_s
        return self._token


def _infer_field(name: str, value: object) -> StructField:
    if isinstance(value, bool):
        return StructField(name, BooleanType())
    if isinstance(value, int):
        return StructField(name, LongType())
    if isinstance(value, float):
        return StructField(name, DoubleType())
    return StructField(name, StringType())


def _cell(rec: dict, name: str, string_fields: frozenset[str]):
    """One output cell. Nested JSON values (lists/objects) whose field
    was inferred as StringType are re-serialized — the raw Python
    list/dict would fail Spark's type conversion at scan time."""
    v = rec.get(name)
    if (
        name in string_fields
        and v is not None
        and not isinstance(v, (str, int, float, bool))
    ):
        return json.dumps(v, separators=(",", ":"), sort_keys=True)
    return v


def _string_fields(schema: StructType) -> frozenset[str]:
    return frozenset(f.name for f in schema.fields if isinstance(f.dataType, StringType))


@dataclass
class PagePartition(InputPartition):
    """A page of the layer, addressed by BYTE offsets so each task seeks
    straight to its slice — line-index (islice) addressing would re-read
    and discard O(page_index) lines per task, turning the scan into
    O(pages x file)."""

    byte_start: int
    byte_end: int


class ArcGISSimReader(DataSourceReader):
    """Reader WITHOUT filter pushdown — the default, reuse-safe.

    Why pushdown is opt-in (measured on Spark 4.1.2, see
    tests/test_datasource.py::test_union_two_scans_same_relation):
    when one query scans the SAME relation twice with DIFFERENT pushed
    filters (e.g. the two branches of a union), Spark deduplicates the
    two BatchScans even though their Python-side pushed-filter state
    differs — the JVM scan-equality check cannot see it — and both
    branches read one branch's filtered output: silent wrong results.
    The ``arcgis_sim_pushdown`` format enables pushdown for single-scan
    queries (the reference's actual access pattern, one ARCGIS_QUERY per
    scheduled pull).
    """

    def __init__(self, schema: StructType, options: dict):
        self.schema = schema
        self.options = options
        self.path = options["path"]
        self.page_size = int(options.get("pagesize", 1000))
        self.pushed: list[Filter] = []
        # simulated auth handshake at plan time (A19)
        self._token = TokenBroker().token()

    def partitions(self) -> list[PagePartition]:
        """One partition per OID page — the esri-dump resultOffset window
        (task.ts:418), parallelized. One driver-side pass records the
        byte offset where every page starts; tasks then seek directly.
        """
        offsets = [0]
        with open(self.path, "rb") as fh:
            n_lines = 0
            for _line in fh:
                n_lines += 1
                if n_lines % self.page_size == 0:
                    offsets.append(fh.tell())
            file_end = fh.tell()
        if offsets[-1] != file_end:
            offsets.append(file_end)
        parts = [
            PagePartition(offsets[i], offsets[i + 1])
            for i in range(len(offsets) - 1)
            if offsets[i] < offsets[i + 1]
        ]
        return parts or [PagePartition(0, 0)]

    def _matches(self, rec: dict) -> bool:
        for f in self.pushed:
            v = rec.get(f.attribute[0])
            if isinstance(f, EqualTo):
                ok = v == f.value
            elif isinstance(f, GreaterThan):
                ok = v is not None and v > f.value
            elif isinstance(f, GreaterThanOrEqual):
                ok = v is not None and v >= f.value
            elif isinstance(f, LessThan):
                ok = v is not None and v < f.value
            elif isinstance(f, LessThanOrEqual):
                ok = v is not None and v <= f.value
            elif isinstance(f, In):
                ok = v in f.value
            elif isinstance(f, IsNotNull):
                ok = v is not None
            else:  # pragma: no cover
                ok = True
            if not ok:
                return False
        return True

    def read(self, partition: PagePartition):
        names = [f.name for f in self.schema.fields]
        top_group = self.options.get("topgroup")
        top_order = self.options.get("toporder")
        top_count = int(self.options.get("topcount", 0) or 0)
        rows = self._page_rows(partition, names)
        if not (top_group and top_order and top_count > 0):
            yield from rows
            return
        # A2 (TOP_FEATURES_ITER, task.ts:16-19,400): the queryTopFeatures
        # topFilter pushed into the scan as a PAGE-LOCAL group limit.
        # Every global winner lives in some page and is page-locally a
        # winner there too, so the union of per-page top-k is a SUPERSET
        # of the global top-k — the scan pre-reduces (like partial
        # aggregation) and the query-layer window finishes exactly.
        gi, oi = names.index(top_group), names.index(top_order)
        groups: dict = {}
        for row in rows:
            groups.setdefault(row[gi], []).append(row)
        for members in groups.values():
            members.sort(key=lambda r: (r[oi] is not None, r[oi]), reverse=True)
            yield from members[:top_count]

    def _page_rows(self, partition: PagePartition, names: list):
        sf = _string_fields(self.schema)
        with open(self.path, "rb") as fh:
            fh.seek(partition.byte_start)
            remaining = partition.byte_end - partition.byte_start
            while remaining > 0:
                line = fh.readline()
                if not line:
                    break
                remaining -= len(line)
                rec = json.loads(line)
                if self._matches(rec):
                    yield tuple(_cell(rec, n, sf) for n in names)


class ArcGISSimPushReader(ArcGISSimReader):
    """Reader WITH filter pushdown (``arcgis_sim_pushdown`` format) —
    absorbs the SQL-92-expressible filter classes into the paged read,
    yields the rest back to Catalyst. Safe when each relation is scanned
    once per query (see ArcGISSimReader docstring for the multi-scan
    hazard)."""

    def pushFilters(self, filters: list[Filter]):  # noqa: N802 (API name)
        for f in filters:
            if isinstance(
                f,
                (EqualTo, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, In, IsNotNull),
            ) and len(f.attribute) == 1:
                self.pushed.append(f)
            else:
                yield f  # unsupported -> evaluated by Spark above the scan


@dataclass
class ChunkCommit(WriterCommitMessage):
    path: str
    rows: int
    partition: int


def _sweep_stale_tmp(out_dir: str) -> None:
    """Remove orphaned ``.tmp-*`` attempt files from ``out_dir``.

    abort() only runs when the whole job/epoch fails, so the LOSING
    attempt of a task-level retry or speculative duplicate leaves its
    tmp file behind forever (round-3 ADVICE finding). The driver-side
    commit/abort barriers run strictly after every attempt of the epoch
    has finished (the next epoch cannot start first), so any ``.tmp-*``
    file still present there is garbage by construction — identifiable
    by prefix, safe to unlink."""
    import glob as _glob
    import os

    for stale in _glob.glob(f"{out_dir}/.tmp-*"):
        try:
            os.remove(stale)
        except OSError:
            pass


class ArcGISSimWriter(DataSourceWriter):
    """A17: append-only batch sink — one JSONL chunk per partition
    (chunked submit), commit barrier == Promise.allSettled
    (task.ts:358).

    Tasks write to ``.tmp-`` attempt files; only ``commit()`` renames
    them to their final ``chunk-*.jsonl`` names, and ``abort()`` deletes
    them — so a failed or partially-executed job never leaves
    committed-looking output in the target directory.
    """

    def __init__(self, schema: StructType, options: dict):
        self.schema = schema
        self.out_dir = options["path"]

    def write(self, iterator) -> ChunkCommit:
        import os
        import uuid

        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        os.makedirs(self.out_dir, exist_ok=True)
        tmp = f"{self.out_dir}/.tmp-{uuid.uuid4().hex}-{pid:05d}"
        names = [f.name for f in self.schema.fields]
        n = 0
        with open(tmp, "w") as fh:
            for row in iterator:
                fh.write(json.dumps(dict(zip(names, row))) + "\n")
                n += 1
        return ChunkCommit(path=tmp, rows=n, partition=pid)

    def commit(self, messages) -> None:
        import os

        for m in messages:
            final = f"{self.out_dir}/chunk-{m.partition:05d}.jsonl"
            os.replace(m.path, final)
        total = sum(m.rows for m in messages)
        _sweep_stale_tmp(self.out_dir)
        print(f"ok - submitted {total} features in {len(messages)} chunks")

    def abort(self, messages) -> None:
        import os

        for m in messages:
            try:
                os.remove(m.path)
            except OSError:
                pass
        _sweep_stale_tmp(self.out_dir)


class ArcGISSimStreamWriter(DataSourceStreamWriter):
    """A17 as a STREAMING sink — the reference's outgoing flow
    (task.ts:155-361: SQS micro-batch -> chunked submit) on Spark's
    stream-writer extension point. Each micro-batch writes one JSONL
    chunk per partition; ``commit(messages, batchId)`` is the
    allSettled barrier (task.ts:358), made idempotent with a
    per-batch marker file: a replayed batch (checkpoint recovery
    re-runs the last uncommitted epoch) sees its marker, discards the
    duplicate attempt files, and commits nothing twice — exactly-once
    delivery over an at-least-once replay, the property the
    reference's raw HTTP submit does NOT have (a Lambda retry
    re-posts the whole FeatureCollection).
    """

    def __init__(self, schema: StructType, options: dict):
        self.schema = schema
        self.out_dir = options["path"]

    def write(self, iterator) -> ChunkCommit:
        import os
        import uuid

        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        os.makedirs(self.out_dir, exist_ok=True)
        tmp = f"{self.out_dir}/.tmp-{uuid.uuid4().hex}-{pid:05d}"
        names = [f.name for f in self.schema.fields]
        n = 0
        with open(tmp, "w") as fh:
            for row in iterator:
                fh.write(json.dumps(dict(zip(names, row))) + "\n")
                n += 1
        return ChunkCommit(path=tmp, rows=n, partition=pid)

    def commit(self, messages, batchId: int) -> None:  # noqa: N803
        import glob as _glob
        import os

        marker = f"{self.out_dir}/_committed_{batchId}"
        if os.path.exists(marker):
            # replayed epoch: the batch is already durable — drop the
            # duplicate attempt files, commit nothing
            for m in messages:
                if m is not None:
                    try:
                        os.remove(m.path)
                    except OSError:
                        pass
            _sweep_stale_tmp(self.out_dir)
            return
        # No marker => the epoch is NOT durable yet, whatever partial
        # state a crashed earlier attempt left behind. Delete any
        # chunk-<batchId>-* leftovers BEFORE promoting: a replay may
        # legitimately produce a different partition count, and a stale
        # promoted chunk from the dead attempt would otherwise survive
        # as a duplicate orphan (round-3 ADVICE finding).
        for stale in _glob.glob(f"{self.out_dir}/chunk-{batchId:06d}-*.jsonl"):
            try:
                os.remove(stale)
            except OSError:
                pass
        total = 0
        for m in messages:
            if m is None:
                continue
            final = f"{self.out_dir}/chunk-{batchId:06d}-{m.partition:05d}.jsonl"
            os.replace(m.path, final)
            total += m.rows
        # marker write is itself atomic (tmp + rename): the epoch is
        # durable exactly when the marker exists
        marker_tmp = f"{marker}.tmp"
        with open(marker_tmp, "w") as fh:
            fh.write(str(total))
        os.replace(marker_tmp, marker)
        _sweep_stale_tmp(self.out_dir)
        print(f"ok - submitted {total} features (batch {batchId})")

    def abort(self, messages, batchId: int) -> None:  # noqa: N803
        import os

        for m in messages:
            if m is None:
                continue
            try:
                os.remove(m.path)
            except OSError:
                pass
        _sweep_stale_tmp(self.out_dir)


class ArcGISSimStreamReader(SimpleDataSourceStreamReader):
    """A1 + the schedule as a STREAMING source: the reference's incoming
    flow is a cron-scheduled incremental pull of the layer
    (task.ts:50-51 ``'Schedule'``; each invocation re-pages the REST
    endpoint). Structured Streaming is the idiomatic Spark spelling of
    exactly that loop: the engine owns the schedule (trigger), the
    checkpoint owns progress, and each micro-batch pulls the next page
    window.

    Offset = byte position into the simulated layer file (monotone,
    replayable). ``read`` advances at most ``pagesPerBatch`` pages per
    micro-batch — the scheduled-pull page budget; ``readBetweenOffsets``
    re-reads a committed byte range verbatim for recovery, so a batch
    replayed after a crash yields bit-identical rows (exactly-once with
    an idempotent sink, the same guarantee the reference approximates
    with its upsert key)."""

    def __init__(self, schema: StructType, options: dict):
        self.schema = schema
        self.names = [f.name for f in schema.fields]
        self.path = options["path"]
        self.page_size = int(options.get("pagesize", 1000))
        self.pages_per_batch = int(options.get("pagesperbatch", 1))
        self._token = TokenBroker().token()

    def initialOffset(self) -> dict:
        return {"byte": 0}

    def read(self, start: dict):
        rows = []
        with open(self.path, "rb") as fh:
            fh.seek(start["byte"])
            budget = self.page_size * self.pages_per_batch
            while budget > 0:
                line = fh.readline()
                if not line:
                    break
                rows.append(json.loads(line))
                budget -= 1
            end = fh.tell()
        sf = _string_fields(self.schema)
        return (
            iter([tuple(_cell(r, n, sf) for n in self.names) for r in rows]),
            {"byte": end},
        )

    def readBetweenOffsets(self, start: dict, end: dict):
        sf = _string_fields(self.schema)
        with open(self.path, "rb") as fh:
            fh.seek(start["byte"])
            remaining = end["byte"] - start["byte"]
            while remaining > 0:
                line = fh.readline()
                if not line:
                    break
                remaining -= len(line)
                rec = json.loads(line)
                yield tuple(_cell(rec, n, sf) for n in self.names)


class ArcGISSimDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self) -> StructType:
        """A5: layer schema from field metadata (≅ dumper.schema(),
        task.ts:78) — inferred over the first 100 records, keeping
        first-seen key order and the first NON-NULL value per key, so a
        null or missing field in record 1 neither pins the column to
        string nor drops it."""
        samples: dict[str, object] = {}
        with open(self.options["path"]) as fh:
            for line in islice(fh, 100):
                for k, v in json.loads(line).items():
                    if k not in samples or samples[k] is None:
                        samples[k] = v
        return StructType([_infer_field(k, v) for k, v in samples.items()])

    def reader(self, schema: StructType) -> ArcGISSimReader:
        return ArcGISSimReader(schema, dict(self.options))

    def writer(self, schema: StructType, overwrite: bool) -> ArcGISSimWriter:
        return ArcGISSimWriter(schema, dict(self.options))

    def simpleStreamReader(self, schema: StructType) -> ArcGISSimStreamReader:  # noqa: N802
        return ArcGISSimStreamReader(schema, dict(self.options))

    def streamWriter(self, schema: StructType, overwrite: bool) -> ArcGISSimStreamWriter:  # noqa: N802
        return ArcGISSimStreamWriter(schema, dict(self.options))


class ArcGISSimPushdownDataSource(ArcGISSimDataSource):
    @classmethod
    def name(cls) -> str:
        return "arcgis_sim_pushdown"

    def reader(self, schema: StructType) -> ArcGISSimPushReader:
        return ArcGISSimPushReader(schema, dict(self.options))


def register(spark) -> None:
    spark.dataSource.register(ArcGISSimDataSource)
    spark.dataSource.register(ArcGISSimPushdownDataSource)
