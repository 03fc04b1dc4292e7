"""Cross-PROCESS commit-race test for the acid table format.

The threaded races in test_acid.py share one JVM; the atomicity claim
acid._publish actually makes (os.link EEXIST = lost the race) is about
separate OS processes. Here two subprocesses, each with its OWN
SparkSession, interleave merges on the same table while the parent
runs vacuum sweeps — asserting that every commit lands exactly once
(no lost snapshot: the final version equals 1 + total merges and the
parent chain is gap-free), that losers retried rather than clobbered,
and that a grace-windowed vacuum never deletes a file any surviving
manifest references. (VERDICT r6 'next round' #4.)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import textwrap

import pytest

from etl_arcgis_spark import acid

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WRITER = textwrap.dedent(
    """
    import json, sys
    sys.path.insert(0, {repo!r})
    from pyspark.sql import SparkSession
    from etl_arcgis_spark import acid

    root, writer_id, n_merges = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    spark = (
        SparkSession.builder.master("local[2]")
        .appName(f"race-writer-{{writer_id}}")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    versions = []
    for i in range(n_merges):
        # disjoint key ranges per writer; every merge inserts 3 new keys
        base = 1000 * writer_id + 10 * i
        src = spark.createDataFrame(
            [(base + j, f"w{{writer_id}}m{{i}}r{{j}}") for j in range(3)],
            "id INT, v STRING",
        )
        # generous retry budget: the race is real contention, not a
        # test of the retry ceiling
        versions.append(acid.merge(spark, root, src, max_retries=50))
    print(json.dumps({{"writer": writer_id, "versions": versions}}))
    spark.stop()
    """
)


def test_two_process_writers_and_vacuum_no_lost_snapshot(spark, tmp_path):
    root = str(tmp_path / "racetbl")
    base = spark.createDataFrame([(1, "seed")], "id INT, v STRING")
    acid.create(spark, root, base, key="id")

    n_merges = 4
    script = _WRITER.format(repo=_REPO)
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", script, root, str(w), str(n_merges)],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
        )
        for w in (1, 2)
    ]
    # parent interleaves vacuum sweeps while the writers race: the
    # 1-hour grace window must protect every in-flight writer's files
    deleted: list[str] = []
    import time

    while any(p.poll() is None for p in procs):
        deleted += acid.vacuum(root, keep_versions=2, grace_seconds=3600.0)
        time.sleep(0.5)
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, f"writer failed:\n{err[-3000:]}"
        outs.append(json.loads(out.strip().splitlines()[-1]))

    # every commit landed exactly once: versions 2..(1 + 2*n_merges)
    # were each claimed by exactly one writer (os.link atomicity —
    # two writers returning the same version would mean a clobbered
    # snapshot), with no gaps
    claimed = sorted(v for o in outs for v in o["versions"])
    assert claimed == list(range(2, 2 + 2 * n_merges))
    assert acid.current_version(root) == 1 + 2 * n_merges
    # surviving manifests (vacuum expires old snapshots) chain cleanly
    for v in acid._list_versions(root):
        man = acid._read_manifest(root, v)
        assert man["version"] == v
        if v > 1:
            assert man["parent"] == v - 1

    # no lost rows: seed + every writer's inserts all present
    rows = {(r.id, r.v) for r in acid.read(spark, root).collect()}
    expect = {(1, "seed")}
    for w in (1, 2):
        for i in range(n_merges):
            for j in range(3):
                expect.add((1000 * w + 10 * i + j, f"w{w}m{i}r{j}"))
    assert rows == expect

    # the grace-windowed vacuum deleted nothing young; every file the
    # final snapshot references still exists
    man = acid._read_manifest_or_raise(root)
    for f in man["files"]:
        assert os.path.exists(os.path.join(root, f["path"])), f["path"]
