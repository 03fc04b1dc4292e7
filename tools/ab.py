"""Ad-hoc same-process A/B timing for bench experiments.

Host load makes cross-run comparisons untrustworthy (±20-30%); this
harness times variants interleaved in ONE session, median of N, so only
the variant differs. Edit VARIANTS below per experiment.

Usage: python tools/ab.py
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("SPARK_GRAFT_CACHE", "1")

from etl_arcgis_spark.helpers import r4_sql  # noqa: E402
from etl_arcgis_spark.session import get_session  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

RUNNING = f"""
SELECT event_id, user_id, unix_micros(ts) AS us,
       {r4_sql("sum(value) OVER (PARTITION BY user_id ORDER BY unix_micros(ts), event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)")} AS running
FROM {{t}}
"""

TUMBLE = f"""
SELECT (unix_micros(ts) div 3600000000) * 3600000 AS w_start_ms, event_type,
       count(1) AS n, {r4_sql("sum(value)")} AS val_sum
FROM {{t}}
GROUP BY 1, 2
"""


def mat(df):
    df.write.format("noop").mode("overwrite").save()


def timeit(fn, n=7):
    mat(fn())
    mat(fn())
    runs = []
    for _ in range(n):
        t0 = time.perf_counter()
        mat(fn())
        runs.append(time.perf_counter() - t0)
    return statistics.median(runs)


def main():
    spark = get_session("ab", shuffle_partitions=4)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.inMemoryColumnarStorage.compressed", "false")
    spark.conf.set("spark.sql.inMemoryColumnarStorage.batchSize", "65536")

    for w in (2, 4, 8):
        df = spark.read.parquet(f"{SF}/events.parquet").repartition(w, "user_id").cache()
        df.createOrReplaceTempView(f"e{w}")
        df.count()

    variants = {}
    for w in (2, 4, 8):
        variants[f"run_e{w}"] = (lambda w=w: spark.sql(RUNNING.format(t=f"e{w}")))
        variants[f"tum_e{w}"] = (lambda w=w: spark.sql(TUMBLE.format(t=f"e{w}")))

    acc = {k: [] for k in variants}
    for _ in range(2):
        for k, fn in variants.items():
            acc[k].append(timeit(fn))
    for k, ts in acc.items():
        sys.stdout.write(f"RESULT {k:16s} {min(ts)*1000:7.1f} ms\n")
    spark.stop()


if __name__ == "__main__":
    main()
