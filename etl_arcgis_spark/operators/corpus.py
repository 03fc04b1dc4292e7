"""End-to-end training-corpus cleaning funnel — the LLM-pipeline
operators composed into one verified dataflow.

Every stage reuses the exact semantics of its standalone operator
(thresholds included), so this is the integration proof that the
pieces compose: quality gate (text.py text_quality_gate) -> exact
dedup (dedup.py dedup_exact, keep-lowest) -> bigram-Jaccard near-dup
drop (dedup.py dedup_ngram_jaccard, source-blocked) -> benchmark
n-gram decontamination (dedup.py dedup_decontaminate_ngrams). The
output is the funnel: per-stage surviving document counts — the
number every data-curation run reports — hash-checked against a
DuckDB oracle that replays the whole pipeline.

Scale: each stage is the standalone operator's plan (documented
there); composition adds NO new shuffle shapes — the funnel counts
are map-side-combined aggregates over each stage's output. At 100 TB
the stages materialize to parquet between runs (checkpointing the
funnel); here they fuse into one plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..registry import query
from ..tables import sql_over

# Spark-side pipeline (one spark.sql text — see tables.sql_over).
_SPARK_FUNNEL = """
WITH t AS (
  SELECT doc_id, source, text, split(text, ' ') AS l FROM documents
), g AS (
  SELECT doc_id, source, text, l, size(l) AS n_tokens,
         CASE WHEN size(l) >= 2 THEN
           1.0 - CAST(size(array_distinct(transform(
                 sequence(1, size(l) - 1),
                 i -> concat(element_at(l, i), ' ', element_at(l, i + 1))))) AS DOUBLE)
               / (size(l) - 1)
         ELSE 1.0 END AS rep
  FROM t
), gated AS (
  SELECT doc_id, source, text, l FROM g
  WHERE n_tokens >= 20 AND n_tokens <= 90 AND rep <= 0.2
), exact AS (
  SELECT doc_id, source, l FROM (
    SELECT doc_id, source, l,
           row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
    FROM gated
  ) WHERE rn = 1
), grams AS (
  SELECT DISTINCT doc_id, source, bg FROM (
    SELECT doc_id, source,
           explode(transform(sequence(1, size(l) - 1),
                   i -> concat(element_at(l, i), ' ', element_at(l, i + 1)))) AS bg
    FROM exact
  )
), sizes AS (
  SELECT doc_id, count(1) AS n_grams FROM grams GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(1) AS n_inter
  FROM grams a JOIN grams b
    ON a.source = b.source AND a.bg = b.bg AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
), neardup_drop AS (
  SELECT DISTINCT id_b AS doc_id
  FROM inter
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
  WHERE CAST(n_inter AS DOUBLE) / (sa.n_grams + sb.n_grams - n_inter) >= 0.2
), neard AS (
  SELECT e.doc_id, e.l FROM exact e
  WHERE NOT EXISTS (SELECT 1 FROM neardup_drop d WHERE d.doc_id = e.doc_id)
), g4 AS (
  SELECT doc_id,
         explode(transform(sequence(1, size(l) - 3),
                 i -> concat_ws(' ', slice(l, i, 4)))) AS g4g
  FROM t WHERE size(l) >= 4
), bench AS (
  SELECT DISTINCT g4g FROM g4 WHERE doc_id % 97 = 0
), contaminated AS (
  SELECT DISTINCT c.doc_id
  FROM g4 c JOIN bench b ON c.g4g = b.g4g
  WHERE c.doc_id % 97 <> 0
), clean AS (
  SELECT n.doc_id FROM neard n
  WHERE n.doc_id % 97 <> 0
    AND NOT EXISTS (SELECT 1 FROM contaminated c WHERE c.doc_id = n.doc_id)
)
SELECT * FROM (
  SELECT 1 AS stage_idx, 'raw' AS stage, count(1) AS n_docs FROM t
  UNION ALL
  SELECT 2, 'quality_gated', count(1) FROM gated
  UNION ALL
  SELECT 3, 'exact_deduped', count(1) FROM exact
  UNION ALL
  SELECT 4, 'near_deduped', count(1) FROM neard
  UNION ALL
  SELECT 5, 'decontaminated', count(1) FROM clean
)
"""

_ORACLE_FUNNEL = """
WITH t AS (
  SELECT doc_id, source, text, string_split(text, ' ') AS l FROM documents
), g AS (
  SELECT doc_id, source, text, l, len(l) AS n_tokens,
         CASE WHEN len(l) >= 2 THEN
           1.0 - CAST(len(list_distinct(list_transform(
                 generate_series(1, len(l) - 1),
                 i -> l[i] || ' ' || l[i + 1]))) AS DOUBLE) / (len(l) - 1)
         ELSE 1.0 END AS rep
  FROM t
), gated AS (
  SELECT doc_id, source, text, l FROM g
  WHERE n_tokens >= 20 AND n_tokens <= 90 AND rep <= 0.2
), exact AS (
  SELECT doc_id, source, l FROM (
    SELECT doc_id, source, l,
           row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
    FROM gated
  ) WHERE rn = 1
), grams AS (
  SELECT DISTINCT doc_id, source, bg FROM (
    SELECT doc_id, source,
           unnest(list_transform(generate_series(1, len(l) - 1),
                                 i -> l[i] || ' ' || l[i + 1])) AS bg
    FROM exact
  )
), sizes AS (
  SELECT doc_id, count(*) AS n_grams FROM grams GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
  FROM grams a JOIN grams b
    ON a.source = b.source AND a.bg = b.bg AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
), neardup_drop AS (
  SELECT DISTINCT id_b AS doc_id
  FROM inter
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
  WHERE CAST(n_inter AS DOUBLE) / (sa.n_grams + sb.n_grams - n_inter) >= 0.2
), neard AS (
  SELECT e.doc_id, e.l FROM exact e
  WHERE NOT EXISTS (SELECT 1 FROM neardup_drop d WHERE d.doc_id = e.doc_id)
), g4 AS (
  SELECT doc_id, array_to_string(l[i:i+3], ' ') AS g4g
  FROM t, UNNEST(generate_series(1, len(l) - 3)) AS u(i)
  WHERE len(l) >= 4
), bench AS (
  SELECT DISTINCT g4g FROM g4 WHERE doc_id % 97 = 0
), contaminated AS (
  SELECT DISTINCT c.doc_id
  FROM g4 c JOIN bench b ON c.g4g = b.g4g
  WHERE c.doc_id % 97 <> 0
), clean AS (
  SELECT n.doc_id FROM neard n
  WHERE n.doc_id % 97 <> 0
    AND NOT EXISTS (SELECT 1 FROM contaminated c WHERE c.doc_id = n.doc_id)
)
SELECT * FROM (
  SELECT 1 AS stage_idx, 'raw' AS stage, count(*) AS n_docs FROM t
  UNION ALL
  SELECT 2, 'quality_gated', count(*) FROM gated
  UNION ALL
  SELECT 3, 'exact_deduped', count(*) FROM exact
  UNION ALL
  SELECT 4, 'near_deduped', count(*) FROM neard
  UNION ALL
  SELECT 5, 'decontaminated', count(*) FROM clean
)
"""


@query("corpus_clean_funnel", oracle=_ORACLE_FUNNEL)
def corpus_clean_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full corpus-cleaning pipeline as ONE verified dataflow:

      raw -> quality gate (20<=tokens<=90, bigram repetition <= 0.2)
          -> exact dedup (md5, keep lowest doc_id)
          -> near-dup drop (source-blocked bigram Jaccard >= 0.2,
             greedy keep-lowest: any doc that is the higher id of a
             near-dup pair is dropped)
          -> benchmark decontamination (shared word-4-gram with the
             doc_id%97 held-out slice; the slice itself leaves the
             corpus too)

    Emits per-stage surviving counts (the curation funnel report).
    Stage semantics and thresholds are identical to the standalone
    operators (text_quality_gate, dedup_exact, dedup_ngram_jaccard,
    dedup_decontaminate_ngrams) — this query is the proof they
    compose, end to end, bit-identically on both engines."""
    return sql_over(spark, sf_dir, _SPARK_FUNNEL, ("documents",))
