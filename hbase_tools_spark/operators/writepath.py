"""Write-path semantics (M6): SC11 — the reference's buffered-mutator
merge (SequenceBufferedMutator.java:201-300): per rowkey+qualifier the
last write wins, and a delete tombstone masks everything before it.

Spark model: the mutation log is a DataFrame with a monotonically
increasing ``seq``; dedup = one window pass partitioned by the natural
key.  On Delta/Iceberg this becomes MERGE INTO; the window form is the
engine-agnostic batch equivalent and shuffles once on the upsert key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import Model
from ..registry import query


@query(
    "upsert_dedup",
    oracle="""
SELECT row_key, qualifier, seq, val
FROM (
  SELECT row_key, qualifier, seq, val, is_delete,
         row_number() OVER (PARTITION BY row_key, qualifier ORDER BY seq DESC) AS rn
  FROM mutations
) t
WHERE rn = 1 AND NOT is_delete
""",
    views=["mutations"],
)
def upsert_dedup(m: Model) -> DataFrame:
    """SC11 — last-write-wins upsert with delete tombstones: keep the
    highest-seq mutation per (row_key, qualifier); if it is a delete the
    cell disappears."""
    w = Window.partitionBy("row_key", "qualifier").orderBy(F.desc("seq"))
    return (
        m.mutations.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (~F.col("is_delete")))
        .select("row_key", "qualifier", "seq", "val")
    )


@query(
    "mutation_replay_counts",
    oracle="""
SELECT row_key,
       CAST(count(*) AS BIGINT) AS mutations,
       CAST(sum(CASE WHEN is_delete THEN 1 ELSE 0 END) AS BIGINT) AS deletes,
       max(seq) AS last_seq
FROM mutations
GROUP BY row_key
""",
    views=["mutations"],
)
def mutation_replay_counts(m: Model) -> DataFrame:
    """SC11-audit — per-rowkey mutation/delete counts, the batch-side
    stats the reference's merge buffer tracks while deduping."""
    return m.mutations.groupBy("row_key").agg(
        F.count(F.lit(1)).alias("mutations"),
        F.sum(F.when(F.col("is_delete"), 1).otherwise(0)).alias("deletes"),
        F.max("seq").alias("last_seq"),
    )
