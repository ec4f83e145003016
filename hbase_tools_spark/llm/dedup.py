"""Near-duplicate detection (M8): n-gram Jaccard and MinHash+LSH — the
scale path for fuzzy dedup over a training corpus.

Plan shape at 100 TB:
  * shingling is a narrow per-doc transform (explode);
  * the pair-candidate join keys on shingle / band-hash — skew-prone on
    hot shingles, which is why the Jaccard variant joins on *distinct*
    shingles and MinHash-LSH replaces the shingle join with a fixed
    number of band-hash buckets (16 hashes, 4 bands here);
  * verification (exact Jaccard) runs only on candidate pairs.
AQE skew-join handles residual hot buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..catalog import Model
from ..functions.exprs import fround
from ..registry import query

_SHINGLE = 5          # words per shingle
_MINHASHES = 16       # minhash functions
_BANDS = 4            # LSH bands (4 rows each)
_JACCARD_T = 0.5      # similarity threshold

# Shared shingle CTE (DuckDB dialect); Spark side built with
# sequence/transform below — both produce identical shingle strings.
_SHINGLES_SQL = f"""
SELECT doc_id, unnest(list_distinct(
         list_transform(range(1, greatest(len(toks) - {_SHINGLE - 2}, 1)),
                        i -> array_to_string(toks[i:i+{_SHINGLE - 1}], ' '))
       )) AS shingle
FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents) t
WHERE len(toks) >= {_SHINGLE}
"""


def _shingles(m: Model) -> DataFrame:
    toks = F.split(F.col("text"), " ")
    sh = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (_SHINGLE - 1)),
        lambda i: F.array_join(F.slice(toks, i, _SHINGLE), " "),
    )
    return (
        m.documents.select("doc_id", toks.alias("toks"))
        .filter(F.size("toks") >= _SHINGLE)
        .select("doc_id", F.explode(F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size("toks") - (_SHINGLE - 1)),
                lambda i: F.array_join(F.slice(F.col("toks"), i, _SHINGLE), " "),
            )
        )).alias("shingle"))
    )


@query(
    "ngram_jaccard_pairs",
    oracle=f"""
WITH sh AS ({_SHINGLES_SQL}),
sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY 1),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(count(*) AS BIGINT) AS c
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       floor((c * 1.0 / (sa.n + sb.n - c)) * 1000000.0 + 0.5) / 1000000.0 AS jaccard
FROM common
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE c * 1.0 / (sa.n + sb.n - c) >= {_JACCARD_T}
""",
    views=[],
)
def ngram_jaccard_pairs(m: Model) -> DataFrame:
    """Word-{5}-gram Jaccard near-dup pairs >= {0.5}: inverted-index join
    on distinct shingles, then |A∩B| / (|A|+|B|-|A∩B|)."""
    sh = _shingles(m)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    jac = F.col("c") * 1.0 / (F.col("na") + F.col("nb") - F.col("c"))
    return (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(jac >= _JACCARD_T)
        .select("doc_a", "doc_b", fround(jac, 6).alias("jaccard"))
    )


_MINHASH_SQL = f"""
SELECT doc_id, i, min(md5(concat(CAST(i AS VARCHAR), '|', shingle))) AS mh
FROM ({_SHINGLES_SQL}) sh
CROSS JOIN (SELECT unnest(range(0, {_MINHASHES})) AS i) seeds
GROUP BY 1, 2
"""


def _minhash_signatures(m: Model) -> DataFrame:
    """MinHash signatures: sig[i] = min over distinct shingles of
    md5(i || '|' || shingle).  md5 hex strings compare identically in
    both engines, making the signature engine-portable (unlike
    Spark's hash() or DuckDB's hash()).

    Computed entirely with narrow array expressions — per document:
    ``transform(seeds, i -> array_min(transform(shingles, s -> md5(..))))``.
    No explode, no cross join, no shuffle: at 100 TB the signature pass
    is a pure map stage; only the tiny (doc_id, band_hash) relation ever
    shuffles (in the LSH join below)."""
    toks = F.split(F.col("text"), " ")
    shingles = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size("toks") - (_SHINGLE - 1)),
            lambda i: F.array_join(F.slice(F.col("toks"), i, _SHINGLE), " "),
        )
    )
    seeds = F.sequence(F.lit(0), F.lit(_MINHASHES - 1))
    sig = F.transform(
        seeds,
        lambda i: F.array_min(
            F.transform(
                F.col("shingles"),
                lambda s: F.md5(
                    F.concat(i.cast("string"), F.lit("|"), s).cast("binary")
                ),
            )
        ),
    )
    # CPU-bound narrow map: spread it over every core even when the
    # source is a single parquet file (fixture case). On a real corpus
    # the file count already provides this fan-out.
    n_parts = m.spark.sparkContext.defaultParallelism
    return (
        m.documents.select("doc_id", toks.alias("toks"))
        .filter(F.size("toks") >= _SHINGLE)
        .repartition(n_parts, "doc_id")
        .select("doc_id", shingles.alias("shingles"))
        .select("doc_id", sig.alias("sig"))
    )


@query(
    "minhash_band_pairs",
    oracle=f"""
WITH mh AS ({_MINHASH_SQL}),
bands AS (
  SELECT doc_id, CAST(floor(i / {_MINHASHES // _BANDS}) AS BIGINT) AS band,
         md5(string_agg(mh, '|' ORDER BY i)) AS band_hash
  FROM mh
  GROUP BY 1, 2
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM bands a
JOIN bands b ON a.band = b.band AND a.band_hash = b.band_hash
            AND a.doc_id < b.doc_id
""",
    views=[],
)
def minhash_band_pairs(m: Model) -> DataFrame:
    """MinHash-LSH candidate pairs: {16} md5-minhashes, {4} bands of
    {4}; docs sharing any band hash are candidates.  The band-hash join
    replaces the O(shingle-fanout) pair join — the 100 TB dedup path."""
    sig = _minhash_signatures(m)
    rows_per_band = _MINHASHES // _BANDS
    band_ids = F.sequence(F.lit(0), F.lit(_BANDS - 1))
    bands = sig.select(
        "doc_id",
        F.explode(
            F.transform(
                band_ids,
                lambda b: F.struct(
                    b.cast("bigint").alias("band"),
                    F.md5(
                        F.array_join(
                            F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band),
                            "|",
                        ).cast("binary")
                    ).alias("band_hash"),
                ),
            )
        ).alias("bh"),
    ).select("doc_id", "bh.band", "bh.band_hash")
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
