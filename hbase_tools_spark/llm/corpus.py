"""Corpus vocabulary / keyword / entropy operators (training-pipeline
extension, SURVEY.md §7 M8): the token-statistics half of corpus
curation — vocabulary inventories for tokenizer training, per-document
keyword extraction (tf-idf), and character-entropy quality scoring.

Scale notes (100 TB):
  * the vocabulary build is the canonical two-phase word count — the
    (doc, word) pre-aggregate bounds the word shuffle at one row per
    distinct word per doc (map-side partials), and the global top-k is
    a ``TakeOrderedAndProject`` (per-partition heaps merged on one
    reducer over k rows), never a global sort;
  * tf-idf reuses the same (doc, word) relation for both tf and df via
    one ``localCheckpoint`` — the df join keys on ``word`` (corpus-
    proportional cardinality, no skew beyond natural Zipf, which the
    heavy-hitter detector in operators/analyzer.py is for) and the
    corpus size rides as a broadcast 1-row relation;
  * entropy is a pure narrow map (one Arrow batch pass, zero
    shuffles) — constant memory per batch, partition-parallel.

Float discipline: the JVM's ``Math.log``/``log2`` disagree with libm
(and hence DuckDB) in the last ulp on ~7%/30% of inputs (measured over
integer grids), so every logarithm here is computed in PYTHON (libm,
bit-identical with DuckDB — 0/5000 mismatches on the same grids) via
Arrow-batched UDFs, and order-dependent double sums are made exact by
per-term DECIMAL quantization (the ``dsum`` discipline, exprs.py).
"""

from __future__ import annotations

import math
from collections import Counter
from decimal import ROUND_HALF_UP, Decimal

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import Model
from ..functions.exprs import fround, fround_sql
from ..registry import query

_VOCAB_K = 200   # vocabulary inventory size (top terms by frequency)
_TFIDF_K = 3     # keywords kept per document
_ENTROPY_MIN = 3.5  # bits/char below which text is flagged low-entropy

#: Shared (doc_id, word, c) pre-aggregate — the standard word-count
#: backbone (split on single spaces; the fixture generator emits
#: single-space-joined tokens, and DuckDB's string_split agrees with
#: Spark's split on that contract).
_WC_SQL = """
SELECT doc_id, word, count(*) AS c
FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
      FROM documents) w
GROUP BY doc_id, word
"""


def _wc(m: Model) -> DataFrame:
    return (
        m.documents.select(
            "doc_id", F.explode(F.split(F.col("text"), " ")).alias("word")
        )
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).alias("c"))
    )


@query(
    "vocab_top_terms",
    oracle=f"""
SELECT word, n_occurrences, n_docs, CAST(rank AS BIGINT) AS rank
FROM (
  SELECT word,
         CAST(sum(c) AS BIGINT)   AS n_occurrences,
         CAST(count(*) AS BIGINT) AS n_docs,
         ROW_NUMBER() OVER (ORDER BY sum(c) DESC, word) AS rank
  FROM ({_WC_SQL}) wc
  GROUP BY word
) v
WHERE rank <= {_VOCAB_K}
""",
    views=[],
)
def vocab_top_terms(m: Model) -> DataFrame:
    """Corpus vocabulary inventory: the top-{200} terms by total
    occurrence count with their document frequency and Zipf rank — the
    relation a tokenizer-training (BPE seed vocab) or stopword-mining
    step consumes.

    Two-phase count (per-doc then global) keeps the word shuffle at one
    row per distinct (doc, word) with map-side partials; the global
    top-k is ``orderBy().limit(k)`` — Catalyst plans a
    ``TakeOrderedAndProject`` (per-partition bounded heaps, one k-row
    merge), so no global sort ever materializes at 100 TB.  The rank
    window then runs over the k surviving rows only."""
    vocab = _wc(m).groupBy("word").agg(
        F.sum("c").cast("bigint").alias("n_occurrences"),
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
    )
    top = vocab.orderBy(F.col("n_occurrences").desc(), "word").limit(_VOCAB_K)
    rank = F.row_number().over(
        Window.orderBy(F.col("n_occurrences").desc(), "word")
    )
    return top.select(
        "word", "n_occurrences", "n_docs", rank.cast("bigint").alias("rank")
    )


@query(
    "tfidf_top_terms",
    oracle=f"""
WITH wc AS ({_WC_SQL}),
dfr AS (SELECT word, count(*) AS df FROM wc GROUP BY word),
nd AS (SELECT count(*) AS n_docs FROM documents)
SELECT doc_id, term, tf, doc_freq, tfidf, CAST(rank AS BIGINT) AS rank
FROM (
  SELECT wc.doc_id,
         wc.word                 AS term,
         CAST(wc.c AS BIGINT)    AS tf,
         CAST(dfr.df AS BIGINT)  AS doc_freq,
         {fround_sql('wc.c * ln((nd.n_docs + 1.0) / (dfr.df + 1.0))', 6)} AS tfidf,
         ROW_NUMBER() OVER (
           PARTITION BY wc.doc_id
           ORDER BY wc.c * ln((nd.n_docs + 1.0) / (dfr.df + 1.0)) DESC, wc.word
         ) AS rank
  FROM wc JOIN dfr USING (word) CROSS JOIN nd
) t
WHERE rank <= {_TFIDF_K}
""",
    views=[],
)
def tfidf_top_terms(m: Model) -> DataFrame:
    """Keyword extraction: the top-{3} terms per document by tf-idf
    (``tf * ln((N+1)/(df+1))``, the smoothed form) — the per-doc topic
    signal a curriculum/clustering step consumes.

    The (doc, word) counts are computed ONCE (localCheckpoint) and
    reused for tf and for df; the df join keys on ``word`` and the
    corpus size N rides as a broadcast 1-row relation.  The logarithm
    runs through an Arrow-batched Python UDF, NOT ``F.log``: the JVM's
    ``Math.log`` differs from libm/DuckDB in the last ulp (336/5000
    inputs on the (N+1)/(df+1) grid), which would poison the rounded
    output hash — the UDF input is the JVM-computed double ratio, so
    both engines take libm-log of bit-identical arguments.  Ranking
    compares the raw (pre-round) scores; ties break on the term."""
    wc = _wc(m).localCheckpoint(eager=True)
    dfr = wc.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    nd = F.broadcast(m.documents.agg(F.count(F.lit(1)).alias("n_docs")))

    @F.pandas_udf("double")
    def ln_libm(x: pd.Series) -> pd.Series:
        return x.map(math.log)

    ratio = (F.col("n_docs") + F.lit(1.0)) / (F.col("df") + F.lit(1.0))
    scored = (
        wc.join(dfr, "word")
        .crossJoin(nd)
        .withColumn("score", F.col("c") * ln_libm(ratio))
    )
    rank = F.row_number().over(
        Window.partitionBy("doc_id").orderBy(F.col("score").desc(), "word")
    )
    return (
        scored.withColumn("rank", rank)
        .where(F.col("rank") <= _TFIDF_K)
        .select(
            "doc_id",
            F.col("word").alias("term"),
            F.col("c").cast("bigint").alias("tf"),
            F.col("df").cast("bigint").alias("doc_freq"),
            fround(F.col("score"), 6).alias("tfidf"),
            F.col("rank").cast("bigint"),
        )
    )


def _entropy_of(text: str) -> tuple[int, int, float]:
    """(n_chars, n_unique, entropy@6dp) — the Python reference both
    engines must agree with.  H = log2(n) - (Σ c·log2 c)/n with the
    order-dependent double sum made exact: each term is quantized to
    12 decimals (matching DuckDB's CAST to DECIMAL(28,12)), summed as
    decimals, and the total re-quantized to 6 decimals before the one
    double division (matching ``round(s, 6)``)."""
    n = len(text)
    cnt = Counter(text)
    q12, q6 = Decimal("1e-12"), Decimal("1e-6")
    total = Decimal(0)
    for c in cnt.values():
        total += Decimal(c * math.log2(c)).quantize(q12, ROUND_HALF_UP)
    s6 = total.quantize(q6, ROUND_HALF_UP)
    h = math.log2(n) - float(s6) / n
    return n, len(cnt), math.floor(h * 1e6 + 0.5) / 1e6


@query(
    "docs_char_entropy",
    oracle=f"""
SELECT doc_id,
       CAST(n AS BIGINT) AS n_chars,
       CAST(u AS BIGINT) AS n_unique_chars,
       entropy,
       entropy < {_ENTROPY_MIN} AS low_entropy
FROM (
  SELECT doc_id, n, u,
         {fround_sql('log2(CAST(n AS DOUBLE)) - CAST(round(s, 6) AS DOUBLE) / n', 6)} AS entropy
  FROM (
    SELECT doc_id, sum(c) AS n, count(*) AS u,
           sum(CAST(c * log2(CAST(c AS DOUBLE)) AS DECIMAL(28,12))) AS s
    FROM (
      SELECT doc_id, ch, count(*) AS c
      FROM (SELECT doc_id, substr(text, CAST(i AS INTEGER), 1) AS ch
            FROM (SELECT doc_id, text, unnest(range(1, len(text) + 1)) AS i
                  FROM documents WHERE len(text) > 0) t) chs
      GROUP BY doc_id, ch
    ) cc
    GROUP BY doc_id
  ) agg
) e
""",
    views=[],
)
def docs_char_entropy(m: Model) -> DataFrame:
    """Character-entropy quality signal: Shannon entropy (bits/char) of
    each document's character distribution, flagging low-entropy text
    (boilerplate, padding, binary-ish runs — the classic cheap
    complement to the word-level Gopher filters in
    :func:`~hbase_tools_spark.llm.pipeline.docs_repetition_ratio`).

    One Arrow-batched pass over (doc_id, text) — a pure narrow map,
    zero shuffles at any scale (the oracle's explode/regroup form would
    shuffle one row per (doc, char); counting inside the UDF keeps the
    whole histogram worker-local).  All logs are Python/libm (the JVM
    disagrees with DuckDB in the last ulp) and the per-char terms are
    decimal-quantized before summing so the sum is order-independent —
    see :func:`_entropy_of` for the exact cross-engine contract."""

    @F.pandas_udf("n_chars: bigint, n_unique_chars: bigint, entropy: double")
    def ent(texts: pd.Series) -> pd.DataFrame:
        rows = [_entropy_of(t) for t in texts]
        return pd.DataFrame(rows, columns=["n_chars", "n_unique_chars", "entropy"])

    return (
        m.documents.where(F.length("text") > 0)
        .select("doc_id", ent("text").alias("e"))
        .select(
            "doc_id",
            "e.n_chars",
            "e.n_unique_chars",
            "e.entropy",
            (F.col("e.entropy") < _ENTROPY_MIN).alias("low_entropy"),
        )
    )
