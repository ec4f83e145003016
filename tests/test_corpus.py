"""Semantic tests for the corpus-analysis and event-analytics operators
(llm/corpus.py, operators/analyzer.py events section, dedup survivors)
— properties the differential gate can't express."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

import hbase_tools_spark.llm  # noqa: F401
import hbase_tools_spark.operators  # noqa: F401
from hbase_tools_spark.catalog import load_model
from hbase_tools_spark.llm.corpus import _entropy_of
from hbase_tools_spark.registry import QUERIES

from conftest import SF_DIR


@pytest.fixture(scope="module")
def model(spark):
    return load_model(spark, SF_DIR)


# -- entropy reference ------------------------------------------------------

def test_entropy_reference_uniform():
    # 4 distinct chars, uniform -> exactly 2 bits
    n, u, h = _entropy_of("abcd" * 25)
    assert (n, u) == (100, 4)
    assert h == 2.0


def test_entropy_reference_degenerate_and_bounds():
    n, u, h = _entropy_of("aaaa")
    assert (u, h) == (1, 0.0)
    # entropy of any string is within [0, log2(n_unique)]
    for s in ["abab", "hello world", "aab", "x"]:
        n, u, h = _entropy_of(s)
        assert -1e-9 <= h <= math.log2(u) + 1e-6


def test_entropy_flags_low_entropy_text(model):
    out = QUERIES["docs_char_entropy"].fn(model)
    rows = out.limit(2000).collect()
    assert rows
    for r in rows:
        assert r["low_entropy"] == (r["entropy"] < 3.5)
        assert r["n_unique_chars"] <= r["n_chars"]


# -- vocabulary / tf-idf ----------------------------------------------------

def test_vocab_rank_is_dense_and_ordered(model):
    rows = QUERIES["vocab_top_terms"].fn(model).orderBy("rank").collect()
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    occ = [r["n_occurrences"] for r in rows]
    assert occ == sorted(occ, reverse=True)


def test_tfidf_rare_term_beats_common_term(model):
    # Within a doc, a term that appears in fewer documents must not be
    # outranked by an equal-tf term that appears in more documents.
    rows = (
        QUERIES["tfidf_top_terms"].fn(model)
        .orderBy("doc_id", "rank")
        .collect()
    )
    assert rows
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_rows in by_doc.values():
        assert len(doc_rows) <= 3
        for a, b in zip(doc_rows, doc_rows[1:]):
            assert a["tfidf"] >= b["tfidf"] - 1e-9
            if a["tf"] == b["tf"]:
                assert a["doc_freq"] <= b["doc_freq"]


# -- sessionization ---------------------------------------------------------

def test_sessionize_gap_property(model):
    # Sessions of one user never overlap, are ordered, and consecutive
    # sessions are separated by more than the 6h gap.
    rows = (
        QUERIES["events_sessionize"].fn(model)
        .orderBy("user_id", "session_id")
        .collect()
    )
    assert rows
    last = {}
    for r in rows:
        assert r["session_start"] <= r["session_end"]
        if r["user_id"] in last:
            prev = last[r["user_id"]]
            assert r["session_id"] == prev["session_id"] + 1
            assert r["session_start"] - prev["session_end"] > 21_600
        last[r["user_id"]] = r


def test_sessionize_conserves_events(model):
    total = model.events.count()
    out = QUERIES["events_sessionize"].fn(model)
    assert out.agg(F.sum("n_events")).collect()[0][0] == total


# -- heavy hitters ----------------------------------------------------------

def test_heavy_hitters_match_bruteforce(model):
    out = {
        (r["event_type"], r["user_id"])
        for r in QUERIES["events_heavy_hitters"].fn(model).collect()
    }
    brute = (
        model.events.groupBy("event_type", "user_id")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    totals: dict = {}
    for r in brute:
        t = totals.setdefault(r["event_type"], [0, 0])
        t[0] += r["c"]
        t[1] += 1
    expected = {
        (r["event_type"], r["user_id"])
        for r in brute
        if r["c"] * totals[r["event_type"]][1] * 2
        > totals[r["event_type"]][0] * 3
    }
    assert out == expected


# -- survivors --------------------------------------------------------------

def test_survivors_partition_documents(model):
    # survivors + dropped == corpus; every cluster contributes exactly
    # its representative; representatives are the cluster minimum.
    docs = {r["doc_id"] for r in model.documents.select("doc_id").collect()}
    surv = QUERIES["docs_neardup_survivors"].fn(model).collect()
    surv_ids = {r["doc_id"] for r in surv}
    assert surv_ids <= docs
    from hbase_tools_spark.llm.dedup import (
        connected_components,
        ngram_jaccard_pairs,
    )

    cc = connected_components(ngram_jaccard_pairs(model)).collect()
    clustered = {r["doc_id"] for r in cc}
    reps = {r["cluster_id"] for r in cc}
    assert reps == {r["doc_id"] for r in cc if r["doc_id"] == r["cluster_id"]}
    assert surv_ids == (docs - clustered) | reps
    flagged = {r["doc_id"] for r in surv if r["had_dups"]}
    assert flagged == reps


# -- OOV / divergence / window dedup ---------------------------------------

def test_oov_rate_matches_bruteforce(model):
    # brute-force recompute from the raw documents on the driver
    docs = model.documents.select("source", "text").collect()
    from collections import Counter
    corpus = Counter()
    per_source: dict[str, Counter] = {}
    for r in docs:
        toks = r["text"].split(" ")
        corpus.update(toks)
        per_source.setdefault(r["source"], Counter()).update(toks)
    vocab = {
        w for w, _ in sorted(corpus.items(), key=lambda kv: (-kv[1], kv[0]))[:16]
    }
    out = {r["source"]: r for r in QUERIES["oov_rate_by_source"].fn(model).collect()}
    assert set(out) == set(per_source)
    for src, cnt in per_source.items():
        r = out[src]
        n_oov = sum(c for w, c in cnt.items() if w not in vocab)
        assert r["n_tokens"] == sum(cnt.values())
        assert r["n_word_types"] == len(cnt)
        assert r["n_oov_tokens"] == n_oov
        assert r["n_oov_types"] == sum(1 for w in cnt if w not in vocab)
        assert abs(r["oov_rate"] - n_oov / sum(cnt.values())) < 1e-6


def test_kl_divergence_nonnegative_and_bruteforce(model):
    docs = model.documents.select("source", "text").collect()
    from collections import Counter
    corpus = Counter()
    per_source: dict[str, Counter] = {}
    for r in docs:
        toks = r["text"].split(" ")
        corpus.update(toks)
        per_source.setdefault(r["source"], Counter()).update(toks)
    n = sum(corpus.values())
    out = {
        r["source"]: r
        for r in QUERIES["source_unigram_divergence"].fn(model).collect()
    }
    assert set(out) == set(per_source)
    for src, cnt in per_source.items():
        ns = sum(cnt.values())
        kl = sum(
            (c / ns) * math.log((c / ns) / (corpus[w] / n)) for w, c in cnt.items()
        )
        r = out[src]
        # KL(P||Q) >= 0 up to quantization of the per-term decimal sum
        assert r["kl_divergence"] >= -1e-6
        assert abs(r["kl_divergence"] - kl) < 1e-4
        assert r["drifted"] == (r["kl_divergence"] > 0.01)


def test_window_dedup_exact_duplicates_fully_flagged(model):
    # documents with an exact textual twin must have dup_fraction == 1.0
    dup_texts = {
        r["text"]
        for r in model.documents.groupBy("text")
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") >= 2)
        .collect()
    }
    if not dup_texts:
        pytest.skip("fixture has no exact duplicate docs at this sf")
    twin_ids = {
        r["doc_id"]
        for r in model.documents.where(F.col("text").isin(list(dup_texts)))
        .select("doc_id")
        .collect()
    }
    out = {r["doc_id"]: r for r in QUERIES["docs_window_dedup"].fn(model).collect()}
    for doc_id in twin_ids:
        if doc_id in out:  # docs shorter than the window width are dropped
            assert out[doc_id]["dup_fraction"] == 1.0
            assert out[doc_id]["dup_heavy"]


def test_window_dedup_counts_are_consistent(model):
    rows = QUERIES["docs_window_dedup"].fn(model).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_dup_windows"] <= r["n_windows"]
        assert abs(r["dup_fraction"] - r["n_dup_windows"] / r["n_windows"]) < 1e-6
        assert r["dup_heavy"] == (r["n_dup_windows"] / r["n_windows"] >= 0.2)


def test_word_embedding_neighbors_geometry(spark):
    """The projected vectors must behave like a real embedding: every
    pairwise cosine lies in [-1, 1] (the decimal dot/norm pipeline
    preserves Cauchy-Schwarz), all C(topv, 2) pairs are present, and
    the similarity distribution is non-degenerate (not all equal)."""
    from hbase_tools_spark.llm.corpus import _WV_TOPV

    rows = QUERIES["word_embedding_neighbors"].fn(load_model(spark, SF_DIR)).collect()
    n = _WV_TOPV * (_WV_TOPV - 1) // 2
    assert len(rows) == n
    sims = [r["cos_sim"] for r in rows]
    assert all(-1.0 - 1e-9 <= s <= 1.0 + 1e-9 for s in sims)
    assert len(set(sims)) > n // 4  # non-degenerate spread
    assert all(r["w1"] < r["w2"] for r in rows)  # strict upper triangle


def test_lr_training_decreases_log_loss(spark):
    """Five GD steps must actually LEARN: the training log-loss under
    the final weights is strictly below the w=0 loss (ln 2).  (The
    fixture's language classes are nearly inseparable on these
    features — class means differ <6% — so ACCURACY is not the
    invariant; loss descent is what full-batch GD guarantees.)"""
    import math

    m = load_model(spark, SF_DIR)
    [r] = QUERIES["docs_lr_quality_train"].fn(m).collect()
    assert (r["w_stopword"], r["w_wordlen"], r["w_bias"]) != (0.0, 0.0, 0.0)
    rows = m.documents.select(
        (
            F.size(F.filter(F.split("text", " "), lambda x: x.isin("the", "a")))
            * 1.0
            / F.size(F.split("text", " "))
        ).alias("x1"),
        (
            F.length(F.regexp_replace("text", " ", ""))
            * 1.0
            / F.size(F.split("text", " "))
            / 10.0
        ).alias("x2"),
        F.when(F.col("lang") == "en", 1.0).otherwise(0.0).alias("y"),
    ).collect()
    loss = 0.0
    for row in rows:
        z = r["w_stopword"] * row["x1"] + r["w_wordlen"] * row["x2"] + r["w_bias"]
        p = 1.0 / (1.0 + math.exp(-z))
        loss -= row["y"] * math.log(max(p, 1e-12)) + (1 - row["y"]) * math.log(
            max(1 - p, 1e-12)
        )
    assert loss / len(rows) < math.log(2.0)  # w=0 loss


def test_lr_served_weights_parity(spark, tmp_path):
    """The pretrained-classifier production shape: the persisted
    weights artifact reproduces the in-plan trainer's output
    bit-for-bit (same corpus trains both), and the artifact itself is
    a 1-row (wa, wb, wc) decimal relation."""
    from hbase_tools_spark.llm.corpus import (
        _lr_features,
        _lr_readout,
        materialize_lr_weights,
    )

    m = load_model(spark, SF_DIR)
    out = str(tmp_path / "lr")
    materialize_lr_weights(m.documents, out)
    w = spark.read.parquet(out + "/weights")
    assert w.columns == ["wa", "wb", "wc"] and w.count() == 1
    [served] = _lr_readout(_lr_features(m.documents), w).collect()
    [direct] = QUERIES["docs_lr_quality_train"].fn(m).collect()
    assert served.asDict() == direct.asDict()


# -- session paths ----------------------------------------------------------

def test_session_paths_match_python_port(model):
    """Full Python recomputation of the top-25 journey paths from raw
    events (same 6h gap, same 8-step cap, same tie-break)."""
    rows = QUERIES["events_session_paths"].fn(model).collect()
    assert rows
    ev = sorted(
        model.events.select("user_id", "event_id", "event_type", "ts").collect(),
        key=lambda r: (r["user_id"], r["ts"], r["event_id"]),
    )
    from collections import Counter

    paths = Counter()
    cur_user, last_tse, steps = None, None, []
    def flush():
        if steps:
            paths[">".join(steps[:8])] += 1
    for r in ev:
        tse = int(r["ts"].timestamp())
        if r["user_id"] != cur_user or (last_tse is not None and tse - last_tse > 21_600):
            flush()
            steps = []
            cur_user = r["user_id"]
        steps.append(r["event_type"])
        last_tse = tse
    flush()
    expect = sorted(paths.items(), key=lambda kv: (-kv[1], kv[0]))[:25]
    got = [(r["path"], r["n_sessions"]) for r in rows]
    assert got == expect
    for r in rows:
        assert r["n_steps"] == len(r["path"].split(">")) <= 8


def test_neardup_source_matrix_consistent_with_pairs(model, spark):
    """Matrix totals reconcile with the candidate-pair relation and the
    source normalization is unordered (a <= b)."""
    import hbase_tools_spark.llm.dedup as dd

    mat = QUERIES["neardup_source_matrix"].fn(model).collect()
    pairs = QUERIES["minhash_band_pairs"].fn(model)
    src = {r["doc_id"]: r["source"] for r in model.documents.select("doc_id", "source").collect()}
    from collections import Counter

    exp_pairs, exp_cross = Counter(), Counter()
    for r in pairs.collect():
        a, b = src[r["doc_a"]], src[r["doc_b"]]
        k = (min(a, b), max(a, b))
        exp_pairs[k] += 1
        exp_cross[k] += 0 if a == b else 1
    got = {(r["source_a"], r["source_b"]): (r["n_pairs"], r["n_cross"]) for r in mat}
    assert got == {k: (exp_pairs[k], exp_cross[k]) for k in exp_pairs}
    for (a, b), (np_, nc) in got.items():
        assert a <= b and 0 <= nc <= np_


# -- BPE merge training ------------------------------------------------------

def test_bpe_merges_match_python_reference(model):
    """Reference BPE trainer (Sennrich et al.) over the collected word
    counts reproduces the engine's merges exactly, including greedy
    re-merge semantics and the (count desc, pair asc) tie-break."""
    from collections import Counter

    rows = sorted(
        QUERIES["bpe_merge_steps"].fn(model).collect(), key=lambda r: r["step"]
    )
    assert len(rows) == 4
    words = Counter()
    for r in model.documents.select("text").collect():
        words.update(r["text"].split(" "))
    vocab = {tuple(w): c for w, c in words.items()}
    for step, row in enumerate(rows, 1):
        pairs = Counter()
        for syms, c in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += c
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), n = best
        assert row["pair"] == f"{a} {b}", step
        assert row["merged"] == a + b, step
        assert row["n"] == n, step
        new_vocab = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab


def test_bpe_encode_tokens_matches_python_reference(model):
    """Applying the trained merges via the vocabulary join reproduces a
    word-by-word Python re-encode of the corpus, and the token counts
    sit in the [words, chars] band (merges only ever shrink the
    char-level segmentation, never below one token per word)."""
    from collections import Counter

    merges = [
        tuple(r["pair"].split(" "))
        for r in sorted(
            QUERIES["bpe_merge_steps"].fn(model).collect(),
            key=lambda r: r["step"],
        )
    ]

    def encode_len(word: str) -> int:
        syms = list(word)
        for a, b in merges:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return len(syms)

    exp_words, exp_tokens, exp_chars = Counter(), Counter(), Counter()
    for r in model.documents.select("source", "text").collect():
        for w in r["text"].split(" "):
            exp_words[r["source"]] += 1
            exp_tokens[r["source"]] += encode_len(w)
            exp_chars[r["source"]] += len(w)

    rows = QUERIES["bpe_encode_tokens"].fn(model).collect()
    assert {r["source"] for r in rows} == set(exp_words)
    for r in rows:
        s = r["source"]
        assert r["total_words"] == exp_words[s]
        assert r["total_tokens"] == exp_tokens[s]
        assert r["total_chars"] == exp_chars[s]
        assert r["total_words"] <= r["total_tokens"] <= r["total_chars"]


def test_bpe_chain_survives_dry_rounds(spark):
    """A vocabulary that exhausts its merges before _BPE_STEPS rounds
    must NOT annihilate the chain: dry rounds emit the sentinel no-op
    merge (pair ' ', n=0) and the encode side still counts every word."""
    from hbase_tools_spark.catalog import Model
    from hbase_tools_spark.llm.text import bpe_encode_tokens, bpe_merge_steps

    docs = spark.createDataFrame(
        [(0, "ab ab a b", "en", "s0", 9), (1, "a b a", "en", "s0", 5)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    try:
        docs.createOrReplaceTempView("documents")
        m = Model(spark, "/tmp/unused")
        merges = sorted(bpe_merge_steps(m).collect(), key=lambda r: r["step"])
        assert len(merges) == 4
        # round 1 merges 'a b' -> 'ab'; afterwards every word is a
        # single symbol, so rounds 2-4 are dry sentinels
        assert merges[0]["pair"] == "a b" and merges[0]["merged"] == "ab"
        for r in merges[1:]:
            assert r["pair"] == " " and r["merged"] == "" and r["n"] == 0
        enc = {r["source"]: r for r in bpe_encode_tokens(m).collect()}
        assert enc["s0"]["total_words"] == 7
        # every word encodes to one symbol after the single real merge
        assert enc["s0"]["total_tokens"] == 7
        assert enc["s0"]["total_chars"] == 9
    finally:
        # the fixture view was overwritten — force re-registration
        spark.conf.set("spark.hbase_tools.model_dir", "")
        load_model(spark, SF_DIR)
