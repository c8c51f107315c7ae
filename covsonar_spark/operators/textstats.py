"""Text-analysis operators over a documents-like table: token counting,
quality scoring, language ID, document fingerprinting.

All JVM-side column expressions (whole-stage codegen) — these run as pure
map operations with no shuffle, so they scale linearly with input size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from covsonar_spark.functions import text as Tx


# BPE-style pre-tokenization: runs of letters / digits / other
# non-space — the segmentation a byte-pair tokenizer subdivides, so its
# count is the tight lower bound on (and in practice ~proportional to)
# the LLM token count. Plain character classes only, so Java regex
# (Spark) and RE2 (DuckDB oracle) agree exactly.
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"


def token_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document token statistics: whitespace token count, distinct
    tokens, chars, and a BPE-ish subword-regex count (the training-data
    budget metric) — all single-pass codegen expressions, no shuffle."""
    toks = Tx.tokens(text_col)
    # counts as bigint: DuckDB/ANSI count expressions are 64-bit while
    # Spark's size()/length() are int32 — the oracle hash is
    # width-sensitive
    return df.select(
        F.col(id_col),
        Tx.token_count(text_col).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct_tokens"),
        F.length(text_col).cast("long").alias("n_chars_computed"),
        F.size(F.regexp_extract_all(text_col, F.lit(BPE_TOKEN_RE), 0))
         .cast("long").alias("n_bpe_tokens"),
    )


def quality(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic quality score per document."""
    return df.select(F.col(id_col), Tx.quality_score(text_col).alias("quality"))


def language_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                langs: tuple[str, ...] = ("en", "de", "fr")) -> DataFrame:
    """Stopword-vote language identification."""
    return df.select(F.col(id_col), Tx.lang_id(text_col, langs).alias("pred_lang"))


def tfidf_top_terms(df: DataFrame, k: int = 5, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Top-k TF-IDF terms per document.

    Two shuffles total: term frequencies groupBy (doc, term), document
    frequencies groupBy term (small output → broadcast back), then a
    per-doc window top-k. idf = ln((N+1)/(df+1)); deterministic ties by
    term. At corpus scale the df relation is the only global state and
    it is vocabulary-sized, so the plan holds at 100 TB.
    """
    from pyspark.sql import Window

    toks = df.select(F.col(id_col), F.explode(Tx.tokens(text_col)).alias("term"))
    # N arrives as a broadcast one-row cross join, NOT a driver-side
    # count(): an eager count would run a full corpus scan at plan
    # CONSTRUCTION time (the bm25/quality_gate pattern, kept lazy)
    n_docs = df.agg(F.count(F.lit(1)).alias("_n"))
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    # df derives FROM tf (one row per (doc, term) by construction), not
    # from a second distinct over the exploded tokens: counting tf rows
    # per term IS counting distinct docs per term.  The always-true
    # `tf >= 1` filter (count(1) per existing group is ≥ 1) is load-
    # bearing: it forces the roll-up to consume the tf column, so the
    # optimizer cannot prune the count buffer out of the inner
    # aggregate — which keeps the df branch's partial-aggregate
    # exchange byte-identical to tf's own, and AQE's exchange reuse
    # then computes the corpus explode+shuffle ONCE (ReusedExchange in
    # the final plan; previously two full-width Generate+Exchange
    # chains, zero reuse).  Without the filter, column pruning narrows
    # the inner aggregate and the subtrees stop matching.
    dfreq = (tf.where(F.col("tf") >= 1)
             .groupBy("term").agg(F.count(F.lit(1)).alias("df")))
    scored = (tf.join(F.broadcast(dfreq), "term")
              .crossJoin(F.broadcast(n_docs))
              .select(
        F.col(id_col), F.col("term"),
        F.round(F.col("tf") * F.log((F.col("_n") + 1.0) / (F.col("df") + 1.0)), 6)
         .alias("tfidf")))
    w = Window.partitionBy(id_col).orderBy(F.col("tfidf").desc(), F.col("term").asc())
    return scored.withColumn("rnk", F.row_number().over(w)) \
                 .where(F.col("rnk") <= k).drop("rnk")


def bm25_scores(df: DataFrame, query_terms: list[str], *,
                k1: float = 1.2, b: float = 0.75,
                text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Okapi BM25 score per document for a literal query-term set —
    the lexical half of hybrid retrieval.

    Relational plan, no UDFs and no driver-side constants: explode
    tokens → filter to the query terms BEFORE the aggregate (the
    per-term tf shuffle only carries query-term rows), per-term
    document frequencies, and corpus stats (N, avgdl) as a one-row
    aggregate cross-joined in (broadcast of one row). Scores are
    rounded to 6 decimals so downstream ranking is reproducible across
    engines (float-sum epsilon can't flip an order).

    idf = ln((N - df + 0.5) / (df + 0.5) + 1)  (Lucene form, ≥ 0)
    """
    # the explicit isnotnull(id) is a semantic no-op (a null-id row can
    # never reach the output — the dl join is inner on id — and df
    # matches countDistinct's null exclusion) but it is load-bearing for
    # the plan: the tf branch gets the same filter INFERRED from the dl
    # join, and only canonically identical branches let AQE reuse the
    # corpus explode+filter exchange for the df roll-up below.
    toks = (df.where(F.col(id_col).isNotNull())
            .select(F.col(id_col),
                    F.explode(F.split(F.col(text_col), " ")).alias("tok")))
    hits = toks.where(F.col("tok").isin(query_terms))
    tf = hits.groupBy(id_col, "tok").agg(F.count(F.lit(1)).alias("tf"))
    # df derives FROM tf (one row per (doc, tok)), not from a second
    # countDistinct over hits: counting tf rows per tok IS counting
    # distinct docs per tok, and the always-true `tf >= 1` filter keeps
    # the count buffer in the inner aggregate so its partial-agg
    # exchange stays byte-identical to tf's own — AQE's exchange reuse
    # then runs the corpus explode+filter+shuffle ONCE (the
    # tfidf_top_terms trick; without the filter, column pruning narrows
    # the inner aggregate and the subtrees stop matching).
    dfreq = (tf.where(F.col("tf") >= 1)
             .groupBy("tok").agg(F.count(F.lit(1)).alias("df")))
    dl = df.select(F.col(id_col), F.size(F.split(F.col(text_col), " ")).alias("dl"))
    corpus = df.agg(F.count(F.lit(1)).alias("n_docs"),
                    F.avg(F.size(F.split(F.col(text_col), " "))).alias("avgdl"))
    idf = F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
    tf_part = (F.col("tf") * (k1 + 1)) / (
        F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl")))
    return (
        tf.join(F.broadcast(dfreq), "tok")
        .join(dl, id_col)
        .crossJoin(F.broadcast(corpus))
        .groupBy(id_col)
        .agg(F.round(F.sum(idf * tf_part), 6).alias("bm25"))
    )


def bigram_lm_scores(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Perplexity-style quality scoring: train an add-1-smoothed bigram
    LM on the corpus and score every document's mean bigram
    log-probability — in ONE declarative plan (the classic
    train-then-score filter real pipelines run as two jobs).

    p(w2|w1) = (c(w1,w2) + 1) / (c(w1,·) + V),  V = |vocab|

    Plan shape: the big bigram-occurrence frame is exploded twice
    (once into the model aggregate, once for scoring — lineage is a
    tree, so a third reference would mean a third explode) and
    SHUFFLED once each. The unigram context count c(w1,·) is NOT a
    second aggregate over the occurrences — it's a window-sum over the
    already-aggregated (w1, w2) model frame (Σ_w2 c(w1,w2) ≡ c(w1,·)),
    which at 100 TB turns a full-corpus shuffle into one over the
    model's vocab² (orders smaller). The vocab size arrives as a
    broadcast one-row cross join."""
    from pyspark.sql import Window

    def bigram_occurrences():
        toks = df.select(F.col(id_col),
                         F.split(F.col(text_col), " ").alias("t"))
        return toks.select(
            F.col(id_col),
            F.explode(F.expr(
                "transform(slice(t, 1, greatest(size(t) - 1, 0)),"
                " (w, i) -> struct(w as w1, t[i + 1] as w2))")).alias("b")
        ).select(id_col, "b.w1", "b.w2")

    model = (
        bigram_occurrences()
        .groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
        .withColumn("c1", F.sum("c2").over(Window.partitionBy("w1")))
    )
    vocab = df.select(F.explode(F.split(F.col(text_col), " ")).alias("tok")) \
        .agg(F.countDistinct("tok").alias("v"))
    return (
        bigram_occurrences().join(model, ["w1", "w2"])
        .crossJoin(F.broadcast(vocab))
        .groupBy(id_col)
        .agg(F.round(F.avg(F.log((F.col("c2") + 1.0) / (F.col("c1") + F.col("v")))), 6)
             .alias("mean_logp"),
             F.count(F.lit(1)).alias("n_bigrams"))
    )


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                k: int = 8) -> DataFrame:
    """Rolling-hash document fingerprint: min over md5 hashes of character
    k-grams (a 1-permutation winnowing sketch).  md5 is available in both
    Spark and DuckDB, so the fingerprint is engine-portable.
    """
    c = F.col(text_col)
    n = F.length(c)
    seq = F.sequence(F.lit(1), F.greatest(n - F.lit(k - 1), F.lit(1)))
    grams = F.transform(seq, lambda i: F.md5(c.substr(i, F.lit(k))))
    return df.select(
        F.col(id_col),
        F.array_min(grams).alias("fingerprint"),
    )


def quality_gate(df: DataFrame, pct: float = 0.25, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Corpus-relative quality filtering: keep documents whose heuristic
    quality score clears the corpus's ``pct`` percentile — the
    distribution-anchored gate real pipelines use instead of magic
    absolute thresholds.

    Scale shape: two passes over the corpus (inherent — a global
    order statistic must exist before any row can be judged): pass 1
    aggregates the exact percentile threshold (one scalar), pass 2
    re-scores and filters with the threshold broadcast as a one-row
    cross join — pure codegen, no shuffle of the corpus itself. At
    100 TB swap the exact percentile for ``approx_percentile``
    (t-digest sketch, partial-merge, no per-group materialization);
    the exact form is kept here because it is oracle-checkable.
    The threshold is rounded to 6 decimals BEFORE the comparison in
    both engines: percentile interpolation arithmetic may differ in
    the last ulp across engines, and rounding the single scalar pins
    the boundary."""
    scores = quality(df, text_col, id_col)
    thr = scores.agg(
        F.round(F.percentile("quality", F.lit(pct)), 6).alias("q_thr"))
    return (quality(df, text_col, id_col)
            .crossJoin(F.broadcast(thr))
            .where(F.col("quality") >= F.col("q_thr"))
            .select(id_col, "quality", "q_thr"))


def _per_doc_shingles(df: DataFrame, k: int, text_col: str, id_col: str,
                      source_col: str) -> DataFrame:
    """(source, doc_id, shingle) — one row per DISTINCT shingle per doc
    (the shared Arrow-batched shingle kernel, exploded).  Generation-
    cached: ``boilerplate_ratio`` consumes this subtree three times in
    one plan, and the shingle UDF is the dominant cost."""
    from covsonar_spark.operators.dedup import _persist_scoped, shingle_sets

    # round 11: persist the PRE-explode arrays (one row per doc), not
    # the exploded per-shingle frame — caching one row per SHINGLE was
    # the expensive half of this query's 32-core anti-scaling (driver
    # scaling ratio 0.66), and the UDF-once guarantee only needs the
    # array frame cached; the join+explode below is cheap codegen the
    # three consumers re-run from the cache.  floor=False for the same
    # reason as decontaminate (light consumer; the defaultParallelism
    # repartition lost at high core counts).  Probe evidence
    # (tools/ab_lightshingle.py): 1.12 s -> 0.75 s best-of-3 at 32
    # cores, 0.60 -> 0.64 at 8 (noise band).
    sh = _persist_scoped(
        "boilerplate_shingles",
        shingle_sets(df.select(F.col(id_col), F.col(source_col),
                               F.col(text_col)), text_col, id_col, k,
                     floor=False))
    return (df.select(F.col(id_col), F.col(source_col))
            .join(sh, id_col)
            .select(F.col(source_col), F.col(id_col),
                    F.explode("shingles").alias("shingle")))


def boilerplate_ngrams(df: DataFrame, k: int = 3, min_df_frac: float = 0.5,
                       text_col: str = "text", id_col: str = "doc_id",
                       source_col: str = "source",
                       _per_doc: DataFrame | None = None) -> DataFrame:
    """Per-source boilerplate n-gram table: word-k-grams that appear in
    at least ``min_df_frac`` of a source's documents — the site-chrome
    (header/footer/nav) detector of a web-scale curation pipeline,
    keyed per source because boilerplate is a property of the
    EMITTER, not the corpus.

    Output: (source, shingle, sdf, n_docs, df_frac) for flagged
    shingles.

    Plan shape (100 TB): distinct shingles per doc (the shared
    Arrow-batched shingle kernel), explode, then ONE groupBy
    (source, shingle) counting document frequency — partial aggs
    combine map-side; the tiny per-source doc counts broadcast back.
    No joins over raw text.
    """
    per_doc = (_per_doc if _per_doc is not None
               else _per_doc_shingles(df, k, text_col, id_col, source_col))
    n_docs = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("n_docs"))
    sdf = (per_doc.groupBy(source_col, "shingle")
           .agg(F.count(F.lit(1)).alias("sdf")))
    frac = F.col("sdf").cast("double") / F.col("n_docs")
    return (sdf.join(F.broadcast(n_docs), source_col)
            .select(source_col, "shingle", "sdf", "n_docs",
                    F.round(frac, 4).alias("df_frac"))
            .where(F.round(frac, 4) >= min_df_frac))


def boilerplate_ratio(df: DataFrame, k: int = 3, min_df_frac: float = 0.5,
                      text_col: str = "text", id_col: str = "doc_id",
                      source_col: str = "source") -> DataFrame:
    """Per-document boilerplate exposure: the fraction of a doc's
    distinct k-gram shingles that are source-level boilerplate
    (``boilerplate_ngrams``).  The downstream curation signal — docs
    that are mostly chrome get gated, the rest get their spans
    stripped before tokenization.

    Output: (doc_id, source, n_sh, n_boiler, boiler_ratio).

    The per-doc shingle table is computed ONCE (generation-cached) and
    shared by the flagging aggregate, the hit semi-join, and the
    per-doc sizes — the shingle kernel never sweeps the corpus twice.
    """
    per_doc = _per_doc_shingles(df, k, text_col, id_col, source_col)
    flagged = boilerplate_ngrams(df, k, min_df_frac, text_col, id_col,
                                 source_col,
                                 _per_doc=per_doc).select(source_col, "shingle")
    hits = (per_doc.join(flagged, [source_col, "shingle"], "left_semi")
            .groupBy(id_col).agg(F.count(F.lit(1)).alias("n_boiler")))
    n_sh = per_doc.groupBy(id_col, source_col).agg(
        F.count(F.lit(1)).alias("n_sh"))
    return (n_sh.join(hits, id_col, "left")
            .select(id_col, source_col, "n_sh",
                    F.coalesce("n_boiler", F.lit(0)).alias("n_boiler"),
                    F.round(F.coalesce("n_boiler", F.lit(0)).cast("double")
                            / F.col("n_sh"), 4).alias("boiler_ratio")))
