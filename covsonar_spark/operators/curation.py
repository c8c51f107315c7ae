"""Corpus-curation operators for training-data pipelines: repetition
signals, train/eval decontamination, deterministic stratified sampling,
and token-budget sequence packing.

These extend the reference's screening model (rki-mf1/covsonar matches
genomes by token profiles; here the "profiles" are text token streams)
to the operations an LLM-data pipeline runs at 100 TB. Every operator
is a declarative DataFrame plan — no Python in the hot path — and every
randomized-looking choice (sampling, sharding) is an md5-derived
deterministic function so a SQL oracle reproduces it exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from covsonar_spark.functions import text as Tx
from covsonar_spark.operators.textstats import BPE_TOKEN_RE


def _md5_pct(col: Column) -> Column:
    """Deterministic pseudo-uniform percentile in [0,100): 60-bit
    md5-derived hash mod 100. Portable to DuckDB:
    ``('0x' || substr(md5(s),1,15))::BIGINT % 100``."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long") % 100


def repetition_stats(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Gopher-style repetition signals per document: duplicate-token
    fraction and the fraction of all bigrams/trigrams occupied by the
    single most frequent bigram/trigram.

    Scale shape: the token stream is exploded once and shuffled ONCE,
    by document — lead() windows over (doc, pos) derive bi/trigrams
    relationally, a codegen stack() fans each token into its (k, gram)
    rows, and the groupBy(doc, k, gram) aggregation reuses the
    window's doc_id partitioning (clustering on a key subset — no
    second Exchange in the plan). An earlier higher-order-function
    version built shingle arrays with transform+slice+concat_ws; HOFs
    evaluate interpreted per element and measured 7× slower than this
    whole-stage-codegen shape at sf0.1 — and a per-doc HOF top-gram
    scan would be O(len²) per document, fatal for book-length docs.
    """
    from pyspark.sql import Window

    tok = df.select(F.col(id_col),
                    F.posexplode(Tx.tokens(text_col)).alias("pos", "t"))
    w = Window.partitionBy(id_col).orderBy("pos")
    led = tok.select(id_col, "t",
                     F.lead("t", 1).over(w).alias("t2"),
                     F.lead("t", 2).over(w).alias("t3"))
    grams = led.select(
        id_col,
        F.expr("stack(3, 1, t, 2, concat_ws(' ', t, t2), "
               "3, concat_ws(' ', t, t2, t3))").alias("k", "gram"),
    ).where(~((F.col("k") == 2) & F.isnull("t2"))
            & ~((F.col("k") == 3) & (F.isnull("t2") | F.isnull("t3"))))
    per_gram = grams.groupBy(id_col, "k", "gram").agg(F.count(F.lit(1)).alias("cnt"))
    per_k = per_gram.groupBy(id_col, "k").agg(
        F.max("cnt").alias("top"),
        F.sum("cnt").alias("total"),
        F.count(F.lit(1)).alias("n_distinct"))

    def frac(k: int, num: Column, den: Column) -> Column:
        return F.round(F.max(F.when(F.col("k") == k, num / den)), 6)

    return per_k.groupBy(id_col).agg(
        frac(1, F.col("total") - F.col("n_distinct"), F.col("total"))
            .alias("dup_token_frac"),
        frac(2, F.col("top"), F.col("total")).alias("top_bigram_frac"),
        frac(3, F.col("top"), F.col("total")).alias("top_trigram_frac"),
    )


def decontaminate(df: DataFrame, k: int = 3, eval_mod: int = 10,
                  text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Train/eval contamination check: flag training documents sharing
    any word k-gram with the held-out split (doc_id % eval_mod == 0 —
    a deterministic stand-in for a real eval set).

    Output: (doc_id, n_hits) — training docs with ≥1 contaminated
    shingle and how many distinct shingles leak.

    Scale shape: the eval side reduces to a DISTINCT shingle vocabulary
    (eval sets are tiny vs the corpus), which Catalyst broadcasts into
    the exploded train-shingle stream — a broadcast semi-join keyed on
    the shingle string, no corpus-sized shuffle. The per-doc count
    aggregates map-side first (shingles already distinct per doc).
    Shingling reuses dedup.shingle_sets' Arrow-batched path (the JVM
    HOF form measures ~6× slower — see that docstring).
    """
    from covsonar_spark.operators.dedup import _persist_scoped, shingle_sets

    # scoped persist of the pre-explode shingle arrays: BOTH branches
    # below (train stream and eval vocabulary) consume the shingle
    # pandas-UDF stage, which otherwise evaluates twice over the full
    # corpus — the exact "expensive serialized UDF stage" category the
    # round-10 fan-out A/Bs showed persists DO win on (unlike cheap
    # codegen subtrees, where the cache barrier loses).
    # floor=False (round 11): the driver's 8-vs-32-core scaling data
    # showed this LIGHT consumer anti-scaling (1.26 s at 32 cores vs
    # 0.69 s at 8) — the defaultParallelism repartition + the wide
    # cache populate cost more than the small corpus's UDF work saves
    # here, unlike the heavy dedup self-joins where the floor won
    # 0.46-0.73x.  Four-variant probe (tools/ab_lightshingle.py, both
    # core counts): floor=False+persist best-of-3 0.76 s vs 1.29-1.47 s
    # current at 32 cores, neutral at 8 (0.76 vs 0.78).  At production
    # scale the floor was a no-op anyway (inputs have >= par splits).
    # Own scope key (not the jaccard family's "shingle_sets"): the
    # shared slot thrashed when a pipeline alternated the two operator
    # families in one generation (round-10 ADVICE).
    shingled = _persist_scoped(
        "decontam_shingles", shingle_sets(df, text_col, id_col, k,
                                          floor=False)) \
        .select(F.col(id_col), F.explode("shingles").alias("shingle"))
    is_eval = (F.col(id_col) % eval_mod) == 0
    train = shingled.where(~is_eval)
    eval_vocab = shingled.where(is_eval).select("shingle").distinct()
    # NO broadcast hint: a real eval set is tiny and AQE will broadcast
    # it on its own; the default eval_mod split makes the vocabulary a
    # fixed FRACTION of the corpus, where a mandatory broadcast would
    # blow past the driver at scale
    return (train.join(eval_vocab, "shingle")
            .groupBy(id_col).agg(F.count(F.lit(1)).alias("n_hits")))


# PII patterns restricted to syntax Java regex and RE2 (the DuckDB
# oracle) interpret identically: char classes, bounded repetition,
# alternation — no lookaround, no backreferences.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+[0-9]{1,3}-[0-9]{3}-[0-9]{3,4}",
    "ipv4": r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}",
}


def scrub_pii(df: DataFrame, text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """PII redaction — the compliance stage every training-data pipeline
    runs before anything else sees the text. Emails, phone numbers and
    IPv4 literals are replaced with ``<EMAIL>``/``<PHONE>``/``<IP>``
    tags; per-document match counts come back alongside the scrubbed
    text so a pipeline can route high-PII documents to quarantine.

    Scale shape: a pure regexp_replace/regexp_extract_all column chain —
    whole-stage codegen, zero shuffle, prunes to (id, text) at the scan.
    Order matters: emails are counted and replaced before IPv4 so a
    dotted hostname inside an address is consumed by the email tag, and
    counts are taken on the SAME intermediate the replace runs on,
    keeping counts and tags consistent.
    """
    out = df.select(F.col(id_col), F.col(text_col).alias("_t"))
    for name, tag in [("email", "<EMAIL>"), ("phone", "<PHONE>"),
                      ("ipv4", "<IP>")]:
        pat = PII_PATTERNS[name]
        # bigint, not int: DuckDB counts are 64-bit and width parity
        # keeps the cross-engine audit exact (tools/type_audit.py)
        out = out.withColumn(f"n_{name}",
                             F.size(F.regexp_extract_all(
                                 "_t", F.lit(pat), F.lit(0))).cast("long")) \
                 .withColumn("_t", F.regexp_replace("_t", pat, tag))
    return out.select(id_col, F.col("_t").alias("scrubbed"),
                      "n_email", "n_phone", "n_ipv4")


def stratified_sample(df: DataFrame, rates: dict[str, int],
                      stratum_col: str = "lang",
                      id_col: str = "doc_id") -> DataFrame:
    """Deterministic stratified downsampling: keep a row iff its
    md5-percentile (hash of the id, mod 100) falls below the stratum's
    rate — e.g. ``{"en": 50, "de": 100}`` keeps ~50% of English docs
    and all German ones. Unlisted strata are dropped (rate 0).

    This is the domain-mixing primitive of training-data pipelines.
    Hash-based (not random) so the sample is reproducible, stable
    under re-runs and appends, and oracle-checkable. Pure codegen
    filter: no shuffle, prunes at the scan.
    """
    rate = F.lit(0)
    for stratum, pct in sorted(rates.items()):
        rate = F.when(F.col(stratum_col) == stratum, F.lit(pct)).otherwise(rate)
    return df.where(_md5_pct(F.col(id_col).cast("string")) < rate) \
             .select(id_col, stratum_col)


def pack_sequences(df: DataFrame, budget: int = 512, n_shards: int = 8,
                   text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Token-budget sequence packing: concatenate documents (in id
    order) into a token stream per shard and chop it into fixed-size
    training sequences. Output: (doc_id, shard, seq_idx, begin_offset)
    — the sequence each document starts in and its token offset there.

    Scale shape: a single global ordering would serialize the window
    into one partition, so packing is sharded — shard = doc_id %
    n_shards, and the running token sum is windowed PER SHARD
    (partitionBy(shard) parallelizes across the cluster; n_shards
    scales with executor count, each shard streams through one task).
    Token counts are the BPE-ish subword counts from textstats — the
    budget metric a trainer actually packs by.
    """
    from pyspark.sql import Window

    n_tok = F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_TOKEN_RE), 0))
    base = df.select(F.col(id_col), (F.col(id_col) % n_shards).alias("shard"),
                     n_tok.alias("n_tok"))
    w = Window.partitionBy("shard").orderBy(id_col)
    start = (F.sum("n_tok").over(w) - F.col("n_tok")).alias("start")
    return base.select(
        id_col, "shard",
        F.floor(start / budget).cast("int").alias("seq_idx"),
        (start % budget).cast("int").alias("begin_offset"),
    )


def temperature_mix(df: DataFrame, alpha: float = 0.5, budget: int = 250,
                    group_col: str = "lang", id_col: str = "doc_id") -> DataFrame:
    """Temperature-weighted mixture sampling (the multilingual-LM
    recipe: sample group g with probability ∝ p_g^alpha, p_g its
    corpus share) realized as deterministic per-row keep rates.

    Per group: q_g = (n_g / N)^alpha, normalized over groups; the
    per-row keep rate is min(1, budget * q_g / q_sum / n_g), applied
    as an md5-per-mille threshold on the row id — reproducible,
    append-stable, and reproducible in SQL. alpha=0.5 is sqrt
    (IEEE-correctly-rounded, so bit-identical across engines; other
    alphas go through pow and are libm-dependent — keep 0.5 for
    oracle-checked runs).

    Scale shape: ONE pass over the fact for group counts (a
    tiny |groups|-row aggregate), the share/normalize math as
    empty-frame windows over that aggregate (NOT a second .agg() +
    crossJoin, which would duplicate the subtree and re-scan the
    fact), then a broadcast join of the |groups|-row rate table back
    onto the fact — the rate lookup + hash filter are pure codegen.
    """
    from pyspark.sql import Window

    if alpha != 0.5:
        raise ValueError("only alpha=0.5 (sqrt) is cross-engine exact")
    per = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("n_g"))
    everything = Window.partitionBy()
    rates = (
        per
        .withColumn("q_g", F.sqrt(F.col("n_g") / F.sum("n_g").over(everything)))
        .withColumn("keep_rate", F.least(
            F.lit(1.0),
            F.lit(float(budget)) * F.col("q_g") / F.sum("q_g").over(everything) / F.col("n_g")))
        .select(group_col, F.floor(F.col("keep_rate") * 1000).cast("long").alias("keep_mille"))
    )
    mille = F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10) \
             .cast("long") % 1000
    return (df.join(F.broadcast(rates), group_col)
              .where(mille < F.col("keep_mille"))
              .select(id_col, group_col, "keep_mille"))


def leakage_safe_split(docs: DataFrame, clusters: DataFrame,
                       test_mille: int = 100, val_mille: int = 200,
                       id_col: str = "doc_id") -> DataFrame:
    """Train/val/test split with NO near-duplicate leakage: the split
    key is the document's duplicate-CLUSTER id (near-dup cluster
    members always land in the same split), not the document id —
    hashing doc ids would put reformatted copies of one text on both
    sides of the train/eval boundary, the classic eval-contamination
    bug dedup exists to prevent.

    ``clusters`` is (id, cluster_id) for documents that HAVE a near
    dup (duplicate_clusters' contract); singletons fall back to their
    own id via the left join + coalesce.  Split assignment is the
    repo's portable md5-per-mille idiom — deterministic, engine
    -portable, and stable under corpus growth (a new document never
    reassigns an old one).  Cost on top of clustering: one broadcast
    -joinable cluster attach + pure codegen hashing; no extra
    shuffle of the corpus.
    """
    mille = (F.conv(F.substring(
        F.md5(F.col("group_key").cast("string")), 1, 15), 16, 10)
        .cast("long") % 1000)
    return (
        docs.select(id_col)
        .join(F.broadcast(clusters.withColumnRenamed("cluster_id", "ck")),
              id_col, "left")
        .select(F.col(id_col),
                F.coalesce(F.col("ck"), F.col(id_col)).alias("group_key"))
        .withColumn("split",
                    F.when(mille < test_mille, "test")
                    .when(mille < val_mille, "val")
                    .otherwise("train"))
    )


def priority_sample(df: DataFrame, weight_col: str, k: int = 50,
                    id_col: str = "doc_id") -> DataFrame:
    """Deterministic weighted sampling without replacement (priority
    sampling, Duffield/Lund/Thorup): each row gets priority = w / u
    with u a uniform from the portable md5 hash of its id, and the
    sample is the top-k by priority — heavy rows are proportionally
    more likely to be kept, yet the choice is a pure function of
    (id, weight), so the sample is reproducible across engines and
    stable across reruns (the property a training pipeline needs to
    re-materialize the same subset).

    Every step is a single IEEE operation on identical operands
    (integer hash → one division → one division), so the priorities
    are bit-identical in Spark and DuckDB without any rounding.
    Plan: pure codegen scan + TakeOrderedAndProject — no shuffle of
    the corpus, no RNG state."""
    u = ((F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 15),
                 16, 10).cast("long") + 1) / F.lit(2.0 ** 60))
    prio = F.col(weight_col).cast("double") / u
    return (df.select(F.col(id_col), F.col(weight_col).alias("weight"),
                      prio.alias("priority"))
            # null/non-positive weights cannot be sampled — and engines
            # disagree on NULL placement under DESC, so they must not
            # reach the ordering
            .where(F.col("weight").isNotNull() & (F.col("weight") > 0))
            .orderBy(F.col("priority").desc(), id_col)
            .limit(k))


def dsir_importance(docs: DataFrame, target: DataFrame, k: int = 50,
                    buckets: int = 2048, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """DSIR-style importance resampling (Xie et al. 2023, "Data
    Selection for Language Models via Importance Resampling"): score
    every corpus document by how much more likely its hashed-bigram
    features are under the TARGET distribution than under the corpus
    distribution, and keep the top-k — the data-selection step that
    steers a raw crawl toward a curated domain.

    weight(d) = mean over d's bigram occurrences (bucket h) of
        ln((tc_h + 1) / (Tn + B)) − ln((cc_h + 1) / (Cn + B))
    with tc/cc the target/corpus bucket counts, Tn/Cn their totals and
    B the bucket count (add-1 smoothing over the hashed feature space —
    hashing bounds model state at B regardless of corpus size, the
    paper's own scaling device).

    Scale shape: one bigram explode per side, two groupBy(h) count
    aggregates (model state = B rows, broadcastable), the totals as
    one-row broadcast cross joins, one groupBy(doc) for the per-doc
    mean, and a top-k sort of doc-count rows.  The md5 bucket hash is
    engine-portable, so the DuckDB oracle retrains the same two models
    and reproduces the selection exactly (registry ``sample_dsir``)."""
    def occurrences(df: DataFrame, with_id: bool):
        toks = df.select(F.col(id_col),
                         F.split(F.col(text_col), " ").alias("t"))
        occ = toks.select(
            F.col(id_col),
            F.explode(F.expr(
                "transform(slice(t, 1, greatest(size(t) - 1, 0)),"
                " (w, i) -> concat(w, ' ', t[i + 1]))")).alias("bg"))
        h = (F.conv(F.substring(F.md5(F.col("bg")), 1, 15), 16, 10)
             .cast("long") % buckets).alias("h")
        out = occ.select(F.col(id_col), h) if with_id else occ.select(h)
        # h is never null (explode emits no row for a null/empty bigram
        # array), so this filter is a semantic no-op — it exists to make
        # every plan copy of the occurrence subtree CANONICALLY IDENTICAL
        # to the copies under the model joins, where the optimizer infers
        # the same isnotnull(h) from the join condition.  Identical
        # subtrees are what lets Spark's exchange reuse compute the
        # model aggregate once (ReusedExchange) instead of re-running
        # the tokenize+md5 pass for the totals branches.
        return out.where(F.col("h").isNotNull())

    # the occurrence frames feed 3 (occ) / 2 (t_occ) consumers as plan
    # copies — left UNCACHED deliberately: scope-persisting both
    # measured 1.3× slower in a 4-pair interleaved A/B at sf0.1 (cache
    # populate serializes the pipeline; the duplicated tokenize+md5
    # branches run as parallel stages of one job and are wall-free)
    occ = occurrences(docs, with_id=True)
    t_occ = occurrences(target, with_id=False)
    cc = occ.groupBy("h").agg(F.count(F.lit(1)).alias("cc"))
    tc = t_occ.groupBy("h").agg(F.count(F.lit(1)).alias("tc"))
    # the totals are Σ_h of the model counts — deriving them from the
    # B-row models instead of re-counting occ/t_occ removes one full
    # tokenize+md5 pass per side: the model subtree below each total is
    # now byte-identical to the model itself, so Spark's exchange reuse
    # computes it ONCE (ReusedExchange in the plan) and only the trivial
    # post-shuffle roll-up differs.  coalesce guards the empty-side
    # case where sum() is NULL but count() was 0.
    totals = (
        cc.agg(F.coalesce(F.sum("cc"), F.lit(0)).alias("cn"))
        .crossJoin(tc.agg(F.coalesce(F.sum("tc"), F.lit(0)).alias("tn"))))
    term = (F.log((F.col("tc") + 1.0) / (F.col("tn") + float(buckets)))
            - F.log((F.col("cc") + 1.0) / (F.col("cn") + float(buckets))))
    return (occ.join(cc, "h").join(tc, "h", "left").na.fill({"tc": 0})
            .crossJoin(F.broadcast(totals))
            .groupBy(id_col)
            .agg(F.round(F.avg(term), 6).alias("dsir_weight"),
                 F.count(F.lit(1)).alias("n_bigrams"))
            .orderBy(F.col("dsir_weight").desc(), id_col)
            .limit(k))
