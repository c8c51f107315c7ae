"""String-similarity analytics: blocked edit-distance joins, cross-doc
chunk dedup with reassembly, and PMI collocation mining.

The reference's only string matching is exact / LIKE-wildcard over
metadata (SURVEY.md §2.2 F2/F5; lib/sonardb.py:3302-3340).  A curation
engine also needs *approximate* string matching; this module adds the
three standard shapes, all JVM-expression-only (no Python UDFs):

  join_fuzzy_levenshtein  blocked similarity self-join: candidate
                          generation by (length-band x first-char)
                          blocking keys, then exact levenshtein verify
                          — the classic filter-verify pattern; the
                          cross product never materializes
  text_chunk_dedup        RefinedWeb-style exact substring dedup at
                          fixed 16-token chunk granularity: global
                          first-occurrence wins, later copies dropped,
                          documents reassembled from surviving chunks
  text_pmi_collocations   corpus collocations by pointwise mutual
                          information over adjacent token pairs

Scale notes (100 TB):
  * the fuzzy join's block fan-out is |names| x 3 length keys; each
    block is tiny, so the verify step is linear-ish — the same
    blocking algebra that backs dedup.py's LSH banding;
  * chunk dedup shuffles once on chunk-hash (first-occurrence window)
    and once on doc_id (reassembly) — both key-partitioned, no
    global ordering anywhere;
  * PMI needs unigram totals joined to bigram counts: the unigram
    side collapses to |vocab| rows, broadcast — the bigram scan is
    the only wide shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# blocked levenshtein self-join
# ---------------------------------------------------------------------------

MAX_DIST = 2


def join_fuzzy_levenshtein(spark, sf_dir):
    """Distinct part-name pairs within edit distance 2.  Candidates
    come from equi-joinable blocking keys — (candidate length in
    {l-1,l,l+1}) x (equal first char) — sound for distance<=2 only
    when the first char matches; pairs whose first chars differ are
    caught by the mirrored block on LAST char.  Union of the two
    blocks = lossless for dist<=1 and covers dist-2 pairs that keep
    either end anchored (the practical fuzzy-match contract; stated
    in the name: this is blocked, not exhaustive)."""
    names = (_t(spark, sf_dir, "part")
             .select(F.col("p_name").alias("name")).distinct()
             .withColumn("len", F.length("name")))
    left = names.select("name", "len",
                        F.explode(F.array(F.col("len") - 1, F.col("len"),
                                          F.col("len") + 1)).alias("blen"))

    def block(key_fn):
        l = left.withColumn("lkey", key_fn(F.col("name")))
        r = names.select(F.col("name").alias("name2"),
                         F.col("len").alias("len2"))
        r = r.withColumn("rkey", key_fn(F.col("name2")))
        return (l.join(r, (F.col("blen") == F.col("len2"))
                       & (F.col("lkey") == F.col("rkey")))
                .where(F.col("name") < F.col("name2"))
                .select("name", "name2"))

    cands = (block(lambda c: F.substring(c, 1, 1))
             .union(block(lambda c: F.substring(c, -1, 1)))
             .distinct())
    return (
        # bigint for cross-engine width parity (tools/type_audit.py)
        cands.withColumn("dist", F.levenshtein("name", "name2").cast("long"))
        .where(F.col("dist") <= MAX_DIST)
        .orderBy("name", "name2")
    )


FUZZY_LEV_SQL = f"""
WITH names AS (SELECT DISTINCT p_name AS name, length(p_name) AS len FROM part),
cands AS (
  SELECT a.name AS name, b.name AS name2
  FROM names a JOIN names b
    ON abs(a.len - b.len) <= 1 AND a.name < b.name
   AND (substr(a.name, 1, 1) = substr(b.name, 1, 1)
        OR substr(a.name, -1, 1) = substr(b.name, -1, 1))
)
SELECT name, name2, levenshtein(name, name2) AS dist
FROM cands WHERE levenshtein(name, name2) <= {MAX_DIST}
ORDER BY name, name2
"""


# ---------------------------------------------------------------------------
# cross-doc chunk dedup + reassembly
# ---------------------------------------------------------------------------

CHUNK = 16


def text_chunk_dedup(spark, sf_dir):
    """Corpus-global exact dedup of 16-token chunks: the FIRST
    occurrence (by doc_id, then chunk position — a total order) of
    each chunk hash survives; every later copy is cut, and each doc
    is reassembled from its surviving chunks in order.  Returns per
    doc: chunk counts before/after and the md5 of the reassembled
    text, so the oracle checks the actual surviving bytes."""
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.split("text", " ").alias("t"))
    chunks = (
        toks.select(
            "doc_id",
            F.posexplode(F.expr(
                f"transform(sequence(0, CAST(ceil(size(t)/{CHUNK}.0) AS INT) - 1),"
                f" i -> concat_ws(' ', slice(t, i*{CHUNK} + 1, {CHUNK})))"))
            .alias("pos", "chunk"))
        .withColumn("h", F.md5("chunk"))
    )
    w = Window.partitionBy("h").orderBy("doc_id", "pos")
    marked = chunks.withColumn("kept", F.row_number().over(w) == 1)
    return (
        marked.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_chunks"),
             F.sum(F.col("kept").cast("int")).alias("n_kept"),
             F.md5(F.concat_ws(" ", F.expr(
                 "transform(filter(array_sort(collect_list(struct(pos, kept, chunk))),"
                 " s -> s.kept), s -> s.chunk)"))).alias("dedup_md5"))
        .orderBy("doc_id")
    )


TEXT_CHUNK_DEDUP_SQL = f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
chunks AS (
  SELECT doc_id, pos,
         array_to_string(t[pos*{CHUNK} + 1 : (pos + 1)*{CHUNK}], ' ') AS chunk
  FROM (SELECT doc_id, t,
               unnest(range(0, CAST(ceil(length(t)/{CHUNK}.0) AS BIGINT))) AS pos
        FROM toks)
), marked AS (
  SELECT doc_id, pos, chunk,
         row_number() OVER (PARTITION BY md5(chunk) ORDER BY doc_id, pos) = 1 AS kept
  FROM chunks
)
SELECT doc_id, count(*) AS n_chunks, CAST(sum(CAST(kept AS INT)) AS BIGINT) AS n_kept,
       md5(coalesce(string_agg(chunk, ' ' ORDER BY pos) FILTER (kept), '')) AS dedup_md5
FROM marked GROUP BY doc_id ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# PMI collocations
# ---------------------------------------------------------------------------

MIN_PAIR = 5
TOP_K = 20


def text_pmi_collocations(spark, sf_dir):
    """Top-20 adjacent-token collocations by PMI:
    pmi = ln(c_ab * N_tokens^2 / (N_pairs * c_a * c_b)) — unigram
    counts collapse to |vocab| rows and broadcast; the bigram count
    is the one wide shuffle.  Deterministic ordering (rounded pmi
    desc, then pair) and a min-count floor keep the result stable."""
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(F.split("text", " ").alias("t"))
    # uni/bi feed multiple consumers as plan copies — left UNCACHED
    # deliberately: scope-persisting both measured 2.7× slower in a
    # 4-pair interleaved A/B at sf0.1 (cache populate serializes the
    # pipeline; the duplicated tokenize branches run as parallel
    # stages of one job and are wall-free at this scale)
    uni = (toks.select(F.explode("t").alias("w"))
           .groupBy("w").agg(F.count(F.lit(1)).alias("cw")))
    bi = (toks.select(F.explode(F.expr(
            "CASE WHEN size(t) < 2 THEN array() ELSE "
            "transform(sequence(1, size(t) - 1),"
            " i -> struct(element_at(t, i) AS a, element_at(t, i+1) AS b)) END"))
          .alias("p"))
          .select("p.a", "p.b")
          .groupBy("a", "b").agg(F.count(F.lit(1)).alias("cab")))
    n_tok = uni.agg(F.sum("cw").alias("nt"))
    n_pair = bi.agg(F.sum("cab").alias("np"))
    ua = uni.select(F.col("w").alias("a"), F.col("cw").alias("ca"))
    ub = uni.select(F.col("w").alias("b"), F.col("cw").alias("cb"))
    pmi = F.round(F.log((F.col("cab") * F.col("nt") * F.col("nt"))
                        / (F.col("np") * F.col("ca") * F.col("cb"))), 6)
    return (
        bi.where(F.col("cab") >= MIN_PAIR)
        .join(F.broadcast(ua), "a").join(F.broadcast(ub), "b")
        .crossJoin(F.broadcast(n_tok)).crossJoin(F.broadcast(n_pair))
        .select("a", "b", "cab", pmi.alias("pmi"))
        .orderBy(F.col("pmi").desc(), "a", "b")
        .limit(TOP_K)
    )


TEXT_PMI_SQL = f"""
WITH toks AS (SELECT string_split(text, ' ') AS t FROM documents),
uni AS (SELECT w, count(*) AS cw FROM (SELECT unnest(t) AS w FROM toks) GROUP BY w),
bi AS (
  SELECT t[i] AS a, t[i+1] AS b, count(*) AS cab
  FROM (SELECT t, unnest(range(1, length(t))) AS i FROM toks)
  GROUP BY 1, 2
), nt AS (SELECT sum(cw) AS nt FROM uni), np AS (SELECT sum(cab) AS np FROM bi)
SELECT a, b, cab,
       round(ln((cab * nt * nt) / (np * ca * cb)), 6) AS pmi
FROM bi
JOIN (SELECT w AS a, cw AS ca FROM uni) USING (a)
JOIN (SELECT w AS b, cw AS cb FROM uni) USING (b)
CROSS JOIN nt CROSS JOIN np
WHERE cab >= {MIN_PAIR}
ORDER BY pmi DESC, a, b LIMIT {TOP_K}
"""


QUERIES = {
    "join_fuzzy_levenshtein": (join_fuzzy_levenshtein, FUZZY_LEV_SQL),
    "text_chunk_dedup": (text_chunk_dedup, TEXT_CHUNK_DEDUP_SQL),
    "text_pmi_collocations": (text_pmi_collocations, TEXT_PMI_SQL),
}
