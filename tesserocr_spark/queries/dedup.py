"""Deduplication operators for a training-data pipeline over ``documents``.

Since the synthetic corpus has no natural duplicates, each dedup query
*plants* deterministic (near-)duplicates inside the query itself — exact
copies for hash dedup, first-word-dropped copies for near-dup methods — so
the operators produce meaningful, oracle-checkable output.

All hashing uses the verified md5-hex→int64 pair (registry docstring), so
Spark and DuckDB agree bit-for-bit. Everything is JVM-native (explode +
hash agg + self-join); at corpus scale the shuffles are keyed exactly where
they must be (signature/band buckets), and candidate verification happens
after the LSH bucket join — the standard minhash-LSH shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .registry import query

#: planted duplicates: every doc_id % 7 == 0 gets a copy at id + 100000.
_PLANT_MOD = 7
_PLANT_OFFSET = 100000

_SQL_CANDIDATES_EXACT = f"""
candidates AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + {_PLANT_OFFSET} AS doc_id, text
  FROM documents WHERE doc_id % {_PLANT_MOD} = 0
)
"""

#: near-dup copies: drop the first word (substr after the first space).
_SQL_CANDIDATES_NEAR = f"""
candidates AS (
  SELECT doc_id, trim(text) AS text FROM documents
  UNION ALL
  SELECT doc_id + {_PLANT_OFFSET} AS doc_id,
         substr(trim(text), strpos(trim(text), ' ') + 1) AS text
  FROM documents WHERE doc_id % {_PLANT_MOD} = 0
)
"""


def _candidates_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    copies = (
        d.filter(F.col("doc_id") % _PLANT_MOD == 0)
        .select((F.col("doc_id") + _PLANT_OFFSET).alias("doc_id"), "text")
    )
    return d.unionByName(copies)


def _candidates_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", F.trim("text").alias("text"))
    )
    copies = d.filter(F.col("doc_id") % _PLANT_MOD == 0).select(
        (F.col("doc_id") + _PLANT_OFFSET).alias("doc_id"),
        F.expr("substring(text, instr(text, ' ') + 1)").alias("text"),
    )
    return d.unionByName(copies)


@query(
    "dedup_exact",
    oracle=f"""
WITH {_SQL_CANDIDATES_EXACT}
SELECT md5(text) AS fp, count(*) AS n,
       CAST(min(doc_id) AS BIGINT) AS keep_id,
       CAST(max(doc_id) AS BIGINT) AS dup_id
FROM candidates GROUP BY md5(text) HAVING count(*) > 1""",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on content fingerprint; keep min id.
    At 10^12 scale this is one shuffle keyed by the hash — the minimum
    possible; AQE coalesces the post-agg partitions."""
    return (
        _candidates_exact(spark, sf_dir)
        .groupBy(F.md5("text").alias("fp"))
        .agg(
            F.count("*").alias("n"),
            F.min("doc_id").cast("bigint").alias("keep_id"),
            F.max("doc_id").cast("bigint").alias("dup_id"),
        )
        .filter(F.col("n") > 1)
    )


# -- minhash LSH --------------------------------------------------------------

_N_HASHES = 8

_SQL_SHINGLES = f"""
words AS (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS word,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM candidates
),
shingles AS (
  SELECT DISTINCT doc_id,
         word || ' ' || lead(word, 1) OVER w || ' ' || lead(word, 2) OVER w AS shingle
  FROM words WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
  QUALIFY lead(word, 2) OVER w IS NOT NULL
),
hashes AS (
  SELECT doc_id, h.i AS band,
         min(('0x' || substr(md5(h.i || ':' || shingle), 1, 15))::BIGINT) AS minhash
  FROM shingles, (SELECT unnest(range({_N_HASHES})) AS i) h
  GROUP BY doc_id, h.i
)
"""


def _minhash_signatures(cand: DataFrame) -> DataFrame:
    """(doc_id, band, minhash): min over 3-word shingles of band-salted
    md5-int hashes. Shuffle count: one explode (narrow) + one hash agg keyed
    (doc_id, band)."""
    words = cand.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos0", "word")
    ).withColumn("pos", F.col("pos0") + 1).drop("pos0")
    w = Window.partitionBy("doc_id").orderBy("pos")
    shingles = (
        words.select(
            "doc_id",
            F.concat_ws(
                " ", "word", F.lead("word", 1).over(w), F.lead("word", 2).over(w)
            ).alias("shingle"),
            F.lead("word", 2).over(w).alias("_guard"),
        )
        .filter(F.col("_guard").isNotNull())
        .select("doc_id", "shingle")
        .distinct()
    )
    bands = shingles.crossJoin(
        F.broadcast(
            shingles.sparkSession.range(_N_HASHES).select(F.col("id").cast("int").alias("band"))
        )
    )
    h = F.conv(
        F.substring(F.md5(F.concat(F.col("band").cast("string"), F.lit(":"), "shingle")), 1, 15),
        16, 10,
    ).cast("bigint")
    return bands.groupBy("doc_id", "band").agg(F.min(h).alias("minhash"))


@query(
    "minhash_signatures",
    oracle=f"""
WITH {_SQL_CANDIDATES_NEAR}, {_SQL_SHINGLES.rstrip()}
SELECT doc_id, CAST(band AS INT) AS band, minhash FROM hashes""",
)
def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signatures (8 hash functions over 3-word shingles)."""
    return _minhash_signatures(_candidates_near(spark, sf_dir)).select(
        "doc_id", F.col("band").cast("int").alias("band"), "minhash"
    )


@query(
    "dedup_minhash_lsh",
    oracle=f"""
WITH {_SQL_CANDIDATES_NEAR}, {_SQL_SHINGLES.rstrip()},
pairs AS (
  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
  FROM hashes a JOIN hashes b
    ON a.band = b.band AND a.minhash = b.minhash AND a.doc_id < b.doc_id
),
verified AS (
  SELECT p.a_id, p.b_id,
         round(len(list_intersect(sa.sh, sb.sh))::DOUBLE
               / len(list_distinct(sa.sh || sb.sh)), 4) AS jaccard
  FROM pairs p
  JOIN (SELECT doc_id, list(DISTINCT shingle) AS sh FROM shingles GROUP BY doc_id) sa
    ON sa.doc_id = p.a_id
  JOIN (SELECT doc_id, list(DISTINCT shingle) AS sh FROM shingles GROUP BY doc_id) sb
    ON sb.doc_id = p.b_id
)
SELECT a_id, b_id, jaccard FROM verified WHERE jaccard >= 0.5""",
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + LSH near-dup detection: signature → band-bucket self-join →
    Jaccard verification of candidates. The self-join is keyed on
    (band, minhash) — at corpus scale that is the only wide shuffle, and
    bucket sizes are bounded by signature collisions, not corpus size."""
    cand = _candidates_near(spark, sf_dir)
    sig = _minhash_signatures(cand)
    a, b = sig.alias("a"), sig.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.minhash") == F.col("b.minhash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id"))
        .distinct()
    )
    # verification: true Jaccard over distinct shingle sets
    words = cand.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "word")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    shingle_sets = (
        words.select(
            "doc_id",
            F.concat_ws(" ", "word", F.lead("word", 1).over(w),
                        F.lead("word", 2).over(w)).alias("shingle"),
            F.lead("word", 2).over(w).alias("_guard"),
        )
        .filter(F.col("_guard").isNotNull())
        .groupBy("doc_id")
        .agg(F.collect_set("shingle").alias("sh"))
    )
    sa, sb = shingle_sets.alias("sa"), shingle_sets.alias("sb")
    jac = F.round(
        F.size(F.array_intersect(F.col("sa.sh"), F.col("sb.sh"))).cast("double")
        / F.size(F.array_union(F.col("sa.sh"), F.col("sb.sh"))),
        4,
    )
    return (
        pairs.join(sa, F.col("sa.doc_id") == F.col("a_id"))
        .join(sb, F.col("sb.doc_id") == F.col("b_id"))
        .select("a_id", "b_id", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= 0.5)
    )


# -- simhash -------------------------------------------------------------------

_SIMHASH_BITS = 16

_SQL_SIMHASH = f"""
words AS (
  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS word
  FROM candidates
),
wh AS (
  SELECT doc_id, ('0x' || substr(md5(word), 1, 15))::BIGINT AS h FROM words
),
bits AS (
  SELECT doc_id, b.i AS bit,
         sum(CASE WHEN (h >> b.i) & 1 = 1 THEN 1 ELSE -1 END) AS s
  FROM wh, (SELECT unnest(range({_SIMHASH_BITS})) AS i) b
  GROUP BY doc_id, b.i
),
sims AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN s > 0 THEN 1 << bit ELSE 0 END) AS BIGINT) AS simhash
  FROM bits GROUP BY doc_id
)
"""


def _simhash(cand: DataFrame) -> DataFrame:
    words = cand.select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    ).distinct()
    wh = words.select(
        "doc_id",
        F.conv(F.substring(F.md5("word"), 1, 15), 16, 10).cast("bigint").alias("h"),
    )
    bits = wh.crossJoin(
        F.broadcast(wh.sparkSession.range(_SIMHASH_BITS).select(F.col("id").cast("int").alias("bit")))
    ).groupBy("doc_id", "bit").agg(
        F.sum(
            F.when(F.expr("shiftright(h, bit) & 1") == 1, 1).otherwise(-1)
        ).alias("s")
    )
    return bits.groupBy("doc_id").agg(
        F.sum(
            F.when(F.col("s") > 0, F.expr("shiftleft(1, bit)")).otherwise(0)
        ).cast("bigint").alias("simhash")
    )


@query(
    "simhash_signatures",
    oracle=f"WITH {_SQL_CANDIDATES_NEAR}, {_SQL_SIMHASH.rstrip()} SELECT doc_id, simhash FROM sims",
)
def simhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash signature per document (word-level features)."""
    return _simhash(_candidates_near(spark, sf_dir))


@query(
    "dedup_simhash",
    oracle=f"""
WITH {_SQL_CANDIDATES_NEAR}, {_SQL_SIMHASH.rstrip()}
SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
FROM sims a JOIN sims b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 2""",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: hamming distance ≤ 2 on 16-bit signatures.
    (Quadratic candidate scan here at test scale; at corpus scale you bucket
    by simhash bit-slices exactly like the minhash bands.)"""
    s = _simhash(_candidates_near(spark, sf_dir))
    a, b = s.alias("a"), s.alias("b")
    ham = F.bit_count(
        F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
    ).cast("int")
    return (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("a_id"),
            F.col("b.doc_id").alias("b_id"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= 2)
    )


@query(
    "ngram_jaccard_pairs",
    oracle=f"""
WITH {_SQL_CANDIDATES_NEAR}, {_SQL_SHINGLES.rstrip()},
sets AS (SELECT doc_id, list(DISTINCT shingle) AS sh FROM shingles GROUP BY doc_id),
keyed AS (
  -- content-derived blocking key (the last word survives the near-copy edit)
  SELECT c.doc_id,
         ('0x' || substr(md5(string_split(c.text, ' ')[-1]), 1, 15))::BIGINT % 16 AS bucket,
         s.sh
  FROM candidates c JOIN sets s ON s.doc_id = c.doc_id
)
SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       round(len(list_intersect(a.sh, b.sh))::DOUBLE
             / len(list_distinct(a.sh || b.sh)), 4) AS jaccard
FROM keyed a JOIN keyed b ON a.bucket = b.bucket AND a.doc_id < b.doc_id
WHERE len(list_intersect(a.sh, b.sh))::DOUBLE / len(list_distinct(a.sh || b.sh)) >= 0.3""",
)
def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram Jaccard near-dup within hash buckets (blocked all-pairs):
    the non-probabilistic baseline the LSH methods approximate."""
    cand = _candidates_near(spark, sf_dir)
    words = cand.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "word")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    sets = (
        words.select(
            "doc_id",
            F.concat_ws(" ", "word", F.lead("word", 1).over(w),
                        F.lead("word", 2).over(w)).alias("shingle"),
            F.lead("word", 2).over(w).alias("_guard"),
        )
        .filter(F.col("_guard").isNotNull())
        .groupBy("doc_id")
        .agg(F.collect_set("shingle").alias("sh"))
    )
    last_word_bucket = (
        F.conv(F.substring(F.md5(F.element_at(F.split("text", " "), -1)), 1, 15), 16, 10)
        .cast("bigint") % 16
    )
    sets = sets.join(
        cand.select("doc_id", last_word_bucket.alias("bucket")), "doc_id"
    )
    a, b = sets.alias("a"), sets.alias("b")
    jac = F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh"))).cast("double") / F.size(
        F.array_union(F.col("a.sh"), F.col("b.sh"))
    )
    return (
        a.join(b, (F.col("a.bucket") == F.col("b.bucket"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(
            F.col("a.doc_id").alias("a_id"),
            F.col("b.doc_id").alias("b_id"),
            F.round(jac, 4).alias("jaccard"),
        )
        .filter(jac >= 0.3)
    )


# -- duplicate clusters (connected components) --------------------------------

@query(
    "dedup_cc_clusters",
    oracle=f"""
WITH RECURSIVE {_SQL_CANDIDATES_NEAR.strip()}, {_SQL_SHINGLES.rstrip()},
sets AS (SELECT doc_id, list(DISTINCT shingle) AS sh FROM shingles GROUP BY doc_id),
keyed AS (
  SELECT c.doc_id,
         ('0x' || substr(md5(string_split(c.text, ' ')[-1]), 1, 15))::BIGINT % 16 AS bucket,
         s.sh
  FROM candidates c JOIN sets s ON s.doc_id = c.doc_id
),
pairs AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id
  FROM keyed a JOIN keyed b ON a.bucket = b.bucket AND a.doc_id < b.doc_id
  WHERE len(list_intersect(a.sh, b.sh))::DOUBLE / len(list_distinct(a.sh || b.sh)) >= 0.3
),
edges AS (
  SELECT a_id AS src, b_id AS dst FROM pairs
  UNION SELECT b_id, a_id FROM pairs
),
reach(node, label) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.src, r.label FROM edges e JOIN reach r ON r.node = e.dst
)
SELECT CAST(node AS BIGINT) AS doc_id,
       CAST(min(label) AS BIGINT) AS cluster_id
FROM reach GROUP BY node""",
)
def dedup_cc_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate CLUSTERS via connected components over near-dup pairs —
    the iterative operator a dedup pipeline needs when similarity is not
    transitive (A~B, B~C, A!~C must still collapse to one cluster).

    Spark-first iteration: min-label propagation over the edge list with an
    early-stop convergence check; ``localCheckpoint`` truncates the lineage
    each round so the plan stays flat. Rounds needed = component diameter
    (tiny for dup clusters); the 100 TB upgrade is the large-star/small-star
    variant of the same loop, which converges in O(log d) rounds. The DuckDB
    oracle states the same fixpoint as a recursive CTE."""
    pairs = ngram_jaccard_pairs(spark, sf_dir).select("a_id", "b_id")
    edges = (
        pairs.union(pairs.select(F.col("b_id"), F.col("a_id")))
        .toDF("src", "dst")
        .distinct()
        .localCheckpoint()
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(20):
        nbr = edges.join(labels, edges.dst == labels.node).select(
            F.col("src").alias("node"), "label"
        )
        new_labels = (
            labels.unionByName(nbr)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .localCheckpoint()
        )
        improved = (
            new_labels.withColumnRenamed("label", "new_label")
            .join(labels, "node")
            .filter(F.col("new_label") < F.col("label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if improved == 0:
            break
    return labels.select(
        F.col("node").cast("bigint").alias("doc_id"),
        F.col("label").cast("bigint").alias("cluster_id"),
    )
