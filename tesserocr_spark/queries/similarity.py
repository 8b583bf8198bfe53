"""Similarity search over the ``embeddings`` table (array<float> column).

Brute-force cosine top-k is the exact baseline; sign-LSH bucketing is the
scale path (bucket join instead of all-pairs). All vector math uses
``F.aggregate``/``F.zip_with`` sequential folds in double precision, which
matches DuckDB's ``list_dot_product``/``list_cosine_similarity`` bit-for-bit
(verified), so the oracles compare exactly at 6 dp rounding.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .registry import query

_N_QUERIES = 5   # vec_id < 5 are the query vectors
_TOP_K = 5
_LSH_K = 8       # hyperplanes
_DIM = 64


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e"), "label"
    )


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def _norm(a):
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                              F.lit(0.0), lambda acc, x: acc + x))


@query(
    "embedding_norms",
    oracle="""
SELECT vec_id, label,
       round(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])), 6) AS l2
FROM embeddings""",
)
def embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2 norms — the vector-math smoke check (fold == list_dot_product)."""
    e = _emb(spark, sf_dir)
    return e.select("vec_id", "label", F.round(_norm("e"), 6).alias("l2"))


@query(
    "ann_bruteforce_topk",
    oracle=f"""
WITH scored AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cos,
         row_number() OVER (
           PARTITION BY a.vec_id
           ORDER BY list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) DESC,
                    b.vec_id
         ) AS rank
  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
  WHERE a.vec_id < {_N_QUERIES}
)
SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, cos
FROM scored WHERE rank <= {_TOP_K}""",
)
def ann_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k per query vector: broadcast the (small) query set
    against the corpus — at scale the corpus side stays partitioned and only
    queries are replicated, so no all-pairs shuffle."""
    e = _emb(spark, sf_dir)
    q = e.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe")
    )
    cos = _dot("qe", "e") / (_norm("qe") * _norm("e"))
    scored = (
        F.broadcast(q)
        .join(e, F.col("query_id") != F.col("vec_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"), cos.alias("cos_raw"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_raw"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= _TOP_K)
        .select("query_id", "rank", "neighbor_id", F.round("cos_raw", 6).alias("cos"))
    )


def _hyperplane(k: int) -> list[float]:
    """Deterministic ±1 hyperplane from md5 — same literal on both engines."""
    signs = []
    for d in range(_DIM):
        h = hashlib.md5(f"{k}:{d}".encode()).digest()[0]
        signs.append(1.0 if h % 2 == 0 else -1.0)
    return signs


def _lsh_bucket_expr():
    """Sum_k (dot(e, plane_k) > 0) << k, planes as literal arrays (sequential
    fold ⇒ engine-identical)."""
    bucket = F.lit(0)
    for k in range(_LSH_K):
        plane = F.array(*[F.lit(v) for v in _hyperplane(k)])
        bit = F.when(_dot("e", plane) > 0, 1 << k).otherwise(0)
        bucket = bucket + bit
    return bucket.cast("int")


def _lsh_bucket_sql() -> str:
    terms = []
    for k in range(_LSH_K):
        plane = "[" + ", ".join(str(v) for v in _hyperplane(k)) + "]"
        terms.append(
            f"(CASE WHEN list_dot_product(embedding::DOUBLE[], {plane}::DOUBLE[]) > 0 "
            f"THEN {1 << k} ELSE 0 END)"
        )
    return " + ".join(terms)


@query(
    "ann_lsh_buckets",
    oracle=f"SELECT vec_id, CAST({_lsh_bucket_sql()} AS INT) AS bucket FROM embeddings",
)
def ann_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-LSH bucket assignment (8 deterministic hyperplanes → 256
    buckets): the partition key for scalable ANN — candidates co-locate by
    bucket, turning all-pairs similarity into per-bucket joins."""
    e = _emb(spark, sf_dir)
    return e.select("vec_id", _lsh_bucket_expr().alias("bucket"))


@query(
    "dedup_embedding_cosine",
    oracle=f"""
WITH candidates AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 100000 AS vec_id, embedding
  FROM embeddings WHERE vec_id % 9 = 0
),
buckets AS (
  SELECT vec_id, embedding, {_lsh_bucket_sql()} AS bucket FROM candidates
)
SELECT a.vec_id AS a_id, b.vec_id AS b_id,
       round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cos
FROM buckets a JOIN buckets b
  ON a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.99""",
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate detection: planted duplicate vectors
    (vec_id % 9 == 0 copied at id+100000) recovered by LSH-bucket blocking +
    exact cosine verification ≥ 0.99 — the embedding-space twin of
    minhash-LSH dedup; the bucket join is the only shuffle."""
    base = _emb(spark, sf_dir).select("vec_id", "e")
    copies = base.filter(F.col("vec_id") % 9 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "e"
    )
    cand = base.unionByName(copies).withColumn("bucket", _lsh_bucket_expr())
    a, b = cand.alias("a"), cand.alias("b")
    cos = _dot("a.e", "b.e") / (_norm("a.e") * _norm("b.e"))
    return (
        a.join(b, (F.col("a.bucket") == F.col("b.bucket"))
               & (F.col("a.vec_id") < F.col("b.vec_id")))
        .withColumn("cos_raw", cos)
        .filter(F.col("cos_raw") >= 0.99)
        .select(
            F.col("a.vec_id").alias("a_id"),
            F.col("b.vec_id").alias("b_id"),
            F.round("cos_raw", 6).alias("cos"),
        )
    )


_IVF_K = 16      # centroid count
_IVF_NPROBE = 2  # cells probed per query

_SQL_IVF = f"""
centroids AS (
  SELECT vec_id AS cid, embedding AS ce FROM embeddings WHERE vec_id < {_IVF_K}
),
assigned AS (
  SELECT vec_id, embedding, cid FROM (
    SELECT e.vec_id, e.embedding, c.cid,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], c.ce::DOUBLE[]) DESC, c.cid
           ) AS rn
    FROM embeddings e, centroids c
  ) WHERE rn = 1
),
probes AS (
  SELECT query_id, cid FROM (
    SELECT e.vec_id AS query_id, c.cid,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], c.ce::DOUBLE[]) DESC, c.cid
           ) AS rn
    FROM embeddings e, centroids c WHERE e.vec_id < {_N_QUERIES}
  ) WHERE rn <= {_IVF_NPROBE}
)
"""


@query(
    "ann_ivf_cells",
    oracle=f"WITH {_SQL_IVF.rstrip()} SELECT vec_id, CAST(cid AS BIGINT) AS cid FROM assigned",
)
def ann_ivf_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF cell assignment: nearest of K deterministic centroids (the first
    K vectors stand in for k-means means — same structure, seedless). The
    cell id is the partition key of the IVF scale path: candidate search
    touches nprobe cells instead of the corpus."""
    return _ivf_assign(spark, sf_dir).select(
        "vec_id", F.col("cid").cast("bigint").alias("cid")
    )


def _centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _emb(spark, sf_dir)
        .filter(F.col("vec_id") < _IVF_K)
        .select(F.col("vec_id").alias("cid"), F.col("e").alias("ce"))
    )


def _argmax_cells(vectors: DataFrame, cents: DataFrame, n: int) -> DataFrame:
    cos = _dot("e", "ce") / (_norm("e") * _norm("ce"))
    w = Window.partitionBy("vec_id").orderBy(F.desc("cos_raw"), "cid")
    return (
        vectors.crossJoin(F.broadcast(cents))
        .withColumn("cos_raw", cos)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= n)
        .select("vec_id", "cid")
    )


def _ivf_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _argmax_cells(_emb(spark, sf_dir), _centroids(spark, sf_dir), 1)


@query(
    "ann_ivf_topk",
    oracle=f"""WITH {_SQL_IVF.rstrip()},
scored AS (
  SELECT p.query_id, a.vec_id AS neighbor_id,
         list_cosine_similarity(q.embedding::DOUBLE[], a.embedding::DOUBLE[]) AS cos_raw
  FROM probes p
  JOIN assigned a ON a.cid = p.cid
  JOIN embeddings q ON q.vec_id = p.query_id
  WHERE a.vec_id <> p.query_id
)
SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, round(cos_raw, 6) AS cos
FROM (
  SELECT query_id, neighbor_id, cos_raw,
         row_number() OVER (PARTITION BY query_id ORDER BY cos_raw DESC, neighbor_id) AS rank
  FROM scored
) WHERE rank <= {_TOP_K}""",
)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: probe the nprobe nearest cells per query, exact cosine only
    within them — candidate count scales with cell size, not corpus size;
    the candidate join is keyed on the cell id."""
    emb = _emb(spark, sf_dir)
    cents = _centroids(spark, sf_dir)
    assigned = _argmax_cells(emb, cents, 1)
    probes = _argmax_cells(
        emb.filter(F.col("vec_id") < _N_QUERIES), cents, _IVF_NPROBE
    ).select(F.col("vec_id").alias("query_id"), "cid")
    q = emb.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe")
    )
    cand = (
        probes.join(assigned, "cid")
        .filter(F.col("vec_id") != F.col("query_id"))
        .join(emb.select("vec_id", "e"), "vec_id")
        .join(F.broadcast(q), "query_id")
    )
    cos = _dot("qe", "e") / (_norm("qe") * _norm("e"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_raw"), "vec_id")
    return (
        cand.withColumn("cos_raw", cos)
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= _TOP_K)
        .select("query_id", "rank", F.col("vec_id").alias("neighbor_id"),
                F.round("cos_raw", 6).alias("cos"))
    )


@query(
    "ann_lsh_topk",
    oracle=f"""
WITH buckets AS (
  SELECT vec_id, embedding, {{bucket_sql}} AS bucket FROM embeddings
),
scored AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) AS cos_raw,
         row_number() OVER (
           PARTITION BY a.vec_id
           ORDER BY list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) DESC,
                    b.vec_id
         ) AS rank
  FROM buckets a JOIN buckets b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
  WHERE a.vec_id < {_N_QUERIES}
)
SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, round(cos_raw, 6) AS cos
FROM scored WHERE rank <= {_TOP_K}""".replace("{bucket_sql}", _lsh_bucket_sql()),
)
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed ANN: exact cosine only within the query's bucket.
    Composition of ann_lsh_buckets + ann_bruteforce_topk; recall vs brute
    force is asserted in pytest, end-to-end values against the oracle."""
    e = _emb(spark, sf_dir).withColumn("bucket", _lsh_bucket_expr())
    q = e.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe"),
        F.col("bucket").alias("qb"),
    )
    cos = _dot("qe", "e") / (_norm("qe") * _norm("e"))
    scored = (
        F.broadcast(q)
        .join(e, (F.col("qb") == F.col("bucket")) & (F.col("query_id") != F.col("vec_id")))
        .select("query_id", F.col("vec_id").alias("neighbor_id"), cos.alias("cos_raw"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_raw"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= _TOP_K)
        .select("query_id", "rank", "neighbor_id", F.round("cos_raw", 6).alias("cos"))
    )
