"""Text-analysis operators for a training-data pipeline over ``documents``:
language-ID heuristic, quality scoring, token counting, fingerprinting.
All JVM-native expressions (no Python in the hot path); each has a
closed-form DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import query

#: English function words used by the n-gram/stopword language heuristic.
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it", "that", "for")

_SQL_STOP = "', '".join(STOPWORDS)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


@query(
    "langid_heuristic",
    oracle=f"""
WITH w AS (
  SELECT doc_id,
         len(string_split(trim(text), ' ')) AS n_words,
         len(list_filter(string_split(trim(text), ' '),
                         x -> x IN ('{_SQL_STOP}'))) AS n_stop
  FROM documents
)
SELECT doc_id, CAST(n_stop AS BIGINT) AS n_stop,
       round(n_stop / n_words, 4) AS stop_ratio,
       CASE WHEN n_stop / n_words >= 0.05 THEN 'en' ELSE 'unk' END AS pred
FROM w""",
)
def langid_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-ratio language ID (n-gram heuristic family): JVM-side
    filter over the split word array — no UDF."""
    d = _docs(spark, sf_dir)
    words = F.split(F.trim("text"), " ")
    n_words = F.size(words)
    n_stop = F.size(F.filter(words, lambda x: x.isin(*STOPWORDS)))
    return d.select(
        "doc_id",
        n_stop.cast("bigint").alias("n_stop"),
        F.round(n_stop / n_words, 4).alias("stop_ratio"),
        F.when(n_stop / n_words >= 0.05, "en").otherwise("unk").alias("pred"),
    )


@query(
    "quality_score",
    oracle=f"""
WITH w AS (
  SELECT doc_id, n_chars,
         string_split(trim(text), ' ') AS words,
         length(replace(trim(text), ' ', '')) AS n_alpha
  FROM documents
)
SELECT doc_id,
       CAST(len(words) AS BIGINT) AS n_words,
       round(n_alpha / len(words), 4) AS mean_word_len,
       round(len(list_filter(words, x -> x IN ('{_SQL_STOP}'))) / len(words), 4) AS stop_ratio,
       round(least(len(words) / 50.0, 1.0)
             * (0.5 + 0.5 * least(len(list_filter(words, x -> x IN ('{_SQL_STOP}')))
                                  / len(words) / 0.05, 1.0)), 4) AS quality
FROM w""",
)
def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document quality score: length + stopword-ratio components (the
    text-density scoring family used for boilerplate, applied corpus-wide)."""
    d = _docs(spark, sf_dir)
    words = F.split(F.trim("text"), " ")
    n_words = F.size(words)
    n_alpha = F.length(F.replace(F.trim("text"), F.lit(" "), F.lit("")))
    n_stop = F.size(F.filter(words, lambda x: x.isin(*STOPWORDS)))
    stop_ratio = n_stop / n_words
    quality = F.least(n_words / F.lit(50.0), F.lit(1.0)) * (
        0.5 + 0.5 * F.least(stop_ratio / 0.05, F.lit(1.0))
    )
    return d.select(
        "doc_id",
        n_words.cast("bigint").alias("n_words"),
        F.round(n_alpha / n_words, 4).alias("mean_word_len"),
        F.round(stop_ratio, 4).alias("stop_ratio"),
        F.round(quality, 4).alias("quality"),
    )


@query(
    "token_count",
    oracle=r"""
SELECT doc_id,
       CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS ws_tokens,
       CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS BIGINT) AS bpe_tokens
FROM documents""",
)
def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens + a BPE-ish regex tokenizer
    (letters / digits / punctuation as separate tokens)."""
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        F.size(F.split(F.trim("text"), " ")).cast("bigint").alias("ws_tokens"),
        F.size(
            F.expr(r"regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\\s]', 0)")
        ).cast("bigint").alias("bpe_tokens"),
    )


@query(
    "doc_fingerprint",
    oracle="""
SELECT doc_id, md5(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS fp
FROM documents""",
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized-content fingerprint (document identity for lineage/dedup)."""
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id", F.md5(F.regexp_replace(F.trim("text"), r"\s+", " ")).alias("fp")
    )


@query(
    "multimodal_stub",
    oracle="""
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       CAST(octet_length(encode(text)) % 640 AS INT) AS fake_width,
       CAST(octet_length(encode(text)) % 7 AS INT) AS n_frames
FROM documents""",
)
def multimodal_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing: an opaque binary column 'decoded' by a
    deterministic stub inside ``mapInPandas`` (real decoders aren't in this
    container — the Spark-side schema/batching/partitioning is the tested
    part; see multimodal.py for the full path)."""
    from ..multimodal import decode_stub_map

    d = _docs(spark, sf_dir).select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    return d.mapInPandas(
        decode_stub_map, "doc_id bigint, n_bytes bigint, fake_width int, n_frames int"
    )
