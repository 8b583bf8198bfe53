"""Adversarial-corpus oracle regression: the driver's Spark-vs-DuckDB
comparison re-run over a documents table full of the edge cases the fixed
testdata never exercises — empty text, whitespace-only text, leading/
trailing tabs and newlines, single-word docs, doubled internal whitespace.

Round 3 found five latent cross-engine law divergences that only these
rows expose (trim-before-collapse ordering, phantom '' words from
string_split(''), unguarded closed forms assuming a non-empty document);
this test keeps the whole family fixed.

Round 4 extended the corpus to non-ASCII (CJK no-space text, combining
marks, astral emoji, ideographic space U+3000, mixed scripts, no-letter
documents) and found two more: Python's Unicode-aware str.split()/
isspace() treated U+3000 as a word separator while both SQL engines'
ASCII ``\\s`` did not (fixed by freezing the ASCII law in segment.py),
and the osd script oracle hardcoded 'Latin' where the engine classifies
by Unicode ranges (fixed by encoding the real law as registry.SQL_SCRIPT)."""

from __future__ import annotations

import importlib.util
import sys

import duckdb
import pytest

_spec = importlib.util.spec_from_file_location(
    "check_oracles", "/root/repo/scripts/check_oracles.py"
)
_harness = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_harness)

#: the law-sensitive, documents-only queries (everything the edge rows touch)
EDGE_QUERIES = (
    "utf8_text",
    "all_words",
    "fold_from_spans",
    "span_level_counts",
    "doc_metrics",
    "charset_table",
    "thresholded_text",
    "extract_full",
    "osd_script",
    "word_recognition_language",
    "mean_text_conf",
    "langid_heuristic",
    "quality_score",
    "token_count",
    "repetition_filter",
    "unpivot_doc_stats",
    "dedup_sentences",
    # r04 expansion: every remaining documents-only query — the dedup
    # signature laws (shingles, minhash, simhash) and the textops family
    # have their own empty/CJK/emoji edge behavior
    "doc_fingerprint",
    "quality_gate_rules",
    "pii_scrub",
    "tfidf_top_terms",
    "stratified_sample",
    "token_budget_pack",
    "dedup_exact",
    "minhash_signatures",
    "dedup_minhash_lsh",
    "simhash_signatures",
    "dedup_simhash",
    "dedup_simhash64",
    "ngram_jaccard_pairs",
    "dedup_cc_clusters",
    "dedup_campaign_keep",
    "dedup_campaign_keep_lsh",
    "decontaminate_ngram_overlap",
    "multimodal_stub",
    "multimodal_decode",
    # r05 expansion (VERDICT r04 task #7): the word/span-level families —
    # these run the same CJK/emoji/whitespace-edge content through
    # pages.make_page and the extraction UDF into the spans oracles, so
    # the geometry/confidence/boundary laws are exercised on non-ASCII
    # words, phantom-empty documents, and single-word pages too
    "all_word_confidences",
    "blanks_before_word",
    "map_word_confidences",
    "tsv_word_rows",
    "word_attributes",
    "word_boundaries",
    "word_geometry",
    "word_normed_text",
    "tesseract_rect",
    "rollup_lang_source",
    "multimodal_pixels",
)


@pytest.fixture(scope="module")
def edge_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("edge_sf")
    con = duckdb.connect()
    con.execute(
        f"""
COPY (
  SELECT doc_id, text, lang, source, n_chars
  FROM '/root/testdata/sf0.001/documents.parquet' WHERE doc_id < 40
  UNION ALL SELECT 9001, '', 'en', 'edge', 0
  UNION ALL SELECT 9002, '   ', 'en', 'edge', 3
  UNION ALL SELECT 9003, chr(10) || 'hello world', 'en', 'edge', 12
  UNION ALL SELECT 9004, 'tail space ' || chr(9), 'en', 'edge', 12
  UNION ALL SELECT 9005, 'one', 'en', 'edge', 3
  UNION ALL SELECT 9006, 'a  b' || chr(10) || chr(10) || 'c', 'de', 'edge', 6
  -- r04 non-ASCII family: CJK (no spaces — one giant word), combining
  -- marks (é as e+U+0301), astral-plane emoji (UTF-16 surrogate pairs vs
  -- codepoint counting), ideographic space U+3000 (NOT ASCII \\s in either
  -- engine — must stay inside the word), mixed scripts
  UNION ALL SELECT 9007, '这是一个测试文档没有空格也没有标点', 'zh', 'edge', 17
  UNION ALL SELECT 9008, 'cafe' || chr(769) || ' nai' || chr(776) || 've words', 'fr', 'edge', 17
  UNION ALL SELECT 9009, 'good {chr(128512)}{chr(128512)} day {chr(128640)} end', 'en', 'edge', 16
  UNION ALL SELECT 9010, '汉字 mixed with ascii 词 and spaces', 'zh', 'edge', 31
  UNION ALL SELECT 9011, chr(128512), 'en', 'edge', 1
  UNION ALL SELECT 9012, 'ideo' || chr(12288) || 'space', 'ja', 'edge', 10
  UNION ALL SELECT 9013, 'привет мир αβγ δεζ', 'ru', 'edge', 18
  -- no classifiable letter at all -> OSD falls back to the config-lang
  -- script ('Latin' for every registry query)
  UNION ALL SELECT 9014, '12 34 567 890', 'ru', 'edge', 13
  -- \\v (0x0B): Java \\s matches it, RE2 \\s does NOT -> it must be a WORD
  -- character in every law (r04 code-review finding)
  UNION ALL SELECT 9015, 'alpha' || chr(11) || 'beta gamma', 'en', 'edge', 16
  -- combining marks must NOT count toward the script winner (isalpha law):
  -- Latin 5 letters vs 4 Devanagari letters + 2 matras -> Latin wins
  UNION ALL SELECT 9016, 'hello नमस्ते', 'en', 'edge', 12
) TO '{d}/documents.parquet' (FORMAT PARQUET)
"""
    )
    con.close()
    return str(d)


def test_edge_corpus_oracles_match(spark, edge_dir):
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry_mod

    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{edge_dir}/documents.parquet'"
    )
    failures = []
    for name in EDGE_QUERIES:
        spdf = _harness.norm_pdf(qs[name](spark, edge_dir).toPandas())
        opdf = _harness.norm_pdf(con.sql(oracles[name]).df())
        if len(spdf) != len(opdf):
            failures.append(f"{name}: rowcount {len(spdf)} vs {len(opdf)}")
        elif sorted(spdf.columns) != sorted(opdf.columns):
            failures.append(f"{name}: schema mismatch")
        elif _harness.value_hash(spdf) != _harness.value_hash(opdf):
            failures.append(f"{name}: value-hash mismatch")
    assert not failures, failures
