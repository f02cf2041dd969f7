"""Text analysis operators: token counting, quality scoring, language-ID,
document fingerprinting. All JVM built-ins (split/filter/aggregate/md5) —
oracle-expressible and codegen-friendly; plus a numpy winnowing
fingerprint (rolling hash) as the pandas-UDF scale path.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "for", "on"],
    "de": ["der", "die", "das", "und", "ist", "ein", "zu", "mit", "von", "nicht"],
    "fr": ["le", "la", "les", "et", "de", "un", "une", "est", "pour", "dans"],
}

# a BPE-ish token regex: words, numbers, or single non-space symbols
TOKEN_RE = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


def text_stats(docs: DataFrame, text_col: str = "text",
               key_col: str = "doc_id") -> DataFrame:
    """Per-doc stats: n_chars, whitespace tokens, regex (BPE-ish) tokens,
    punctuation count, English-stopword count."""
    toks = F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
    retoks = F.regexp_extract_all(F.col(text_col), F.lit(TOKEN_RE), F.lit(0))
    stop = F.array([F.lit(w) for w in STOPWORDS["en"]])
    return docs.select(
        key_col,
        F.length(text_col).alias("n_chars"),
        F.size(toks).alias("n_tokens"),
        F.size(retoks).alias("n_retokens"),
        F.size(F.filter(retoks, lambda t: t.rlike("^[^a-zA-Z0-9]$")))
        .alias("n_punct"),
        F.size(F.filter(toks, lambda t: F.array_contains(stop, t)))
        .alias("n_stopwords"),
    )


def quality_score(docs: DataFrame, text_col: str = "text",
                  key_col: str = "doc_id") -> DataFrame:
    """Heuristic quality in basis points (integer, oracle-friendly):
    + length component (capped), + stopword presence, - punctuation excess.
    The formula is arbitrary but fixed; it exists to exercise the pipeline
    shape of a crawl quality filter."""
    s = text_stats(docs, text_col, key_col)
    len_c = F.least(F.col("n_chars"), F.lit(500)) * 10
    stop_c = F.least(F.col("n_stopwords") * 100, F.lit(2000))
    punct_p = F.when(F.col("n_retokens") > 0,
                     (F.col("n_punct") * 10000 / F.col("n_retokens")).cast("long")
                     ).otherwise(F.lit(0))
    return s.select(
        key_col, "n_chars", "n_tokens",
        (len_c + stop_c - punct_p).cast("long").alias("quality_bp"))


def lang_id(docs: DataFrame, text_col: str = "text",
            key_col: str = "doc_id") -> DataFrame:
    """Stopword-vote language ID over {en, de, fr}: most hits wins, ties in
    (en, de, fr) priority order; no hits -> 'und'."""
    toks = F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
    hits = {}
    d = docs.select(key_col, toks.alias("toks"))
    for lang, words in STOPWORDS.items():
        arr = F.array([F.lit(w) for w in words])
        hits[lang] = F.size(F.filter(F.col("toks"),
                                     lambda t: F.array_contains(arr, t)))
    best = F.greatest(*[hits[l] for l in STOPWORDS])
    pred = (F.when(best == 0, F.lit("und"))
            .when(hits["en"] == best, F.lit("en"))
            .when(hits["de"] == best, F.lit("de"))
            .otherwise(F.lit("fr")))
    return d.select(key_col,
                    *[hits[l].alias(f"hits_{l}") for l in STOPWORDS],
                    pred.alias("pred_lang"))


def fingerprint_md5(docs: DataFrame, text_col: str = "text",
                    key_col: str = "doc_id") -> DataFrame:
    """60-bit content fingerprint (md5-based; oracle twin via hex cast)."""
    return docs.select(
        key_col,
        F.conv(F.substring(F.md5(text_col), 1, 15), 16, 10).cast("long")
        .alias("fingerprint"))


def fingerprint_winnow(docs: DataFrame, k: int = 8, window: int = 4,
                       text_col: str = "text", key_col: str = "doc_id") -> DataFrame:
    """Winnowing fingerprint (Schleimer et al. 2003): rolling polynomial
    hash of k-grams, min per window, distinct mins kept. numpy kernel over
    Arrow batches — the scale path for plagiarism-style matching (not
    SQL-expressible; verified by pytest determinism + containment tests)."""
    B = np.uint64(1000003)

    def winnow(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            keys, prints = [], []
            for key, text in zip(pdf[key_col], pdf[text_col]):
                b = np.frombuffer(str(text).encode("utf-8"), dtype=np.uint8)
                if len(b) < k:
                    keys.append(key); prints.append([])
                    continue
                with np.errstate(over="ignore"):
                    powers = B ** np.arange(k, dtype=np.uint64)[::-1]
                    n = len(b) - k + 1
                    # rolling hash via strided dot (mod 2^64 wraparound)
                    idx = np.arange(n)[:, None] + np.arange(k)[None, :]
                    hs = (b[idx].astype(np.uint64) * powers[None, :]).sum(
                        axis=1, dtype=np.uint64)
                if len(hs) >= window:
                    w = np.lib.stride_tricks.sliding_window_view(hs, window)
                    mins = w.min(axis=1)
                else:
                    mins = hs.min(keepdims=True)
                keys.append(key)
                # mask to 63 bits: Arrow bigint is signed
                prints.append(sorted({int(m) & 0x7FFFFFFFFFFFFFFF for m in mins}))
            yield pd.DataFrame({key_col: keys, "fingerprints": prints})

    return docs.select(key_col, text_col).mapInPandas(
        winnow, f"{key_col} bigint, fingerprints array<bigint>")


def sql_text_stats(text_expr: str = "text", key_expr: str = "doc_id") -> str:
    """DuckDB twin of text_stats."""
    toks = f"list_filter(string_split({text_expr}, ' '), t -> t <> '')"
    retoks = f"regexp_extract_all({text_expr}, '{TOKEN_RE}')"
    stop = "', '".join(STOPWORDS["en"])
    return f"""
SELECT {key_expr} AS doc_id,
       length({text_expr}) AS n_chars,
       len({toks}) AS n_tokens,
       len({retoks}) AS n_retokens,
       len(list_filter({retoks}, t -> regexp_matches(t, '^[^a-zA-Z0-9]$'))) AS n_punct,
       len(list_filter({toks}, t -> t IN ('{stop}'))) AS n_stopwords
FROM documents"""


def sql_fingerprint_winnow(k: int = 8, window: int = 4) -> str:
    """DuckDB twin of fingerprint_winnow, exploded to (doc_id, fp) rows.

    Replays the numpy kernel exactly: per-position rolling polynomial hash
    sum(byte[i+j] * B^(k-1-j)) mod 2^64 (HUGEINT intermediates, wraparound
    via % 2^64 — the powers are precomputed mod-2^64 constants, matching
    numpy's uint64 overflow), window-min per sliding window, DISTINCT of
    the 63-bit-masked mins. Valid because the corpus is pure ASCII
    (unicode(char) == byte value; asserted in the pytest twin)."""
    P = [pow(1000003, k - 1 - j, 1 << 64) for j in range(k)]
    terms = " + ".join(
        f"CAST(LEAD(c, {j}) OVER w AS HUGEINT) * {P[j]}" if j else
        f"CAST(c AS HUGEINT) * {P[0]}" for j in range(k))
    return f"""
WITH pos AS (
  SELECT doc_id, i, unicode(substr(text, CAST(i AS INT), 1)) AS c
  FROM documents, LATERAL (SELECT unnest(range(1, length(text) + 1)) AS i)
),
hs AS (
  SELECT doc_id, i, ({terms}) % 18446744073709551616 AS h,
         LEAD(c, {k - 1}) OVER w IS NOT NULL AS valid
  FROM pos WINDOW w AS (PARTITION BY doc_id ORDER BY i)
),
mins AS (
  SELECT doc_id,
         MIN(h) OVER (PARTITION BY doc_id ORDER BY i
                      ROWS BETWEEN CURRENT ROW AND {window - 1} FOLLOWING) AS m,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY i) AS rn,
         COUNT(*) OVER (PARTITION BY doc_id) AS cnt
  FROM hs WHERE valid
)
SELECT DISTINCT doc_id, CAST(m % 9223372036854775808 AS BIGINT) AS fp
FROM mins WHERE rn <= GREATEST(cnt - {window - 1}, 1)"""
