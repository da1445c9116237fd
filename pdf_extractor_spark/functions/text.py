"""Shared native-expression builders for text / hashing ops.

All of these stay JVM-side (whole-stage codegen; no Python), and each has an
exact DuckDB-SQL counterpart so catalog queries built from them pass the
driver's value-hash gate bit-for-bit.

Cross-engine hash: ``h32(s) = int(md5(s)[:8], 16)`` — deterministic, identical
in Spark (``conv(substring(md5(x),1,8),16,10)``) and DuckDB
(``CAST('0x'||substr(md5(x),1,8) AS BIGINT)``), uniform over [0, 2^32).
Never Spark's ``hash()``/``xxhash64`` (engine-private) or Python ``hash()``
(process-salted).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# BPE-ish pre-tokenizer: letter runs | single digits | single punctuation.
# ASCII classes only — identical semantics in Java and RE2-style engines.
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"


def h32(col: Column) -> Column:
    """32-bit deterministic content hash (md5 prefix), as bigint."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def h32_sql(expr: str) -> str:
    """DuckDB counterpart of :func:`h32` for oracle SQL."""
    return f"CAST(('0x' || substr(md5({expr}), 1, 8)) AS BIGINT)"


def ws_tokens(col: Column, distinct: bool = False) -> Column:
    """Whitespace (single-space) tokenization; optionally set-semantics."""
    toks = F.split(col, " ")
    return F.array_distinct(toks) if distinct else toks


def bpe_ish_token_count(col: Column) -> Column:
    """Token count under the BPE-ish pre-tokenizer (skips whitespace runs)."""
    return F.size(F.regexp_extract_all(col, F.lit(BPE_ISH_PATTERN), 0)).cast("long")


def rolling_fingerprint(col: Column, k: int = 8) -> Column:
    """Document fingerprint: min over all k-char shingles of h32(shingle)
    (the winnowing-style rolling-hash min; one pass, no explode)."""
    idx = F.sequence(F.lit(1), F.greatest(F.length(col) - F.lit(k - 1), F.lit(1)))
    return F.array_min(F.transform(idx, lambda i: h32(col.substr(i, F.lit(k)))))


def rolling_fingerprint_sql(expr: str, k: int = 8) -> str:
    return (
        f"list_min([{h32_sql(f'substr({expr}, CAST(i AS INT), {k})')} "
        f"for i in range(1, greatest(length({expr}) - {k - 1}, 1) + 1)])"
    )


# R13 strip list in reference order (transaction_normalizer.py:390-399);
# mirrors rules/textnorm.py — (?i) inline flag works in both Java and Python
REF_STRIP_PATTERNS = (
    r"(?i)POS\s+DEBIT\s+\d+",
    r"(?i)ACH\s+DEBIT\s+\d+",
    r"(?i)ACH\s+CREDIT\s+\d+",
    r"(?i)POS\s+CREDIT\s+\d+",
    r"(?i)\d{4}\*",
    r"(?i)REF\s*\d+",
    r"(?i)TRANS\s*\d+",
    r"(?i)PURCHASE\s+AUTH\s+\d+",
)


def normalize_description_expr(col: Column, strip_trailing: bool = False) -> Column:
    """Native-expression tier of R13+R14 (rules/textnorm.py
    normalize_description; R15 via strip_trailing=True, mirroring the Python
    tier's bank-specific opt-in): whole-stage-codegen, zero Python.

    Parity domain: printable-ASCII + NBSP + control chars — the reference's
    actual input domain. OUTSIDE it (exotic unicode whitespace like \\u2028)
    Java's ``\\s`` is ASCII-only while Python's is unicode-aware; the
    pandas-UDF tier (rules/textnorm.py) is authoritative there, per SURVEY
    §7.8 mitigation ("demote any mismatching rule to the UDF tier"). The
    property test (tests/test_property_parity.py) pins the in-domain parity.
    """
    # NBSP first: Java \s is ASCII-only while Python's \s matches NBSP, so
    # folding it to a plain space up front makes the \s-bearing patterns agree
    s = F.regexp_replace(col, "\u00a0", " ")
    for pat in REF_STRIP_PATTERNS:
        s = F.regexp_replace(s, pat, "")
    if strip_trailing:
        s = F.regexp_replace(s, r"XXXXXXXXXXXX\d+", "")  # R15 masked card
        s = F.regexp_replace(s, r"\s+\d+\s*$", "")  # R15 trailing ref run
    s = F.regexp_replace(s, r"\s+", " ")  # R14 collapse
    return F.trim(s)


def token_sort_key(col: Column) -> Column:
    """token_sort normalization (rapidfuzz token_sort_ratio's first half):
    lowercase, split, sort tokens, rejoin."""
    return F.array_join(F.array_sort(F.split(F.lower(col), " ")), " ")


def levenshtein_ratio(a: Column, b: Column, scale: int = 10000) -> Column:
    """Similarity ratio from Levenshtein distance, deterministic 4-dp fixed
    point: floor((1 - lev/(len(a)+len(b))) * scale + 0.5) / scale.

    Reference parity note: rapidfuzz token_sort_ratio uses InDel distance
    (no substitutions); we use classic Levenshtein — available as a builtin
    in BOTH Spark and DuckDB — and document the deviation
    (organizer_extractor.py:603-658 J2)."""
    denom = F.greatest(F.length(a) + F.length(b), F.lit(1))
    r = 1.0 - F.levenshtein(a, b).cast("double") / denom
    return F.floor(r * scale + F.lit(0.5)) / float(scale)
