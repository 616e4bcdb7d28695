"""Shared tokenizer / k-gram expressions used by multiple plan
modules (dedup_plans, corpus_plans), kept in ONE place so the Spark
expression and its DuckDB-SQL twin cannot drift apart between plans —
oracle parity depends on every consumer tokenizing identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# whitespace tokenization of lower(trim(text)), empty tokens dropped
SQL_TOKS = (
    "list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), x -> x <> '')"
)


def spark_tokens(text):
    return F.filter(F.split(F.lower(F.trim(text)), r"\s+"), lambda t: t != "")


def sql_kgrams(k: int) -> str:
    """DuckDB k-word shingle list over SQL_TOKS (1-based indexing)."""
    joined = " || ' ' || ".join(
        f"{SQL_TOKS}[i]" if j == 0 else f"{SQL_TOKS}[i+{j}]" for j in range(k)
    )
    return (
        f"list_transform(generate_series(1, len({SQL_TOKS}) - {k - 1}), "
        f"i -> {joined})"
    )


def spark_kgrams(text, k: int = 3):
    """k-word shingles via zip of k shifted slices (array form).

    Deliberately NOT element_at over an index sequence: the token
    array subtree is re-inlined per element access (no CSE inside
    higher-order functions), which turns shingling O(tokens²) per
    document — measured 40× slower at sf0.1. The zip form evaluates
    the token array k times per row, total O(k·tokens)."""
    toks = spark_tokens(text)
    m = F.greatest(F.size(toks) - (k - 1), F.lit(0))
    z = F.arrays_zip(*[F.slice(toks, i + 1, m) for i in range(k)])
    return F.transform(z, lambda x: F.concat_ws(" ", *[x[str(i)] for i in range(k)]))


def exploded_kgrams(
    df: DataFrame, text_col: str, k: int, carry: tuple[str, ...] = (), out: str = "gram"
) -> DataFrame:
    """One row per k-gram, tokenizing each document exactly once.

    The single-element-array explode is a generator barrier that
    materializes the token array as a bound attribute; the shingle zip
    references it 2k+1 times (k slices + sizes), which would otherwise
    re-tokenize the text per reference (CollapseProject re-inlining —
    measured 0.69 s → 0.43 s for the 3-gram stage at sf0.1)."""
    tk = df.select(
        *carry, F.explode(F.array(spark_tokens(F.col(text_col)))).alias("_tk")
    )
    m = F.greatest(F.size("_tk") - (k - 1), F.lit(0))
    z = F.arrays_zip(*[F.slice("_tk", i + 1, m) for i in range(k)])
    grams = F.transform(z, lambda x: F.concat_ws(" ", *[x[str(i)] for i in range(k)]))
    return tk.select(*carry, F.explode(grams).alias(out))


# Cross-engine parity domain (measured, fuzz-tested in
# tests/test_properties.py::TestTokenizerCrossEngineParity): the pair
# above is equivalent over ASCII + common Latin-1 letters and the
# whitespace set {space, \t, \n, \r, \f}. Two measured dialect
# boundaries OUTSIDE that domain: Java's \s includes \x0B (vertical
# tab) while RE2/DuckDB's does not, and lower('İ' U+0130) is
# 'i'+combining-dot under the JVM but plain 'i' under DuckDB. The
# test corpus is ASCII, so every oracle comparison stays exact; any
# non-ASCII production corpus should normalize VT and dotted-İ
# upstream (or extend the fuzz domain first).
