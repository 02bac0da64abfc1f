"""Text expression helpers — tokenization, shingling, fingerprints.

Everything here is a pure column expression (JVM-side, codegen'd); the
same constructions are mirrored in DuckDB SQL by the oracle strings.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Tiny function-word list used by quality scoring / language ID.
STOPWORDS = ["the", "a", "of", "and", "to", "in"]

#: Large prime modulus for the rolling fingerprint fold.
FP_MOD = 1_000_000_007


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization (the corpus is space-separated words)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, " ")


def word_shingles(text: Column | str, k: int = 3) -> Column:
    """Distinct word k-grams as '|'-joined strings.

    1-based element_at keeps the construction aligned with the oracle's
    ``w[i] || '|' || w[i+1] ...`` indexing. Texts with fewer than ``k``
    tokens yield an EMPTY array (matching the oracle's empty
    ``range(1, len(w)-1)``) — without the guard, ``F.sequence(1, 0)``
    builds a descending sequence and ANSI ``element_at`` throws.
    """
    w = tokens(text)
    grams = F.transform(
        F.sequence(F.lit(1), F.size(w) - (k - 1)),
        lambda i: F.concat_ws("|", *[F.element_at(w, i + j) for j in range(k)]),
    )
    return F.when(F.size(w) >= k, F.array_distinct(grams)) \
            .otherwise(F.array().cast("array<string>"))


def word_code(word: Column) -> Column:
    """Deterministic small integer code for a word (shared with the
    oracle: ascii of first char * 7 + length)."""
    return F.ascii(F.substring(word, 1, 1)) * 7 + F.length(word)


def rolling_fingerprint(text: Column | str) -> Column:
    """Order-sensitive polynomial rolling hash over the token stream:
    fold(acc*31 + code(w)) mod p — a content fingerprint that (unlike
    md5) is locality-free but cheap and cross-engine reproducible."""
    codes = F.transform(tokens(text), lambda w: word_code(w).cast("long"))
    return F.aggregate(codes, F.lit(0).cast("long"),
                       lambda a, x: (a * 31 + x) % FP_MOD)
