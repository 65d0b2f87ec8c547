"""Text scalar expressions — tokenization and n-grams as Catalyst
expressions (no Python UDFs in the hot path).

The reference tokenizes with sklearn's `TfidfVectorizer` configured
with word analyzer + `\\b\\w+\\b` token pattern, lowercase, unicode
accent strip (reference: utils/object_retrieval_engine/
object_retrieval.py:51-96 `_fit_tfidf_safe`), and (1,3) word n-grams
for OCR/ASR channels (utils/ocr_retrieval_engine/ocr_retrieval.py:27-41).
Everything here compiles to JVM-side expressions so the tokenizer runs
inside whole-stage codegen across all executors.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ColumnOrName = Column | str

TOKEN_PATTERN = r"\w+"


def _c(col: ColumnOrName) -> Column:
    return F.col(col) if isinstance(col, str) else col


def strip_accents_ascii(col: ColumnOrName) -> Column:
    """Best-effort Latin accent fold via translate (covers the
    Latin-1 supplement the reference's Vietnamese corpus mostly does
    not need post-translation; full NFKD parity would be a pandas UDF)."""
    src = "àáâãäåçèéêëìíîïñòóôõöùúûüýÿ"
    dst = "aaaaaaceeeeiiiinooooouuuuyy"
    return F.translate(_c(col), src, dst)


def tokenize(col: ColumnOrName) -> Column:
    """lowercase + `\\w+` word extraction → ARRAY<STRING>."""
    return F.regexp_extract_all(F.lower(_c(col)), F.lit(TOKEN_PATTERN), 0)


def word_ngrams(tokens: ColumnOrName, n: int, sep: str = " ") -> Column:
    """Word n-grams over a token array; empty array when the document
    is shorter than n. NOTE: `sequence(0, size-n)` must be guarded —
    Spark's sequence() generates *descending* ranges when stop < start,
    which would fabricate bogus n-grams on short docs."""
    t = _c(tokens)
    grams = F.transform(
        F.sequence(F.lit(1), F.size(t) - F.lit(n - 1)),
        lambda i: F.array_join(F.slice(t, i, n), sep),
    )
    return F.when(F.size(t) >= n, grams).otherwise(F.array().cast("array<string>"))


def word_ngrams_range(tokens: ColumnOrName, n_min: int, n_max: int, sep: str = " ") -> Column:
    """(n_min, n_max) n-gram union, the sklearn `ngram_range` analogue
    used for the OCR/ASR channels."""
    out = word_ngrams(tokens, n_min, sep)
    for n in range(n_min + 1, n_max + 1):
        out = F.concat(out, word_ngrams(tokens, n, sep))
    return out


def char_ngrams(col: ColumnOrName, n_min: int = 3, n_max: int = 5) -> Column:
    """char_wb-style n-grams (the reference's empty-vocab fallback at
    object_retrieval.py:79-89); approximated as plain char n-grams of
    the lowercased string."""
    s = F.lower(_c(col))

    # closure factory, NOT `lambda i, n=n:` — a default arg makes the
    # lambda two-parameter, and Spark passes the ARRAY INDEX as the
    # second argument of higher-order-function lambdas, silently
    # rebinding n per element
    def gram_fn(n: int):
        return lambda i: s.substr(i, F.lit(n))

    out = None
    for n in range(n_min, n_max + 1):
        grams = F.transform(
            F.sequence(F.lit(1), F.length(s) - F.lit(n - 1)), gram_fn(n)
        )
        grams = F.when(F.length(s) >= n, grams).otherwise(F.array().cast("array<string>"))
        out = grams if out is None else F.concat(out, grams)
    return out
