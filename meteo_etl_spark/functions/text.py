"""Text analysis for training-data pipelines: tokenization, language-ID,
quality scoring, and document fingerprinting.

All functions return JVM-side Column expressions (no Python UDFs), so
they run inside whole-stage codegen and scale linearly with executors.
The constants below are shared with the DuckDB oracle SQL generators in
``plans/llm_queries.py`` so both engines compute bit-identical results.

Reference parity: the reference has no text ops; this extends its
scalar-function surface (SURVEY.md §2.4, mandated by BASELINE.json) —
the same element-wise style as `etl/models.py:78-79` rounding and
`dashboard/streamlit_app.py:43` string mapping.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tokenizer: the corpus is single-space separated; a production corpus
# would use `\\s+` — kept as a constant so Spark and the oracle agree.
TOKEN_SEP = " "

# BPE-ish pre-tokenizer: letter runs, digit runs, single other glyphs.
# (RE2- and Java-regex compatible — no lookarounds.)
BPE_PATTERN = "[a-z]+|[0-9]+|[^a-z0-9 ]"

# Stopword profiles for the n-gram/stopword language-ID heuristic.
# Fixed evaluation order = deterministic tie-break (first max wins).
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "in", "to", "is"),
    "de": ("der", "die", "das", "und", "nicht", "ein"),
    "fr": ("le", "la", "et", "les", "des", "un"),
    "es": ("el", "los", "de", "y", "que", "una"),
    "zh": ("的", "是", "了", "在", "我", "不"),
}
LANGS = tuple(STOPWORDS)  # evaluation order

# Karp-Rabin-style rolling fingerprint constants. Token values stay
# < 2^14 and the accumulator < P, so acc*B + v < 2^50 — no BIGINT
# overflow in either engine. Production note: at 100 TB you'd use
# xxhash64 over the raw bytes; md5/ascii are used here because they are
# bit-identical across Spark and the DuckDB oracle.
FP_BASE = 1_000_003
FP_MOD = 1_000_000_007


def tokens(col: Column) -> Column:
    """Whitespace tokens (array<string>)."""
    return F.split(col, TOKEN_SEP)


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


def bpe_token_count(col: Column) -> Column:
    """Count of BPE-ish pre-tokens (letter runs / digit runs / glyphs)."""
    return F.size(F.regexp_extract_all(col, F.lit(BPE_PATTERN), F.lit(0)))


def stopword_hits(col: Column, lang: str) -> Column:
    """Number of tokens that are stopwords of ``lang``."""
    words = STOPWORDS[lang]
    return F.size(F.filter(tokens(col), lambda t: t.isin(*words)))


def lang_id(col: Column) -> Column:
    """Stopword-profile language-ID: argmax of per-language stopword
    hits, ties broken by LANGS order, 'und' (undetermined) when no
    profile matches at all."""
    hits = {lang: stopword_hits(col, lang) for lang in LANGS}
    total = None
    for h in hits.values():
        total = h if total is None else total + h
    expr = F.lit(LANGS[-1])
    for lang in reversed(LANGS[:-1]):
        cond = None
        for other in LANGS:
            if other == lang:
                continue
            c = hits[lang] >= hits[other]
            cond = c if cond is None else cond & c
        expr = F.when(cond, F.lit(lang)).otherwise(expr)
    return F.when(total == 0, F.lit("und")).otherwise(expr)


def mean_token_len(col: Column) -> Column:
    """Mean token length without a per-token aggregate: total chars
    minus the (n-1) separators, over n tokens."""
    n = token_count(col)
    return (F.length(col) - (n - F.lit(1))) / n


def round_half_up(col: Column, digits: int) -> Column:
    """floor(x*10^d + 0.5)/10^d — unlike engine-native ROUND (whose
    tie handling on binary doubles differs between Spark and DuckDB),
    this is a fixed sequence of deterministic FP ops, so two engines
    fed bit-identical doubles round identically."""
    scale = float(10**digits)
    return F.floor(col * F.lit(scale) + F.lit(0.5)).cast("long") / F.lit(scale)


def quality_score(col: Column) -> Column:
    """Composite [0,1] quality heuristic: stopword density, length,
    and mean token length, each saturated. Mirrors the usual
    Gopher/C4-style length+stopword filters."""
    n = token_count(col)
    stop_ratio = stopword_hits(col, "en") / n
    score = (
        F.lit(0.4) * F.least(stop_ratio * 5, F.lit(1.0))
        + F.lit(0.3) * F.least(n / F.lit(100.0), F.lit(1.0))
        + F.lit(0.3) * F.least(mean_token_len(col) / F.lit(8.0), F.lit(1.0))
    )
    return round_half_up(score, 4)


def fingerprint(col: Column) -> Column:
    """Rolling (Karp-Rabin-style) document fingerprint over tokens,
    mod FP_MOD — order-sensitive, so shuffled near-dups get distinct
    fingerprints while exact dups collide deterministically."""
    tok_vals = F.transform(
        tokens(col), lambda t: (F.ascii(t) * F.lit(131) + F.length(t)).cast("long")
    )
    return F.aggregate(
        tok_vals,
        F.lit(0).cast("long"),
        lambda acc, v: (acc * F.lit(FP_BASE) + v) % F.lit(FP_MOD),
    )


# Repetition signal: word n-gram order shared with the oracle SQL.
REP_NGRAM = 3

# PII patterns — intersection of Java-regex and RE2 syntax (no
# lookarounds, no backrefs) so Spark and the DuckDB oracle match the
# same spans. Applied in dict order; replacement order matters (an
# email must be scrubbed before its digits could look phone-like).
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}", "<EMAIL>"),
    "phone": (r"\+[0-9]{7,15}", "<PHONE>"),
    "ipv4": (r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}", "<IP>"),
}


def ngrams(tokens_col: str, n: int = REP_NGRAM) -> Column:
    """All word n-grams (with repeats) from a pre-split token array.
    Like ``dedup.shingles`` but keeping duplicates — the repetition
    signal IS the duplicates. Takes a column NAME (pre-projected
    tokens): inlining split() here would re-execute it per lambda
    iteration."""
    return F.expr(
        f"""
        CASE WHEN size({tokens_col}) >= {n} THEN
          transform(sequence(1, size({tokens_col}) - {n - 1}),
                    i -> concat_ws(' ', slice({tokens_col}, i, {n})))
        ELSE array() END
        """
    )


def pii_scrub(col: Column) -> Column:
    """Redact PII spans in pattern order. Chained regexp_replace —
    one codegen'd pass per pattern, no Python in the loop."""
    out = col
    for pat, repl in PII_PATTERNS.values():
        out = F.regexp_replace(out, pat, repl)
    return out


def pii_count(col: Column, kind: str) -> Column:
    """Occurrences of one PII pattern (before any scrubbing)."""
    pat, _ = PII_PATTERNS[kind]
    return F.regexp_count(col, F.lit(pat))
