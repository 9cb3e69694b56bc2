"""Text-analysis expression builders for large-scale training-data pipelines.

Tokenization, shingling, language-ID, quality scoring, token counting and
document fingerprinting — all as pure ``pyspark.sql.functions``
compositions (JVM-side, codegen'd). Mirrors the reference's string surface
(regex extract/replace/split at legiscan_main.R:84-92,220-233;
legiscan_search_all_bills.R:88-93) generalized to corpus scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Stopword marker profiles for the n-gram/stopword language-ID heuristic.
# Tiny on purpose: real deployments swap in larger profiles; the operator
# shape (tokenize → profile hit-count → argmax) is what scales.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "is"),
    "es": ("el", "la", "de", "los", "es"),
    "fr": ("le", "la", "les", "des", "est"),
    "de": ("der", "die", "das", "und", "ist"),
    "zh": ("de5", "shi4", "le5", "zai4", "he2"),
}

# Order must match a deterministic argmax tie-break (first wins).
LANG_ORDER = ("en", "es", "fr", "de", "zh")

STOPWORDS = LANG_MARKERS["en"]

# BPE-ish tokenizer: letter runs | digit runs | single non-alnum-non-space.
TOKEN_REGEX = "[a-z]+|[0-9]+|[^a-z0-9 ]"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def tokens(col: Column | str) -> Column:
    """Whitespace tokens."""
    return F.split(_c(col), " ")


def bpe_ish_tokens(col: Column | str) -> Column:
    """Regex sub-word tokens (letters / digits / punctuation singletons)."""
    return F.regexp_extract_all(F.lower(_c(col)), F.lit(TOKEN_REGEX), 0)


def shingles(tok: Column | str, n: int) -> Column:
    """Distinct n-token shingles joined by spaces.

    Docs shorter than ``n`` tokens yield their full (shorter) token join,
    matching ``slice``'s clamped semantics in both engines.
    """
    t = _c(tok)
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(t) - (n - 1), F.lit(1))),
            lambda i: F.concat_ws(" ", F.slice(t, i, n)),
        )
    )


def sql_shingles(tokens_expr: str, n: int) -> str:
    """DuckDB twin of :func:`shingles` (1-based inclusive list slices)."""
    return (
        f"list_distinct(list_transform("
        f"generate_series(1, greatest(len({tokens_expr}) - {n - 1}, 1)),"
        f" i -> array_to_string(({tokens_expr})[i:i+{n - 1}], ' ')))"
    )


def ngrams_all(tok: Column | str, n: int) -> Column:
    """ALL n-token grams in order (duplicates kept — the repetition
    signal needs multiplicity, unlike :func:`shingles`). Docs shorter
    than ``n`` tokens yield their single full token join."""
    t = _c(tok)
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(t) - (n - 1), F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(t, i, n)),
    )


def sql_ngrams_all(tokens_expr: str, n: int) -> str:
    """DuckDB twin of :func:`ngrams_all`."""
    return (
        f"list_transform("
        f"generate_series(1, greatest(len({tokens_expr}) - {n - 1}, 1)),"
        f" i -> array_to_string(({tokens_expr})[i:i+{n - 1}], ' '))"
    )


def stopword_hits(tok: Column | str, words: tuple[str, ...]) -> Column:
    """Number of tokens that are in the given stopword list."""
    return F.size(F.filter(_c(tok), lambda t: t.isin(*words)))


def sql_stopword_hits(tokens_expr: str, words: tuple[str, ...]) -> str:
    lst = ", ".join(f"'{w}'" for w in words)
    return f"len(list_filter({tokens_expr}, t -> t IN ({lst})))"


def lang_id(tok: Column | str) -> Column:
    """Argmax language guess over stopword-profile hit counts.

    Deterministic tie-break: LANG_ORDER priority; all-zero → 'und'.
    """
    t = _c(tok)
    scores = {lang: stopword_hits(t, LANG_MARKERS[lang]) for lang in LANG_ORDER}
    best = F.greatest(*[scores[lang] for lang in LANG_ORDER])
    expr = F.lit("und")
    for lang in reversed(LANG_ORDER):
        expr = F.when(scores[lang] == best, F.lit(lang)).otherwise(expr)
    return F.when(best == 0, F.lit("und")).otherwise(expr)


def sql_lang_id(tokens_expr: str) -> str:
    """DuckDB twin of :func:`lang_id`."""
    hits = {
        lang: sql_stopword_hits(tokens_expr, LANG_MARKERS[lang])
        for lang in LANG_ORDER
    }
    best = "greatest(" + ", ".join(hits[lang] for lang in LANG_ORDER) + ")"
    whens = " ".join(
        f"WHEN {hits[lang]} = {best} THEN '{lang}'" for lang in LANG_ORDER
    )
    return f"(CASE WHEN {best} = 0 THEN 'und' ELSE (CASE {whens} ELSE 'und' END) END)"


def quality_score(text: Column | str) -> Column:
    """Heuristic document-quality score in [0,1].

    0.4·min(chars/500, 1) + 0.3·alnum-space ratio + 0.3·stopword ratio.
    Rounding is floor(x·10⁴ + 0.5)/10⁴ rather than ROUND: engine ROUNDs
    disagree on half-way doubles (Spark HALF_UP vs DuckDB), while this
    formula is the same IEEE-754 op sequence in both.
    """
    c = _c(text)
    tok = tokens(c)
    n_chars = F.length(c)
    clean = F.length(F.regexp_replace(c, "[^a-z0-9 ]", ""))
    n_tok = F.size(tok)
    stop = stopword_hits(tok, STOPWORDS)
    raw = (
        0.4 * F.least(n_chars.cast("double") / 500.0, F.lit(1.0))
        + 0.3 * (clean.cast("double") / n_chars)
        + 0.3 * (stop.cast("double") / n_tok)
    )
    return F.floor(raw * 10000.0 + 0.5) / 10000.0


def sql_quality_score(text_expr: str) -> str:
    tok = f"string_split({text_expr}, ' ')"
    stop = sql_stopword_hits(tok, STOPWORDS)
    raw = (
        f"(0.4 * least(CAST(length({text_expr}) AS DOUBLE) / 500.0, 1.0)"
        f" + 0.3 * (CAST(length(regexp_replace({text_expr}, '[^a-z0-9 ]', '', 'g')) AS DOUBLE)"
        f" / length({text_expr}))"
        f" + 0.3 * (CAST({stop} AS DOUBLE) / len({tok})))"
    )
    return f"(FLOOR({raw} * 10000.0 + 0.5) / 10000.0)"


def fingerprint(text: Column | str, n: int = 5) -> Column:
    """Deterministic document fingerprint: lexicographic-min MD5 over
    n-token shingles (a 1-permutation MinHash; md5 exists in both engines)."""
    sh = shingles(tokens(_c(text)), n)
    return F.array_min(F.transform(sh, F.md5))


def sql_fingerprint(text_expr: str, n: int = 5) -> str:
    sh = sql_shingles(f"string_split({text_expr}, ' ')", n)
    return f"list_min(list_transform({sh}, s -> md5(s)))"


def skipgram_pairs_arr(tok: Column | str, max_dist: int) -> Column:
    """ALL ordered skip-gram pairs "w_i w_{i+d}" for d = 1..max_dist —
    the word2vec-style (center, context) training-pair generator
    (window co-occurrence WITH multiplicity; duplicates kept like
    :func:`ngrams_all`). Docs with ≤ d tokens contribute no pairs at
    distance d. Index-lambda form (element_at over a generated
    sequence) — the guard is an explicit when(): Spark's sequence(1, 0)
    yields a DESCENDING [1, 0], not an empty list."""
    t = _c(tok)

    def pair_fn(d: int):
        # closure factory: a `lambda i, d=d` would read to Spark as the
        # TWO-argument (element, index) higher-order lambda form
        return lambda i: F.concat_ws(
            " ", F.element_at(t, i), F.element_at(t, i + d)
        )

    per_d = [
        F.when(
            F.size(t) > d,
            F.transform(F.sequence(F.lit(1), F.size(t) - d), pair_fn(d)),
        ).otherwise(F.array().cast("array<string>"))
        for d in range(1, max_dist + 1)
    ]
    out = per_d[0]
    for arr in per_d[1:]:
        out = F.concat(out, arr)
    return out


def sql_skipgram_pairs(tokens_expr: str, max_dist: int) -> str:
    """DuckDB twin of :func:`skipgram_pairs_arr` (1-based list index)."""
    parts = [
        f"CASE WHEN len({tokens_expr}) > {d} THEN "
        f"list_transform(generate_series(1, len({tokens_expr}) - {d}),"
        f" i -> ({tokens_expr})[i] || ' ' || ({tokens_expr})[i + {d}])"
        f" ELSE CAST([] AS VARCHAR[]) END"
        for d in range(1, max_dist + 1)
    ]
    out = parts[0]
    for nxt in parts[1:]:
        out = f"list_concat({out}, {nxt})"
    return out
