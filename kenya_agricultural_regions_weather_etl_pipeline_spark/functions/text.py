"""Text-analysis expression library (LLM-data-pipeline extension surface).

All hot-path functions are native Column expressions (split / regexp /
hash built-ins) so they whole-stage-codegen; nothing here drops to
Python. Designed for the ``documents`` table
(doc_id, text, lang, source, n_chars) but generic over any string column.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword marker sets for the n-gram/stopword language-ID
# heuristic. Deliberately small + deterministic so the DuckDB oracle can
# reproduce the exact same scoring in SQL.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "with", "for"),
    "es": ("el", "la", "de", "que", "y", "en", "los", "del"),
    "fr": ("le", "la", "de", "et", "les", "des", "un", "une"),
    "de": ("der", "die", "das", "und", "ist", "von", "mit", "den"),
}


def tokens(text: Column) -> Column:
    """Whitespace tokenization: array<string> (empty strings removed)."""
    return F.filter(F.split(text, r"\s+"), lambda t: t != "")


def token_count(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(tokens(text))


def token_count_sql(text: str) -> str:
    # len(list_filter(...)) mirrors the empty-token removal.
    return f"len(list_filter(regexp_split_to_array({text}, '\\s+'), t -> t <> ''))"


BPE_ISH_PATTERN = r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-ish subword proxy: count of word/number/punct chunks.

    A deterministic regex approximation of byte-pair tokenizer output
    size (alnum runs + single non-space punct), useful for token
    budgeting without shipping a tokenizer to executors. Uses
    ``regexp_extract_all`` (a codegen-able JVM regex built-in, and the
    pattern avoids lookarounds so DuckDB's RE2 oracle matches it
    verbatim).
    """
    return F.size(F.regexp_extract_all(text, F.lit(BPE_ISH_PATTERN), 0))


def bpe_ish_token_count_sql(text: str) -> str:
    return f"len(regexp_extract_all({text}, '{BPE_ISH_PATTERN}'))"


def char_count(text: Column) -> Column:
    return F.length(text)


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    """Fraction of tokens that are language-marker stopwords."""
    toks = tokens(F.lower(text))
    markers = F.array(*[F.lit(m) for m in LANG_MARKERS[lang]])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(markers, t)))
    return hits / F.greatest(F.size(toks), F.lit(1))


def lang_score(text: Column, lang: str) -> Column:
    """Marker-hit count for one language (the language-ID signal)."""
    toks = tokens(F.lower(text))
    markers = F.array(*[F.lit(m) for m in LANG_MARKERS[lang]])
    return F.size(F.filter(toks, lambda t: F.array_contains(markers, t)))


def lang_id(text: Column) -> Column:
    """Heuristic language ID: argmax of marker-hit counts, 'und' if no hits.

    Ties break by the fixed language order en > es > fr > de
    (deterministic, oracle-reproducible).
    """
    best_lang = F.lit("und")
    best_score = F.lit(0)
    # priority-order fold: a later language replaces only on STRICT
    # improvement, so earlier languages win ties (en > es > fr > de)
    for lang in LANG_MARKERS:
        score = lang_score(text, lang)
        better = score > best_score
        best_lang = F.when(better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(better, score).otherwise(best_score)
    return best_lang


def lang_id_sql(text: str) -> str:
    """DuckDB twin of :func:`lang_id` (same markers, same tie-break)."""
    def score(lang: str) -> str:
        markers = ", ".join(f"'{m}'" for m in LANG_MARKERS[lang])
        return (
            f"len(list_filter(list_filter(regexp_split_to_array(lower({text}), '\\s+'),"
            f" t -> t <> ''), t -> t IN ({markers})))"
        )

    s = {lang: score(lang) for lang in LANG_MARKERS}
    return (
        f"CASE WHEN greatest({s['en']},{s['es']},{s['fr']},{s['de']}) = 0 THEN 'und' "
        f"WHEN {s['en']} >= greatest({s['es']},{s['fr']},{s['de']}) THEN 'en' "
        f"WHEN {s['es']} >= greatest({s['fr']},{s['de']}) THEN 'es' "
        f"WHEN {s['fr']} >= {s['de']} THEN 'fr' "
        f"ELSE 'de' END"
    )


# Characteristic character-trigrams per language (tiny, deterministic —
# chosen for mutual distinctiveness so the oracle reproduces the scoring).
LANG_TRIGRAMS: dict[str, tuple[str, ...]] = {
    "en": ("the", "ing", "and", "ion", "to "),
    "es": ("que", "los", "ción", "ado", "de "),
    "fr": ("les", "des", "ait", "eur", "ent"),
    "de": ("der", "ich", "und", "sch", "ein"),
}


def _occurrences(text: Column, needle: str) -> Column:
    """Occurrence count of a literal substring: length-difference trick
    ((len(s) − len(replace(s, t, ''))) / len(t)) — pure JVM string ops,
    identical formula in any SQL engine."""
    return (
        F.length(text) - F.length(F.replace(text, F.lit(needle), F.lit("")))
    ) / F.lit(len(needle))


def lang_id_ngram(text: Column) -> Column:
    """Character-n-gram language ID: argmax of characteristic-trigram
    occurrence counts over the lowercased text, 'und' when nothing hits.
    Ties break en > es > fr > de (fixed order, oracle-reproducible)."""
    low = F.lower(text)
    best_lang = F.lit("und")
    best_score = F.lit(0.0)
    for lang, tris in LANG_TRIGRAMS.items():
        score = sum((_occurrences(low, t) for t in tris), F.lit(0.0))
        better = score > best_score
        best_lang = F.when(better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(better, score).otherwise(best_score)
    return best_lang


def lang_id_ngram_sql(text: str) -> str:
    """DuckDB twin of :func:`lang_id_ngram`."""
    def occ(t: str) -> str:
        esc = t.replace("'", "''")
        return (
            f"((length(lower({text})) - length(replace(lower({text}), '{esc}', '')))"
            f" / {len(t)})"
        )

    def score(lang: str) -> str:
        return "(" + " + ".join(occ(t) for t in LANG_TRIGRAMS[lang]) + ")"

    s = {lang: score(lang) for lang in LANG_TRIGRAMS}
    return (
        f"CASE WHEN greatest({s['en']},{s['es']},{s['fr']},{s['de']}) <= 0 THEN 'und' "
        f"WHEN {s['en']} >= greatest({s['es']},{s['fr']},{s['de']}) THEN 'en' "
        f"WHEN {s['es']} >= greatest({s['fr']},{s['de']}) THEN 'es' "
        f"WHEN {s['fr']} >= {s['de']} THEN 'fr' "
        f"ELSE 'de' END"
    )


def quality_score(text: Column) -> Column:
    """Composite document quality score in [0,1].

    0.4·length-score (chars/1000 capped at 1) + 0.3·(1 − punct ratio)
    + 0.3·stopword-coverage (en-marker ratio capped at 3× of 0.1).
    Pure arithmetic → identical in SQL.
    """
    n = F.length(text).cast("double")
    punct = F.length(F.regexp_replace(text, r"[A-Za-z0-9\s]", "")).cast("double")
    punct_ratio = punct / F.greatest(n, F.lit(1.0))
    length_score = F.least(n / F.lit(1000.0), F.lit(1.0))
    stop_score = F.least(stopword_ratio(text, "en") * 10.0, F.lit(1.0))
    return F.round(
        F.lit(0.4) * length_score + F.lit(0.3) * (1.0 - punct_ratio) + F.lit(0.3) * stop_score,
        6,
    )


def quality_score_sql(text: str) -> str:
    markers = ", ".join(f"'{m}'" for m in LANG_MARKERS["en"])
    toks = f"list_filter(regexp_split_to_array(lower({text}), '\\s+'), t -> t <> '')"
    stop_ratio = (
        f"(len(list_filter({toks}, t -> t IN ({markers})))::DOUBLE "
        f"/ greatest(len({toks}), 1))"
    )
    n = f"length({text})::DOUBLE"
    punct = f"length(regexp_replace({text}, '[A-Za-z0-9\\s]', '', 'g'))::DOUBLE"
    return (
        f"round(0.4 * least({n}/1000.0, 1.0) "
        f"+ 0.3 * (1.0 - {punct}/greatest({n},1.0)) "
        f"+ 0.3 * least({stop_ratio} * 10.0, 1.0), 6)"
    )


def normalized(text: Column) -> Column:
    """Canonical form for fingerprinting: lowercase, collapse whitespace, trim."""
    return F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))


def fingerprint_md5(text: Column) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text.

    Exact-dup detection key; md5 is identical across Spark and DuckDB so
    the oracle can reproduce it bit-for-bit.
    """
    return F.md5(normalized(text))


def fingerprint_md5_sql(text: str) -> str:
    return f"md5(trim(regexp_replace(lower({text}), '\\s+', ' ', 'g')))"


def shingles(text: Column, k: int = 3) -> Column:
    """Word k-shingles (n-grams) of the normalized text: array<string>.

    The unit set for MinHash / Jaccard near-dup. Uses transform over a
    token array — stays JVM-side.

    The token array is LET-BOUND once via a single-element ``transform``
    lambda: higher-order functions are interpreted (no whole-stage
    codegen, no subexpression elimination), so a naive expression that
    mentions ``toks`` five times re-runs the regex tokenization five
    times per row — measured 3× end-to-end on the shingle index scan.
    Inside the lambda, ``ts`` is a bound-variable reference (free).
    """
    toks = tokens(normalized(text))
    return F.flatten(
        F.transform(
            F.array(toks),
            lambda ts: F.when(
                F.size(ts) < k, F.array(F.array_join(ts, " "))
            ).otherwise(
                F.transform(
                    F.sequence(F.lit(0), F.size(ts) - k),
                    lambda i: F.array_join(F.slice(ts, i + 1, k), " "),
                )
            ),
        )
    )


def rolling_hash(text: Column, base: int = 257, mod: int = 1_000_000_007) -> Column:
    """Polynomial rolling hash over the normalized text's characters.

    h = Σ code(c_i)·base^(n-1-i) mod p, computed with F.aggregate —
    JVM-side fold, no UDF. (No SQL oracle twin: driver rows-only check.)
    """
    chars = F.split(normalized(text), "")
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * base + F.ascii(c)) % mod,
    )


def word_trigrams_of_t() -> Column:
    """Adjacent word 3-grams over a column named ``t`` (token array) —
    indexed JVM ``transform`` lambda, no Python, no shuffle."""
    return F.expr(
        "transform(slice(t, 1, greatest(size(t)-2, 0)),"
        " (x, i) -> concat(x, ' ', t[i+1], ' ', t[i+2]))"
    )


def repetition_signals(df, text_col: str = "text", id_col: str = "doc_id"):
    """Gopher-style repetition quality signals per document.

    - ``trigram_dup_frac``: 1 − distinct-trigram/trigram ratio — a pure
      narrow expression (``array_distinct`` on the per-row trigram
      array), zero shuffle.
    - ``top_bigram_frac``: share of all bigram slots taken by the single
      most frequent bigram — two keyed aggregations (doc_id×bigram,
      then doc_id), partial-agg friendly.

    Heavily templated/boilerplate documents score high on both; a
    training-data filter drops rows above a threshold. Output:
    (id_col, n_trigrams, trigram_dup_frac, top_bigram_frac).
    """
    toks = df.select(
        F.col(id_col), tokens(F.lower(F.col(text_col))).alias("t")
    )
    tri = toks.select(
        F.col(id_col), word_trigrams_of_t().alias("tg")
    ).select(
        id_col,
        F.size(F.col("tg")).alias("n_trigrams"),
        F.when(F.size(F.col("tg")) == 0, F.lit(0.0))
        .otherwise(
            1.0 - F.size(F.array_distinct(F.col("tg"))) / F.size(F.col("tg"))
        )
        .alias("trigram_dup_frac"),
    )
    bigrams = toks.select(
        F.col(id_col),
        F.explode(
            F.expr(
                "transform(slice(t, 1, greatest(size(t)-1, 0)),"
                " (x, i) -> concat(x, \' \', t[i+1]))"
            )
        ).alias("bigram"),
    )
    top = (
        bigrams.groupBy(id_col, "bigram")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy(id_col)
        .agg((F.max("c") / F.sum("c")).alias("top_bigram_frac"))
    )
    from .weather import round_half_up

    return tri.join(top, id_col, "left").select(
        id_col,
        "n_trigrams",
        round_half_up(F.col("trigram_dup_frac"), 6).alias("trigram_dup_frac"),
        round_half_up(
            F.coalesce(F.col("top_bigram_frac"), F.lit(0.0)), 6
        ).alias("top_bigram_frac"),
    )


# C4-style rule filters (https://arxiv.org/abs/1910.10683 §2.2 describes
# the public recipe): cheap per-document predicates a crawl-cleaning
# pipeline evaluates on every row. All thresholds are explicit args so
# the DuckDB oracle can restate them verbatim.

def mean_token_len(text: Column) -> Column:
    """Mean token length: total non-space chars / token count (0 for
    empty docs). Fold-free — array_join + length, not an aggregate."""
    toks = tokens(text)
    return F.when(F.size(toks) == 0, F.lit(0.0)).otherwise(
        F.length(F.array_join(toks, "")).cast("double") / F.size(toks)
    )


def mean_token_len_sql(text: str) -> str:
    toks = f"list_filter(regexp_split_to_array({text}, '\\s+'), t -> t <> '')"
    return (
        f"(CASE WHEN len({toks}) = 0 THEN 0.0 "
        f"ELSE length(array_to_string({toks}, ''))::DOUBLE / len({toks}) END)"
    )


def c4_filter_flags(
    text: Column,
    min_tokens: int = 15,
    min_mean_len: float = 3.0,
    max_mean_len: float = 10.0,
) -> dict[str, Column]:
    """C4-class keep/drop flags: too-short docs and word-soup/gibberish
    (mean token length outside a human-text band). Returns named flag
    Columns plus the composite ``keep``; callers aggregate or filter."""
    n = token_count(text)
    mlen = mean_token_len(text)
    too_short = n < min_tokens
    bad_word_len = (mlen < min_mean_len) | (mlen > max_mean_len)
    return {
        "flag_too_short": too_short,
        "flag_bad_word_len": bad_word_len,
        "keep": ~(too_short | bad_word_len),
    }


# Gopher rule-based document filter (Rae et al. 2021, "Scaling Language
# Models: Methods, Analysis & Insights from Training Gopher", App. A).
# The canonical doc must contain >=2 distinct words from this list.
GOPHER_STOPWORDS: tuple[str, ...] = (
    "the", "be", "to", "of", "and", "that", "have", "with",
)


def gopher_filter_flags(
    text: Column,
    min_tokens: int = 50,
    max_tokens: int = 100_000,
    min_mean_len: float = 3.0,
    max_mean_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_alpha_ratio: float = 0.8,
    min_stopwords: int = 2,
) -> dict[str, Column]:
    """Gopher-style keep/drop flags — the second public rule family
    beyond :func:`c4_filter_flags`: token-count band, mean-word-length
    band, symbol-to-word ratio (# and ellipsis), alphabetic-word
    fraction, and the >=2-required-stopwords rule. Every signal is a
    pure codegen-able expression; callers aggregate or filter. Each
    formula has a character-identical DuckDB twin in
    :func:`gopher_filter_flags_sql` so audits are oracle-exact."""
    toks = tokens(text)
    low = tokens(F.lower(text))
    n = F.size(toks)
    nd = F.greatest(n, F.lit(1)).cast("double")
    mlen = mean_token_len(text)
    symbol_ratio = (_occurrences(text, "#") + _occurrences(text, "...")) / nd
    alpha_ratio = (
        F.size(F.filter(toks, lambda t: t.rlike("[A-Za-z]"))).cast("double")
        / nd
    )
    stop_hits = sum(
        (F.array_contains(low, w).cast("int") for w in GOPHER_STOPWORDS),
        F.lit(0),
    )
    flag_token_count = (n < min_tokens) | (n > max_tokens)
    flag_word_len = (mlen < min_mean_len) | (mlen > max_mean_len)
    flag_symbol = symbol_ratio > max_symbol_ratio
    flag_alpha = alpha_ratio < min_alpha_ratio
    flag_stopword = stop_hits < min_stopwords
    return {
        "flag_token_count": flag_token_count,
        "flag_word_len": flag_word_len,
        "flag_symbol": flag_symbol,
        "flag_alpha": flag_alpha,
        "flag_stopword": flag_stopword,
        "keep": ~(
            flag_token_count
            | flag_word_len
            | flag_symbol
            | flag_alpha
            | flag_stopword
        ),
    }


def gopher_filter_flags_sql(
    text: str,
    min_tokens: int = 50,
    max_tokens: int = 100_000,
    min_mean_len: float = 3.0,
    max_mean_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_alpha_ratio: float = 0.8,
    min_stopwords: int = 2,
) -> dict[str, str]:
    """DuckDB twin of :func:`gopher_filter_flags` (same defaults)."""
    toks = f"list_filter(regexp_split_to_array({text}, '\\s+'), t -> t <> '')"
    low = (
        f"list_filter(regexp_split_to_array(lower({text}), '\\s+'),"
        " t -> t <> '')"
    )
    n = f"len({toks})"
    nd = f"greatest({n}, 1)::DOUBLE"
    mlen = mean_token_len_sql(text)

    def occ(needle: str) -> str:
        esc = needle.replace("'", "''")
        return (
            f"((length({text}) - length(replace({text}, '{esc}', '')))"
            f" / {len(needle)})"
        )

    symbol_ratio = f"(({occ('#')} + {occ('...')}) / {nd})"
    alpha_ratio = (
        f"(len(list_filter({toks}, t -> regexp_matches(t, '[A-Za-z]')))::DOUBLE"
        f" / {nd})"
    )
    stop_hits = "(" + " + ".join(
        f"list_contains({low}, '{w}')::INT" for w in GOPHER_STOPWORDS
    ) + ")"
    f_count = f"(({n} < {min_tokens}) OR ({n} > {max_tokens}))"
    f_len = f"(({mlen} < {min_mean_len}) OR ({mlen} > {max_mean_len}))"
    f_sym = f"({symbol_ratio} > {max_symbol_ratio})"
    f_alpha = f"({alpha_ratio} < {min_alpha_ratio})"
    f_stop = f"({stop_hits} < {min_stopwords})"
    return {
        "flag_token_count": f_count,
        "flag_word_len": f_len,
        "flag_symbol": f_sym,
        "flag_alpha": f_alpha,
        "flag_stopword": f_stop,
        "keep": (
            f"(NOT ({f_count} OR {f_len} OR {f_sym} OR {f_alpha} OR {f_stop}))"
        ),
    }
