"""Text analysis for training-data pipelines: language-ID heuristic,
quality scoring, token counting, document fingerprinting (content hash
+ winnowing). Everything is a pure column expression / window — no
Python in the hot path, fully deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

EN_STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "on", "for", "with"]
DE_STOPWORDS = ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "von", "zu"]
FR_STOPWORDS = ["le", "la", "les", "et", "est", "un", "une", "des", "que", "pour"]


def _hits(tokens_col: str, words: list[str]):
    # array_intersect already returns distinct elements — no
    # array_distinct needed
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.array_intersect(tokens_col, arr))


def _lang_vote(tokens_col: str):
    """(en, de, fr, pred) — the ONE construction of the stopword-vote
    expressions, so lang_id and pred_lang_expr cannot drift and a
    projection using both doesn't build the intersects twice."""
    en, de, fr = (
        _hits(tokens_col, EN_STOPWORDS),
        _hits(tokens_col, DE_STOPWORDS),
        _hits(tokens_col, FR_STOPWORDS),
    )
    best = F.greatest(en, de, fr)
    pred = (
        # best is NULL for a NULL tokens array — without the isNull
        # branch every when-condition is NULL(false) and the otherwise
        # would mislabel a token-less doc 'fr'
        F.when(best.isNull() | (best == 0), F.lit("und"))
        .when(en == best, F.lit("en"))
        .when(de == best, F.lit("de"))
        .otherwise(F.lit("fr"))
    )
    return en, de, fr, pred


def pred_lang_expr(tokens_col: str = "tokens"):
    """Predicted-language column (stopword vote, deterministic tie
    order en>de>fr, 'und' on no hits or a NULL array) — shared by
    lang_id and any per-row composition that wants the label without
    a join (e.g. the per-source rollup)."""
    return _lang_vote(tokens_col)[3]


def lang_id(
    docs: DataFrame, id_col: str = "doc_id", tokens_col: str = "tokens"
) -> DataFrame:
    """(id, en/de/fr stopword hits, pred_lang): n-gram-free stopword-vote
    language heuristic; argmax with deterministic tie order en>de>fr,
    'und' when nothing matches or the array is NULL."""
    en, de, fr, pred = _lang_vote(tokens_col)
    return docs.select(
        F.col(id_col),
        en.cast("long").alias("en_hits"),
        de.cast("long").alias("de_hits"),
        fr.cast("long").alias("fr_hits"),
        pred.alias("pred_lang"),
    )


def _quality_parts(tokens_col: str, stopwords: list[str] | None = None):
    """(n_tok, uniq_ratio, stop_ratio, mean_len, quality) column
    expressions — the ONE definition of the quality formula, shared by
    quality_score and quality_expr so compositions cannot drift.

    EXCEPTION: quality_at_least holds a hand-derived INTEGER form of
    this same formula (cross-multiplied so thresholds decide exactly).
    If the weights (0.4/0.3/0.3) or the mean-length cap (8) change
    here, its coefficients must be re-derived in the same commit —
    tests/test_dedup_ann_textstats.py::test_quality_gate_matches_float_formula
    sweeps the two against each other and fails on any drift."""
    stopwords = stopwords or EN_STOPWORDS
    # stopwords ride in as LITERALS (like _hits), never spliced into a
    # SQL string: a quoted splice breaks on any word with an apostrophe
    # (l', d', qu' — ordinary French stopwords)
    sw_arr = F.array(*[F.lit(s) for s in stopwords])
    n_tok = F.size(tokens_col)
    n_uniq = F.size(F.array_distinct(tokens_col))
    stop_occ = F.size(
        F.filter(tokens_col, lambda t: F.array_contains(sw_arr, t))
    )
    # F.aggregate, never an f-string splice — the module's no-splice
    # rule applies to column names too (backtickless hyphenated/keyword
    # names would parse wrong)
    mean_len = (
        F.aggregate(
            tokens_col, F.lit(0.0), lambda acc, t: acc + F.length(t)
        )
        / n_tok
    )
    uniq_ratio = n_uniq / n_tok
    stop_ratio = stop_occ / n_tok
    quality = (
        0.4 * uniq_ratio + 0.3 * (1.0 - stop_ratio)
        + 0.3 * F.least(mean_len / 8.0, F.lit(1.0))
    )
    return n_tok, uniq_ratio, stop_ratio, mean_len, quality


def quality_expr(tokens_col: str = "tokens", stopwords: list[str] | None = None):
    """The blended quality column alone — for per-row compositions
    that want the score without quality_score's projection or a join."""
    return _quality_parts(tokens_col, stopwords)[4]


def coerce_rational(threshold, what: str = "quality threshold") -> tuple[int, int]:
    """Validate/coerce a rational threshold to an exact (num, den) pair.

    The integer gates (quality_at_least, verify_token_jaccard) decide
    ``x >= num/den`` by cross-multiplication, so they need integers. A
    legacy float (the pre-round-4 API shape, e.g. ``0.62``) is accepted
    and converted via ``Fraction.limit_denominator`` — which recovers
    the decimal the caller typed (0.62 -> 31/50) rather than the
    float's binary expansion — instead of failing with an opaque
    unpacking TypeError deep inside the gate."""
    from fractions import Fraction

    import math

    if isinstance(threshold, bool):
        raise TypeError(f"{what} must be (num, den) ints or a number, got bool")
    if isinstance(threshold, (int, float)):
        if not math.isfinite(threshold):
            raise TypeError(f"{what} must be finite, got {threshold!r}")
        fr = Fraction(threshold).limit_denominator(10_000)
        # limit_denominator recovers the decimal the caller typed
        # (0.62 -> 31/50) but SNAPS anything needing a denominator past
        # 10_000 (e.g. 1e-5 -> 0/1, which would turn a small positive
        # floor into "keep everything"). Refuse the silent change.
        if abs(float(fr) - threshold) > 1e-9 * max(1.0, abs(threshold)):
            raise ValueError(
                f"{what}={threshold!r} is not representable with "
                f"denominator <= 10000; pass an exact (num, den) pair"
            )
        return fr.numerator, fr.denominator
    try:
        qnum, qden = threshold
    except (TypeError, ValueError):
        raise TypeError(
            f"{what} must be a (num, den) integer pair or a number, "
            f"got {threshold!r}"
        ) from None
    if not (isinstance(qnum, int) and isinstance(qden, int)) or qden <= 0:
        raise TypeError(
            f"{what} (num, den) must be ints with den > 0, got {threshold!r}"
        )
    return qnum, qden


def quality_at_least(
    tokens_col: str = "tokens",
    threshold: tuple[int, int] | float = (62, 100),
    stopwords: list[str] | None = None,
):
    """Boolean gate ``quality >= qnum/qden`` by INTEGER cross-
    multiplication — no float division anywhere, so Spark and any SQL
    oracle agree on the exact boundary (a doc sitting precisely on
    0.55 or 0.60 passes in both engines or in neither; the same
    pattern as curate.CurateConfig.jaccard_threshold).

    With n = len(tokens), u = distinct tokens, s = stopword
    occurrences, tl = total char length, the formula
    ``0.4*u/n + 0.3*(1 - s/n) + 0.3*min(tl/(8n), 1)`` branches on the
    mean-length cap (an exact integer compare ``tl >= 8n``):

      capped:   qden * (4u + 3(n-s) + 3n)        >= 10 * qnum * n
      uncapped: qden * (32u + 24(n-s) + 3tl)     >= 80 * qnum * n

    Empty docs (n = 0) are rejected, matching quality_score's
    ``n_tok > 0`` precondition.

    The coefficients are hand-derived from _quality_parts' formula
    (weights 0.4/0.3/0.3, mean-length cap 8); if that formula changes,
    re-derive these in the same commit — the drift-sweep test named in
    _quality_parts' docstring enforces agreement.
    """
    qnum, qden = coerce_rational(threshold)
    stopwords = stopwords or EN_STOPWORDS
    sw_arr = F.array(*[F.lit(w) for w in stopwords])  # literals, not a splice
    n = F.size(tokens_col).cast("long")
    u = F.size(F.array_distinct(tokens_col)).cast("long")
    s = F.size(
        F.filter(tokens_col, lambda t: F.array_contains(sw_arr, t))
    ).cast("long")
    tl = F.aggregate(
        tokens_col,
        F.lit(0).cast("long"),
        lambda acc, t: acc + F.length(t),
    )
    capped = qden * (4 * u + 3 * (n - s) + 3 * n) >= 10 * qnum * n
    uncapped = qden * (32 * u + 24 * (n - s) + 3 * tl) >= 80 * qnum * n
    return (n > 0) & F.when(tl >= 8 * n, capped).otherwise(uncapped)


def quality_score(
    docs: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    stopwords: list[str] | None = None,
) -> DataFrame:
    """(id, n_tokens, uniq_ratio, stop_ratio, mean_tok_len, quality).

    quality = 0.4*uniq_ratio + 0.3*(1 - stop_ratio)
              + 0.3*min(mean_tok_len / 8, 1)
    """
    n_tok, uniq_ratio, stop_ratio, mean_len, quality = _quality_parts(
        tokens_col, stopwords
    )
    return docs.filter(n_tok > 0).select(
        F.col(id_col),
        n_tok.cast("long").alias("n_tokens"),
        uniq_ratio.alias("uniq_ratio"),
        stop_ratio.alias("stop_ratio"),
        mean_len.alias("mean_tok_len"),
        quality.alias("quality"),
    )


def token_count(
    docs: DataFrame, id_col: str = "doc_id", tokens_col: str = "tokens"
) -> DataFrame:
    return docs.select(
        F.col(id_col),
        F.size(tokens_col).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(tokens_col)).cast("long").alias("n_uniq"),
    )


# BPE-ish pre-tokenizer pattern (ASCII-safe subset usable identically
# under Java regex and RE2): a word is letters OR digits OR one
# non-alnum-non-space char; subwords additionally split every 4 letters
# (a crude stand-in for merge-limited BPE pieces used to ESTIMATE LLM
# token counts without a vocab file).
BPE_WORD_RE = r"[a-z]+|[0-9]+|[^a-z0-9\s]"
BPE_PIECE_RE = r"[a-z]{1,4}|[0-9]{1,3}|[^a-z0-9\s]"


def token_count_bpe(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "norm_text"
) -> DataFrame:
    """(id, n_ws, n_words, n_pieces): whitespace-token count, BPE-ish
    word count, and BPE-ish piece count — the training-data-pipeline
    estimate of LLM token cost per document. Pure regexp column
    expressions (whole-stage codegen), restricted to a regex subset
    that Java regex and RE2 (DuckDB) interpret identically on the
    normalized (lowercased) text."""
    t = F.col(text_col)
    ws = F.size(F.filter(F.split(t, r"\s+"), lambda x: x != ""))
    words = F.size(F.regexp_extract_all(t, F.lit(BPE_WORD_RE), F.lit(0)))
    pieces = F.size(F.regexp_extract_all(t, F.lit(BPE_PIECE_RE), F.lit(0)))
    return docs.select(
        F.col(id_col),
        ws.cast("long").alias("n_ws"),
        words.cast("long").alias("n_words"),
        pieces.cast("long").alias("n_pieces"),
    )


def content_fingerprint(
    docs: DataFrame, id_col: str = "doc_id", tokens_col: str = "tokens"
) -> DataFrame:
    """(id, fp): normalization-invariant content hash (md5 over tokens)."""
    return docs.select(
        F.col(id_col), F.md5(F.array_join(tokens_col, " ")).alias("fp")
    )


def winnowing_fingerprints(
    docs: DataFrame,
    k: int = 4,
    window: int = 5,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
) -> DataFrame:
    """(id, fp long): winnowing (Schleimer et al., SIGMOD'03) fingerprint
    *set* per document — the min k-gram hash in every sliding window of
    ``window`` consecutive k-grams, deduplicated.

    Guarantees any shared run of >= k + window - 1 tokens between two
    documents yields a shared fingerprint. All JVM-side: k-grams via
    transform/sequence, rolling min via a bounded window frame.
    """
    from entitymatch_spark.functions.text import ngram_expr

    grams = ngram_expr(tokens_col, k)
    # gram hash = first 60 bits of md5, portable across engines (DuckDB
    # reproduces it exactly, so the contract query is value-checked;
    # xxhash64 would be ~2x faster at scale but is Spark-only — swap is
    # this one line)
    hashed = docs.select(
        F.col(id_col), F.posexplode(grams).alias("pos", "gram")
    ).withColumn(
        "h", F.conv(F.substring(F.md5("gram"), 1, 15), 16, 10).cast("long")
    )
    w = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(0, window - 1)
    )
    return (
        hashed.withColumn("fp", F.min("h").over(w))
        .select(id_col, "fp")
        .distinct()
    )


def repetition_signals(
    docs: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
) -> DataFrame:
    """Per-doc repetition quality signals (the Gopher/RefinedWeb family
    of filters: heavily self-repeating pages are low-value training
    text and a classic crawl-spam shape):

    - ``top_token_frac``  — occurrences of the most frequent token over
      all token occurrences;
    - ``top_bigram_frac`` — same for word bigrams;
    - ``dup_bigram_frac`` — fraction of bigram OCCURRENCES whose bigram
      appears more than once in the doc.

    Relational shape (explode -> per-doc-per-gram count -> per-doc
    agg): both groupBys are map-side-combinable and key on the doc id,
    so the second agg is a narrow regroup of the first — no UDF, no
    per-row Python, scales with the corpus.
    """
    from entitymatch_spark.functions.text import ngram_expr

    def fam(col_expr, prefix):
        occ = docs.select(F.col(id_col), F.explode(col_expr).alias("g"))
        per = occ.groupBy(id_col, "g").agg(F.count("*").alias("c"))
        return per.groupBy(id_col).agg(
            F.sum("c").alias(f"{prefix}_n"),
            F.max("c").alias(f"{prefix}_top"),
            F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0)).alias(
                f"{prefix}_dup"
            ),
        )

    tok = fam(F.col(tokens_col), "tok")
    big = fam(ngram_expr(tokens_col, 2), "big")
    base = docs.filter(F.size(tokens_col) > 0).select(id_col)
    frac = lambda num, den: F.when(  # noqa: E731
        F.coalesce(den, F.lit(0)) == 0, F.lit(0.0)
    ).otherwise(num / den)
    return (
        base.join(tok, id_col, "left")
        .join(big, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("tok_n", F.lit(0).cast("long")).alias("n_tokens"),
            frac(F.col("tok_top"), F.col("tok_n")).alias("top_token_frac"),
            F.coalesce("big_n", F.lit(0).cast("long")).alias("n_bigrams"),
            frac(F.col("big_top"), F.col("big_n")).alias("top_bigram_frac"),
            frac(F.col("big_dup"), F.col("big_n")).alias("dup_bigram_frac"),
        )
    )


def group_quantiles(
    df: DataFrame,
    value_col: str,
    group_col: str,
    probs: tuple[float, ...] = (0.1, 0.5, 0.9),
    *,
    exact: bool = True,
    accuracy: int = 10000,
) -> DataFrame:
    """Per-group distribution summary: count, the requested quantiles
    (``pNN`` columns, linear interpolation), min, max — the length /
    score profile a curation run reads before picking thresholds.

    ``exact=True`` uses ``percentile`` — it buffers each group's
    values, fine for per-language/per-domain groups (thousands of
    groups, bounded members) and for calibration samples, and it is
    what the DuckDB oracle reproduces bit-for-bit. At 100 TB with
    huge groups flip to ``exact=False``: ``approx_percentile``
    (t-digest-style sketch, ``accuracy`` trades memory for error) is
    a bounded-state partial aggregate that map-side combines like any
    sum.
    """
    for p in probs:
        if not 0 <= p <= 1:
            raise ValueError(f"probs must be in [0, 1], got {p}")
    names = [f"p{int(round(p * 100)):02d}" for p in probs]
    if len(set(names)) != len(names):
        raise ValueError(
            f"probs {probs} collide after pNN naming ({names}); "
            "quantiles closer than 1% need distinct percent labels"
        )
    fn = "percentile" if exact else "approx_percentile"
    extra = f", {int(accuracy)}" if not exact else ""
    quoted = "`" + value_col.replace("`", "``") + "`"
    aggs = [F.count("*").alias("n")]
    for p, name in zip(probs, names):
        aggs.append(F.expr(f"{fn}({quoted}, {p!r}{extra})").alias(name))
    aggs.append(F.min(value_col).alias("min_value"))
    aggs.append(F.max(value_col).alias("max_value"))
    return df.groupBy(group_col).agg(*aggs)
