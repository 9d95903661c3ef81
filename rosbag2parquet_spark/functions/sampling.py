"""Deterministic sampling, splitting, mixing, packing — the corpus-shaping
pass of a large-scale training-data pipeline (north-star §2d; the reference
stops at conversion, its README delegates selection to engines reading the
output, README.md:14-18).

Every operator here is DETERMINISTIC BY HASH, not `rand()`: sampling
decisions are a pure function of the row key (md5 — present and
bit-identical in Spark and DuckDB, same idiom as functions.dedup), so runs
are reproducible across engines, retries, and cluster sizes — the property
a training pipeline actually needs (re-running the job must not change the
training set). The same SQL fragment is used verbatim on both the Spark
and the DuckDB side, so parity is structural.

Scale notes per operator are in each docstring; the common design rule:
a sampling/split decision is a narrow per-row projection (no shuffle at
all), and anything that needs an order (capping, packing) orders within
hash shards so no global or per-key single-reducer sort exists.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rosbag2parquet_spark.sources.catalog import load_table

_HEX = "0123456789abcdef"

#: bucket space for 5 hex nibbles = 16^5
BUCKET_SPACE = 1 << 20


def md5_bucket_sql(col_sql: str, salt: str = "", nhex: int = 5) -> str:
    """SQL (valid in BOTH Spark and DuckDB) for an integer hash bucket in
    ``[0, 16**nhex)``: the first ``nhex`` nibbles of ``md5(salt || key)``.
    Nibbles decode via ``instr`` arithmetic — no engine-specific hex
    conversion function needed (same trick as dedup.simhash)."""
    h = f"md5('{salt}' || cast({col_sql} as string))"
    terms = [
        f"(instr('{_HEX}', substr({h}, {i + 1}, 1)) - 1) * {16 ** (nhex - 1 - i)}"
        for i in range(nhex)
    ]
    return "(" + " + ".join(terms) + ")"


# ------------------------------------------------------------- sample-hash

#: 10% Bernoulli sample: keep when bucket < 0.10 * 2^20
_SAMPLE_KEEP = BUCKET_SPACE // 10

_BUCKET_DOC = md5_bucket_sql("doc_id", salt="sample|")


def q_sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 10% Bernoulli sample of the corpus, keyed on
    md5(doc_id). A pure per-row filter: no shuffle, no state, embarrassingly
    parallel at any scale, and the SAME rows are kept on every run and
    every engine. The summary per (lang) proves the realized rate."""
    docs = load_table(spark, sf_dir, "documents")
    kept = docs.filter(F.expr(f"{_BUCKET_DOC} < {_SAMPLE_KEEP}"))
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.sum("n_chars").cast("long").alias("sampled_chars"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


ORACLE_SAMPLE_HASH = f"""
SELECT lang, count(*) AS n_sampled,
       CAST(sum(n_chars) AS BIGINT) AS sampled_chars,
       min(doc_id) AS first_doc, max(doc_id) AS last_doc
FROM documents WHERE {_BUCKET_DOC} < {_SAMPLE_KEEP}
GROUP BY lang
"""


# -------------------------------------------------------- split-train-test

_BUCKET_SPLIT = md5_bucket_sql("doc_id", salt="split|")

#: 90 / 5 / 5 split boundaries in the 2^20 bucket space
_TRAIN_END = BUCKET_SPACE * 90 // 100
_VAL_END = BUCKET_SPACE * 95 // 100

_SPLIT_CASE = (
    f"CASE WHEN {_BUCKET_SPLIT} < {_TRAIN_END} THEN 'train' "
    f"WHEN {_BUCKET_SPLIT} < {_VAL_END} THEN 'val' ELSE 'test' END"
)


def q_split_train_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """90/5/5 train/val/test split assigned by hash bucket — the split is a
    pure function of doc_id, so adding data later never moves an existing
    document between splits (the property that prevents eval
    contamination). Per (split, source) counts audit the assignment."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.withColumn("split", F.expr(_SPLIT_CASE))
        .groupBy("split", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
    )


ORACLE_SPLIT_TRAIN_TEST = f"""
SELECT {_SPLIT_CASE} AS split, source, count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM documents GROUP BY 1, 2
"""


# ------------------------------------------------------------ mix-weighted

#: per-language mixture rates in basis points (a typical data-mixing recipe:
#: upweight scarce languages, downsample the dominant one)
_LANG_RATES_BPS = {"en": 5000, "de": 10000, "es": 7500, "fr": 7500, "zh": 10000}

_RATE_CASE = (
    "CASE lang "
    + " ".join(f"WHEN '{k}' THEN {v}" for k, v in sorted(_LANG_RATES_BPS.items()))
    + " ELSE 10000 END"
)

_BUCKET_MIX = md5_bucket_sql("doc_id", salt="mix|")


def q_mix_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted data mixing: each language is kept at its recipe rate
    (basis points), decided per row by hash — deterministic downsampling
    with NO shuffle on the data path (the audit groupBy is on the tiny
    result). At 100 TB this is a map-only pass; changing the recipe
    re-filters without re-shuffling anything."""
    docs = load_table(spark, sf_dir, "documents")
    kept = docs.filter(
        F.expr(f"pmod({_BUCKET_MIX}, 10000) < ({_RATE_CASE})")
    )
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.expr(f"any_value({_RATE_CASE})").cast("int").alias("rate_bps"),
    )


ORACLE_MIX_WEIGHTED = f"""
SELECT lang, count(*) AS n_kept,
       CAST(any_value({_RATE_CASE}) AS INTEGER) AS rate_bps
FROM documents
WHERE ({_BUCKET_MIX}) % 10000 < ({_RATE_CASE})
GROUP BY lang
"""


# -------------------------------------------------------- stratified-sample

_BUCKET_STRAT = md5_bucket_sql("doc_id", salt="strat|")


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balanced stratified sampling with DATA-DERIVED rates — the
    rebalancing pass mix-weighted can't do (its recipe is fixed): every
    ``source`` stratum is downsampled to the size of the SMALLEST stratum,
    so the output is class-balanced no matter how skewed the input. The
    per-row keep decision is the integer threshold crossing
    ``bucket * n_s < n_min * 2^20`` (keep rate n_min/n_s without a single
    division — exact in both engines, no float rounding at the boundary).

    Plan: one tiny per-stratum count (partial-combines map-side), one
    1-row min reduce broadcast back (same scalar posture as lm-surprise's
    V), then the data path is a broadcast join + map-side filter — the
    corpus itself never shuffles. Changing the balance target re-filters
    without re-shuffling anything."""
    docs = load_table(spark, sf_dir, "documents")
    strata = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_s"))
    # n_min as a window min over the |strata|-row frame: the former
    # strata.agg(min) cross-joined back evaluated the strata subtree (and
    # its documents scan) twice — once for the scalar, once for the dim
    # rows (r14, guide §2.4 duplicated subtrees). One single-partition
    # exchange of tiny rows computes the identical integer min.
    dim = F.broadcast(
        strata.withColumn("n_min", F.expr("min(n_s) OVER ()"))
    )
    # bucket * n_s wraps BIGINT once a stratum passes ~2^43 rows; widened to
    # DECIMAL(38,0) (exact integers to 1e38) so the keep decision survives
    # the 100 TB posture. The oracle widens to HUGEINT (int128) — both
    # arithmetics are exact, so the boolean is identical.
    keep = F.expr(
        f"CAST({_BUCKET_STRAT} AS DECIMAL(38,0)) * n_s"
        f" < CAST(n_min AS DECIMAL(38,0)) * {BUCKET_SPACE}"
    )
    return (
        docs.join(dim, "source")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_total"),
            F.sum(keep.cast("long")).cast("long").alias("n_kept"),
            F.any_value(F.col("n_min")).cast("long").alias("n_quota"),
        )
    )


ORACLE_STRATIFIED_SAMPLE = f"""
WITH strata AS (
  SELECT source, count(*) AS n_s FROM documents GROUP BY source
),
nm AS (SELECT min(n_s) AS n_min FROM strata)
SELECT d.source,
       CAST(count(*) AS BIGINT) AS n_total,
       CAST(sum(CASE WHEN CAST(({_BUCKET_STRAT}) AS HUGEINT) * s.n_s
                          < CAST(nm.n_min AS HUGEINT) * {BUCKET_SPACE}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(any_value(nm.n_min) AS BIGINT) AS n_quota
FROM documents d JOIN strata s USING (source) CROSS JOIN nm
GROUP BY d.source
"""


# -------------------------------------------------------- temperature-sample

_BUCKET_TEMP = md5_bucket_sql("doc_id", salt="temp|")


def q_temperature_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based mixture rebalancing — the alpha-exponent family
    between mix-weighted's fixed recipe (alpha=1 keeps natural
    proportions) and stratified-sample's hard equalization (alpha=0):
    stratum s is sampled toward share proportional to ``n_s^alpha``, the
    standard multilingual-corpus rebalance (mT5/XLM-R style) that keeps
    head languages from drowning the tail without flattening it entirely.
    alpha=0.5 here, made INTEGER-EXACT cross-engine: the stratum weight
    is ``w_s = floor(sqrt(n_s))`` (sqrt of an integer is IEEE
    correctly-rounded in both engines and floor() cannot straddle — for
    n = m^2 - 1 the true root sits ~1/(2m) below m, orders of magnitude
    more than a double ulp at any realistic stratum size), and the
    per-row keep decision is the integer threshold crossing
    ``bucket * S_w * n_s < T * w_s * 2^20`` (rate T*w_s/(S_w*n_s) with no
    division; T = N div 2 is the target total, S_w the weight sum —
    integer addition, order-free, unlike a float sum). Rates above 1 clip
    to keep-everything — filtering cannot upsample; the caveat every
    sampling-by-filter implementation shares, stated rather than hidden.

    Plan: one tiny per-stratum count, one 1-row totals reduce broadcast
    back, then broadcast join + map-side filter — the corpus never
    shuffles, and a temperature change re-filters without re-shuffling
    (same posture as stratified-sample)."""
    docs = load_table(spark, sf_dir, "documents")
    strata = (
        docs.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_s"))
        .withColumn(
            "w_s",
            F.expr("CAST(floor(sqrt(CAST(n_s AS DOUBLE))) AS BIGINT)"),
        )
    )
    # totals as window sums over the |strata|-row frame — the same
    # duplicated-subtree fix as stratified-sample (the crossJoin form
    # re-ran the per-stratum count, a second documents scan, for the two
    # scalars); integer sums are order-free, so values are identical
    dim = F.broadcast(
        strata.select(
            "lang",
            "n_s",
            "w_s",
            F.expr("sum(w_s) OVER ()").alias("s_w"),
            F.expr(
                "CAST(sum(n_s) OVER () div 2 AS BIGINT)"
            ).alias("t_goal"),
        )
    )
    # bucket * s_w * n_s (and t_goal * w_s * 2^20) wrap BIGINT at a few
    # billion rows — far below the posture this docstring advertises. Both
    # sides widen to DECIMAL(38,0) (engine) / HUGEINT (oracle): exact
    # integer arithmetic on each, so the keep boolean is identical.
    keep = F.expr(
        f"CAST({_BUCKET_TEMP} AS DECIMAL(38,0)) * s_w * n_s"
        f" < CAST(t_goal AS DECIMAL(38,0)) * w_s * {BUCKET_SPACE}"
    )
    return (
        docs.join(dim, "lang")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_total"),
            F.sum(keep.cast("long")).cast("long").alias("n_kept"),
            F.any_value(F.col("w_s")).cast("long").alias("w"),
        )
        .orderBy("lang")
    )


ORACLE_TEMPERATURE_SAMPLE = f"""
WITH strata AS (
  SELECT lang, count(*) AS n_s,
         CAST(floor(sqrt(CAST(count(*) AS DOUBLE))) AS BIGINT) AS w_s
  FROM documents GROUP BY lang
),
tot AS (
  SELECT sum(w_s) AS s_w, CAST(sum(n_s) // 2 AS BIGINT) AS t_goal
  FROM strata
)
SELECT d.lang,
       CAST(count(*) AS BIGINT) AS n_total,
       CAST(sum(CASE WHEN CAST(({_BUCKET_TEMP}) AS HUGEINT) * t.s_w * s.n_s
                          < CAST(t.t_goal AS HUGEINT) * s.w_s * {BUCKET_SPACE}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(any_value(s.w_s) AS BIGINT) AS w
FROM documents d JOIN strata s USING (lang) CROSS JOIN tot t
GROUP BY d.lang
ORDER BY d.lang
"""


# ------------------------------------------------------------ cap-per-group

_CAP_PER_LANG = 50

_BUCKET_CAP = md5_bucket_sql("doc_id", salt="cap|")


def q_cap_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group document cap: keep at most K=50 docs per language, chosen
    by hash order (NOT arrival order — reproducible and unbiased). The
    window partitions by lang; at scale the rank only needs the top-K, so
    Catalyst's WindowGroupLimit pushes the limit below the sort — no group
    ever materializes fully on one reducer."""
    docs = load_table(spark, sf_dir, "documents")
    ranked = docs.select(
        "doc_id",
        "lang",
        F.expr(
            f"row_number() OVER (PARTITION BY lang "
            f"ORDER BY {_BUCKET_CAP}, doc_id)"
        ).alias("rk"),
    )
    return ranked.filter(F.col("rk") <= _CAP_PER_LANG).select(
        "doc_id", "lang", F.col("rk").cast("long").alias("rk")
    )


ORACLE_CAP_PER_GROUP = f"""
SELECT doc_id, lang, CAST(rk AS BIGINT) AS rk FROM (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY lang
                            ORDER BY {_BUCKET_CAP}, doc_id) AS rk
  FROM documents
) WHERE rk <= {_CAP_PER_LANG}
"""


# ----------------------------------------------------------- pack-sequences

#: context-window capacity in (approximated) tokens, and the shard fan-out.
#: Packing is SHARD-LOCAL: a global greedy pack is inherently sequential,
#: so the corpus is hashed into shards and each shard packs independently —
#: the standard distributed formulation (shards ≈ training-data files).
_PACK_CAPACITY = 2048
_PACK_SHARDS = 8

_BUCKET_PACK = md5_bucket_sql("doc_id", salt="pack|")

#: ~4 chars per token — the usual cheap token estimate (per-engine integer
#: division spelling: Spark `div`, DuckDB `//`)
_TOKENS_SPARK = "greatest(n_chars div 4, 1L)"
_TOKENS_DUCK = "greatest(n_chars // 4, 1)"


def pack_sequences(
    docs: DataFrame,
    capacity: int = _PACK_CAPACITY,
    n_shards: int = _PACK_SHARDS,
    tokens_expr: str = _TOKENS_SPARK,
) -> DataFrame:
    """Library form of the packing operator. ``n_shards`` is the
    parallelism knob: per-shard work is a LINEAR cumsum over its docs, so
    a production run sizes shards to the corpus (corpus_tokens /
    target_tokens_per_shard — e.g. one shard per output training file); a
    fixed count would cap throughput at scale, not break correctness. The
    driver query pins fixture constants so the oracle SQL stays static."""
    packed = docs.select(
        "doc_id",
        F.expr(f"cast(pmod({_BUCKET_PACK}, {n_shards}) as bigint)").alias("shard"),
        F.expr(tokens_expr).alias("tokens"),
        F.expr(
            f"sum({tokens_expr}) OVER (PARTITION BY pmod({_BUCKET_PACK}, {n_shards})"
            f" ORDER BY {_BUCKET_PACK}, doc_id)"
        ).alias("cum_tokens"),
    ).withColumn("bin_id", F.expr(f"(cum_tokens - tokens) div {capacity}"))
    return packed.groupBy("shard", "bin_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("tokens").cast("long").alias("bin_tokens"),
    )


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: fill 2048-token context windows with documents,
    sharded by hash. Within a shard, docs are ordered by hash and assigned
    to the bin their cumulative token count lands in (contiguous-fill
    packing — one window cumsum, expressible identically in both engines).
    Emits per-bin fill statistics. Scale shape: the only shuffle is the
    hash-shard exchange; each shard's cumsum is one sorted partition;
    shard count is the :func:`pack_sequences` knob sized to the corpus."""
    return pack_sequences(load_table(spark, sf_dir, "documents"))


ORACLE_PACK_SEQUENCES = f"""
WITH packed AS (
  SELECT doc_id,
         CAST(({_BUCKET_PACK}) % {_PACK_SHARDS} AS BIGINT) AS shard,
         {_TOKENS_DUCK} AS tokens,
         sum({_TOKENS_DUCK}) OVER (PARTITION BY ({_BUCKET_PACK}) % {_PACK_SHARDS}
                                   ORDER BY {_BUCKET_PACK}, doc_id) AS cum_tokens
  FROM documents
)
SELECT shard, CAST((cum_tokens - tokens) // {_PACK_CAPACITY} AS BIGINT) AS bin_id,
       count(*) AS n_docs, CAST(sum(tokens) AS BIGINT) AS bin_tokens
FROM packed GROUP BY 1, 2
"""


# ----------------------------------------------------------- shuffle-global

_BUCKET_SHUF = md5_bucket_sql("doc_id", salt="shuffle|")


def q_shuffle_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global training order: every doc gets a dense rank in
    a hash-shuffled order — the 'global shuffle before training' pass,
    reproducible across runs.

    A naive ``row_number() OVER (ORDER BY ...)`` plans as an Exchange
    SinglePartition — the global-window scale-killer. This uses the same
    bucketed two-pass rank as the engine's seqno operator
    (operators.keys.assign_seqno): the 2^20 hash-bucket space is split
    into 64 coarse ranges, per-range counts are prefix-summed driver-side,
    and the window partitions by range — every stage parallel."""
    from rosbag2parquet_spark.operators.keys import assign_seqno

    docs = load_table(spark, sf_dir, "documents")
    tagged = docs.select("doc_id", F.expr(_BUCKET_SHUF).alias("__shuf"))
    ranked = assign_seqno(
        tagged,
        ["__shuf", "doc_id"],
        bucket=F.expr(f"__shuf div {BUCKET_SPACE // 64}"),
    )
    return ranked.select(
        "doc_id", (F.col("seqno") + 1).cast("long").alias("shuffle_rank")
    )


ORACLE_SHUFFLE_GLOBAL = f"""
SELECT doc_id,
       CAST(row_number() OVER (ORDER BY {_BUCKET_SHUF}, doc_id) AS BIGINT)
         AS shuffle_rank
FROM documents
"""


# ------------------------------------------------------------- corpus-filter


def q_corpus_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end filter funnel of a training-data pipeline: exact-dup
    removal (keep the min doc_id per md5(text)), then C4/Gopher-style
    heuristic gates (min chars, min tokens), with FIRST-FAILING-RULE
    attribution — the per-source funnel report ('how much did each rule
    cost me?') every corpus build wants. All gates are integer conditions,
    so the funnel is deterministic across engines.

    Plan: one window over md5(text) partitions (tiny groups — exact-dup
    clusters), everything else is a narrow projection into a small
    groupBy."""
    docs = load_table(spark, sf_dir, "documents")
    n_tok = F.size(F.split("text", " "))
    rk = F.expr(
        "row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id)"
    )
    reason = (
        F.when(rk > 1, "duplicate")
        .when(F.col("n_chars") < 100, "too_short")
        .when(n_tok < 20, "too_few_tokens")
        .otherwise("kept")
    )
    return (
        docs.select("source", "n_chars", reason.alias("reason"))
        .groupBy("source", "reason")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
    )


ORACLE_CORPUS_FILTER = """
WITH marked AS (
  SELECT source, n_chars,
         CASE WHEN row_number() OVER (PARTITION BY md5(text)
                                      ORDER BY doc_id) > 1 THEN 'duplicate'
              WHEN n_chars < 100 THEN 'too_short'
              WHEN len(string_split(text, ' ')) < 20 THEN 'too_few_tokens'
              ELSE 'kept' END AS reason
  FROM documents
)
SELECT source, reason, count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM marked GROUP BY source, reason
"""


# ------------------------------------------------------------ contamination

#: word-3-shingle expressions (same 3-gram family as functions.text
#: fingerprinting; Spark slice() is (start, length), DuckDB w[i:i+2] is an
#: inclusive 1-based slice — both yield 3 words)
_SHINGLES_SPARK = (
    "transform(sequence(1, greatest(size(split(text, ' ')) - 2, 1)),"
    " i -> concat_ws(' ', slice(split(text, ' '), i, 3)))"
)
_SHINGLES_DUCK = (
    "list_transform(range(1, greatest(len(string_split(text, ' ')) - 2, 1) + 1),"
    " i -> array_to_string((string_split(text, ' '))[i:i+2], ' '))"
)


def q_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination check: for every TRAIN-split document, count
    its distinct word-3-shingles that also occur anywhere in the TEST split
    (the eval set of the hash split) — the standard n-gram decontamination
    pass run before training. Emits only contaminated docs.

    Plan shape: explode distinct shingles once, split the exploded frame by
    the hash split, LEFT-join train shingles against the distinct eval
    shingle set (keyed on the shingle — at fixture scale the eval side
    broadcasts; at 100 TB it shuffle-joins on the shingle hash, which is
    uniformly distributed by construction), then one per-doc count. No
    quadratic step anywhere: cost is O(total shingles)."""
    docs = load_table(spark, sf_dir, "documents")
    ex = docs.select(
        "doc_id",
        F.expr(_SPLIT_CASE).alias("split"),
        F.explode(F.expr(f"array_distinct({_SHINGLES_SPARK})")).alias("s"),
    )
    ev = (
        ex.filter(F.col("split") == "test")
        .select("s")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    tr = ex.filter(F.col("split") == "train")
    return (
        tr.join(ev, "s", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.coalesce("hit", F.lit(0))).cast("long").alias("n_overlap"),
        )
        .filter(F.col("n_overlap") > 0)
    )


ORACLE_CONTAMINATION = f"""
WITH sd AS (
  SELECT doc_id, {_SPLIT_CASE} AS split,
         list_distinct({_SHINGLES_DUCK}) AS sh
  FROM documents
), ex AS (
  SELECT doc_id, split, unnest(sh) AS s FROM sd
), ev AS (
  SELECT DISTINCT s FROM ex WHERE split = 'test'
), tr AS (
  SELECT doc_id, s FROM ex WHERE split = 'train'
)
SELECT tr.doc_id, count(*) AS n_shingles,
       CAST(sum(CASE WHEN ev.s IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_overlap
FROM tr LEFT JOIN ev ON tr.s = ev.s
GROUP BY tr.doc_id
HAVING sum(CASE WHEN ev.s IS NOT NULL THEN 1 ELSE 0 END) > 0
"""


# --------------------------------------------------------- weighted-sample

_BUCKET_WS = md5_bucket_sql("doc_id", salt="wsample|")

_WS_K = 50

#: Sequential Poisson (Ohlsson) order sampling: priority = u / w with
#: u = (bucket+1)/2^20 ∈ (0,1] and weight w = n_chars; the K smallest
#: priorities are an (approximate) probability-proportional-to-size sample
#: WITHOUT replacement. The whole key is ONE IEEE division of exact
#: integers — correctly rounded by the standard, hence bit-identical in
#: Spark and DuckDB (an Efraimidis-Spirakis ln(u)/w key would hang parity
#: on libm transcendentals, which carry no such guarantee).
_WS_PRIORITY = (
    f"(({_BUCKET_WS}) + 1) / ({BUCKET_SPACE} * cast(n_chars as double))"
)


def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sample (K=50, weight = n_chars): hash-derived
    priority, K smallest win. Spark plans TakeOrderedAndProject — each
    task keeps its local top-K and only K·partitions rows reach the
    driver-side merge; no global sort at any scale. Re-running (or adding
    non-winning data) never changes a chosen document's priority."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        # NULL/zero weights are excluded EXPLICITLY: a NULL priority would
        # sort NULLS FIRST in Spark but NULLS LAST in DuckDB — an unweighted
        # row must not be able to flip the sample between engines
        docs.filter(F.col("n_chars").isNotNull() & (F.col("n_chars") > 0))
        .select(
            "doc_id",
            "lang",
            "n_chars",
            F.expr(_WS_PRIORITY).alias("priority"),
        )
        .orderBy("priority", "doc_id")
        .limit(_WS_K)
    )


ORACLE_WEIGHTED_SAMPLE = f"""
SELECT doc_id, lang, n_chars, {_WS_PRIORITY} AS priority
FROM documents
WHERE n_chars IS NOT NULL AND n_chars > 0
ORDER BY priority, doc_id
LIMIT {_WS_K}
"""


# ---------------------------------------------------------- tokenize-chunk

CHUNK_TOKENS = 32
CHUNK_STRIDE = 24  # 8-token overlap between consecutive chunks


def q_tokenize_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking — the RAG/pretraining prep that
    turns each document into fixed-size token chunks with overlap (stride <
    window). One narrow projection + one explode per document: the chunk
    starts are a generated arithmetic sequence over the words array, each
    chunk re-slices the SAME array (no shuffle, no self-join; chunk count
    per doc is ceil(n/stride), so output scales linearly with the corpus).
    Emits (doc_id, chunk_idx, n_chunk_tokens, chunk_text) — chunk_idx is
    the stride ordinal, deterministic and dense per doc."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("w")
    )
    return (
        docs.select(
            "doc_id",
            "w",
            F.explode(
                F.expr(f"sequence(1, size(w), {CHUNK_STRIDE})")
            ).alias("start"),
        )
        .select(
            "doc_id",
            F.expr(f"(start - 1) div {CHUNK_STRIDE}").alias("chunk_idx"),
            F.expr(f"size(slice(w, start, {CHUNK_TOKENS}))")
            .cast("long")
            .alias("n_chunk_tokens"),
            F.expr(f"concat_ws(' ', slice(w, start, {CHUNK_TOKENS}))").alias(
                "chunk_text"
            ),
        )
    )


ORACLE_TOKENIZE_CHUNK = f"""
WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
starts AS (
  SELECT doc_id, w, unnest(range(1, len(w) + 1, {CHUNK_STRIDE})) AS start
  FROM words
)
SELECT doc_id,
       (start - 1) // {CHUNK_STRIDE} AS chunk_idx,
       len(w[start:start+{CHUNK_TOKENS - 1}]) AS n_chunk_tokens,
       array_to_string(w[start:start+{CHUNK_TOKENS - 1}], ' ') AS chunk_text
FROM starts
"""


QUERIES = {
    "sample-hash": q_sample_hash,
    "weighted-sample": q_weighted_sample,
    "split-train-test": q_split_train_test,
    "mix-weighted": q_mix_weighted,
    "stratified-sample": q_stratified_sample,
    "temperature-sample": q_temperature_sample,
    "cap-per-group": q_cap_per_group,
    "pack-sequences": q_pack_sequences,
    "shuffle-global": q_shuffle_global,
    "contamination": q_contamination,
    "corpus-filter": q_corpus_filter,
    "tokenize-chunk": q_tokenize_chunk,
}

ORACLES = {
    "sample-hash": ORACLE_SAMPLE_HASH,
    "weighted-sample": ORACLE_WEIGHTED_SAMPLE,
    "split-train-test": ORACLE_SPLIT_TRAIN_TEST,
    "mix-weighted": ORACLE_MIX_WEIGHTED,
    "stratified-sample": ORACLE_STRATIFIED_SAMPLE,
    "temperature-sample": ORACLE_TEMPERATURE_SAMPLE,
    "cap-per-group": ORACLE_CAP_PER_GROUP,
    "pack-sequences": ORACLE_PACK_SEQUENCES,
    "shuffle-global": ORACLE_SHUFFLE_GLOBAL,
    "contamination": ORACLE_CONTAMINATION,
    "corpus-filter": ORACLE_CORPUS_FILTER,
    "tokenize-chunk": ORACLE_TOKENIZE_CHUNK,
}
