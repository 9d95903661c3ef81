"""Deduplication over the ``documents`` table (north-star X1/X2).

Four tiers, cheapest to richest:

- exact        — hash-groupBy on content digest; one shuffle on the digest.
- simhash      — 16-bit sign-of-sums signature; near-dup candidates collide.
- minhash-lsh  — MinHash signatures banded into LSH buckets; candidate pairs
                 from bucket joins, then exact Jaccard verification.
- ngram-jaccard — exact Jaccard over word-3-shingles for candidate pairs
                 sharing a shingle (the verification join MinHash avoids
                 doing globally).

All hashing is md5 (present and bit-identical in Spark and DuckDB) so every
step has an exact SQL oracle.

Scale notes (100 TB): exact dedup shuffles digests only (bytes, not text).
MinHash-LSH is the scale path for near-dup: cost is O(docs × shingles) for
signatures (narrow), then a shuffle keyed on (band, value) whose fan-in is
the planted-duplicate rate, then pair verification only on candidates.
ngram-jaccard's candidate join prunes shingles with document frequency >
NGRAM_DF_MAX (hot shingles fan out O(df²) pairs with no dedup signal; the
oracle applies the identical cap). dedup-clusters turns verified pairs into
transitive components (min-label fixpoint). Skewed bucket keys are
AQE-skew-split.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rosbag2parquet_spark.sources.catalog import load_table

# ------------------------------------------------------------ exact (X1)


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: group by content digest, keep the smallest doc_id as the
    canonical representative (deterministic winner — important so reruns and
    the oracle agree). Shuffles 16-byte digests, never the documents."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.md5("text").alias("digest"), "doc_id")
        .groupBy("digest")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count(F.lit(1)).alias("n_copies"))
    )


ORACLE_DEDUP_EXACT = """
SELECT md5(text) AS digest, min(doc_id) AS keep_doc_id, count(*) AS n_copies
FROM documents GROUP BY md5(text)
"""


# ---------------------------------------------------------- shingle prep

_SHINGLES_SQL = """
WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
sh AS (
  SELECT DISTINCT doc_id, s
  FROM (SELECT doc_id,
               unnest(list_transform(range(1, greatest(len(w) - 2, 1) + 1),
                                     i -> array_to_string(w[i:i+2], ' '))) AS s
        FROM words)
),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id)
"""


_SET_CACHE: dict[tuple[int, str], DataFrame] = {}


def _doc_shingle_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, shingle-set array) — the set representation used by Jaccard,
    kept as a per-row array (no explode, no shuffle): ``array_distinct``
    gives set semantics, matching the oracle's DISTINCT.

    The words array is projected in its own step so ``split`` runs once per
    row — inlining it into the shingle lambda would re-split per element
    (O(words²) per document). The result is cached: every dedup query reads
    the set column 2-3 times (signature + both verification sides), and at
    scale this is the one intermediate worth memoizing (it is ~the corpus
    size, reused across near-dup passes)."""
    # keyed by applicationId (unique per session), NOT id(spark) — CPython
    # reuses object addresses, which could serve a DataFrame bound to a
    # stopped SparkContext
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _SET_CACHE:
        docs = load_table(spark, sf_dir, "documents")
        words = docs.select("doc_id", F.split("text", " ").alias("w"))
        sets = words.select(
            "doc_id",
            F.array_distinct(
                F.expr(
                    "transform(sequence(1, greatest(size(w) - 2, 1)),"
                    " i -> concat_ws(' ', slice(w, i, 3)))"
                )
            ).alias("sset"),
        )
        _SET_CACHE[key] = sets.cache()
    return _SET_CACHE[key]


def _doc_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, shingle) distinct pairs — exploded form, used only where a
    shingle-keyed join is genuinely needed (candidate generation in the
    exact similarity join)."""
    return (
        _doc_shingle_sets(spark, sf_dir)
        .select("doc_id", F.explode("sset").alias("s"))
    )


# -------------------------------------------------------- minhash-lsh (X2)

N_HASHES = 8
BAND_SIZE = 2  # 4 bands × 2 rows — b·r = 8
JACCARD_THRESHOLD = 0.8


def minhash_signatures_expr(shingle_sets: DataFrame) -> DataFrame:
    """The pure-expression REFERENCE tier for `minhash_signatures` (r13:
    serving moved to the Arrow tier below; this formulation stays as the
    oracle-shaped reference the pair-pin test checks against): 8
    min-hashes from TWO md5 evaluations per shingle via one explode +
    one groupBy(doc_id) with map-side partial mins."""
    hashed = shingle_sets.select(
        "doc_id", F.explode("sset").alias("s")
    ).select(
        "doc_id",
        F.md5(F.concat(F.lit("0|"), F.col("s"))).alias("h0"),
        F.md5(F.concat(F.lit("1|"), F.col("s"))).alias("h1"),
    )
    aggs = [
        F.min(F.substring(F.col(f"h{k // 4}"), 1 + 8 * (k % 4), 8)).alias(f"mh{k}")
        for k in range(N_HASHES)
    ]
    return hashed.groupBy("doc_id").agg(*aggs)


def minhash_signatures(shingle_sets: DataFrame) -> DataFrame:
    """MinHash signature per doc: 8 independent min-hashes derived from TWO
    md5 evaluations per shingle (each 32-hex digest sliced into four 8-hex
    values ≈ four independent 32-bit hashes) — 4× less hashing than
    hash-per-permutation.

    r13: computed MAP-SIDE in one Arrow pass over the per-doc shingle
    arrays — each doc's signature is a function of its OWN shingles, so
    the explode + groupBy of the expression tier (230k shingle rows
    through a shuffle at sf0.1, 0.66 s) was pure mechanism; the Python
    md5s produce the IDENTICAL hex strings (hashlib md5 of the same
    UTF-8 bytes, the same [8k, 8k+8) hex slices, the same lexicographic
    min — pair-pinned against `minhash_signatures_expr` in tests), and
    the signature stage now shuffles NOTHING at any scale."""
    import hashlib

    import pandas as pd

    def sigs(ssets):
        rows = []
        for sset in ssets:
            h0s = [
                hashlib.md5(("0|" + s).encode("utf-8")).hexdigest()
                for s in sset
            ]
            h1s = [
                hashlib.md5(("1|" + s).encode("utf-8")).hexdigest()
                for s in sset
            ]
            rows.append(
                [
                    min(h[8 * (k % 4): 8 * (k % 4) + 8] for h in
                        (h0s if k < 4 else h1s))
                    for k in range(N_HASHES)
                ]
            )
        return pd.Series(rows)

    sigs.__annotations__ = {"ssets": pd.Series, "return": pd.Series}
    mh = F.pandas_udf(sigs, "array<string>")
    return shingle_sets.select(
        "doc_id", mh(F.col("sset")).alias("__mh")
    ).select(
        "doc_id",
        *[
            F.element_at("__mh", k + 1).alias(f"mh{k}")
            for k in range(N_HASHES)
        ],
    )


def _verify_jaccard(cand: DataFrame, sets: DataFrame) -> DataFrame:
    """Exact Jaccard for candidate pairs via array_intersect — per-pair
    narrow arithmetic after two id-keyed joins (candidates are few; the
    shingle sets ride along as arrays instead of re-exploding)."""
    ja = sets.select(F.col("doc_id").alias("a_id"), F.col("sset").alias("sa"))
    jb = sets.select(F.col("doc_id").alias("b_id"), F.col("sset").alias("sb"))
    inter = F.size(F.array_intersect("sa", "sb"))
    return (
        cand.join(ja, "a_id")
        .join(jb, "b_id")
        .select(
            "a_id",
            "b_id",
            # raw IEEE quotient of exact ints — deterministic across engines
            # (round() can face an exact half when |∪| is 2^k·5^m)
            (inter / (F.size("sa") + F.size("sb") - inter)).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    )


def q_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + LSH near-duplicate pairs, exact-verified.

    Pipeline: shingle-set arrays → 8 MinHash values/doc (narrow array ops)
    → band into 4 buckets of 2 → self-join on (band, bucket) for candidates
    (the ONLY shuffle, keyed on bucket values) → exact Jaccard via
    array_intersect → threshold. The quadratic step only ever sees bucket
    collisions."""
    sets = _doc_shingle_sets(spark, sf_dir)
    cand = lsh_candidates(minhash_signatures(sets))
    return _verify_jaccard(cand, sets)


def lsh_candidates(sig: DataFrame) -> DataFrame:
    """Distinct candidate pairs (a_id < b_id) from banded signatures — the
    batch construction the streaming incremental index must reproduce
    exactly (stream-neardup-parity)."""
    bands = sig.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[
                    F.concat_ws(
                        "#", *[F.col(f"mh{b * BAND_SIZE + r}") for r in range(BAND_SIZE)]
                    )
                    for b in range(N_HASHES // BAND_SIZE)
                ]
            )
        ).alias("band", "bucket"),
    )
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id"))
        .distinct()
    )


#: shared CTE chain shingles → signatures → bands → candidates → exact
#: intersection counts (reused by the clustering oracle)
_MINHASH_CTES = (
    _SHINGLES_SQL
    + """,
sig AS (
  SELECT doc_id,
"""
    + ",\n".join(
        f"         min(substr(md5('{k // 4}|' || s), {1 + 8 * (k % 4)}, 8)) AS mh{k}"
        for k in range(N_HASHES)
    )
    + """
  FROM sh GROUP BY doc_id
),
bands AS (
"""
    + "\n  UNION ALL\n".join(
        f"  SELECT doc_id, {b} AS band, mh{b * BAND_SIZE} || '#' || mh{b * BAND_SIZE + 1} AS bucket FROM sig"
        for b in range(N_HASHES // BAND_SIZE)
    )
    + """
),
cand AS (
  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
),
inter AS (
  SELECT c.a_id, c.b_id, count(*) AS inter
  FROM cand c
  JOIN sh sa ON sa.doc_id = c.a_id
  JOIN sh sb ON sb.doc_id = c.b_id AND sb.s = sa.s
  GROUP BY c.a_id, c.b_id
)"""
)

ORACLE_MINHASH_LSH = (
    _MINHASH_CTES
    + """
SELECT a_id, b_id,
       inter * 1.0 / (za.n + zb.n - inter) AS jaccard
FROM inter
JOIN sizes za ON za.doc_id = a_id
JOIN sizes zb ON zb.doc_id = b_id
WHERE inter * 1.0 / (za.n + zb.n - inter) >= """
    + str(JACCARD_THRESHOLD)
)


# ------------------------------------------------------- ngram-jaccard (X2)


#: document-frequency cap for candidate-generating shingles: a shingle in
#: more than this many docs fans out O(df²) candidate pairs while carrying
#: ~no dedup signal (stopword-like shingles). Pairs sharing ONLY >cap
#: shingles are missed — at Jaccard ≥ 0.8 a true near-dup pair shares many
#: rare shingles, so the miss set is empty in practice. This is the standard
#: similarity-join scale mitigation (prefix filtering's cheap cousin).
NGRAM_DF_MAX = 50


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram Jaccard similarity join: candidates = pairs sharing at least
    one RARE 3-shingle (document frequency ≤ NGRAM_DF_MAX — the df-pruning
    that keeps the shingle-keyed self-join from exploding on hot shingles;
    the oracle applies the identical cap so parity stays value-exact),
    verified with the full shingle sets via array_intersect like the LSH
    variant. Still the shuffle-heaviest dedup tier — q_minhash_lsh is the
    scale path."""
    sh = _doc_shingles(spark, sf_dir)
    rare = sh.join(
        sh.groupBy("s").agg(F.count(F.lit(1)).alias("__df"))
        .filter(F.col("__df") <= NGRAM_DF_MAX)
        .select("s"),
        "s",
        "left_semi",
    )
    cand = (
        rare.alias("a")
        .join(
            rare.alias("b"),
            (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id"))
        .distinct()
    )
    return _verify_jaccard(cand, _doc_shingle_sets(spark, sf_dir))


ORACLE_NGRAM_JACCARD = (
    _SHINGLES_SQL
    + f""",
rare AS (
  SELECT sh.* FROM sh
  JOIN (SELECT s FROM sh GROUP BY s HAVING count(*) <= {NGRAM_DF_MAX}) r USING (s)
),
cand AS (
  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
  FROM rare a JOIN rare b ON a.s = b.s AND a.doc_id < b.doc_id
),
inter AS (
  SELECT c.a_id, c.b_id, count(*) AS inter
  FROM cand c
  JOIN sh sa ON sa.doc_id = c.a_id
  JOIN sh sb ON sb.doc_id = c.b_id AND sb.s = sa.s
  GROUP BY 1, 2
)
SELECT a_id, b_id,
       inter * 1.0 / (za.n + zb.n - inter) AS jaccard
FROM inter
JOIN sizes za ON za.doc_id = a_id
JOIN sizes zb ON zb.doc_id = b_id
WHERE inter * 1.0 / (za.n + zb.n - inter) >= """
    + str(JACCARD_THRESHOLD)
)


# ------------------------------------------------------------ simhash (X2)

SIMHASH_BITS = 16
_HEX = "0123456789abcdef"


def _word_hash16_expr(col: str) -> str:
    """16-bit hash of a word from the first 4 hex chars of its md5 —
    hex→int via strpos arithmetic because it must be identical SQL in both
    engines (Spark `conv` has no DuckDB twin)."""
    parts = [
        f"(instr('{_HEX}', substr(md5({col}), {i + 1}, 1)) - 1) * {16 ** (3 - i)}"
        for i in range(4)
    ]
    return "(" + " + ".join(parts) + ")"


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash document signature: per bit j, sum +1/-1 over distinct words
    according to bit j of the word hash; bit set iff the sum is positive.
    Computed entirely with array expressions (array_distinct → transform →
    16 aggregates) — NARROW, zero shuffles: the signature materializes in
    the scan stage. Near-dup docs land at small Hamming distance; grouping
    by the signature is the O(n) near-dup partitioner."""
    docs = load_table(spark, sf_dir, "documents")
    h_arr = F.expr(
        "transform(array_distinct(split(text, ' ')), w -> "
        + _word_hash16_expr("w")
        + ")"
    )
    with_h = docs.select("doc_id", h_arr.alias("hs"))
    bit_cols = [
        F.expr(
            f"aggregate(hs, 0, (acc, h) -> acc + "
            f"CASE WHEN (h div {1 << j}) % 2 = 1 THEN 1 ELSE -1 END)"
        ).alias(f"b{j}")
        for j in range(SIMHASH_BITS)
    ]
    bit_sums = with_h.select("doc_id", *bit_cols)
    sim = None
    for j in range(SIMHASH_BITS):
        term = F.when(F.col(f"b{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        sim = term if sim is None else sim + term
    return bit_sums.select("doc_id", sim.cast("long").alias("simhash"))


def _oracle_simhash() -> str:
    h = _word_hash16_expr("w").replace("instr(", "strpos(")
    bit_sums = ",\n         ".join(
        f"sum(CASE WHEN (h // {1 << j}) % 2 = 1 THEN 1 ELSE -1 END) AS b{j}"
        for j in range(SIMHASH_BITS)
    )
    assemble = " + ".join(
        f"CASE WHEN b{j} > 0 THEN {1 << j} ELSE 0 END" for j in range(SIMHASH_BITS)
    )
    return f"""
WITH words AS (
  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
), hashed AS (
  SELECT doc_id, {h} AS h FROM words
), bit_sums AS (
  SELECT doc_id,
         {bit_sums}
  FROM hashed GROUP BY doc_id
)
SELECT doc_id, CAST({assemble} AS BIGINT) AS simhash FROM bit_sums
"""


# ---------------------------------------------------- dedup clustering (X2)


def connected_components_min_label(edges: DataFrame, max_iter: int = 20) -> DataFrame:
    """Connected components by iterative min-label propagation: every vertex
    starts labeled with itself; each round pulls the minimum label across
    its neighborhood; stop at fixpoint. Returns (doc_id, cluster) with
    cluster = min doc_id of the component — deterministic for any engine or
    iteration order, which is what makes the result oracle-comparable.

    Each round is two shuffles (join on edge endpoints + min-agg); rounds
    needed = graph diameter, and near-dup graphs are shallow (duplicate
    clusters are cliques or near-cliques). This is the dataframe-native CC
    loop (the large-star/small-star optimization drops in for adversarial
    diameters); the driver only ever sees the converged-or-not count — no
    vertex data leaves the cluster.

    Iterative-algorithm hygiene (the failure mode at scale is NOT compute —
    it is unbounded plan/lineage growth): each generation is cut with
    ``localCheckpoint(eager)`` so the plan stays one-join deep regardless of
    round count, and the previous generation's blocks are explicitly freed.
    After R rounds the storage footprint is ONE label set, not R."""
    sym = (
        edges.selectExpr("a_id AS src", "b_id AS dst")
        .unionByName(edges.selectExpr("b_id AS src", "a_id AS dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        sym.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("cluster", F.col("doc_id"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        neigh = (
            sym.join(labels, sym.dst == labels.doc_id)
            .groupBy(F.col("src").alias("doc_id"))
            .agg(F.min("cluster").alias("nmin"))
        )
        # checkpoint BEFORE the convergence count: the count and the next
        # round both read the materialized blocks, and `updated` carries no
        # lineage back through this round's joins
        updated = (
            labels.join(neigh, "doc_id", "left")
            .select(
                "doc_id",
                F.least(
                    "cluster", F.coalesce("nmin", F.col("cluster"))
                ).alias("cluster"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            updated.alias("u")
            .join(labels.alias("l"), "doc_id")
            .filter(F.col("u.cluster") != F.col("l.cluster"))
            .count()
        )
        # drop the superseded generation: localCheckpoint blocks are freed
        # by the ContextCleaner once the backing RDD is dereferenced, so
        # rebinding `labels` (and loop scope) keeps live storage at ONE
        # label set + the edge set, independent of round count
        labels = updated
        if changed == 0:
            break
    return labels


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive near-duplicate clusters: the verified MinHash-LSH pairs
    are edges; components get the min doc_id as canonical representative —
    the keep-one-per-cluster decision a dedup pipeline actually ships.
    Exact-oracled: the fixpoint (min reachable id) is engine-independent,
    and DuckDB reproduces it with a recursive transitive closure."""
    pairs = q_minhash_lsh(spark, sf_dir).select("a_id", "b_id")
    return connected_components_min_label(pairs).select(
        "doc_id", F.col("cluster").alias("cluster_rep")
    )


ORACLE_DEDUP_CLUSTERS = (
    _MINHASH_CTES.replace("WITH ", "WITH RECURSIVE ", 1)
    + """,
pairs AS (
  SELECT a_id, b_id
  FROM inter
  JOIN sizes za ON za.doc_id = a_id
  JOIN sizes zb ON zb.doc_id = b_id
  WHERE inter * 1.0 / (za.n + zb.n - inter) >= """
    + str(JACCARD_THRESHOLD)
    + """
),
sym AS (
  SELECT a_id AS src, b_id AS dst FROM pairs
  UNION
  SELECT b_id AS src, a_id AS dst FROM pairs
),
reach AS (
  SELECT src AS v, dst AS r FROM sym
  UNION
  SELECT sym.src AS v, reach.r
  FROM sym JOIN reach ON sym.dst = reach.v
)
SELECT v AS doc_id, least(v, min(r)) AS cluster_rep
FROM reach GROUP BY v
"""
)


# --------------------------------------------------------- containment (X2)

#: containment threshold: |A∩B| / min(|A|,|B|) — the smaller document is
#: mostly inside the larger one (quotes, excerpts, boilerplate wrapping);
#: symmetric Jaccard misses these when the size ratio is large
CONTAINMENT_THRESHOLD = 0.5


def q_dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric near-dup: shingle containment ≥ CONTAINMENT_THRESHOLD.
    A Jaccard join misses a short document embedded in a long one (the
    union term swamps the intersection); containment normalizes by the
    SMALLER set, which is exactly the excerpt/boilerplate case a
    training-corpus dedup pass must catch. Same df-pruned candidate join
    and array_intersect verify as the Jaccard tier — one more metric on
    the same scale skeleton, not a new pipeline."""
    sh = _doc_shingles(spark, sf_dir)
    rare = sh.join(
        sh.groupBy("s").agg(F.count(F.lit(1)).alias("__df"))
        .filter(F.col("__df") <= NGRAM_DF_MAX)
        .select("s"),
        "s",
        "left_semi",
    )
    cand = (
        rare.alias("a")
        .join(
            rare.alias("b"),
            (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id"))
        .distinct()
    )
    sets = _doc_shingle_sets(spark, sf_dir)
    ja = sets.select(F.col("doc_id").alias("a_id"), F.col("sset").alias("sa"))
    jb = sets.select(F.col("doc_id").alias("b_id"), F.col("sset").alias("sb"))
    inter = F.size(F.array_intersect("sa", "sb"))
    return (
        cand.join(ja, "a_id")
        .join(jb, "b_id")
        .select(
            "a_id",
            "b_id",
            (inter / F.least(F.size("sa"), F.size("sb"))).alias("containment"),
        )
        .filter(F.col("containment") >= CONTAINMENT_THRESHOLD)
    )


ORACLE_DEDUP_CONTAINMENT = (
    _SHINGLES_SQL
    + f""",
rare AS (
  SELECT sh.* FROM sh
  JOIN (SELECT s FROM sh GROUP BY s HAVING count(*) <= {NGRAM_DF_MAX}) r USING (s)
),
cand AS (
  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
  FROM rare a JOIN rare b ON a.s = b.s AND a.doc_id < b.doc_id
),
inter AS (
  SELECT c.a_id, c.b_id, count(*) AS inter
  FROM cand c
  JOIN sh sa ON sa.doc_id = c.a_id
  JOIN sh sb ON sb.doc_id = c.b_id AND sb.s = sa.s
  GROUP BY 1, 2
)
SELECT a_id, b_id,
       inter * 1.0 / least(za.n, zb.n) AS containment
FROM inter
JOIN sizes za ON za.doc_id = a_id
JOIN sizes zb ON zb.doc_id = b_id
WHERE inter * 1.0 / least(za.n, zb.n) >= """
    + str(CONTAINMENT_THRESHOLD)
)


# ---------------------------------------------------- normalized dedup (X2)


def q_dedup_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup AFTER text canonicalization (lowercase, non-alnum →
    space, whitespace collapse, trim) — the standard first pass of a
    corpus pipeline: it folds case/punctuation variants plain byte-exact
    dedup misses, still map-only + one digest-keyed shuffle. The
    normalization is the identical regex program on both engines."""
    docs = load_table(spark, sf_dir, "documents")
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", " "),
            "  +",
            " ",
        )
    )
    return (
        docs.select("doc_id", F.md5(norm).alias("norm_fp"), F.length(norm).alias("norm_len"))
        .groupBy("norm_fp")
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
            F.min("norm_len").cast("long").alias("norm_len"),
        )
    )


ORACLE_DEDUP_NORMALIZED = """
SELECT md5(n) AS norm_fp, min(doc_id) AS keep_doc_id, count(*) AS n_copies,
       CAST(min(length(n)) AS BIGINT) AS norm_len
FROM (SELECT doc_id,
             trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                                 '  +', ' ', 'g')) AS n
      FROM documents)
GROUP BY 1
"""


def q_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall of MinHash-LSH against the exact n-gram-Jaccard ground truth
    at the same threshold — the quality number an LSH band/row config is
    tuned by (b=4, r=2 here), measured instead of asserted (companion to
    `knn-recall` on the embedding side). Both sides are deterministic
    engine queries, so this is a reproducible integer, not a sample
    estimate. The truth side reuses the DF-pruned exact join — the
    measurement harness runs at audit scale; LSH is the production path."""
    truth = q_ngram_jaccard(spark, sf_dir).select("a_id", "b_id")
    found = q_minhash_lsh(spark, sf_dir).select("a_id", "b_id")
    tot = truth.agg(F.count(F.lit(1)).alias("n_truth"))
    hit = truth.join(found, ["a_id", "b_id"], "left_semi").agg(
        F.count(F.lit(1)).alias("n_found")
    )
    return tot.crossJoin(hit).select(
        "n_truth",
        "n_found",
        F.expr("CAST(n_found * 10000 div n_truth AS BIGINT)").alias(
            "recall_bps"
        ),
    )


ORACLE_LSH_RECALL = f"""
WITH truth AS (
  SELECT a_id, b_id FROM ({ORACLE_NGRAM_JACCARD})
),
found AS (
  SELECT a_id, b_id FROM ({ORACLE_MINHASH_LSH})
),
tot AS (SELECT count(*) AS n_truth FROM truth),
hit AS (SELECT count(*) AS n_found
        FROM truth JOIN found USING (a_id, b_id))
SELECT n_truth, n_found,
       CAST(n_found * 10000 // n_truth AS BIGINT) AS recall_bps
FROM tot, hit
"""


# ------------------------------------------------- substring-dedup (X2+)

#: positional word-5-shingles — the span granularity of suffix-style
#: training-data dedup (Lee et al., "Deduplicating Training Data Makes
#: Language Models Better"): a span is duplicated if the SAME 5-word
#: window occurs anywhere else in the corpus (cross- OR within-doc).
#: Same greatest(...,1) guard as the contamination shingles: a <5-token
#: doc yields one (short) shingle on both engines.
_SPAN_K = 5
#: span generator over a PRE-SPLIT token array column ``toks`` — r13: the
#: lambda used to call ``split(text, ' ')`` inline, and higher-order
#: functions evaluate their body per element with NO common-subexpression
#: caching, so every ~46-span doc re-split its text 46 times (interpreted).
#: Splitting once into a bound column and slicing the attribute is the
#: same value sequence at a fraction of the per-span work.
_SPANS_SPARK = (
    f"transform(sequence(1, greatest(size(toks) - {_SPAN_K - 1},"
    " 1)), i ->"
    f" concat_ws(' ', slice(toks, i, {_SPAN_K})))"
)
_SPANS_DUCK = (
    "list_transform(range(1, greatest(len(string_split(text, ' ')) -"
    f" {_SPAN_K - 1}, 1) + 1), i ->"
    f" array_to_string((string_split(text, ' '))[i:i+{_SPAN_K - 1}], ' '))"
)


def q_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level duplicate MASS per document — the granularity the
    document-level tiers above can't see (two docs sharing one boilerplate
    paragraph are not near-dups, but that paragraph is still duplicated
    training data). For every positional 5-word window, the span is
    duplicated iff it occurs >= 2 times corpus-wide; the per-doc report is
    (total spans, duplicated spans) — the signal a span-removal pass
    thresholds on.

    Plan: spans explode narrow as (doc_id, xxhash64(span)) — the 8-byte
    hash shuffles, never the text (the 100 TB posture; at fixture scale the
    oracle's exact string grouping cross-checks that 64-bit collisions
    don't occur). Corpus-wide occurrence counts come from a COUNT window
    over the hash partition — ONE Exchange on the hash, no join-back
    (a groupBy+join would shuffle the span stream twice; mostly-unique
    keys mean partial aggregation buys nothing). Then one doc_id
    re-aggregation; total spans is arithmetic on the token count, no
    second text scan."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    spans = docs.select(
        "doc_id", F.split("text", " ").alias("toks")
    ).select(
        "doc_id", F.explode(F.expr(_SPANS_SPARK)).alias("s")
    ).select("doc_id", F.xxhash64("s").alias("h"))
    occ = spans.withColumn(
        "occ", F.count(F.lit(1)).over(Window.partitionBy("h"))
    )
    dup = (
        occ.filter(F.col("occ") >= 2)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("dup_spans"))
    )
    totals = docs.select(
        "doc_id",
        F.expr(
            f"greatest(size(split(text, ' ')) - {_SPAN_K - 1}, 1)"
        )
        .cast("long")
        .alias("n_spans"),
    )
    return totals.join(dup, "doc_id", "left").select(
        "doc_id",
        "n_spans",
        F.coalesce(F.col("dup_spans"), F.lit(0)).cast("long").alias(
            "dup_spans"
        ),
    )


ORACLE_SUBSTRING_DEDUP = f"""
WITH sh AS (
  SELECT doc_id, unnest({_SPANS_DUCK}) AS s FROM documents
),
occ AS (
  SELECT doc_id, count(*) OVER (PARTITION BY s) AS occ FROM sh
),
dup AS (
  SELECT doc_id, count(*) AS dup_spans FROM occ WHERE occ >= 2
  GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(greatest(len(string_split(d.text, ' ')) - {_SPAN_K - 1}, 1)
            AS BIGINT) AS n_spans,
       CAST(coalesce(dup.dup_spans, 0) AS BIGINT) AS dup_spans
FROM documents d LEFT JOIN dup ON d.doc_id = dup.doc_id
"""


def q_scrub_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span REMOVAL — the apply step `substring-dedup` only scores (Lee et
    al.'s dedup actually deletes the duplicated text; two docs sharing one
    boilerplate paragraph keep their unique prose and lose the paragraph):
    every token covered by ANY duplicated positional 5-word window (window
    occurring >= 2x corpus-wide) is removed, and the cleaned text plus
    removal accounting comes back per document.

    Plan — built so TOKENS NEVER SHUFFLE: the span stream shuffles as
    8-byte hashes for the corpus-wide occurrence count (same single
    Exchange as substring-dedup), duplicated windows explode into covered
    token positions and reduce to ONE small int-array row per affected doc
    (collect_set over doc_id — the only other shuffle, proportional to
    duplicated mass, not corpus size), and that array joins back to the
    documents at doc grain where the removal itself is a map-side
    higher-order filter (indexed transform + array_contains). A
    token-grain anti-join would shuffle every token twice; this shuffles
    none. The oracle uses the token-grain formulation — equivalent
    semantics, fixture-affordable, and its exact string grouping
    cross-checks the hash blocking."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    # window start positions are 0-based token indices (posexplode index)
    spans = docs.select(
        "doc_id", F.split("text", " ").alias("toks")
    ).select(
        "doc_id", F.posexplode(F.expr(_SPANS_SPARK)).alias("p", "s")
    ).select("doc_id", "p", F.xxhash64("s").alias("h"))
    occ = spans.withColumn(
        "occ", F.count(F.lit(1)).over(Window.partitionBy("h"))
    )
    covered = (
        occ.filter(F.col("occ") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.col("p"), F.col("p") + F.lit(_SPAN_K - 1))
            ).alias("pos"),
        )
        .groupBy("doc_id")
        .agg(F.collect_set("pos").alias("cov"))
    )
    return (
        docs.join(covered, "doc_id", "left")
        .select(
            "doc_id",
            F.expr("split(text, ' ')").alias("toks"),
            F.coalesce("cov", F.expr("array()")).alias("cov"),
        )
        .select(
            "doc_id",
            F.expr("size(toks)").cast("long").alias("n_tokens"),
            F.expr(
                "transform(filter(transform(toks, (t, i) -> struct(i AS i,"
                " t AS t)), x -> NOT array_contains(cov, x.i)), x -> x.t)"
            ).alias("kept"),
        )
        .select(
            "doc_id",
            "n_tokens",
            (F.col("n_tokens") - F.expr("size(kept)")).cast("long").alias(
                "n_removed"
            ),
            F.expr("array_join(kept, ' ')").alias("clean_text"),
        )
        .orderBy("doc_id")
    )


ORACLE_SCRUB_DUP_SPANS = f"""
WITH toks0 AS (
  SELECT doc_id,
         unnest(list_transform(string_split(text, ' '),
                (t, i) -> {{'tok': t, 'pos': i - 1}})) AS u
  FROM documents
), toks AS (
  SELECT doc_id, u.tok AS tok, CAST(u.pos AS BIGINT) AS pos FROM toks0
), sp0 AS (
  SELECT doc_id,
         unnest(list_transform({_SPANS_DUCK},
                (s, i) -> {{'s': s, 'p': i - 1}})) AS u
  FROM documents
), sp AS (
  SELECT doc_id, u.s AS s, CAST(u.p AS BIGINT) AS p FROM sp0
), occ AS (
  SELECT doc_id, p, count(*) OVER (PARTITION BY s) AS occ FROM sp
), covered AS (
  SELECT DISTINCT doc_id, p + g.g AS pos
  FROM occ, range({_SPAN_K}) g(g) WHERE occ >= 2
), kept AS (
  SELECT t.doc_id,
         count(*) AS n_kept,
         string_agg(t.tok, ' ' ORDER BY t.pos) AS clean_text
  FROM toks t ANTI JOIN covered c ON t.doc_id = c.doc_id AND t.pos = c.pos
  GROUP BY t.doc_id
)
SELECT d.doc_id,
       CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens,
       CAST(len(string_split(d.text, ' ')) - coalesce(k.n_kept, 0)
            AS BIGINT) AS n_removed,
       coalesce(k.clean_text, '') AS clean_text
FROM documents d LEFT JOIN kept k ON d.doc_id = k.doc_id
ORDER BY d.doc_id
"""


# ------------------------------------------------- edit-distance (Pass-Join)

#: edit-distance threshold for the character-level tier
EDITDIST_TAU = 4


def q_dedup_editdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level near-dup: all pairs with Levenshtein distance <= 4,
    found WITHOUT the O(n^2) distance matrix via Pass-Join-style segment
    blocking (Li/Deng/Feng/Wang, PVLDB 2011 — public): partition each doc
    into tau+1 = 5 disjoint segments; if ed(a,b) <= tau, at most tau
    segments receive an edit, so BY PIGEONHOLE at least one segment of the
    shorter doc appears EXACTLY in the longer one — and its displacement x
    obeys the multi-match-aware bound |x| + |x - (len_b - len_a)| <= tau
    (|x| <= edits before the segment, |x - delta| <= edits after it, and
    the two classes share the tau budget), i.e. at most ~tau/2 positions
    either side of the length-adjusted home. Candidate generation is
    therefore a pure EQUI-join: the shorter side emits its 5 segments
    keyed (len, segment_index, text); the longer side emits every
    substring that a length-compatible partner's segment could equal (<= 5
    candidate lengths x 5 segments x ~5 shifts, each keyed by the
    segment's 8-byte xxhash64) — the corpus text itself never fans out,
    and since r13 not even the probe substrings do: fixed-width hashes
    go through ONE shuffle straight into the join (a hash collision only
    adds a candidate the verifier discards). Exact ``levenshtein(_, _, tau)``
    (early-abort threshold form) verifies candidates only — the same
    candidates-only posture as the MinHash tier, at character rather than
    shingle granularity (catches the small-typo/boilerplate-tweak
    duplicates a word-shingle tier scores as far apart). The blocked
    candidate set is a superset of the true pair set, so recall is EXACT
    (not probabilistic — unlike
    MinHash, this tier cannot miss a pair — the displacement bound above
    is derived, not heuristic, and the oracle's independent blocking
    cross-checks it). Docs shorter than tau+1 chars
    are out of scope for this tier (their segments degenerate; exact/
    normalized dedup owns them; the fixture has none). The oracle blocks
    with the looser contains-anywhere form — fine at fixture scale,
    quadratic at 100 TB, which is exactly why the positioned equi-join is
    the engine's plan. Output: (a_id, b_id, ed), a_id < b_id."""
    tau = EDITDIST_TAU
    d = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text", F.length("text").alias("len"))
        .filter(F.col("len") > tau)
    )

    # shorter side: 5 disjoint segments per doc, keyed by (len, i, text).
    # 0-based start of segment i: i*base + min(i, rem); length base(+1<rem)
    seg = (
        d.select(
            F.col("doc_id").alias("a_id"),
            F.col("len").alias("la"),
            "text",
            F.explode(F.sequence(F.lit(0), F.lit(tau))).alias("i"),
        )
        .withColumn("base", F.expr("la div 5"))
        .withColumn("rem", F.expr("la % 5"))
        .select(
            "a_id",
            "la",
            "i",
            # r13: the equi-key is the segment's 8-byte xxhash64, not the
            # ~60-char substring (substring-dedup's posture: hashes move,
            # text never does). A 64-bit collision can only ADD a
            # candidate pair, and every candidate is verified by exact
            # levenshtein below — false positives cost one bounded
            # verification, false negatives are impossible (equal
            # segments hash equal), so recall stays exact.
            F.xxhash64(
                F.expr(
                    "substring(text, i*base + least(i, rem) + 1,"
                    " base + IF(i < rem, 1, 0))"
                )
            ).alias("hs"),
        )
    )

    # longer side: for every compatible partner length la in [len-4, len]
    # and segment i, every substring within +-tau of the segment's home
    probe = (
        d.select(
            F.col("doc_id").alias("b_id"),
            F.col("len").alias("lb"),
            "text",
            F.explode(
                F.sequence(F.col("len") - tau, F.col("len"))
            ).alias("la"),
        )
        .filter(F.col("la") > tau)
        .select(
            "b_id",
            "lb",
            "text",
            "la",
            F.explode(F.sequence(F.lit(0), F.lit(tau))).alias("i"),
        )
        .withColumn("base", F.expr("la div 5"))
        .withColumn("rem", F.expr("la % 5"))
        .withColumn("slen", F.expr("base + IF(i < rem, 1, 0)"))
        .withColumn("sa0", F.expr("i*base + least(i, rem)"))
        .select(
            "b_id",
            "la",
            "i",
            "slen",
            "sa0",
            "text",
            "lb",
            # multi-match-aware shift window: an unedited segment's
            # displacement x = ins_before - del_before satisfies
            # |x| <= edits_before and |x - delta| = |ins_after - del_after|
            # <= edits_after, so |x| + |x - delta| <= tau (delta = lb-la).
            # That halves the +-tau window: x in
            # [-((tau-delta) div 2), (tau+delta) div 2].
            F.explode(
                F.expr(
                    f"sequence(-(({tau} - (lb - la)) div 2),"
                    f" ({tau} + (lb - la)) div 2)"
                )
            ).alias("sh"),
        )
        .withColumn("p0", F.col("sa0") + F.col("sh"))
        .filter((F.col("p0") >= 0) & (F.col("p0") + F.col("slen") <= F.col("lb")))
        .select(
            "b_id",
            "la",
            "i",
            F.xxhash64(F.expr("substring(text, p0 + 1, slen)")).alias("hs"),
        )
        # r13: no probe-level distinct — measured at sf0.1 it collapsed
        # NOTHING (535k -> 535k rows; shift-positioned substrings are
        # near-unique keys) while paying a full hash-aggregate on both
        # sides of the exchange (~0.9 s of the query). The join below
        # hashes the same (la, i, s) key, so the shuffle count is
        # unchanged, and duplicate candidate PAIRS (the only semantic
        # effect of duplicate probes) still collapse in the pair-keyed
        # distinct that follows — the output is provably identical. On a
        # highly-repetitive 100 TB corpus duplicate probes would fan the
        # join out; that corpus re-adds the collapse ONE line up — the
        # fixture-measured default pays for what the data actually has.
    )

    cand = (
        seg.join(probe, ["la", "i", "hs"])
        .filter(F.col("a_id") != F.col("b_id"))
        .select("a_id", "b_id")
        .distinct()
    )

    texts = d.select("doc_id", "text")
    ver = (
        cand.join(
            texts.select(
                F.col("doc_id").alias("a_id"), F.col("text").alias("ta")
            ),
            "a_id",
        )
        .join(
            texts.select(
                F.col("doc_id").alias("b_id"), F.col("text").alias("tb")
            ),
            "b_id",
        )
        .withColumn(
            "ed", F.levenshtein(F.col("ta"), F.col("tb"), tau).cast("long")
        )
        .filter((F.col("ed") >= 0) & (F.col("ed") <= tau))
    )
    return (
        ver.select(
            F.least("a_id", "b_id").alias("a_id"),
            F.greatest("a_id", "b_id").alias("b_id"),
            "ed",
        )
        .distinct()
        .orderBy("a_id", "b_id")
    )


ORACLE_DEDUP_EDITDIST = """
WITH d AS (
  SELECT doc_id, text, length(text) AS len FROM documents
  WHERE length(text) > 4
), seg AS (
  SELECT doc_id AS a_id, len AS la, i,
         substr(text,
                CAST(i*(len//5) + least(i, len%5) + 1 AS BIGINT),
                CAST((len//5) + CASE WHEN i < len%5 THEN 1 ELSE 0 END
                     AS BIGINT)) AS s
  FROM d, range(5) t(i)
), cand AS (
  SELECT DISTINCT seg.a_id, b.doc_id AS b_id
  FROM seg JOIN d b
    ON b.len BETWEEN seg.la AND seg.la + 4
   AND seg.a_id <> b.doc_id
   AND position(seg.s IN b.text) > 0
), ver AS (
  SELECT least(c.a_id, c.b_id) AS a_id,
         greatest(c.a_id, c.b_id) AS b_id,
         CAST(levenshtein(x.text, y.text) AS BIGINT) AS ed
  FROM cand c
  JOIN d x ON x.doc_id = c.a_id
  JOIN d y ON y.doc_id = c.b_id
  WHERE levenshtein(x.text, y.text) <= 4
)
SELECT DISTINCT a_id, b_id, ed FROM ver ORDER BY a_id, b_id
"""


QUERIES = {
    "dedup-exact": q_dedup_exact,
    "dedup-editdist": q_dedup_editdist,
    "scrub-dup-spans": q_scrub_dup_spans,
    "substring-dedup": q_substring_dedup,
    "dedup-minhash-lsh": q_minhash_lsh,
    "dedup-ngram-jaccard": q_ngram_jaccard,
    "dedup-simhash": q_simhash,
    "dedup-clusters": q_dedup_clusters,
    "lsh-recall": q_lsh_recall,
    "dedup-containment": q_dedup_containment,
    "dedup-normalized": q_dedup_normalized,
}

ORACLES = {
    "dedup-exact": ORACLE_DEDUP_EXACT,
    "dedup-editdist": ORACLE_DEDUP_EDITDIST,
    "scrub-dup-spans": ORACLE_SCRUB_DUP_SPANS,
    "substring-dedup": ORACLE_SUBSTRING_DEDUP,
    "dedup-minhash-lsh": ORACLE_MINHASH_LSH,
    "dedup-ngram-jaccard": ORACLE_NGRAM_JACCARD,
    "dedup-simhash": _oracle_simhash(),
    "dedup-clusters": ORACLE_DEDUP_CLUSTERS,
    "lsh-recall": ORACLE_LSH_RECALL,
    "dedup-containment": ORACLE_DEDUP_CONTAINMENT,
    "dedup-normalized": ORACLE_DEDUP_NORMALIZED,
}
