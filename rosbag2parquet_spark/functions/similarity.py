"""Similarity search over the ``embeddings`` table (north-star X2/X3).

- knn           — brute-force cosine top-k against a query vector. The
                  baseline: broadcast the query, one narrow pass computing
                  the score, TakeOrderedAndProject for top-k. At 100 TB this
                  is the exact-scan fallback; the per-row cost is a 64-wide
                  fused arithmetic expression (JVM codegen, no Python).
- embed-neardup — banded sign-LSH near-duplicate pairs: LSH_SIGN_BANDS
                  hyperplane-sign signatures, each sized ~log2(N/load) bits
                  so bucket count grows WITH the corpus; candidates agree on
                  any full band, exact cosine runs only within buckets. The
                  quadratic term shrinks by the (corpus-proportional) bucket
                  count, and the one self-join shuffles on (band, bucket)
                  (AQE splits skewed buckets).

Dot products use ``zip_with`` + ``aggregate`` (sequential left fold) over
double-cast arrays; DuckDB folds lists the same way, and results are rounded
to 6 decimals so the last-ulp difference of any fold-order divergence cannot
surface. No UDFs anywhere — pure Catalyst expressions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from rosbag2parquet_spark.sources.catalog import load_table

KNN_K = 10
KNN_QUERY_ID = 0
NEARDUP_THRESHOLD = 0.3
#: sign-LSH shape: ``LSH_SIGN_BANDS`` independent signatures, each
#: ``_lsh_bits(N)`` wide. Bits grow with the corpus (~N/LSH_BUCKET_LOAD
#: buckets per band) so within-bucket candidate generation stays ~linear;
#: OR-ing the bands recovers the recall a single wider signature loses.
LSH_SIGN_BANDS = 2
LSH_MIN_BITS = 8
LSH_MAX_BITS = 40  # 2^j stays exactly representable; N ~ 4·2^40 is beyond scope
LSH_BUCKET_LOAD = 4  # target mean bucket occupancy
#: Hamming-1 probe BUDGET per band, margin-ordered: when the signature
#: width exceeds this, flip only the LSH_PROBE_BITS bits whose integer
#: projection sums are closest to zero (the bits most likely to disagree
#: with a true neighbor — the classic multi-probe ordering). At the
#: LSH_MIN_BITS floor the budget covers every bit, so behavior (and the
#: measured recall curve) is unchanged from all-bits probing; the cap is
#: what keeps probe cost CONSTANT as bits grows with log2(N) toward
#: LSH_MAX_BITS=40, where un-budgeted probing would be 41x candidates.
#: Measured at the fixture (bits=8): budget 4 keeps 69-100% of the
#: full recall per similarity band at half the candidate volume — the
#: knob is real, the default spends it all while it is free.
LSH_PROBE_BITS = 8
assert LSH_PROBE_BITS <= LSH_MIN_BITS


def _lsh_bits(n_rows: int) -> int:
    """Signature width for a corpus of ``n_rows``: smallest ``bits`` with
    ``2^bits ≥ N / LSH_BUCKET_LOAD`` (pure-integer bit_length — no float
    log2, whose rounding could disagree across engines at powers of two),
    clamped to [LSH_MIN_BITS, LSH_MAX_BITS]. The oracle derives the same
    number in SQL as ``length(bin((N-1)//load))``."""
    raw = ((max(n_rows, 1) - 1) // LSH_BUCKET_LOAD).bit_length()
    return max(LSH_MIN_BITS, min(LSH_MAX_BITS, raw))


def _as_double(col) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a, b) -> Column:
    """Sequential-fold dot product of two array<double> columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a, b) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def _normalized(df: DataFrame) -> DataFrame:
    """Attach a unit-normalized double vector column ``en``. Norms are
    computed ONCE per row (separate projection steps so codegen evaluates
    the norm a single time, not per element); every pairwise score
    downstream is then a single dot product — at N² candidate pairs this
    removes two-thirds of the arithmetic vs. cosine-per-pair."""
    df = df.withColumn("__e", _as_double("embedding")).withColumn(
        "__n", norm(F.col("__e"))
    )
    return df.withColumn(
        "en", F.transform(F.col("__e"), lambda x: x / F.col("__n"))
    ).drop("__e", "__n")


# ----------------------------------------------------------------- knn (X3)


_QEN_CACHE: "dict[tuple[str, str], list[float]]" = {}
#: raw (un-normalized) fixed-query components, same memo posture
_RAWQ_CACHE: "dict[tuple[str, str], list[float]]" = {}


def _norm_query_vec(spark: SparkSession, sf_dir: str) -> "list[float]":
    """The UNIT-NORMALIZED fixed query vector, computed driver-side with
    exactly `_normalized`'s arithmetic (sequential left-fold sum of
    squares in float64, sqrt, elementwise divide — Python floats ARE
    IEEE float64, so the components are bit-identical to the expression
    tier's). One 1-row pushdown-filtered collect, the same posture as
    every ADC serve's `qen` collect — and like the kmeans/PQ fits it is
    memoized per (applicationId, sf_dir): the fixed query's components
    are a deterministic function of the input corpus, re-collected once
    per session per fixture, never across runs."""
    import math

    key = (spark.sparkContext.applicationId, sf_dir)
    if key in _QEN_CACHE:
        return _QEN_CACHE[key]
    raw = [
        float(x)
        for x in load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") == KNN_QUERY_ID)
        .select(_as_double("embedding").alias("e"))
        .collect()[0]["e"]
    ]
    acc = 0.0
    for x in raw:
        acc = acc + x * x
    n = math.sqrt(acc)
    _QEN_CACHE[key] = [x / n for x in raw]
    return _QEN_CACHE[key]


def _cos_vs_query_vectorized(qen: "list[float]"):
    """Arrow-vectorized cosine-vs-fixed-query tier: normalize each row
    and dot it against the (already normalized) query components, in ONE
    pandas_udf — bit-identical to `_normalized` + `dot` (the pure-
    expression reference tier, pair-pinned in tests): the norm is the
    same sequential left fold (loop over dims, vectorized over rows),
    the division the same elementwise IEEE op, the dot the same
    left-fold over dims. Why a UDF when the semantics ARE expressible as
    Catalyst HOFs: higher-order functions evaluate interpreted
    (~180 µs/row measured at dim=64 for normalize+dot — 0.48 s of the
    2000-row fixture scan); the numpy formulation is the same arithmetic
    at batch throughput (the `_normalize_and_sign_vectorized` /
    decode-tier design)."""
    import numpy as np
    import pandas as pd

    q = np.array(qen, dtype=np.float64)

    def score(emb):
        E = np.vstack(emb.to_numpy()).astype(np.float64)  # exact widen
        acc = np.zeros(E.shape[0], dtype=np.float64)
        for i in range(E.shape[1]):  # sequential left fold per row
            acc = acc + E[:, i] * E[:, i]
        en = E / np.sqrt(acc)[:, None]
        s = np.zeros(E.shape[0], dtype=np.float64)
        for i in range(E.shape[1]):  # same fold order as dot()
            s = s + en[:, i] * q[i]
        return pd.Series(s)

    score.__annotations__ = {"emb": pd.Series, "return": pd.Series}
    return F.pandas_udf(score, "double")


def _pair_cos_vectorized():
    """Arrow-vectorized PAIR-cosine tier (r13, serving `embed-recall`'s
    O(N²) brute-force truth scan): the raw-quotient cosine of two raw
    float vectors in ONE pandas_udf — bit-identical to the expression
    `cosine()` = dot/(norm·norm) it replaces (pair-pinned in tests): the
    dot and both sum-of-squares are the same float64 sequential left
    folds (loop over dims, vectorized over rows), then the same
    sqrt·sqrt product and single IEEE division. Inputs ship as the
    parquet float32 arrays — HALF the Arrow bytes of pre-cast doubles
    across N² pair rows — and widen in numpy (float32→float64 is exact,
    the same values `_as_double` produces). Why a UDF: the interpreted
    HOF cosine costs ~180 µs/pair at dim=64, and the truth side is the
    one N² surface in the repo (2M pairs at sf0.1 — ~57 s measured);
    the numpy formulation is the same arithmetic at batch throughput."""
    import numpy as np
    import pandas as pd

    def score(ea, eb):
        A = np.vstack(ea.to_numpy()).astype(np.float64)  # exact widen
        B = np.vstack(eb.to_numpy()).astype(np.float64)
        d = np.zeros(A.shape[0], dtype=np.float64)
        sa = np.zeros(A.shape[0], dtype=np.float64)
        sb = np.zeros(A.shape[0], dtype=np.float64)
        for i in range(A.shape[1]):  # same fold order as dot()/norm()
            d = d + A[:, i] * B[:, i]
            sa = sa + A[:, i] * A[:, i]
            sb = sb + B[:, i] * B[:, i]
        return pd.Series(d / (np.sqrt(sa) * np.sqrt(sb)))

    score.__annotations__ = {
        "ea": pd.Series, "eb": pd.Series, "return": pd.Series
    }
    return F.pandas_udf(score, "double")


#: rows per block of the blocked all-pairs truth scan (`embed-recall`) —
#: the block COUNT derives from the corpus size (ceil(N/256)), so group
#: count (and with it parallelism) grows as N²/256² exactly like the
#: pair work itself; nothing is tuned to the local core count
_TRUTH_BLOCK_ROWS = 256


def _truth_block_kernel(pdf):
    """Kernel of the blocked all-pairs cosine: one group = one block
    pair (bi ≤ bj); members are the rows of both blocks. Emits
    (a_id, b_id, c) for every unordered pair with a_id < b_id whose
    blocks are exactly {bi, bj} — across the whole group fan-out each
    unordered pair surfaces in exactly one group. The arithmetic is the
    expression `cosine()` fold exactly (pair-pinned in tests): the dot
    accumulates X[p,i]·Y[q,i] over dims in the same sequential order
    (vectorized over the pair grid), the sums of squares likewise, then
    the same sqrt·sqrt product and single IEEE division — and swapped
    operands for pairs oriented (q, p) change nothing, since IEEE
    multiply is commutative and the add order over dims is fixed."""
    import numpy as np
    import pandas as pd

    bi = int(pdf["bi"].iat[0])
    bj = int(pdf["bj"].iat[0])
    P = pdf[pdf["blk"] == bi]
    Q = P if bj == bi else pdf[pdf["blk"] == bj]
    if len(P) == 0 or len(Q) == 0:
        return pd.DataFrame(
            {
                "a_id": np.array([], dtype=np.int64),
                "b_id": np.array([], dtype=np.int64),
                "c": np.array([], dtype=np.float64),
            }
        )
    X = np.vstack(P["embedding"].to_numpy()).astype(np.float64)  # exact widen
    Y = X if bj == bi else np.vstack(Q["embedding"].to_numpy()).astype(
        np.float64
    )
    D = np.zeros((X.shape[0], Y.shape[0]), dtype=np.float64)
    sx = np.zeros(X.shape[0], dtype=np.float64)
    sy = np.zeros(Y.shape[0], dtype=np.float64)
    for i in range(X.shape[1]):  # same left-fold order as dot()/norm()
        D = D + X[:, i][:, None] * Y[None, :, i]
        sx = sx + X[:, i] * X[:, i]
        sy = sy + Y[:, i] * Y[:, i]
    C = D / (np.sqrt(sx)[:, None] * np.sqrt(sy)[None, :])
    pid = P["vec_id"].to_numpy()
    qid = Q["vec_id"].to_numpy()
    PI = np.broadcast_to(pid[:, None], C.shape)
    QI = np.broadcast_to(qid[None, :], C.shape)
    # same-block groups see both orientations of each pair — keep one;
    # cross-block groups see each pair once (blocks are disjoint)
    mask = (PI < QI) if bj == bi else np.ones(C.shape, dtype=bool)
    return pd.DataFrame(
        {
            "a_id": np.minimum(PI, QI)[mask],
            "b_id": np.maximum(PI, QI)[mask],
            "c": C[mask],
        }
    )


def _truth_pairs_blocked(emb: DataFrame) -> DataFrame:
    """All-pairs raw-quotient cosine (a_id < b_id, unrounded `c`) via a
    BLOCKED nested loop in ONE applyInPandas stage (r13, serving
    `embed-recall`'s brute-force truth side). Why: the BNLJ+pair-UDF
    formulation ships BOTH 64-float vectors on every one of the N²/2
    pair rows across the Arrow boundary — measured 9.0 s of the 11 s
    truth scan at sf0.1 against 0.4 s for the join itself. Here every
    row ships to its nb block-pair groups ONCE (nb·N input rows, ~16k
    at sf0.1 vs 2M pair rows), pairs materialize only as a numpy grid
    inside the kernel, and only the (a_id, b_id, c) triple leaves
    Python. The one extra job is a count() to size the block count from
    the data (the `embed-neardup` bits precedent)."""
    n = emb.count()
    nb = max(1, -(-n // _TRUTH_BLOCK_ROWS))
    g = emb.select(
        "vec_id",
        "embedding",
        F.pmod(F.col("vec_id"), F.lit(nb)).cast("int").alias("blk"),
    )
    groups = F.array(
        *[
            F.struct(F.lit(i).alias("bi"), F.lit(j).alias("bj"))
            for i in range(nb)
            for j in range(i, nb)
        ]
    )
    rep = (
        g.select("vec_id", "embedding", "blk", F.explode(groups).alias("gp"))
        .filter(
            (F.col("gp.bi") == F.col("blk")) | (F.col("gp.bj") == F.col("blk"))
        )
        .select(
            F.col("gp.bi").alias("bi"),
            F.col("gp.bj").alias("bj"),
            "blk",
            "vec_id",
            "embedding",
        )
    )
    return rep.groupBy("bi", "bj").applyInPandas(
        _truth_block_kernel, "a_id long, b_id long, c double"
    )


def q_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k nearest neighbours of the query vector (vec_id=0) by cosine.
    The query's normalized components ship as literals into one Arrow
    scoring pass (`_cos_vs_query_vectorized` — r13: replaced the
    interpreted HOF normalize+dot chain, 0.65 → ~0.25 s at sf0.1, value-
    identical by construction and by the oracle); top-k is
    TakeOrderedAndProject with a deterministic vec_id tie-break, and the
    final round(…, 6) stays a Spark expression so rounding semantics are
    unchanged."""
    qen = _norm_query_vec(spark, sf_dir)
    raw = load_table(spark, sf_dir, "embeddings")
    scored = raw.filter(F.col("vec_id") != KNN_QUERY_ID).select(
        "vec_id",
        "label",
        F.round(
            _cos_vs_query_vectorized(qen)(_as_double("embedding")), 6
        ).alias("cos_sim"),
    )
    return scored.orderBy(F.desc("cos_sim"), F.asc("vec_id")).limit(KNN_K)


ORACLE_KNN = f"""
WITH q AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = {KNN_QUERY_ID})
SELECT vec_id, label,
       round(list_dot_product(embedding::DOUBLE[], qe)
             / (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
                * sqrt(list_dot_product(qe, qe))), 6) AS cos_sim
FROM embeddings, q
WHERE vec_id != {KNN_QUERY_ID}
ORDER BY cos_sim DESC, vec_id LIMIT {KNN_K}
"""


# -------------------------------------------------------- embed-neardup (X2)


EMBED_DIM = 64


def _hyperplanes(band: int, bits: int, dim: int = EMBED_DIM) -> list[list[float]]:
    """Seeded deterministic random hyperplanes for sign-LSH band ``band``:
    component (j, i) is derived from md5(f"hp|{band}|{j}|{i}") mapped to
    [-0.5, 0.5). Generated driver-side once and inlined as plan literals —
    the broadcast-seeded-rotation production pattern, with a seed the oracle
    reproduces IN SQL (md5 hex → uint → u/2^32 − 0.5; both steps exact)."""
    import hashlib

    planes = []
    for j in range(bits):
        row = []
        for i in range(dim):
            u = int(hashlib.md5(f"hp|{band}|{j}|{i}".encode()).hexdigest()[:8], 16)
            row.append(u / 2**32 - 0.5)
        planes.append(row)
    return planes


def _sign_bucket(col, band: int, bits: int) -> Column:
    """``bits``-wide signature from the signs of projections onto band
    ``band``'s seeded hyperplanes. Determinism: a double fold's last-ulp
    noise could flip the SIGN of a near-zero projection and desynchronize
    buckets between engines, so each term is quantized as floor(x·h·1e12)
    into a LONG — identical per-term floor of identical doubles, order-free
    exact integer sum (and ~10× cheaper than a decimal accumulator; 64
    terms ≤ 1e12 each stay far below 2^63). One literal array-of-arrays
    iterated by a runtime lambda (the kmeans assign_clusters lesson:
    unrolled per-plane trees cost ~5× in planning).

    The literal matrix is emitted as ONE SQL text expression, not nested
    ``F.array(F.lit(...))`` calls: bits×64 ≈ 700 Column constructions each
    cross py4j (~1-2 s of driver-side plan build measured at 2 bands);
    a single parsed string is one round trip for an identical plan."""
    planes = F.expr(
        "array("
        + ",".join(
            "array(" + ",".join(f"{x!r}D" for x in row) + ")"
            for row in _hyperplanes(band, bits)
        )
        + ")"
    )
    sig_bits = F.transform(
        planes,
        lambda h, j: F.when(
            F.aggregate(
                F.zip_with(
                    col, h, lambda a, b: F.floor(a * b * F.lit(1e12)).cast("long")
                ),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            )
            > 0,
            # 2^j as an exact long (shiftleft needs a literal bit count;
            # pow is exact for j ≤ LSH_MAX_BITS < 53)
            F.pow(F.lit(2.0), j).cast("long"),
        ).otherwise(F.lit(0).cast("long")),
    )
    return F.aggregate(sig_bits, F.lit(0).cast("long"), lambda acc, x: acc + x)


def _sign_buckets_vectorized(bits: int):
    """Arrow-vectorized signature tier: one pandas_udf computing ALL band
    buckets per row as ``array<bigint>``, bit-identical to `_sign_bucket`
    (the pure-expression reference tier, cross-checked in tests).

    Why a UDF here when the semantics ARE expressible as Catalyst HOFs:
    higher-order functions evaluate interpreted per element (~1 µs/term →
    ~1 ms/row at 2 bands × bits × 64 terms), and the bands×bits×64 literal
    matrix adds ~0.3 s of ANTLR parse per plan. The numpy formulation is
    the same arithmetic — elementwise float64 ``floor((x·h)·1e12)`` then
    int64 row sums — so results are IEEE-identical (same operand order,
    exact widening float32→float64, exact int64 accumulation), at batch
    throughput instead of per-element interpretation. Mirrors the decoder's
    vectorized-tier design (sources/decode.py)."""
    import numpy as np
    import pandas as pd

    mats = [
        np.array(_hyperplanes(band, bits), dtype=np.float64)
        for band in range(LSH_SIGN_BANDS)
    ]
    pow2 = (np.int64(1) << np.arange(bits, dtype=np.int64))

    def buckets(emb):
        E = np.vstack(emb.to_numpy()).astype(np.float64)  # (n, dim), exact widen
        per_band = []
        for H in mats:  # H: (bits, dim)
            # (n, bits, dim): same left-assoc (x·h)·1e12 as the expression
            # tier; floor in float64 then exact int64 sum over dim
            terms = np.floor(E[:, None, :] * H[None, :, :] * 1e12).astype(np.int64)
            d = terms.sum(axis=2)  # (n, bits)
            per_band.append(((d > 0) * pow2).sum(axis=1))
        return pd.Series(np.stack(per_band, axis=1).tolist())

    # module uses `from __future__ import annotations` (PEP 563 string
    # hints), which pandas_udf's type-hint inference can't evaluate —
    # attach the real objects instead
    buckets.__annotations__ = {"emb": pd.Series, "return": pd.Series}
    return F.pandas_udf(buckets, "array<bigint>")


def _normalize_and_sign_vectorized(bits: int):
    """One Arrow pass producing struct(en, bk, pb): the unit-normalized
    vector, all band buckets, AND the margin-ordered probe buckets.
    Bit-identical to `_normalized` + the signature tiers: the norm is the
    same sequential left fold (loop over dims, vectorized over rows —
    ``((0+x₀²)+x₁²)+…`` exactly), the division the same elementwise IEEE
    op, the signature shared with `_sign_buckets_vectorized`.

    Margin-aware probing: the per-bit integer projection sums ARE the
    margins — the smaller ``|sum|``, the likelier that bit disagrees with
    a true neighbor's. ``pb[band]`` holds the LSH_PROBE_BITS buckets made
    by flipping the lowest-|margin| bits (ties broken by bit index —
    numpy's stable argsort, mirrored by the oracle's ORDER BY abs(d), j),
    so probing cost drops from bits+1 to LSH_PROBE_BITS+1 buckets per
    band while keeping the flips most likely to recover a miss."""
    import numpy as np
    import pandas as pd

    mats = [
        np.array(_hyperplanes(band, bits), dtype=np.float64)
        for band in range(LSH_SIGN_BANDS)
    ]
    pow2 = (np.int64(1) << np.arange(bits, dtype=np.int64))
    k_probe = min(LSH_PROBE_BITS, bits)

    def norm_and_sign(emb):
        E = np.vstack(emb.to_numpy()).astype(np.float64)  # (n, dim)
        dim = E.shape[1]
        acc = np.zeros(E.shape[0], dtype=np.float64)
        for i in range(dim):  # sequential left fold, vectorized over rows
            acc = acc + E[:, i] * E[:, i]
        en = E / np.sqrt(acc)[:, None]
        per_band = []
        probe_band = []
        for H in mats:
            terms = np.floor(E[:, None, :] * H[None, :, :] * 1e12).astype(np.int64)
            S = terms.sum(axis=2)  # (n, bits) integer margins
            bucket = ((S > 0) * pow2).sum(axis=1)
            per_band.append(bucket)
            # lowest-|margin| bits first; stable sort ⇒ ties by bit index
            order = np.argsort(np.abs(S), axis=1, kind="stable")[:, :k_probe]
            probe_band.append(bucket[:, None] ^ (np.int64(1) << order))
        return pd.DataFrame(
            {
                "en": list(en),
                "bk": np.stack(per_band, axis=1).tolist(),
                "pb": [
                    [probe_band[b][r].tolist() for b in range(LSH_SIGN_BANDS)]
                    for r in range(E.shape[0])
                ],
            }
        )

    norm_and_sign.__annotations__ = {"emb": pd.Series, "return": pd.DataFrame}
    return F.pandas_udf(
        norm_and_sign,
        "struct<en:array<double>,bk:array<bigint>,pb:array<array<bigint>>>",
    )


def q_embed_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via BANDED random-hyperplane
    sign-LSH with MARGIN-ORDERED Hamming-1 MULTI-PROBE: LSH_SIGN_BANDS
    independent signatures, each ``_lsh_bits(N)`` wide; one side of the
    self-join additionally probes up to LSH_PROBE_BITS 1-bit-flipped
    neighbors, chosen as the bits with the LOWEST |projection margin| —
    the bits most likely to disagree with a true neighbor's signature
    (the classic multi-probe ordering, applied to sign-LSH); exact
    cosine filters candidates at NEARDUP_THRESHOLD.

    Multi-probe is the recall lever that does NOT touch bucket geometry:
    at the fixture's similarity regime (cos ≈ 0.35, per-bit agreement
    p ≈ 0.61, 8-bit bands) exact-match banding recalls p^8·L ≈ 4% of true
    pairs, while 1-bit probes lift that to ~15-21% per band (measured:
    `embed-recall`). The margin ordering is the SCALE control: probe cost
    per vector is (LSH_PROBE_BITS+1)·load·bands — CONSTANT as the
    signature grows with log2(N) toward 40 bits, where probing every bit
    would multiply candidates 41×; the budget spends its flips on the
    bits whose integer margins say they are likeliest to differ
    (measured at bits=8: a half budget keeps 69-100% of full recall per
    band). At the LSH_MIN_BITS floor the budget covers all bits, so the
    fixture-scale pair set equals all-bits probing exactly.

    Scale shape: signature width grows with log2(N) so per-band bucket
    count tracks N/LSH_BUCKET_LOAD — within-bucket candidate work stays
    ~linear in N instead of O((N/256)²) at a fixed width. Bands and probes
    are rows (posexplode/explode), so ALL band-probes resolve in ONE
    self-join whose shuffle key is (band, bucket); duplicate candidates
    from multi-band or multi-probe agreement collapse in a pair-keyed
    distinct BEFORE verification, so each unique pair's cosine is computed
    once. Probing only the a-side suffices: for a pair
    (x < y) differing in bit i, x's flipped probe hits y's exact bucket.
    The only driver-side data dependence is count() (one cheap job) to
    size the signature. Signatures and normalized vectors come from ONE
    Arrow pass (`_normalize_and_sign_vectorized`), materialized BEFORE
    the explode: a Generate over the non-cheap projection makes Catalyst
    re-evaluate it per output branch (~4× measured), so the cache
    boundary sits between the Python stage and the explode."""
    raw = load_table(spark, sf_dir, "embeddings")
    bits = _lsh_bits(raw.count())
    mat = (
        raw.select(
            "vec_id",
            _normalize_and_sign_vectorized(bits)(
                _as_double("embedding")
            ).alias("s"),
        )
        # cache: both self-join sides (and the explode) read the
        # materialized struct instead of re-running the Python stage
        # (Spark's cache manager keys on the logical plan, so repeated
        # calls share one entry)
        .cache()
    )
    # keys-only through the bucket join: the probe explode multiplies rows
    # by (bits+1), so the 64-double vector must NOT ride along (it would
    # 12x the shuffle bytes); vectors re-attach per UNIQUE candidate pair
    # by two id-keyed joins afterwards — same construction as the MinHash
    # verify step (dedup._verify_jaccard)
    exploded = mat.select(
        "vec_id", F.posexplode("s.bk").alias("band", "bucket")
    )
    # exact bucket + the margin-ordered flips the UDF pre-computed (pb):
    # (LSH_PROBE_BITS+1) probes per band instead of bits+1 — the low-margin
    # bits carry almost all the flip probability, so recall holds while the
    # candidate multiplier halves (measured by embed-recall)
    flips = mat.select(
        "vec_id", F.posexplode("s.pb").alias("band", "pbl")
    ).select("vec_id", "band", F.explode("pbl").alias("bucket"))
    probes = exploded.unionByName(flips)
    a, b = probes.alias("a"), exploded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("a_id"), F.col("b.vec_id").alias("b_id")
        )
        .distinct()
    )
    ea = mat.select(F.col("vec_id").alias("a_id"), F.col("s.en").alias("ea"))
    eb = mat.select(F.col("vec_id").alias("b_id"), F.col("s.en").alias("eb"))
    return (
        cand.join(ea, "a_id")
        .join(eb, "b_id")
        .select(
            "a_id",
            "b_id",
            F.round(dot(F.col("ea"), F.col("eb")), 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= NEARDUP_THRESHOLD)
    )


def _oracle_embed_neardup() -> str:
    """Oracle derives bits AND hyperplanes in SQL: bits via integer
    bit-length (length(bin(x)) — no float log2), plane component (band,j,i)
    via the same md5-hex→uint→[−0.5,0.5) map as `_hyperplanes` (DuckDB
    CAST('0x…' AS UBIGINT) parses the hex; /2^32 and −0.5 are IEEE-exact)."""
    return f"""
WITH nb AS (
  SELECT greatest({LSH_MIN_BITS}, least({LSH_MAX_BITS},
           length(bin(greatest((count(*) - 1) // {LSH_BUCKET_LOAD}, 1))))) AS bits
  FROM embeddings
),
hp AS (
  SELECT band.range AS band, j.range AS j, pos.range AS pos,
         CAST(concat('0x', substr(md5('hp|' || band.range || '|' || j.range
                                  || '|' || (pos.range - 1)), 1, 8)) AS UBIGINT)
           / 4294967296.0 - 0.5 AS h
  FROM range(0, {LSH_SIGN_BANDS}) band, range(0, {LSH_MAX_BITS}) j,
       range(1, {EMBED_DIM} + 1) pos, nb
  WHERE j.range < nb.bits
),
ed AS (
  SELECT vec_id, i AS pos, embedding[i]::DOUBLE AS x
  FROM embeddings, unnest(generate_series(1, {EMBED_DIM})) AS t(i)
),
dots AS (
  SELECT ed.vec_id, hp.band, hp.j,
         sum(CAST(floor(ed.x * hp.h * 1e12) AS BIGINT)) AS d
  FROM ed JOIN hp USING (pos)
  GROUP BY 1, 2, 3
),
buck AS (
  SELECT vec_id, band,
         sum(CASE WHEN d > 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS bucket
  FROM dots GROUP BY vec_id, band
),
e AS (
  SELECT b.vec_id, emb.embedding::DOUBLE[] AS e, b.band, b.bucket
  FROM buck b JOIN embeddings emb USING (vec_id)
),
ranked AS (
  -- margin order: |integer projection sum| ascending, ties by bit index —
  -- the exact mirror of the UDF's stable argsort over abs(S)
  SELECT vec_id, band, j,
         row_number() OVER (PARTITION BY vec_id, band
                            ORDER BY abs(d), j) AS rk
  FROM dots
),
pr AS (
  -- the exact bucket plus the LSH_PROBE_BITS lowest-|margin| 1-bit flips
  SELECT vec_id, e, band, bucket FROM e
  UNION ALL
  SELECT e.vec_id, e.e, e.band,
         xor(e.bucket, CAST(1 AS BIGINT) << r.j) AS bucket
  FROM e JOIN ranked r ON e.vec_id = r.vec_id AND e.band = r.band
  WHERE r.rk <= {LSH_PROBE_BITS}
)
SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id,
       round(list_dot_product(a.e, b.e)
             / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))),
             6) AS cos_sim
FROM pr a JOIN e b
  ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE round(list_dot_product(a.e, b.e)
            / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))),
            6) >= {NEARDUP_THRESHOLD}
"""


# ------------------------------------------------------------- knn-ivf (X3)

# Deployed probe depth. 3 since round 11: the `ivf-nprobe-curve` sensitivity
# sweep (and a full-pipeline A/B replica at both fixtures) measured recall@10
# 7/10 -> 9/10 at sf0.01 for raw IVFADC (no change at sf0.001) for +50%
# probed-cell scan — the probe set, not the encoding, was the recall ceiling.
IVF_NPROBE = 3


def _dec12(x: float):
    """Replicate CAST(x AS DECIMAL(28,12)) — correctly-rounded half-away —
    for driver-side cell scoring that must match the SQL oracle exactly."""
    from decimal import ROUND_HALF_UP, Decimal

    return Decimal(x).quantize(Decimal("1e-12"), rounding=ROUND_HALF_UP)


def _ivf_probe_cells(
    spark, sf_dir: str, raw: DataFrame, nprobe: "int | None" = None
):
    """(probed cell ids, assignment frame) for the fixed query vector:
    K tiny driver-side integer-quantized centroid scores (per-term
    floor(x·1e12) BIGINT sums — the same quantization the trainer's
    argmin uses; the common 1e6 score scale cancels in the ranking) pick
    the ``nprobe`` highest cells (deployed default IVF_NPROBE) —
    bit-identical to the oracle's cell CTE, so engine and oracle probe
    the SAME cells. Shared by `knn-ivf` (float scan of the probed cells)
    and `knn-ivf-quantized` (int8 scan of the same). ``nprobe`` is the
    per-QUERY production knob (FAISS's search-time nprobe — for a flat
    coarse quantizer, deeper ranked probing IS the multiprobe expansion;
    the bucket-perturbation flavor of multiprobe lives in the sign-LSH
    path, `LSH_PROBE_BITS`): a latency-tolerant caller probes deeper for
    the recall `ivf-nprobe-curve` measures, without retraining or
    re-registering anything."""
    ranked, assigned = _ivf_cell_ranking(spark, sf_dir, raw)
    return ranked[: (IVF_NPROBE if nprobe is None else nprobe)], assigned


def _ivf_cell_ranking(spark, sf_dir: str, raw: DataFrame):
    """The FULL score-ordered cell list for the fixed query (plus the
    assignment frame) — `_ivf_probe_cells` slices the deployed prefix,
    `q_ivf_nprobe_curve` sweeps deeper prefixes of the SAME ranking, so
    the two can never desync on the quantization."""
    import math

    from rosbag2parquet_spark.functions.kmeans import kmeans_fit_cached

    centroids, assigned = kmeans_fit_cached(spark, sf_dir)
    # r13: memoized like `_norm_query_vec` — every IVF-probed serve was
    # paying a 1-row collect job per invocation for the fixed query row
    qkey = (spark.sparkContext.applicationId, sf_dir)
    if qkey not in _RAWQ_CACHE:
        _RAWQ_CACHE[qkey] = [
            float(x)
            for x in raw.filter(F.col("vec_id") == KNN_QUERY_ID)
            .select(_as_double("embedding").alias("e"))
            .collect()[0]["e"]
        ]
    qe = _RAWQ_CACHE[qkey]
    scores = []
    for cl, c in enumerate(centroids):
        num = sum(math.floor(ci * qi * 1e12) for ci, qi in zip(c, qe))
        den = sum(math.floor(ci * ci * 1e12) for ci in c)
        scores.append((float(num) / math.sqrt(float(den)), cl))
    return [cl for _, cl in sorted(((-sc, cl) for sc, cl in scores))], assigned


def q_knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: the k-means coarse quantizer (functions.kmeans — the
    real trainer, 5 deterministic Lloyd's iterations) partitions the corpus
    into K cells; the query searches only the ``nprobe`` highest-scoring
    cells.

    Plan: the quantizer costs one shuffle per iteration at train time (in
    production it is trained once on a sample and broadcast); cell selection
    is K tiny driver-side scores; the corpus scan is restricted to the
    chosen cells by a broadcast semi-join on the assignment — the expensive
    exact scoring touches only ~nprobe/K of the corpus, which is the whole
    point of IVF at 100 TB.

    Determinism: cell scores are integer-quantized exact dot products
    (the same floor(x·1e12) per-term quantization as the trainer's argmin)
    so the probed cell set is bit-identical to the oracle's; the final
    cosine ranking uses the same rounded-fold scoring as `knn`."""
    raw = load_table(spark, sf_dir, "embeddings")
    cells, assigned = _ivf_probe_cells(spark, sf_dir, raw)

    # r13: the membership semi-join now restricts the RAW rows BEFORE any
    # scoring work (normalization is per-row pure, so join-then-normalize
    # is value-identical to normalize-then-join — the optimizer was not
    # reordering the semi-join below the HOF projections itself), and the
    # member rows score through the Arrow cosine tier `knn` uses
    # (bit-identical to the expression fold, pair-pinned in tests).
    members = assigned.filter(F.col("cluster").isin(cells)).select("vec_id")
    probed = raw.filter(F.col("vec_id") != KNN_QUERY_ID).join(
        F.broadcast(members), "vec_id", "left_semi"
    )
    qen = _norm_query_vec(spark, sf_dir)
    return (
        probed.select(
            "vec_id",
            "label",
            F.round(
                _cos_vs_query_vectorized(qen)(_as_double("embedding")), 6
            ).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(KNN_K)
    )


def _oracle_knn_ivf() -> str:
    from rosbag2parquet_spark.functions.kmeans import N_ITER, kmeans_cte_sql

    return (
        kmeans_cte_sql()
        + f""",
q AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = {KNN_QUERY_ID}),
qdims AS (SELECT i AS pos, qe[i] AS x FROM q, unnest(generate_series(1, 64)) AS t(i)),
cells AS (
  SELECT cl FROM (
    SELECT c.cl,
           CAST(sum(CAST(floor(c.m * qd.x * 1e12) AS BIGINT)) AS DOUBLE)
             / sqrt(CAST(sum(CAST(floor(c.m * c.m * 1e12) AS BIGINT)) AS DOUBLE)) AS score
    FROM c{N_ITER} c JOIN qdims qd USING (pos)
    GROUP BY c.cl
  ) ORDER BY score DESC, cl LIMIT {IVF_NPROBE}
)
SELECT e.vec_id, e.label,
       round(list_dot_product(e.embedding::DOUBLE[], q.qe)
             / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
                * sqrt(list_dot_product(q.qe, q.qe))), 6) AS cos_sim
FROM embeddings e, q
WHERE e.vec_id != {KNN_QUERY_ID}
  AND e.vec_id IN (SELECT vec_id FROM a{N_ITER} WHERE cl IN (SELECT cl FROM cells))
ORDER BY cos_sim DESC, vec_id LIMIT {KNN_K}
"""
    )


# ----------------------------------------------------------- knn-batch (X3)

KNN_BATCH_QUERIES = 5  # vec_id 0..4 are the query set


#: (applicationId, sf_dir) → (query vec_ids ascending, their unit-normalized
#: float64 components) — the `_QEN_CACHE` memo posture for the batch set
_QBATCH_CACHE: "dict[tuple[str, str], tuple[list[int], list[list[float]]]]" = {}


def _norm_query_batch(
    spark: SparkSession, sf_dir: str
) -> "tuple[list[int], list[list[float]]]":
    """The KNN_BATCH_QUERIES fixed query vectors (vec_id ascending),
    unit-normalized DRIVER-side with exactly `_normalized`'s arithmetic —
    `_norm_query_vec`'s proof extended to the batch (Python floats are
    IEEE float64, so each query's components are bit-identical to the
    expression tier's). One pushdown-filtered M-row collect, memoized per
    (applicationId, sf_dir) like every fit collect — computed from the
    parquet inputs once per session per fixture, never across runs."""
    import math

    key = (spark.sparkContext.applicationId, sf_dir)
    if key in _QBATCH_CACHE:
        return _QBATCH_CACHE[key]
    rows = sorted(
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < KNN_BATCH_QUERIES)
        .select("vec_id", _as_double("embedding").alias("e"))
        .collect(),
        key=lambda r: r["vec_id"],
    )
    qids, qens = [], []
    for r in rows:
        raw = [float(x) for x in r["e"]]
        acc = 0.0
        for x in raw:
            acc = acc + x * x
        n = math.sqrt(acc)
        qids.append(int(r["vec_id"]))
        qens.append([x / n for x in raw])
    _QBATCH_CACHE[key] = (qids, qens)
    return _QBATCH_CACHE[key]


def _cos_vs_query_batch_vectorized(qens: "list[list[float]]"):
    """Arrow-vectorized cosine-vs-M-queries tier (`_cos_vs_query_vectorized`
    extended to the batch): normalize each row once and dot it against
    every (already normalized) query's components in ONE pandas_udf
    returning the M scores as an array — bit-identical per (row, query)
    to the `_normalized` + `dot` reference (pair-pinned in tests): same
    float64 left folds, same elementwise division."""
    import numpy as np
    import pandas as pd

    Q = np.array(qens, dtype=np.float64)  # (M, dim)

    def score(emb):
        E = np.vstack(emb.to_numpy()).astype(np.float64)  # exact widen
        acc = np.zeros(E.shape[0], dtype=np.float64)
        for i in range(E.shape[1]):  # sequential left fold per row
            acc = acc + E[:, i] * E[:, i]
        en = E / np.sqrt(acc)[:, None]
        out = np.empty((E.shape[0], Q.shape[0]), dtype=np.float64)
        for m in range(Q.shape[0]):
            s = np.zeros(E.shape[0], dtype=np.float64)
            for i in range(E.shape[1]):  # same fold order as dot()
                s = s + en[:, i] * Q[m, i]
            out[:, m] = s
        return pd.Series(list(out))

    score.__annotations__ = {"emb": pd.Series, "return": pd.Series}
    return F.pandas_udf(score, "array<double>")


def q_knn_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched multi-query top-k — the production ANN shape (score a whole
    query BATCH in one corpus pass, not one driver round-trip per query).

    Plan: the M query vectors' normalized components ship as literals
    into one Arrow scoring pass emitting all M scores per row
    (`_cos_vs_query_batch_vectorized` — r13: replaced the interpreted
    `_normalized`+crossJoin-dot chain, value-identical by construction
    and by the pair-pin test); posexplode fans the score array out to
    (query, row) pairs, and a window partitioned by query_id takes each
    query's top-k — the shuffle key is the query id, so adding queries
    adds reducers, not passes. At very large M the window becomes a
    per-(query, partition) local top-k pre-prune + final merge; at M
    this size the single window is the right plan."""
    qids, qens = _norm_query_batch(spark, sf_dir)
    qid_arr = F.array(*[F.lit(q).cast("long") for q in qids])
    scored = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") >= KNN_BATCH_QUERIES)
        .select(
            "vec_id",
            F.posexplode(
                _cos_vs_query_batch_vectorized(qens)(
                    _as_double("embedding")
                )
            ).alias("qi", "s"),
        )
        .select(
            F.element_at(qid_arr, F.col("qi") + F.lit(1)).alias("query_id"),
            "vec_id",
            F.round(F.col("s"), 6).alias("cos_sim"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("vec_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= KNN_K)
        .select("query_id", "rk", "vec_id", "cos_sim")
    )


def _knn_batch_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pure-expression `knn-batch` formulation (pre-r13) — retained
    as the pinned reference the Arrow batch tier is proven against."""
    emb = _normalized(load_table(spark, sf_dir, "embeddings"))
    queries = F.broadcast(
        emb.filter(F.col("vec_id") < KNN_BATCH_QUERIES).select(
            F.col("vec_id").alias("query_id"), F.col("en").alias("qen")
        )
    )
    scored = (
        emb.filter(F.col("vec_id") >= KNN_BATCH_QUERIES)
        .crossJoin(queries)
        .select(
            "query_id",
            "vec_id",
            F.round(dot(F.col("en"), F.col("qen")), 6).alias("cos_sim"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("vec_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= KNN_K)
        .select("query_id", "rk", "vec_id", "cos_sim")
    )


ORACLE_KNN_BATCH = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qe
  FROM embeddings WHERE vec_id < {KNN_BATCH_QUERIES}
),
scored AS (
  SELECT q.query_id, e.vec_id,
         round(list_dot_product(e.embedding::DOUBLE[], q.qe)
               / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
                  * sqrt(list_dot_product(q.qe, q.qe))), 6) AS cos_sim
  FROM embeddings e, q
  WHERE e.vec_id >= {KNN_BATCH_QUERIES}
)
SELECT query_id, rk, vec_id, cos_sim FROM (
  SELECT query_id, vec_id, cos_sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos_sim DESC, vec_id) AS rk
  FROM scored
) WHERE rk <= {KNN_K}
"""


# ----------------------------------------------------------- knn-recall (X3)


def q_knn_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of the IVF path against the exact scan — the quality metric
    an ANN index is tuned by (nprobe/K trade). Both sides are the engine's
    own deterministic queries, so recall is a reproducible number, not a
    sample estimate; output is integer-only (count + basis points)."""
    exact = q_knn(spark, sf_dir).select("vec_id")
    ivf = q_knn_ivf(spark, sf_dir).select("vec_id")
    return (
        exact.join(ivf, "vec_id")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
        .select(
            F.lit(KNN_K).cast("int").alias("k"),
            "n_overlap",
            F.expr(f"CAST(n_overlap * 10000 div {KNN_K} AS BIGINT)").alias(
                "recall_bps"
            ),
        )
    )


def _oracle_knn_recall() -> str:
    return f"""
SELECT CAST({KNN_K} AS INTEGER) AS k,
       count(*) AS n_overlap,
       CAST(count(*) * 10000 // {KNN_K} AS BIGINT) AS recall_bps
FROM ({ORACLE_KNN}) e JOIN ({_oracle_knn_ivf()}) i USING (vec_id)
"""


#: nprobe values the sensitivity curve sweeps (K = 8 coarse cells, so 4
#: probes = half the index — past the knee any real deployment cares about)
NPROBE_CURVE = (1, 2, 3, 4)


def q_ivf_nprobe_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The recall@nprobe SENSITIVITY CURVE — the tuning table an IVF
    deployment reads before fixing nprobe (§7.1 #5: at sf0.01 every
    IVF-pruned rung tops at 7/10 while unpruned rungs reach 10/10, so
    the probe set, not the encoding, binds recall — this query MEASURES
    that, one row per probe depth). Cell ranking is computed ONCE (the
    same K driver-side integer-exact scores `_ivf_probe_cells` uses);
    ONE corpus pass (r13) scores every row through the Arrow cosine
    tier and tags probed-cell members with their cell's probe RANK
    (NULL outside the deepest prefix), materialized once — both the
    exact top-k baseline AND every curve point's candidate set then
    read that table (a rank-prefix filter + top-k + overlap), so the
    measurement costs one corpus scan total instead of an exact-scan
    pass PLUS a probed-fraction pass. recall_bps per extra cell,
    measured not guessed."""
    from functools import reduce

    raw = load_table(spark, sf_dir, "embeddings")
    ranked, assigned = _ivf_cell_ranking(spark, sf_dir, raw)

    # members of the DEEPEST prefix, tagged with their cell's probe rank
    # (1-based) via a tiny literal map — one broadcast join, one scan
    depth = max(NPROBE_CURVE)
    rank_expr = F.create_map(
        *[
            x
            for cl_rank, cl in enumerate(ranked[:depth], start=1)
            for x in (F.lit(int(cl)), F.lit(cl_rank))
        ]
    )
    members = (
        assigned.filter(F.col("cluster").isin(ranked[:depth]))
        .select("vec_id", rank_expr[F.col("cluster")].alias("probe_rank"))
    )
    # r13: ONE corpus pass serves BOTH sides of the comparison — every
    # row scores through the Arrow cosine tier (bit-identical to the
    # `knn` expression fold, pair-pinned), non-members carry a NULL
    # probe_rank via the left join, and the checkpoint is the only scan.
    # The exact top-k ids come from the SAME materialized table (the
    # full-corpus ordering is exactly `q_knn`'s: same scores, same
    # (cos DESC, vec_id) ties), so the previous second corpus scan
    # (q_knn) and its collect are gone.
    qen = _norm_query_vec(spark, sf_dir)
    scored = (
        raw.filter(F.col("vec_id") != KNN_QUERY_ID)
        .join(F.broadcast(members), "vec_id", "left")
        .select(
            "vec_id",
            "probe_rank",
            F.round(
                _cos_vs_query_vectorized(qen)(_as_double("embedding")), 6
            ).alias("cos_sim"),
        )
        .localCheckpoint(eager=True)  # the one corpus pass
    )
    exact_ids = [
        int(r["vec_id"])
        for r in scored.orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(KNN_K)
        .select("vec_id")
        .collect()
    ]
    pieces = []
    for nprobe in NPROBE_CURVE:
        approx = (
            scored.filter(F.col("probe_rank") <= nprobe)
            .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
            .limit(KNN_K)
            .select("vec_id")
        )
        pieces.append(
            approx.filter(F.col("vec_id").isin(exact_ids))
            .agg(F.count(F.lit(1)).alias("n_overlap"))
            .select(
                F.lit(nprobe).cast("int").alias("nprobe"),
                "n_overlap",
                F.expr(
                    f"CAST(n_overlap * 10000 div {KNN_K} AS BIGINT)"
                ).alias("recall_bps"),
            )
        )
    return reduce(lambda a, b: a.unionAll(b), pieces).orderBy("nprobe")


def _oracle_ivf_nprobe_curve() -> str:
    from rosbag2parquet_spark.functions.kmeans import N_ITER, kmeans_cte_sql

    score6 = (
        "round(list_dot_product(e.embedding::DOUBLE[], q.qe)"
        " / (sqrt(list_dot_product(e.embedding::DOUBLE[],"
        " e.embedding::DOUBLE[])) * sqrt(list_dot_product(q.qe, q.qe))), 6)"
    )
    sels = []
    rows = []
    for nprobe in NPROBE_CURVE:
        sels.append(
            f"""
sel{nprobe} AS (
  SELECT e.vec_id FROM embeddings e, q
  WHERE e.vec_id != {KNN_QUERY_ID}
    AND e.vec_id IN (
      SELECT vec_id FROM a{N_ITER}
      WHERE cl IN (SELECT cl FROM ranked
                   ORDER BY score DESC, cl LIMIT {nprobe}))
  ORDER BY {score6} DESC, e.vec_id LIMIT {KNN_K}
)"""
        )
        rows.append(
            f"""
SELECT CAST({nprobe} AS INTEGER) AS nprobe,
       CAST(count(*) AS BIGINT) AS n_overlap,
       CAST(count(*) * 10000 // {KNN_K} AS BIGINT) AS recall_bps
FROM exact JOIN sel{nprobe} USING (vec_id)"""
        )
    return (
        kmeans_cte_sql()
        + f""",
q AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = {KNN_QUERY_ID}),
qdims AS (SELECT i AS pos, qe[i] AS x FROM q, unnest(generate_series(1, 64)) AS t(i)),
ranked AS (
  SELECT c.cl,
         CAST(sum(CAST(floor(c.m * qd.x * 1e12) AS BIGINT)) AS DOUBLE)
           / sqrt(CAST(sum(CAST(floor(c.m * c.m * 1e12) AS BIGINT)) AS DOUBLE)) AS score
  FROM c{N_ITER} c JOIN qdims qd USING (pos)
  GROUP BY c.cl
),
exact AS (
  SELECT e.vec_id FROM embeddings e, q
  WHERE e.vec_id != {KNN_QUERY_ID}
  ORDER BY {score6} DESC, e.vec_id LIMIT {KNN_K}
),"""
        + ",".join(sels)
        + "\nSELECT * FROM ("
        + " UNION ALL ".join(rows)
        + "\n) ORDER BY nprobe\n"
    )


#: similarity-band edges for the recall report (left-closed; values are
#: round-6 cosines so band assignment is bit-identical across engines)
_RECALL_BANDS = (0.45, 0.40, 0.35)


def q_embed_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall of the multi-probe sign-LSH near-dup against the BRUTE-FORCE
    all-pairs cosine ground truth, PER SIMILARITY BAND — `knn-recall`'s
    companion for the pairwise path, so both ANN structures carry a
    measured quality curve, not a single asserted number (an LSH
    structure's recall rises with similarity; one scalar hides that). The
    O(N²) truth side is the measurement harness (run at audit scale / on
    a sample); the banded LSH is the production path. Cosine uses the
    identical round-6 raw-quotient formulation as the LSH verify step, so
    truth ⊇ found structurally and recall is exact integer arithmetic.
    r13: the N² truth scan runs as a BLOCKED nested loop in one
    applyInPandas stage (`_truth_pairs_blocked` — value-identical to
    the expression `cosine()` fold by construction and by the pair-pin
    tests; see also `_pair_cos_vectorized`, the pinned intermediate
    pair-row tier this superseded); the final round(…, 6) stays a Spark
    expression so rounding semantics are unchanged."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    hi, mid, lo = _RECALL_BANDS
    truth = (
        _truth_pairs_blocked(emb)
        .select(
            "a_id",
            "b_id",
            F.round(F.col("c"), 6).alias("cs"),
        )
        .filter(F.col("cs") >= NEARDUP_THRESHOLD)
        .select(
            "a_id",
            "b_id",
            F.when(F.col("cs") >= hi, f"{hi}+")
            .when(F.col("cs") >= mid, f"{mid}-{hi}")
            .when(F.col("cs") >= lo, f"{lo}-{mid}")
            .otherwise(f"{NEARDUP_THRESHOLD}-{lo}")
            .alias("sim_band"),
        )
    )
    found = q_embed_neardup(spark, sf_dir).select(
        "a_id", "b_id", F.lit(1).alias("__hit")
    )
    return (
        truth.join(found, ["a_id", "b_id"], "left")
        .groupBy("sim_band")
        .agg(
            F.count(F.lit(1)).alias("n_truth"),
            F.count("__hit").alias("n_found"),
        )
        .select(
            "sim_band",
            "n_truth",
            "n_found",
            F.expr("CAST(n_found * 10000 div n_truth AS BIGINT)").alias(
                "recall_bps"
            ),
        )
    )


def _oracle_embed_recall() -> str:
    ldp = "list_dot_product"
    cos = (
        f"round({ldp}(a.embedding::DOUBLE[], b.embedding::DOUBLE[])"
        f" / (sqrt({ldp}(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))"
        f" * sqrt({ldp}(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))), 6)"
    )
    hi, mid, lo = _RECALL_BANDS
    return f"""
WITH truth AS (
  SELECT a.vec_id AS a_id, b.vec_id AS b_id,
         CASE WHEN {cos} >= {hi} THEN '{hi}+'
              WHEN {cos} >= {mid} THEN '{mid}-{hi}'
              WHEN {cos} >= {lo} THEN '{lo}-{mid}'
              ELSE '{NEARDUP_THRESHOLD}-{lo}' END AS sim_band
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  WHERE {cos} >= {NEARDUP_THRESHOLD}
),
found AS (
  SELECT a_id, b_id, 1 AS hit FROM ({_oracle_embed_neardup()})
)
SELECT sim_band, count(*) AS n_truth, count(hit) AS n_found,
       CAST(count(hit) * 10000 // count(*) AS BIGINT) AS recall_bps
FROM truth LEFT JOIN found USING (a_id, b_id)
GROUP BY sim_band
"""


def q_embed_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 scalar quantization of the embedding column — the 4x storage
    compression an ANN corpus takes before it can live at 100 TB (the
    IVF coarse quantizer bounds SEARCH cost; this bounds STORAGE and
    memory bandwidth; product quantization is the documented next rung).
    Per-vector symmetric quantization: scale = 127 / max_abs(v), code =
    floor(x * scale) clamped to [-127, 127], emitted as real TINYINT —
    entirely map-side higher-order expressions, zero shuffle, zero
    Python.

    Determinism: max_abs is an order-free exact fold (greatest of abs);
    127.0 / max_abs is one correctly-rounded IEEE division and x * scale
    one multiplication, so both engines floor the SAME double — the code
    arrays are bit-identical cross-engine, which is exactly what makes
    int8 codes safe to ship between systems. A zero vector quantizes to
    NULL codes via nullif (explicit, not inf-garbage).

    The COMPARED projection joins the codes into one comma string
    (`codes_str`): the engine-side column stays a real ARRAY<TINYINT>
    (`knn_quantized` consumes it), but a raw array cell is unhashable
    under the driver's pandas canonicalizer (r7 red row; the replica
    guard now refuses top-level arrays outright), and the joined string
    carries the exact same bit-identical information."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double("embedding").alias("e")
    )
    return (
        emb.withColumn(
            "max_abs",
            F.aggregate(
                F.col("e"), F.lit(0.0), lambda a, x: F.greatest(a, F.abs(x))
            ),
        )
        .withColumn(
            "codes",
            F.expr(
                "transform(e, x -> CAST(greatest(-127.0, least(127.0,"
                " floor(x * (127.0 / nullif(max_abs, 0.0))))) AS TINYINT))"
            ),
        )
        .select(
            "vec_id",
            "max_abs",
            F.expr(
                "array_join(transform(codes,"
                " x -> coalesce(CAST(x AS STRING), 'null')), ',')"
            ).alias("codes_str"),
        )
        .orderBy("vec_id")
    )


ORACLE_EMBED_QUANTIZE = """
SELECT vec_id, max_abs,
       array_to_string(list_transform(
           list_transform(e, x -> CAST(greatest(-127.0, least(127.0,
               floor(x * (127.0 / nullif(max_abs, 0.0))))) AS TINYINT)),
           c -> coalesce(CAST(c AS VARCHAR), 'null')), ',') AS codes_str
FROM (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e,
         list_max(list_transform(embedding,
                                 x -> abs(CAST(x AS DOUBLE)))) AS max_abs
  FROM embeddings
)
ORDER BY vec_id
"""


def _quantized_codes(emb: DataFrame) -> DataFrame:
    """Attach per-vector symmetric int8 quantization to a normalized frame
    (columns ``s`` = max_abs scale basis, ``codes`` = TINYINT array): the
    same deterministic construction `embed-quantize` proves bit-identical
    cross-engine. Shared by `knn-quantized` (flat quantized scan) and
    `knn-ivf-quantized` (quantized scan of the probed IVF cells)."""
    return emb.withColumn(
        "s",
        F.aggregate(
            F.col("en"), F.lit(0.0), lambda a, x: F.greatest(a, F.abs(x))
        ),
    ).withColumn(
        "codes",
        F.expr(
            "transform(en, x -> CAST(greatest(-127.0, least(127.0,"
            " floor(x * (127.0 / nullif(s, 0.0))))) AS TINYINT))"
        ),
    )


def q_knn_quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN served FROM the int8 codes — the query side that makes
    `embed-quantize` an index, not just compression: both corpus and
    query quantize their unit-normalized vectors, the score is the
    INTEGER code dot (exact — products and 64-term sums of small ints
    are exactly representable doubles, order-free) rescaled by the two
    per-vector scales, and top-k ranks by that reconstructed cosine.
    Memory bandwidth per candidate drops 4x vs the float corpus — the
    production reason quantized scan beats exact scan at 100 TB; the
    deterministic construction means THIS ranking (approximation and
    all) is bit-identical cross-engine, so the oracle checks the real
    quantized scores, not a tolerance band. Accuracy vs exact `knn` is
    visible by comparing the two queries' driver rows over the same
    fixture."""
    qn = _quantized_codes(_normalized(load_table(spark, sf_dir, "embeddings")))
    query = qn.filter(F.col("vec_id") == KNN_QUERY_ID).select(
        F.col("codes").alias("qc"), F.col("s").alias("qs")
    )
    scored = (
        qn.filter(F.col("vec_id") != KNN_QUERY_ID)
        .crossJoin(F.broadcast(query))
        .select(
            "vec_id",
            "label",
            F.round(
                dot(
                    F.expr("transform(codes, x -> CAST(x AS DOUBLE))"),
                    F.expr("transform(qc, x -> CAST(x AS DOUBLE))"),
                )
                * F.col("s")
                * F.col("qs")
                / F.lit(16129.0),
                6,
            ).alias("qcos"),
        )
    )
    return scored.orderBy(F.desc("qcos"), F.asc("vec_id")).limit(KNN_K)


ORACLE_KNN_QUANTIZED = f"""
WITH n AS (
  SELECT vec_id, label,
         list_transform(embedding::DOUBLE[],
             x -> x / sqrt(list_dot_product(embedding::DOUBLE[],
                                            embedding::DOUBLE[]))) AS en
  FROM embeddings
), qz AS (
  SELECT vec_id, label, en,
         list_max(list_transform(en, x -> abs(x))) AS s
  FROM n
), qc AS (
  SELECT vec_id, label, s,
         list_transform(en, x -> CAST(greatest(-127.0, least(127.0,
             floor(x * (127.0 / nullif(s, 0.0))))) AS TINYINT)) AS codes
  FROM qz
), q AS (
  SELECT codes AS qcodes, s AS qs FROM qc WHERE vec_id = {KNN_QUERY_ID}
)
SELECT c.vec_id, c.label,
       round(list_dot_product(c.codes::DOUBLE[], q.qcodes::DOUBLE[])
             * c.s * q.qs / 16129.0, 6) AS qcos
FROM qc c, q WHERE c.vec_id != {KNN_QUERY_ID}
ORDER BY qcos DESC, c.vec_id LIMIT {KNN_K}
"""


def q_knn_ivf_quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPOSED production ANN serve shape at 100 TB — IVF bounds
    SEARCH cost (only the IVF_NPROBE best cells are scanned: ~nprobe/K of
    the corpus) and int8 bounds STORAGE/bandwidth (the probed cells are
    scanned as codes, 4x less memory traffic per candidate): the two
    halves `knn-ivf` and `knn-quantized` each prove separately, composed
    here into the index a real 100 TB corpus serves from (an IVF over
    float vectors re-reads the full-width corpus; a quantized flat scan
    still reads every row — only the composition bounds both).

    Plan: probe-cell selection is K tiny driver-side integer-exact scores
    (shared helper `_ivf_probe_cells`, bit-identical to the oracle's cell
    CTE); membership restricts the scan via a broadcast semi-join; the
    scored expression is the integer code dot (exact — products and
    64-term sums of small ints are exactly representable doubles,
    order-free) rescaled by the two per-vector scales, identical to
    `knn-quantized`. Deterministic end to end, so the oracle checks the
    REAL quantized scores of the REAL probed cells — approximation
    included, no tolerance band. Recall vs exact `knn` is measured in
    tests/test_operators.py (test_knn_ivf_quantized_recall_vs_exact)."""
    raw = load_table(spark, sf_dir, "embeddings")
    cells, assigned = _ivf_probe_cells(spark, sf_dir, raw)

    # r13: membership restricts the raw rows BEFORE normalize+quantize —
    # both are per-row pure, so join-then-encode is value-identical to
    # encode-then-join, and the interpreted HOF encode work shrinks to
    # the probed fraction of the corpus (the optimizer was not reordering
    # the semi-join below the HOF projections itself)
    members = assigned.filter(F.col("cluster").isin(cells)).select("vec_id")
    query = _quantized_codes(
        _normalized(raw.filter(F.col("vec_id") == KNN_QUERY_ID))
    ).select(F.col("codes").alias("qc"), F.col("s").alias("qs"))
    qn = _quantized_codes(
        _normalized(
            raw.filter(F.col("vec_id") != KNN_QUERY_ID).join(
                F.broadcast(members), "vec_id", "left_semi"
            )
        )
    )
    scored = (
        qn.crossJoin(F.broadcast(query))
        .select(
            "vec_id",
            "label",
            F.round(
                dot(
                    F.expr("transform(codes, x -> CAST(x AS DOUBLE))"),
                    F.expr("transform(qc, x -> CAST(x AS DOUBLE))"),
                )
                * F.col("s")
                * F.col("qs")
                / F.lit(16129.0),
                6,
            ).alias("qcos"),
        )
    )
    return scored.orderBy(F.desc("qcos"), F.asc("vec_id")).limit(KNN_K)


def _oracle_knn_ivf_quantized() -> str:
    from rosbag2parquet_spark.functions.kmeans import N_ITER, kmeans_cte_sql

    return (
        kmeans_cte_sql()
        + f""",
q0 AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = {KNN_QUERY_ID}),
qdims AS (SELECT i AS pos, qe[i] AS x FROM q0, unnest(generate_series(1, 64)) AS t(i)),
cells AS (
  SELECT cl FROM (
    SELECT c.cl,
           CAST(sum(CAST(floor(c.m * qd.x * 1e12) AS BIGINT)) AS DOUBLE)
             / sqrt(CAST(sum(CAST(floor(c.m * c.m * 1e12) AS BIGINT)) AS DOUBLE)) AS score
    FROM c{N_ITER} c JOIN qdims qd USING (pos)
    GROUP BY c.cl
  ) ORDER BY score DESC, cl LIMIT {IVF_NPROBE}
),
n AS (
  SELECT vec_id, label,
         list_transform(embedding::DOUBLE[],
             x -> x / sqrt(list_dot_product(embedding::DOUBLE[],
                                            embedding::DOUBLE[]))) AS en
  FROM embeddings
), qz AS (
  SELECT vec_id, label, en,
         list_max(list_transform(en, x -> abs(x))) AS s
  FROM n
), qc AS (
  SELECT vec_id, label, s,
         list_transform(en, x -> CAST(greatest(-127.0, least(127.0,
             floor(x * (127.0 / nullif(s, 0.0))))) AS TINYINT)) AS codes
  FROM qz
), q AS (
  SELECT codes AS qcodes, s AS qs FROM qc WHERE vec_id = {KNN_QUERY_ID}
)
SELECT c.vec_id, c.label,
       round(list_dot_product(c.codes::DOUBLE[], q.qcodes::DOUBLE[])
             * c.s * q.qs / 16129.0, 6) AS qcos
FROM qc c, q
WHERE c.vec_id != {KNN_QUERY_ID}
  AND c.vec_id IN (SELECT vec_id FROM a{N_ITER} WHERE cl IN (SELECT cl FROM cells))
ORDER BY qcos DESC, c.vec_id LIMIT {KNN_K}
"""
    )


QUERIES = {
    "knn": q_knn,
    "embed-quantize": q_embed_quantize,
    "knn-quantized": q_knn_quantized,
    "knn-ivf": q_knn_ivf,
    "knn-ivf-quantized": q_knn_ivf_quantized,
    "knn-batch": q_knn_batch,
    "knn-recall": q_knn_recall,
    "embed-neardup": q_embed_neardup,
    "embed-recall": q_embed_recall,
    "ivf-nprobe-curve": q_ivf_nprobe_curve,
}

ORACLES = {
    "knn": ORACLE_KNN,
    "embed-quantize": ORACLE_EMBED_QUANTIZE,
    "knn-quantized": ORACLE_KNN_QUANTIZED,
    "knn-ivf": _oracle_knn_ivf(),
    "knn-ivf-quantized": _oracle_knn_ivf_quantized(),
    "knn-batch": ORACLE_KNN_BATCH,
    "knn-recall": _oracle_knn_recall(),
    "embed-neardup": _oracle_embed_neardup(),
    "embed-recall": _oracle_embed_recall(),
    "ivf-nprobe-curve": _oracle_ivf_nprobe_curve(),
}
