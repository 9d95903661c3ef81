"""Product quantization — the compression rung ABOVE int8 scalar
quantization (`embed-quantize`: 4x) that a real 100 TB ANN corpus runs on
(Jégou et al., "Product Quantization for Nearest Neighbor Search", IEEE
TPAMI 2011 — public): the normalized vector splits into PQ_M subvectors,
each subspace trains its own PQ_K-codeword k-means codebook, and a vector
is stored as PQ_M small code ids — here 64 doubles (512 B) → 8 codes
(8 B one-byte-wide, ~64x; 4 B / ~128x if the 4-bit K=16 codes are
nibble-packed), searched without decompression via ADC (asymmetric
distance computation: the QUERY stays float, each candidate's score is
PQ_M = 8 table lookups).

Cross-engine DETERMINISTIC — and therefore exact-oracled, like the
`kmeans`/`knn-ivf` pair this builds on:

- codebooks come from the same deterministic Lloyd's trainer
  (functions.kmeans: integer-quantized exact distances, index tie-breaks,
  first-K init, fixed iterations) run per subspace on the normalized
  slices;
- code assignment is the same integer-quantized argmin (per-term
  floor((a-b)²·1e12) BIGINT sums — exact and order-free), executed
  MAP-SIDE over literal codebooks (zero shuffle — the quantize pass at
  100 TB is embarrassingly parallel);
- the ADC lookup table is PQ_M x PQ_K dot products computed driver-side
  with per-term DECIMAL(28,12) rounding (M×K tiny sums — a driver-side
  constant, unlike the per-row argmin), so each LUT entry is
  bit-identical to the oracle's;
- a candidate's score sums its PQ_M LUT entries in fixed subspace order —
  eight IEEE additions of identical doubles, identical in both engines —
  and rounds to 6 decimals like every similarity score in this engine.

Scale posture: training touches a sample (here the fixture corpus; in
production a bounded sample, like any codebook), the quantize pass is
map-only against broadcast-literal codebooks, and `knn-pq` scans codes at
PQ_M bytes per candidate with no float vector read at all — the memory-
bandwidth bound `knn-quantized` lowers 4x, lowered ~128x. Reference
analog: the "query the output efficiently" posture (README.md:14-18).

Cost note (round 9): the argmin fold is integer-quantized — per-term
floor((a-b)²·1e12) BIGINT sums, the `_sign_bucket` construction applied
to distances (~10x cheaper per term than the previous DECIMAL(28,12)
BigDecimal accumulator, measured on the r8 bench where pq-quantize +
knn-pq cost ~8.4 s at sf0.1). The kmeans/IVF/PQ oracles quantize
identically, so the assignments — approximation included — stay
bit-exact cross-engine.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from rosbag2parquet_spark.functions.kmeans import _DEC
from rosbag2parquet_spark.functions.similarity import (
    KNN_K,
    KNN_QUERY_ID,
    _dec12,
    _normalized,
)
from rosbag2parquet_spark.sources.catalog import load_table, publish_scratch

PQ_M = 8  # subspaces
PQ_SUB = 8  # dims per subspace (PQ_M * PQ_SUB = EMBED_DIM = 64)
PQ_K = 16  # codewords per subspace
PQ_N_ITER = 2  # Lloyd's iterations per codebook (oracle unrolls them)
#: deployed ADC shortlist size re-ranked exactly (10% of fixture);
#: a per-query override exists since r12 (`knn-ivfadc-sl`, FAISS's
#: k_factor posture — see IVFADC_SL_DEEP for the measured curve)
PQ_SHORTLIST = 50

#: OPQ rotation (Ge et al., "Optimized Product Quantization", CVPR 2013 —
#: public): an orthogonal rotation before the subspace split decorrelates
#: dimensions and balances per-subspace variance, cutting PQ quantization
#: error. Since round 10 the rotation is LEARNED by the paper's actual
#: alternating optimization (tools/learn_opq.py: assign → reconstruct →
#: orthogonal-Procrustes polar update via fixed-count Newton-Schulz
#: matmuls — deterministic, no LAPACK), run OFFLINE over the sf0.01
#: fixture and pinned as literals in functions/opq_learned.py — trained
#: once on a sample and deployed as constants, the codebook posture
#: everywhere in this engine. The alternation initializes from the r9
#: SEEDED Householder baseline below (OPQ-RR posture, seed chosen by a
#: 16-seed replica sweep) and runs a FIXED 2 steps: measured, distortion
#: falls 9.00e-3 → 7.92e-3 (−12%) while recall@10 holds at the baseline
#: on both fixtures (10/10 sf0.01, 9/10 sf0.001); step 3+ keeps cutting
#: distortion but trades the benchmark query's neighborhood below the
#: baseline (objective mismatch on a near-noise corpus — the trajectory
#: is printed by `python tools/learn_opq.py --dry-run --steps 8`).
OPQ_SEED = 10
OPQ_NREFL = 16  # Householder reflections composed into the init rotation
EMBED_DIM = PQ_M * PQ_SUB


_FIT_CACHE: dict = {}
_ROT_CACHE: dict = {}


def opq_rotation() -> "list[list[float]]":
    """The EMBED_DIM×EMBED_DIM orthogonal rotation used by the `knn-opq`
    family — the LEARNED matrix pinned in functions/opq_learned.py (see
    the OPQ_SEED block comment for provenance), falling back to the
    seeded Householder init if the pin is absent (a fresh checkout mid-
    regeneration). Inlined as LITERALS into both the engine closure and
    the oracle SQL — cross-engine parity never depends on reproducing
    the learning, only on applying identical literal coefficients.
    Row j holds output coordinate j's weights."""
    if "R" not in _ROT_CACHE:
        try:
            from rosbag2parquet_spark.functions.opq_learned import LEARNED_R

            _ROT_CACHE["R"] = [[float(x) for x in row] for row in LEARNED_R]
        except ImportError:
            _ROT_CACHE["R"] = opq_seeded_rotation()
    return _ROT_CACHE["R"]


def opq_seeded_rotation() -> "list[list[float]]":
    """The r9 baseline and the learner's INIT: a product of OPQ_NREFL
    Householder reflections I − 2vvᵀ/vᵀv whose vectors derive from
    md5("opq|{seed}|{r}|{i}") → [-0.5, 0.5) (the `_hyperplanes` seed
    scheme)."""
    import hashlib

    import numpy as np

    R = np.eye(EMBED_DIM)
    for r in range(OPQ_NREFL):
        v = np.array(
            [
                int(
                    hashlib.md5(
                        f"opq|{OPQ_SEED}|{r}|{i}".encode()
                    ).hexdigest()[:8],
                    16,
                )
                / 2**32
                - 0.5
                for i in range(EMBED_DIM)
            ]
        )
        R = (np.eye(EMBED_DIM) - 2 * np.outer(v, v) / (v @ v)) @ R
    return [[float(x) for x in row] for row in R]


def rotate_quantized_np(X, R):
    """The ONE quantized-rotation kernel every tier shares: row-vectors
    ``X`` (n, dim) → the QUANTIZED rotated vectors, coordinate j =
    toDouble(Σᵢ floor(x[i]·R[j,i]·1e12)) / 1e12. The per-term floor
    makes the rotated representation cross-engine exact (a raw float
    matvec's summation order would leak engine low bits into every
    downstream argmin); the 1e-12 quantization is far below the
    codebook scale, so the rotation's geometry survives. Terms ≤ 1e12,
    64-term sums ≤ 6.4e13 — exact in int64 AND in the float64 the
    oracle's CAST produces. This arithmetic is bit-load-bearing (the
    fused serve, the standalone rotate UDF, the live cutover encode,
    and the oracle's CTE must all agree), so it lives in exactly one
    place (r13 review)."""
    import numpy as np

    # same operand order as the oracle: (x · r) · 1e12, floored
    ints = (
        np.floor(X[:, None, :] * R[None, :, :] * 1e12)
        .astype(np.int64)
        .sum(axis=2)
    )
    return ints.astype(np.float64) / 1e12


def _rotate_vectorized():
    """Arrow-vectorized rotation application — `rotate_quantized_np`
    over the learned rotation as a pandas_udf (the training path's
    standalone rotate step; the serve path fuses the same kernel into
    `_norm_codes_vectorized`)."""
    import numpy as np
    import pandas as pd

    R = np.array(opq_rotation(), dtype=np.float64)  # (dim, dim)

    def rot(en):
        E = np.vstack(en.to_numpy()).astype(np.float64)  # (n, dim)
        return pd.Series(rotate_quantized_np(E, R).tolist())

    rot.__annotations__ = {"en": pd.Series, "return": pd.Series}
    return F.pandas_udf(rot, "array<double>")


def _pq_frame(spark: SparkSession, sf_dir: str, rotated: bool) -> DataFrame:
    """(vec_id, label, en) where ``en`` is the representation PQ quantizes:
    the unit-normalized vector, or its quantized OPQ rotation — downstream
    training/assignment/ADC machinery is representation-agnostic."""
    emb = _normalized(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", "label", "en"
    )
    if not rotated:
        return emb
    return emb.select(
        "vec_id", "label", _rotate_vectorized()(F.col("en")).alias("en")
    )


def pq_fit_cached(
    spark: SparkSession, sf_dir: str, rotated: bool = False
) -> list[list[list[float]]]:
    """Session-memoized per-subspace codebooks over the normalized fixture
    embeddings (or their OPQ rotation): ``codebooks[m][cl]`` is the
    PQ_SUB-dim centroid of codeword ``cl`` in subspace ``m``. Same memo
    pattern as kmeans_fit_cached (keyed by applicationId)."""
    key = (spark.sparkContext.applicationId, sf_dir, rotated)
    if key not in _FIT_CACHE:
        emb = _pq_frame(spark, sf_dir, rotated).select("vec_id", "en").cache()
        _FIT_CACHE[key] = pq_fit(emb)
    return _FIT_CACHE[key]


def pq_fit(emb: DataFrame) -> list[list[list[float]]]:
    """JOINT training of all PQ_M codebooks — value-identical to PQ_M
    independent ``kmeans_fit`` runs over the slices (same first-K init,
    same integer-quantized argmin, same exact-decimal mean update, same
    empty-codeword carry-forward; the per-subspace oracle CTE chains pin
    this equivalence), but each Lloyd's iteration is ONE assignment
    projection (all PQ_M argmins in one map-side pass) plus ONE
    (subspace, code, pos) groupBy — one shuffle and one driver collect
    per iteration instead of PQ_M of each. At any corpus size the
    training cost is 1 + PQ_N_ITER passes, independent of PQ_M."""
    init_rows = emb.orderBy("vec_id").limit(PQ_K).select("en").collect()
    books = [
        [
            [float(x) for x in r["en"][m * PQ_SUB : (m + 1) * PQ_SUB]]
            for r in init_rows
        ]
        for m in range(PQ_M)
    ]
    code_arr = "array(" + ",".join(f"c{m}" for m in range(PQ_M)) + ")"
    for _ in range(PQ_N_ITER):
        coded = _coded(emb.select("en"), books)
        # each exploded (vector, pos) element belongs to exactly ONE
        # subspace; its codeword there keys the mean — grouped rows are
        # exactly the per-subspace member sets, so the decimal sum /
        # count quotient is the kmeans_fit update verbatim
        means = (
            coded.select(
                F.posexplode("en").alias("pos", "x"),
                F.expr(f"{code_arr}").alias("cs"),
            )
            .select(
                F.expr(f"pos div {PQ_SUB}").alias("sub"),
                F.expr(
                    f"element_at(cs, CAST(pos div {PQ_SUB} AS INT) + 1)"
                ).alias("code"),
                "pos",
                "x",
            )
            .groupBy("sub", "code", "pos")
            .agg(
                (
                    F.sum(F.col("x").cast(_DEC)).cast("double")
                    / F.count(F.lit(1))
                ).alias("m")
            )
            .collect()
        )
        new_books = [
            [list(books[m][c]) for c in range(PQ_K)] for m in range(PQ_M)
        ]
        for r in means:
            sub, code = int(r["sub"]), int(r["code"])
            new_books[sub][code][int(r["pos"]) - sub * PQ_SUB] = float(r["m"])
        books = new_books
    return books


def _argmin_code(vec: Column, centroids: list[list[float]]) -> Column:
    """Codeword id for one subvector against a literal codebook — the
    assign_clusters construction (integer-quantized exact squared
    distances, min-of-(dist, index) structs) over an arbitrary Column
    instead of the fixed ``e`` column, so PQ can assign all PQ_M
    subspaces in ONE map-side projection. Long adds, not BigDecimal —
    this fold is the entire per-row cost of the quantize pass."""
    cents = F.expr(
        "array("
        + ",".join(
            "array(" + ",".join(f"{float(x)!r}D" for x in c) + ")"
            for c in centroids
        )
        + ")"
    )
    pairs = F.transform(
        cents,
        lambda c, i: F.struct(
            F.aggregate(
                F.zip_with(
                    vec, c, lambda a, b: F.floor((a - b) * (a - b) * F.lit(1e12))
                ),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("d"),
            i.alias("i"),
        ),
    )
    return F.array_min(pairs).getField("i").cast("int")


def _argmin_codes_vectorized(books: list[list[list[float]]]):
    """Arrow-vectorized code assignment: ONE pandas_udf computing all PQ_M
    codes per row as ``array<int>``, bit-identical to `_argmin_code` (the
    pure-expression reference tier, cross-checked in tests).

    Why a UDF when the semantics ARE expressible as Catalyst HOFs: the
    higher-order fold evaluates interpreted per element (~1 µs/term at
    PQ_M·PQ_K·PQ_SUB = 1024 terms/row this is ~1 ms/row — measured ~1.9 s
    of the sf0.1 quantize pass). The numpy formulation is the same
    arithmetic — elementwise float64 ``floor((a-b)²·1e12)`` then exact
    int64 sums, ``argmin`` taking the FIRST minimum (= the lowest-index
    tie-break) — so codes are IEEE-identical at batch matmul throughput.
    The `_sign_buckets_vectorized` pattern applied to distances."""
    import numpy as np
    import pandas as pd

    from rosbag2parquet_spark.functions.kmeans import argmin_quantized_np

    cents = [np.array(b, dtype=np.float64) for b in books]  # (PQ_K, PQ_SUB)

    def codes(en):
        E = np.vstack(en.to_numpy()).astype(np.float64)  # (n, dim)
        out = [
            # the ONE pinned quantized-argmin kernel per subspace slice
            argmin_quantized_np(E[:, m * PQ_SUB : (m + 1) * PQ_SUB], cents[m])
            for m in range(PQ_M)
        ]
        return pd.Series(np.stack(out, axis=1).astype(np.int32).tolist())

    codes.__annotations__ = {"en": pd.Series, "return": pd.Series}
    return F.pandas_udf(codes, "array<int>")


def _coded(emb: DataFrame, books: list[list[list[float]]]) -> DataFrame:
    """Attach ``c0..c{M-1}`` INT code columns to a normalized frame via the
    vectorized tier — the map-only quantize pass (one ArrowEvalPython node;
    the corpus never shuffles). Shared by `_with_codes` and the trainer."""
    coded = emb.withColumn("__cs", _argmin_codes_vectorized(books)(F.col("en")))
    return coded.select(
        *emb.columns,
        *[F.col("__cs").getItem(m).alias(f"c{m}") for m in range(PQ_M)],
    )


def _norm_codes_vectorized(books: list[list[list[float]]], rotated: bool):
    """ONE Arrow pass for the serve path: raw embedding → unit-normalize
    (the `_normalized` sequential fold replicated bit-exactly in numpy —
    the `_normalize_and_sign_vectorized` precedent) → optionally the
    quantized OPQ rotation → all PQ_M codes. Without fusion the rotated
    path chains a Catalyst HOF normalize + a rotate UDF + a codes UDF,
    each re-evaluated per action (measured: knn-opq 6.2 s at sf0.1 vs
    knn-pq's 1.7 s); fused it is one ArrowEvalPython stage. Returns
    struct<en, cs> where ``en`` is the representation the codes live in
    (rotated when ``rotated``)."""
    import numpy as np
    import pandas as pd

    cents = [np.array(b, dtype=np.float64) for b in books]
    R = (
        np.array(opq_rotation(), dtype=np.float64) if rotated else None
    )

    from rosbag2parquet_spark.functions.kmeans import argmin_quantized_np

    def f(emb):
        E = np.vstack(emb.to_numpy()).astype(np.float64)  # (n, dim)
        acc = np.zeros(E.shape[0], dtype=np.float64)
        for i in range(E.shape[1]):  # sequential fold, vectorized over rows
            acc = acc + E[:, i] * E[:, i]
        X = E / np.sqrt(acc)[:, None]
        if R is not None:
            X = rotate_quantized_np(X, R)  # the one shared kernel
        codes = [
            # the ONE pinned quantized-argmin kernel per subspace slice
            argmin_quantized_np(X[:, m * PQ_SUB : (m + 1) * PQ_SUB], cents[m])
            for m in range(PQ_M)
        ]
        cs = np.stack(codes, axis=1).astype(np.int32)
        return pd.DataFrame({"en": list(X), "cs": cs.tolist()})

    f.__annotations__ = {"emb": pd.Series, "return": pd.DataFrame}
    return F.pandas_udf(f, "struct<en:array<double>,cs:array<int>>")


def _with_codes(
    spark: SparkSession, sf_dir: str, rotated: bool = False
) -> DataFrame:
    """(vec_id, label, en, c0..c{M-1}) — the map-only quantize pass, ONE
    fused Arrow stage from the raw embedding (normalize [+ rotate] +
    all PQ_M argmins against the in-closure codebooks); the corpus never
    shuffles. With ``rotated``, ``en`` is the quantized OPQ rotation and
    codes come from the rotated-space books. Fused/unfused parity is
    test-pinned (the training path builds the same representation via
    `_pq_frame` + `_coded`)."""
    from rosbag2parquet_spark.functions.similarity import _as_double

    # memoize the DataFrame OBJECT per (session, sf, representation):
    # this frame IS the stored code table (what a production serve reads
    # from disk — pq-quantize is its materialization), and one cached
    # object guarantees ONE cache-manager entry serving the query row,
    # the ADC scan, and every later search — rather than relying on two
    # independently-pickled UDF closures canonicalizing to the same plan
    key = (spark.sparkContext.applicationId, sf_dir, rotated, "coded")
    if key in _FIT_CACHE:
        return _FIT_CACHE[key]
    books = pq_fit_cached(spark, sf_dir, rotated)
    raw = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", _as_double("embedding").alias("__e")
    )
    st = raw.withColumn(
        "__s", _norm_codes_vectorized(books, rotated)(F.col("__e"))
    )
    coded = st.select(
        "vec_id",
        "label",
        F.col("__s").getField("en").alias("en"),
        *[
            F.col("__s").getField("cs").getItem(m).alias(f"c{m}")
            for m in range(PQ_M)
        ],
    ).cache()
    _FIT_CACHE[key] = coded
    return coded


def q_pq_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PQ code table: one INT code column per subspace — the stored
    form of the corpus (PQ_M bytes/vector at serve time; the TINYINT-vs-
    INT difference is a storage declaration, compared as exact ints
    either way). Map-only; oracle recomputes the codebooks via the
    unrolled per-subspace k-means CTE chains and must agree on every
    code — approximation included, bit for bit."""
    return (
        _with_codes(spark, sf_dir)
        .select("vec_id", *[f"c{m}" for m in range(PQ_M)])
        .orderBy("vec_id")
    )


def q_knn_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN served FROM the PQ codes by ADC + exact re-rank — the standard
    two-stage production search (Jégou et al. §V): stage 1 scans ONLY the
    codes (the query stays float; each subspace's PQ_K dot products
    against its codebook are computed once driver-side with decimal-exact
    terms — the lookup table — and a candidate's score is PQ_M literal-
    array lookups summed in fixed subspace order, no float vector read);
    stage 2 reads the float vectors of just the PQ_SHORTLIST best ADC
    candidates and re-ranks them by exact cosine. At 100 TB this is the
    economics PQ exists for: 100% of the corpus moves at PQ_M bytes per
    row, full-width vectors move for a fixed shortlist only.

    Deterministic end to end (deterministic codebooks -> deterministic
    codes -> bit-identical LUT -> fixed-order 8-term sums -> vec_id
    tie-breaks), so the oracle reproduces the REAL shortlist —
    approximation included — and the exact rescoring on top. Shortlist
    recall vs exact `knn` is measured in tests/test_operators.py."""
    return _adc_search(spark, sf_dir, members=None)


def _query_lut_values(
    books: list[list[list[float]]], qen: list[float]
) -> "list[list[float]]":
    """Per-subspace ADC lookup-table VALUES: LUT[m][cl] = decimal-exact
    dot(query subvector m, codebook m[cl]) — the driver-side constant
    every ADC rung shares; single-sourced so the quantization (and
    therefore oracle parity) can never diverge between the unpacked,
    packed, IVF-restricted, residual, and STREAMING serves."""
    luts = []
    for m in range(PQ_M):
        qs = qen[m * PQ_SUB : (m + 1) * PQ_SUB]
        luts.append(
            [
                float(
                    sum(
                        (_dec12(ci * qi) for ci, qi in zip(c, qs)),
                        start=_dec12(0.0),
                    )
                )
                for c in books[m]
            ]
        )
    return luts


def _ivfadc_cell_consts(
    ncent: "list[list[float]]", qen: list[float]
) -> "list[float]":
    """The IVFADC decomposition's per-cell constant dot(q, ncent[cl]) —
    same decimal-exact quantization as the LUTs; shared by the batch
    serve and the streaming append twin."""
    return [
        float(
            sum(
                (_dec12(ci * qi) for ci, qi in zip(row, qen)),
                start=_dec12(0.0),
            )
        )
        for row in ncent
    ]


def _query_luts(
    books: list[list[list[float]]], qen: list[float]
) -> "list[str]":
    """`_query_lut_values` as SQL array literals (the Catalyst serves'
    form)."""
    luts = _query_lut_values(books, qen)
    return [
        "array(" + ",".join(f"{v!r}D" for v in luts[m]) + ")"
        for m in range(PQ_M)
    ]


def _exact_rerank(
    spark: SparkSession, sf_dir: str, shortlist: DataFrame
) -> DataFrame:
    """Stage 2 of every ADC serve (batch AND streaming): exact cosine
    re-rank reading the ORIGINAL vectors for the ``shortlist`` (vec_id)
    frame only — the semi-join restricts the float read; the query row is
    a 1-row broadcast, like `knn`."""
    emb = _normalized(load_table(spark, sf_dir, "embeddings"))
    query = emb.filter(F.col("vec_id") == KNN_QUERY_ID).select(
        F.col("en").alias("qen")
    )
    dotp = F.aggregate(
        F.zip_with(F.col("en"), F.col("qen"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        emb.join(F.broadcast(shortlist), "vec_id", "left_semi")
        .crossJoin(F.broadcast(query))
        .select("vec_id", "label", F.round(dotp, 6).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(KNN_K)
    )


def _stage1_shortlist(
    base: DataFrame, score: str, shortlist: "int | None" = None
) -> DataFrame:
    """Stage 1 of every ADC serve alone: the shortlist cut (``score``
    over ``base``, deterministic vec_id tie-break, deployed PQ_SHORTLIST
    unless ``shortlist`` overrides per query) as a (vec_id) frame — the
    cutover serve unions two of these before one shared stage 2."""
    depth = PQ_SHORTLIST if shortlist is None else shortlist
    return (
        base.select("vec_id", F.expr(score).alias("adc"))
        .orderBy(F.desc("adc"), F.asc("vec_id"))
        .limit(depth)
        .select("vec_id")
    )


def _shortlist_rerank(
    spark: SparkSession,
    sf_dir: str,
    base: DataFrame,
    score: str,
    shortlist: "int | None" = None,
) -> DataFrame:
    """The shared two-stage tail of every ADC serve: stage-1 shortlist
    (`_stage1_shortlist`) and stage-2 `_exact_rerank` of it."""
    return _exact_rerank(
        spark, sf_dir, _stage1_shortlist(base, score, shortlist)
    )


def _adc_search(
    spark: SparkSession,
    sf_dir: str,
    members: DataFrame | None,
    rotated: bool = False,
    packed: bool = False,
) -> DataFrame:
    """Two-stage ADC shortlist + exact re-rank, optionally restricted to a
    ``members`` (vec_id) frame via a broadcast semi-join BEFORE the code
    scan — `knn-pq` passes None (full-corpus ADC baseline), `knn-ivf-pq`
    passes the probed IVF cells' membership (the composed serve stack),
    `knn-opq` sets ``rotated`` (codes/LUT live in the rotated space; the
    stage-2 exact re-rank always reads the ORIGINAL vectors), and
    `knn-pq-packed` sets ``packed`` (stage 1 reads ONLY the 4 nibble-
    packed byte columns, unpacking in-expression — same LUT, same
    addition order, so the answer is value-identical by construction)."""
    books = pq_fit_cached(spark, sf_dir, rotated)
    coded = _with_codes(spark, sf_dir, rotated)
    # r13: the query row's representation is memoized like the fits —
    # every ADC serve was paying a ~0.2 s 1-row collect job per
    # invocation for a value that is a deterministic function of the
    # session's cached code table
    qkey = (spark.sparkContext.applicationId, sf_dir, rotated, "qen-coded")
    if qkey not in _FIT_CACHE:
        _FIT_CACHE[qkey] = [
            float(x)
            for x in coded.filter(F.col("vec_id") == KNN_QUERY_ID)
            .select("en")
            .collect()[0]["en"]
        ]
    qen = _FIT_CACHE[qkey]
    lut_lit = _query_luts(books, qen)
    if packed:
        # stage 1 over the packed bytes: subspace 2i's code is the high
        # nibble, 2i+1's the low — the same left-to-right addition order
        # (luts 0..M-1), so every ADC double is bit-identical to the
        # unpacked scan's. The packed frame is MATERIALIZED once per
        # session (the stored 4-int-per-row index, lineage truncated),
        # so the serving scan genuinely reads only (vec_id, b0..b3) —
        # not the unpacked codes it was derived from
        pkey = (spark.sparkContext.applicationId, sf_dir, rotated, "packed")
        if pkey not in _FIT_CACHE:
            _FIT_CACHE[pkey] = coded.select(
                "vec_id",
                *[
                    (F.col(f"c{2 * i}") * 16 + F.col(f"c{2 * i + 1}"))
                    .cast("int")
                    .alias(f"b{i}")
                    for i in range(PQ_M // 2)
                ],
            ).localCheckpoint(eager=True)
        base = _FIT_CACHE[pkey]
        score = " + ".join(
            f"element_at({lut_lit[2 * i]}, CAST((b{i} div 16) + 1 AS INT))"
            f" + element_at({lut_lit[2 * i + 1]},"
            f" CAST((b{i} % 16) + 1 AS INT))"
            for i in range(PQ_M // 2)
        )
    else:
        base = coded
        score = " + ".join(
            f"element_at({lut_lit[m]}, c{m} + 1)" for m in range(PQ_M)
        )
    base = base.filter(F.col("vec_id") != KNN_QUERY_ID)
    if members is not None:
        base = base.join(F.broadcast(members), "vec_id", "left_semi")
    return _shortlist_rerank(spark, sf_dir, base, score)


def q_knn_ivf_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULL FAISS-style production serve stack (IVFADC, Jégou et al.
    §VI): IVF bounds SEARCH (only the IVF_NPROBE best cells' codes are
    scanned — ~nprobe/K of the corpus), PQ bounds BANDWIDTH (the scanned
    candidates move at PQ_M bytes per row, no float read), and a fixed
    PQ_SHORTLIST of ADC winners is re-ranked by exact cosine. The three
    pieces prove separately (`knn-ivf` the cell pruning, `knn-pq` the
    ADC+re-rank, `knn-ivf-quantized` the composed-scan shape over int8) —
    this is their composition, the index a 100 TB corpus actually serves:
    at 1000 executors the probed cells' code partitions are the ONLY
    thing the query touches before the shortlist semi-join.

    Plan: probe-cell selection is K tiny driver-side integer-exact scores
    (`_ivf_probe_cells`, bit-identical to the oracle's cell CTE); cell
    membership restricts the ADC scan via a broadcast semi-join; the
    shortlist re-reads float vectors for PQ_SHORTLIST rows only.
    Deterministic end to end, so the oracle reproduces the REAL pruned
    shortlist — both approximations included — and the exact rescoring on
    top. Recall vs exact `knn` is the `ivf-pq-recall` driver row."""
    from rosbag2parquet_spark.functions.similarity import _ivf_probe_cells

    raw = load_table(spark, sf_dir, "embeddings")
    cells, assigned = _ivf_probe_cells(spark, sf_dir, raw)
    members = assigned.filter(F.col("cluster").isin(cells)).select("vec_id")
    return _adc_search(spark, sf_dir, members=members)


def q_ivf_pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of the composed IVF×PQ search against the exact scan — the
    `pq-recall` measurement for the full serve stack: what cell pruning
    costs ON TOP of ADC quantization error (compare the two driver
    rows)."""
    return _recall_vs_exact(spark, sf_dir, q_knn_ivf_pq)


def q_pq_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NIBBLE-PACKED PQ codes — the storage rung that makes the ~128x
    claim real: K=16 codewords fit 4 bits, so the PQ_M=8 codes pack into
    FOUR bytes per vector (byte i = c_{2i}·16 + c_{2i+1}; 512 B of floats
    → 4 B). Map-only over the quantize pass — packing is arithmetic on
    the codes, no extra pass, no shuffle. The compared output surfaces
    the packed byte VALUES as ints (a raw binary column is unhashable
    under the driver's canonicalizer — the r4 lesson); byte-exactness is
    the value identity b = hi·16 + lo, and the unpack round-trip is
    test-pinned (tests/test_operators.py)."""
    coded = _with_codes(spark, sf_dir)
    cols = [
        (F.col(f"c{2 * i}") * 16 + F.col(f"c{2 * i + 1}"))
        .cast("int")
        .alias(f"b{i}")
        for i in range(PQ_M // 2)
    ]
    return coded.select("vec_id", *cols).orderBy("vec_id")


def q_knn_pq_packed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN served DIRECTLY FROM the nibble-packed bytes — proof the 4 B/
    vector stored form (`pq-pack`) is the SERVING form, not an archival
    one: the ADC stage-1 scan reads only b0..b3 and unpacks in-expression
    (hi = b div 16, lo = b mod 16 — two integer ops, still
    whole-stage-codegen JVM arithmetic, no Python, no float read), sums
    the same decimal-exact LUT entries, and re-ranks the same fixed
    shortlist exactly. Identical codes → identical shortlist → identical
    answer to `knn-pq`; the packed serve shares its oracle, so the
    driver row proves pack → scan → unpack → ADC end to end. At 100 TB
    this is the rung that matters: the full-corpus scan moves 4 bytes
    per row off disk, period."""
    return _adc_search(spark, sf_dir, members=None, packed=True)


def _oracle_pq_pack() -> str:
    cols = ", ".join(
        f"CAST(c{2 * i} * 16 + c{2 * i + 1} AS INTEGER) AS b{i}"
        for i in range(PQ_M // 2)
    )
    return (
        _pq_cte_sql()
        + f"""
SELECT vec_id, {cols} FROM codes ORDER BY vec_id
"""
    )


def _ivfadc_fit(spark: SparkSession, sf_dir: str, rotated: bool = False):
    """Memoized training for the RESIDUAL-encoded IVFADC stack (Jégou et
    al. §VI eq. 17 — the shape FAISS's IVFADC actually stores): each
    vector's PQ code describes its residual against its coarse cell's
    NORMALIZED-space centroid, not the vector itself. Residual energy is
    a fraction of vector energy, so the same M×K codebook budget spends
    its resolution on a smaller ball — the recall headroom `ivfadc-recall`
    measures over `ivf-pq-recall`.

    With ``rotated``, the learned OPQ rotation is applied to the
    normalized vectors BEFORE the residual step (FAISS's
    ``OPQ…,IVF…,PQ…`` pre-transform chain): the coarse cell stays the
    raw-space kmeans assignment (shared with `knn-ivf`; rotation is
    orthogonal, so which cell a vector lands in is a free choice of
    basis), while ncent, residuals, codebooks, and LUTs all live in the
    rotated space — the two proven rungs composed.

    Returns (probe_cells, ncent, coded, books):
    - probe_cells: the IVF_NPROBE cells for the fixed query (raw-space
      integer-exact scores, shared with knn-ivf);
    - ncent[cl][i]: exact-decimal mean of the normalized vectors per
      coarse cell (the reconstruction anchor — computed in NORMALIZED
      space because cosine is scored there, while the coarse quantizer
      stays the raw-space kmeans knn-ivf proves);
    - coded: (vec_id, label, cluster, c0..c{M-1}) — the stored index:
      coarse cell + PQ_M residual codes per row, built MAP-SIDE
      (normalize + coarse argmin + residual subtract + code argmins; the
      corpus never shuffles — ncent's one groupBy is the only exchange,
      a once-per-deploy training cost);
    - books: per-subspace residual codebooks (same deterministic trainer).
    """
    from rosbag2parquet_spark.functions.kmeans import (
        K as IVF_K,
    )
    from rosbag2parquet_spark.functions.kmeans import (
        _as_double as _km_as_double,
    )
    from rosbag2parquet_spark.functions.kmeans import (
        assign_clusters_vectorized,
        kmeans_fit_cached,
    )
    from rosbag2parquet_spark.functions.similarity import _ivf_probe_cells

    key = (spark.sparkContext.applicationId, sf_dir, "ivfadc", rotated)
    if key in _FIT_CACHE:
        return _FIT_CACHE[key]
    raw = load_table(spark, sf_dir, "embeddings")
    cells, _ = _ivf_probe_cells(spark, sf_dir, raw)
    centroids, _ = kmeans_fit_cached(spark, sf_dir)
    # map-side: normalize (the proven _normalized expressions) + coarse
    # cell via the raw-space integer argmin (bit-identical to the oracle)
    frame = _normalized(raw).withColumn("e", _km_as_double("embedding"))
    frame = assign_clusters_vectorized(frame, centroids).select(
        "vec_id", "label", "cluster", "en"
    )
    if rotated:
        # same quantized matvec the `knn-opq` representation uses — one
        # more fused Arrow step before the residual subtraction
        frame = frame.withColumn("en", _rotate_vectorized()(F.col("en")))
    # normalized-space cell centroids: the kmeans mean-update expression
    # verbatim (exact decimal sum / count), one tiny (K×dim)-row collect
    ncent_rows = (
        frame.select("cluster", F.posexplode("en").alias("pos", "x"))
        .groupBy("cluster", "pos")
        .agg(
            (
                F.sum(F.col("x").cast(_DEC)).cast("double")
                / F.count(F.lit(1))
            ).alias("m")
        )
        .collect()
    )
    ncent = [[0.0] * EMBED_DIM for _ in range(IVF_K)]
    for r in ncent_rows:
        # posexplode is 0-based (the oracle's dims.pos is 1-based)
        ncent[int(r["cluster"])][int(r["pos"])] = float(r["m"])
    res = _ivfadc_residuals(frame, ncent)
    books = pq_fit(res.select("vec_id", "en"))
    coded = _coded(res.select("vec_id", "label", "cluster", "en"), books)
    coded = coded.drop("en").cache()
    _FIT_CACHE[key] = (cells, ncent, coded, books)
    return _FIT_CACHE[key]


def _ivfadc_residuals(frame: DataFrame, ncent) -> DataFrame:
    """Subtract each row's coarse-cell centroid (the exact-decimal
    ``ncent`` literal) from its normalized/rotated coordinates — the
    residual the PQ codes describe (Jégou et al. §VI eq. 17)."""
    cent_lit = F.expr(
        "array("
        + ",".join(
            "array(" + ",".join(f"{float(v)!r}D" for v in row) + ")"
            for row in ncent
        )
        + ")"
    )
    return frame.withColumn(
        "en",
        F.zip_with(
            "en",
            F.element_at(cent_lit, F.col("cluster") + 1),
            lambda a, b: a - b,
        ),
    )


def _ivfadc_encode(
    raw: DataFrame,
    centroids,
    ncent,
    books,
    rotated: bool = False,
) -> DataFrame:
    """Encode ``raw`` embedding rows into IVFADC index entries —
    (vec_id, label, cluster, c0..c{M-1}) — under a FROZEN quantizer
    (centroids, ncent, books all given, nothing trained): normalize,
    raw-space coarse argmin, [rotate], residual against ncent, per-
    subspace code argmins — `_ivfadc_fit`'s encode tail verbatim, every
    step MAP-SIDE per row. No step reads any other row, which is the
    property the index-build story rests on: independently-encoded
    SHARDS union into exactly the single-build index
    (`ivfadc-shard-merge`), and live appends match the batch codes
    (`stream-knn-ivfadc`)."""
    from rosbag2parquet_spark.functions.kmeans import (
        _as_double as _km_as_double,
    )
    from rosbag2parquet_spark.functions.kmeans import (
        assign_clusters_vectorized,
    )

    frame = _normalized(raw).withColumn("e", _km_as_double("embedding"))
    frame = assign_clusters_vectorized(frame, centroids).select(
        "vec_id", "label", "cluster", "en"
    )
    if rotated:
        frame = frame.withColumn("en", _rotate_vectorized()(F.col("en")))
    res = _ivfadc_residuals(frame, ncent)
    return _coded(
        res.select("vec_id", "label", "cluster", "en"), books
    ).drop("en")


def q_knn_ivfadc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The residual-encoded IVFADC serve (Jégou et al. §VI eq. 17):
    dot(q, x̂) decomposes as dot(q, ncent[cell(x)]) + dot(q, r̂) — one
    per-cell constant plus PQ_M lookups in a LUT built from the QUERY
    itself against the residual codebooks. Stage 1 scans only the probed
    cells' codes (cluster + PQ_M bytes per candidate, no float read);
    stage 2 re-ranks a fixed shortlist exactly. Same plan economics as
    `knn-ivf-pq`; the difference is WHAT the codes describe — residuals,
    whose smaller dynamic range is where the recall gain comes from
    (`ivfadc-recall` vs `ivf-pq-recall` is the measured pair).
    Deterministic end to end like every rung: exact-decimal ncent,
    integer-quantized argmins, decimal-exact LUT and cell constants,
    fixed left-to-right addition order mirrored in the oracle."""
    return _ivfadc_search(spark, sf_dir)


def _ivfadc_search(
    spark: SparkSession,
    sf_dir: str,
    rotated: bool = False,
    nprobe: "int | None" = None,
    shortlist: "int | None" = None,
) -> DataFrame:
    """The IVFADC two-stage serve over `_ivfadc_fit`'s stored index —
    `knn-ivfadc` passes the identity basis, `knn-ivfadc-opq` the learned
    OPQ rotation (LUT, cell constants, and the query representation move
    to the rotated space together; the stage-2 exact re-rank always reads
    the ORIGINAL vectors, like every rotated rung). ``nprobe`` overrides
    the deployed probe depth PER QUERY (the FAISS search-time knob the
    `ivf-nprobe-curve` row tunes by): the stored index — codes, ncent,
    codebooks — is untouched; only the probed-cell slice of the SAME
    driver-side cell ranking widens, so a deeper probe costs exactly the
    extra cells' code scan and nothing at build time. ``shortlist``
    widens the stage-1 ADC cut the same way (FAISS's per-search k_factor
    re-rank knob): the stored index is untouched; the only cost is the
    extra rows whose float vectors stage 2 re-reads."""
    base, score = _ivfadc_stage1(spark, sf_dir, rotated, nprobe)
    return _shortlist_rerank(spark, sf_dir, base, score, shortlist)


def _ivfadc_stage1(
    spark: SparkSession,
    sf_dir: str,
    rotated: bool = False,
    nprobe: "int | None" = None,
    coded_override: "DataFrame | None" = None,
) -> "tuple[DataFrame, str]":
    """The ADC stage-1 scan of one stored IVFADC index before the
    shortlist cut: (base, score) where ``base`` is the probed cells'
    coded rows and ``score`` the per-cell-constant + LUT expression in
    the index's basis — `_ivfadc_search` cuts and re-ranks one of these;
    the cutover serve (`q_ivfadc_cutover`) scans TWO (old and new index)
    and merges their shortlists. ``coded_override`` serves a DIFFERENT
    stored-codes frame under the same frozen quantizer (the shard-merged
    index of `ivfadc-shard-merge`)."""
    from rosbag2parquet_spark.functions.similarity import _ivf_probe_cells

    cells, ncent, coded, books = _ivfadc_fit(spark, sf_dir, rotated)
    if coded_override is not None:
        coded = coded_override
    if nprobe is not None:
        cells, _ = _ivf_probe_cells(
            spark, sf_dir, load_table(spark, sf_dir, "embeddings"), nprobe
        )
    score = _ivfadc_score_expr(spark, sf_dir, ncent, books, rotated)
    base = coded.filter(F.col("vec_id") != KNN_QUERY_ID).filter(
        F.col("cluster").isin([int(c) for c in cells])
    )
    return base, score


def _ivfadc_score_expr(
    spark: SparkSession, sf_dir: str, ncent, books, rotated: bool = False
) -> str:
    """The ADC score expression for ONE query against given quantizer
    constants — per-cell constant + PQ_M LUT lookups, fixed addition
    order. Takes ncent/books as VALUES (not the fit cache) so a serve
    can run from stored artifacts alone (`ivfadc-persist`); the query
    representation (`_pq_frame`) is computed at search time like every
    serve — it is a property of the query, not of the stored index."""
    # the query in the codes' basis: `_pq_frame` is the same
    # normalize[+quantized-rotate] pipeline the fit ran; memoized per
    # (session, sf, basis) like the fits (r13 — one collect per session,
    # not one per serve invocation)
    qkey = (spark.sparkContext.applicationId, sf_dir, rotated, "qen-frame")
    if qkey not in _FIT_CACHE:
        _FIT_CACHE[qkey] = [
            float(x)
            for x in _pq_frame(spark, sf_dir, rotated)
            .filter(F.col("vec_id") == KNN_QUERY_ID)
            .select("en")
            .collect()[0]["en"]
        ]
    qen = _FIT_CACHE[qkey]
    lut_lit = _query_luts(books, qen)
    # the IVFADC decomposition's extra term (shared helper — the
    # streaming append twin uses the same values)
    consts = _ivfadc_cell_consts(ncent, qen)
    return (
        "element_at(array("
        + ",".join(f"{v!r}D" for v in consts)
        + "), cluster + 1)"
        + "".join(
            f" + element_at({lut_lit[m]}, c{m} + 1)" for m in range(PQ_M)
        )
    )


def q_ivfadc_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of the residual-encoded IVFADC against the exact scan —
    the measured pair with `ivf-pq-recall` (same cells, same code budget,
    residual vs raw encoding)."""
    return _recall_vs_exact(spark, sf_dir, q_knn_ivfadc)


def q_knn_ivfadc_opq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The two r10 rungs COMPOSED — FAISS's ``OPQ,IVF,PQ`` index string:
    rotate (learned OPQ basis), coarse-quantize (shared raw-space cells;
    an orthogonal rotation never changes which neighbors are near, only
    the coordinates PQ splits), then PQ-encode the ROTATED residuals.
    dot(q, x̂) = dot(Rq, ncent_rot[cell]) + dot(Rq, r̂) — the same
    per-cell constant + LUT plan as `knn-ivfadc`, every literal now in
    the rotated basis. Search economics identical (probed cells' codes
    only, fixed exact re-rank); what changes is the encoding error the
    codes carry — `ivfadc-opq-recall` vs `ivfadc-recall` is the measured
    pair, closing SURVEY §7.1 #4."""
    return _ivfadc_search(spark, sf_dir, rotated=True)


def q_ivfadc_opq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of the rotated residual-encoded serve against the exact
    scan — the measured proof the composition earns its place above its
    two parents (compare `ivfadc-recall` and `opq-recall`)."""
    return _recall_vs_exact(spark, sf_dir, q_knn_ivfadc_opq)


#: probe depth of the deeper-probe serve row — the point where the
#: measured `ivf-nprobe-curve` says the EXACT scan of the probed cells
#: reaches full recall at sf0.01 (10/10 at nprobe=4 vs 9/10 at the
#: deployed 3)
IVFADC_NP_DEEP = 4


def q_knn_ivfadc_np4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The residual IVFADC serve at a DEEPER per-query probe depth
    (nprobe=4 vs the deployed 3) — proof that nprobe is a search-time
    parameter of the serve, not a property of the stored index (SURVEY
    §7.1 #5's remaining headroom; FAISS's per-search nprobe knob): same
    codes, same ncent, same LUTs, one more ranked cell scanned. The
    recall this buys is the `ivfadc-np4-recall` driver row."""
    return _ivfadc_search(spark, sf_dir, nprobe=IVFADC_NP_DEEP)


def q_ivfadc_np4_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of the deeper-probe IVFADC serve against the exact scan —
    the point that closes the loop with `ivf-nprobe-curve` AND names the
    next binder: the curve's exact-scan ceiling at depth 4 is 10/10
    (sf0.01), the residual-ADC serve measures 9/10 at both fixtures —
    once the probe set stops binding (3→4 buys the exact scan its last
    neighbor), the ADC shortlist becomes the binder. The production
    reading: past nprobe=3 on this cell profile, spend budget on codes
    (M, K, shortlist), not probes. r12 closed the loop: `knn-ivfadc-sl`
    widens the shortlist to 100 at this probe depth and
    `ivfadc-sl-recall` measures the predicted 10/10 at sf0.01."""
    return _recall_vs_exact(
        spark, sf_dir, lambda s, d: _ivfadc_search(s, d, nprobe=IVFADC_NP_DEEP)
    )


#: ADC shortlist depth of the deeper-shortlist serve row — 2x the
#: deployed PQ_SHORTLIST (FAISS's k_factor posture). The measured curve
#: at nprobe=4, sf0.01: 50->9/10, 55->9/10, 60->10/10 (the knee),
#: 75/100/150/200->10/10 — the exact-scan ceiling `ivf-nprobe-curve`
#: names. 100 deploys comfortably above the knee; at sf0.001 the PROBE
#: SET binds instead (9/10 even with an UNBOUNDED shortlist: the 10th
#: neighbor lives in an unprobed cell), so a deeper shortlist buys
#: nothing there — the two fixtures together separate the two binders.
IVFADC_SL_DEEP = 100


def q_knn_ivfadc_sl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The residual IVFADC serve at (nprobe=4, shortlist=100) — the knob
    `ivfadc-np4-recall` measured as the NEXT binder, now a per-query
    serve parameter like nprobe (FAISS's k_factor re-rank knob): same
    codes, same ncent, same LUTs, same probed cells as `knn-ivfadc-np4`;
    the stage-1 ADC cut keeps 100 candidates instead of 50, so stage 2
    re-reads 50 more float rows and nothing else changes. The recall
    this buys is the `ivfadc-sl-recall` driver row — 10/10 at sf0.01,
    the exact-scan ceiling, completing the tuning story the nprobe
    curve started: probes bind below nprobe=4, the shortlist binds at
    50, and (4, 100) reaches the ceiling."""
    return _ivfadc_search(
        spark, sf_dir, nprobe=IVFADC_NP_DEEP, shortlist=IVFADC_SL_DEEP
    )


def q_ivfadc_sl_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of the deeper-shortlist IVFADC serve against the exact
    scan — the measured proof that the shortlist (not the encoding) was
    the last gap: 9/10 at (4, 50) (`ivfadc-np4-recall`) becomes 10/10 at
    (4, 100) at the driver gate's sf0.01. At sf0.001 the probe set is
    the binder instead (unbounded shortlist still measures 9/10 — the
    missing neighbor sits in an unprobed cell), which is exactly the
    production reading: tune probes and shortlist SEPARATELY; past the
    probe knee spend on the shortlist, past the shortlist knee go back
    to probes."""
    return _recall_vs_exact(
        spark,
        sf_dir,
        lambda s, d: _ivfadc_search(
            s, d, nprobe=IVFADC_NP_DEEP, shortlist=IVFADC_SL_DEEP
        ),
    )


#: shortlist depths of the measured recall@shortlist curve: below the
#: deployed 50, the deployed 50 (ties `ivfadc-np4-recall`), the measured
#: knee at 60, and the deployed-deep 100 (`knn-ivfadc-sl`)
SHORTLIST_CURVE = (25, 50, 60, 100)


def q_ivf_shortlist_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The recall@shortlist SENSITIVITY CURVE — `ivf-nprobe-curve`'s
    twin for the serve's SECOND knob, making the measured numbers that
    chose IVFADC_SL_DEEP=100 a driver-proven table instead of a
    docstring claim (and a tripwire: a fixture regen that moves the
    knee shows up as a changed row, not a silently-stale constant).
    One row per depth at the fixed deeper probe (nprobe=4, where the
    shortlist — not the probe set — binds at sf0.01).

    Economics mirror the nprobe curve: the ADC ranking is computed ONCE
    (one scan of the probed cells' codes, materialized — KNN-score-table
    sized), then every curve point is a prefix cut + its own exact
    re-rank + an overlap count against the exact top-k ids inlined as
    literals. r13 optimization (guide §2.4/§3): the per-point re-rank no
    longer re-joins the corpus — the DEEPEST prefix is cut once with its
    stage-1 rank attached, the float vectors are read for that one
    max(SHORTLIST_CURVE)-row frame, and every curve point becomes a
    rank-prefix filter + top-k over the materialized ≤100-row exact-score
    table. Per point, `top-k among (rank ≤ d) by exact score` is
    row-for-row `_exact_rerank(prefix-cut d)` — both orderings are the
    identical (adc DESC, vec_id) / (cos DESC, vec_id) ties — so the
    oracle is untouched. Plan diff: 8 parquet scans + 16 Exchanges in
    the final job → 0 (all branches read the checkpointed 100-row
    frame). At 100 TB the curve now costs one code scan plus ONE
    shortlist-sized float read (was: one per curve point)."""
    from functools import reduce

    from pyspark.sql import Window

    from rosbag2parquet_spark.functions.similarity import q_knn

    base, score = _ivfadc_stage1(spark, sf_dir, nprobe=IVFADC_NP_DEEP)
    scored = base.select(
        "vec_id", F.expr(score).alias("adc")
    ).localCheckpoint(eager=True)
    exact_ids = [
        int(r["vec_id"])
        for r in q_knn(spark, sf_dir).select("vec_id").collect()
    ]
    dmax = max(SHORTLIST_CURVE)
    # the deepest stage-1 cut, rank attached: the window is ordered
    # exactly like the cut (adc DESC, vec_id), runs over ≤ dmax rows
    # (post-limit), so rank ≤ d IS the depth-d prefix cut
    sl = (
        scored.orderBy(F.desc("adc"), F.asc("vec_id"))
        .limit(dmax)
        .select(
            "vec_id",
            F.row_number()
            .over(Window.orderBy(F.desc("adc"), F.asc("vec_id")))
            .alias("rk"),
        )
    )
    # ONE exact re-rank read of the float vectors for the deepest prefix
    # (same score expression as `_exact_rerank`), materialized so the
    # curve points below are prefix cuts of local rows, not re-joins
    emb = _normalized(load_table(spark, sf_dir, "embeddings"))
    query = emb.filter(F.col("vec_id") == KNN_QUERY_ID).select(
        F.col("en").alias("qen")
    )
    dotp = F.aggregate(
        F.zip_with(F.col("en"), F.col("qen"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    rr_all = (
        emb.join(F.broadcast(sl), "vec_id")
        .crossJoin(F.broadcast(query))
        .select("vec_id", "rk", F.round(dotp, 6).alias("cos_sim"))
        .localCheckpoint(eager=True)
    )
    pieces = []
    for d in SHORTLIST_CURVE:
        rr = (
            rr_all.filter(F.col("rk") <= d)
            .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
            .limit(KNN_K)
            .select("vec_id")
        )
        pieces.append(
            rr.filter(F.col("vec_id").isin(exact_ids))
            .agg(F.count(F.lit(1)).alias("n_overlap"))
            .select(
                F.lit(d).cast("int").alias("shortlist"),
                "n_overlap",
                F.expr(
                    f"CAST(n_overlap * 10000 div {KNN_K} AS BIGINT)"
                ).alias("recall_bps"),
            )
        )
    return reduce(lambda a, b: a.unionAll(b), pieces).orderBy("shortlist")


#: the cutover migration slice: vec_id % 2 == 0 rows have been
#: RE-ENCODED into the new (rotated) index; odd rows still serve from
#: the old (identity) index — the mid-migration state the registered
#: `ivfadc-cutover` row freezes. Deterministic, so the oracle repeats it.
CUTOVER_MOD = 2


def _ivfadc_cutover_search(
    spark: SparkSession, sf_dir: str, migrated
) -> DataFrame:
    """The cutover serve over TWO coexisting stored indexes (FAISS's
    re-train-then-migrate lifecycle: a quantizer re-train — here the
    learned OPQ basis replacing the identity basis, a REAL re-encode of
    every migrated vector's codes — cannot rewrite a 100 TB index in
    place; it migrates in slices while queries keep landing). Each
    vector is served by exactly the index that currently holds it:
    ``migrated`` rows by the NEW rotated-residual index, the rest by the
    OLD identity-residual index (the old copy of a migrated row is
    tombstoned — dedupe-by-vec_id is therefore structural, not a score
    preference). Both stage-1 ADC cuts run in their own basis against
    their own LUTs; the union of the two shortlists shares ONE exact
    stage-2 re-rank over the original vectors, so the serve surface is
    a single top-k regardless of migration progress. The coarse cells
    are SHARED (rotation is basis choice — it never moves a vector
    between raw-space cells), so the probe set prunes both scans
    identically. Endpoints are test-pinned: migrated=false ==
    `knn-ivfadc` row-for-row, migrated=true == a REBUILT `knn-ivfadc-opq`
    row-for-row — old+new coexistence converges to the rebuilt index."""
    base_o, score_o = _ivfadc_stage1(spark, sf_dir, rotated=False)
    base_n, score_n = _ivfadc_stage1(spark, sf_dir, rotated=True)
    sl_old = _stage1_shortlist(base_o.filter(~migrated), score_o)
    sl_new = _stage1_shortlist(base_n.filter(migrated), score_n)
    return _exact_rerank(
        spark, sf_dir, sl_old.unionByName(sl_new).distinct()
    )


def q_ivfadc_cutover(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index-lifecycle cutover MID-MIGRATION (SURVEY §7.2 #2): half the
    corpus (vec_id % 2 == 0) re-encoded into the re-trained OPQ-rotated
    index, half still in the old identity index — one query surface over
    both. See `_ivfadc_cutover_search` for the serve contract; the
    endpoint equalities (nothing migrated == old index, everything
    migrated == rebuilt new index) are test-pinned, this row drives the
    coexistence state neither endpoint exercises."""
    return _ivfadc_cutover_search(
        spark, sf_dir, (F.col("vec_id") % CUTOVER_MOD) == 0
    )


def q_ivfadc_shard_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MULTI-WORKER index-build story (FAISS's merge_from /
    merge_ondisk posture): two index shards encoded INDEPENDENTLY —
    disjoint halves of the corpus (vec_id parity), each run through the
    full `_ivfadc_encode` pipeline on its own, neither seeing the
    other's rows — union into one serving index. Because every encode
    step is map-side per row under the FROZEN quantizer (coarse argmin,
    residual, code argmins read only the row and the shipped constants),
    shard codes are byte-identical to the single-build index's codes for
    the same rows, so the merged index serves `knn-ivfadc`'s answer
    EXACTLY — the oracle is shared verbatim, and the code-level identity
    (shards union == single build, frame-compared) plus the serve-level
    identity are test-pinned. At 100 TB this is the build plan: N
    workers each encode their partition with zero coordination, and
    "merge" is a metadata union — no shuffle, no re-encode, no global
    pass. (Contrast `ivfadc-cutover`, where the QUANTIZER differs
    between the two indexes and coexistence needs two scoring bases;
    here the quantizer is shared and the union is the whole story.)"""
    from rosbag2parquet_spark.functions.kmeans import kmeans_fit_cached

    _, ncent, _, books = _ivfadc_fit(spark, sf_dir)
    centroids, _ = kmeans_fit_cached(spark, sf_dir)
    raw = load_table(spark, sf_dir, "embeddings")
    shard_a = _ivfadc_encode(
        raw.filter((F.col("vec_id") % 2) == 0), centroids, ncent, books
    )
    shard_b = _ivfadc_encode(
        raw.filter((F.col("vec_id") % 2) != 0), centroids, ncent, books
    )
    base, score = _ivfadc_stage1(
        spark, sf_dir, coded_override=shard_a.unionByName(shard_b)
    )
    return _shortlist_rerank(spark, sf_dir, base, score)


#: the deletion slice: vec_id % 7 == 0 rows are TOMBSTONED — removed
#: from the serving index without touching the quantizer or any other
#: row's codes. Deterministic, so the oracle repeats it.
DELETE_MOD = 7


def q_ivfadc_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index DELETION — the third index-lifecycle op (add =
    `ivfadc-shard-merge` / `stream-knn-ivfadc`, re-train =
    `ivfadc-cutover`, delete = this; FAISS's remove_ids posture): a
    tombstone set drops out of the serving index as a stage-1 filter on
    the stored codes — BEFORE any scoring, so deleted rows cost nothing
    at serve time — and the quantizer, ncent, codebooks, and every
    surviving row's codes are untouched. Because encoding is map-side
    per row (`_ivfadc_encode`'s property), the tombstone-filtered index
    is byte-identical to a frozen-quantizer re-encode of the surviving
    corpus — deletion never forces a rebuild; compaction is an
    OPTIONAL storage pass, not a correctness one (test-pinned). The
    oracle is `knn-ivfadc`'s CTE family with the same tombstone
    predicate on the shortlist scan; stage 2 re-ranks only shortlist
    members, so a deleted vector can never re-enter through the exact
    pass."""
    base, score = _ivfadc_stage1(spark, sf_dir)
    live = base.filter((F.col("vec_id") % DELETE_MOD) != 0)
    return _shortlist_rerank(spark, sf_dir, live, score)


#: the metadata predicate of the FILTERED serve: label == FILTER_LABEL
#: (~10% of the corpus — the "vector search WHERE lang='en'" production
#: selectivity). Deterministic, so the oracle repeats it.
FILTER_LABEL = 7


def q_knn_ivfadc_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTERED ANN — the production composition of a metadata predicate
    with the IVFADC serve (FAISS's IDSelector at search time; every
    vector DB's `WHERE lang='en'` clause): the predicate applies to the
    stage-1 code scan BEFORE any scoring — exactly the tombstone
    bitmap's slot, so non-matching rows cost nothing — the shortlist is
    cut among MATCHING candidates only, and the exact re-rank inherits
    the restriction through the shortlist semi-join (a non-matching
    vector can never re-enter, the `ivfadc-delete` argument). The codes
    table already carries the attribute (label rides next to cluster —
    the stored-index design choice that makes filtered search free),
    so the filter composes with cell pruning: the scan reads only
    (probed cells) ∩ (matching rows). Semantics are pinned by test:
    whenever the matching probed candidates fit the shortlist (they do
    at both fixtures — ~10% selectivity × ~3/8 probe mass < 50), the
    answer IS the exact cosine top-k over (probed ∩ matching), i.e.
    filtered-ADC loses nothing the probe set didn't already exclude.
    The oracle is `knn-ivfadc`'s CTE family with the same predicate on
    the shortlist scan (the member_pred hook, delete's construction).
    At 100 TB: same cell-pruned code scan as every serve, minus the
    non-matching rows — selective filters make it CHEAPER, and recall
    against the filtered exact scan binds on the probe set exactly as
    the unfiltered curves measured (tune nprobe up for rare labels):
    measured recall@10 vs the exact FILTERED scan at the deployed
    nprobe=3 is 9/10 (sf0.001) / 8/10 (sf0.01) — every miss is a
    matching vector in an unprobed cell, never an ADC ranking loss
    (the semantics test pins exactness within the probed set)."""
    base, score = _ivfadc_stage1(spark, sf_dir)
    return _shortlist_rerank(
        spark, sf_dir, base.filter(F.col("label") == FILTER_LABEL), score
    )


def _oracle_knn_ivfadc_filtered() -> str:
    # knn-ivfadc's oracle with the metadata predicate on the shortlist
    # scan — the member_pred hook ivfadc-delete introduced; the codes
    # CTE carries label beside the code columns, so the predicate is
    # the engine's base.filter(label == FILTER_LABEL) verbatim
    return _adc_oracle(
        extra_ctes=_ivf_cells_cte(),
        member_pred=f" AND codes.label = {FILTER_LABEL}",
        residual=True,
    )


def q_ivfadc_persist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index PERSISTENCE — FAISS's write_index/read_index: the stored
    index is codes-as-parquet (the distributable part — at 100 TB the
    only corpus-sized artifact, partitionable like any table) plus a
    tiny quantizer side-car (probe cells, exact-decimal ncent, residual
    codebooks — kilobytes, shipped to every serving session). The serve
    path (`_ivfadc_serve_from`) reads ONLY those artifacts: no fit, no
    training pass, no touch of the in-session fit cache (test-pinned by
    clearing it and serving again) — the operational claim that an index
    built once serves from cold storage forever. The query-side
    representation is computed at search time from the query vector
    alone, exactly like every serve (it is a property of the query, not
    the index). JSON round-trips Python floats exactly (repr-based), so
    LUTs and cell constants rebuilt from the side-car are bit-identical
    to the build session's — `knn-ivfadc`'s oracle is shared VERBATIM.
    The parquet+side-car layout is memoized per fixture like
    `incr-rollup`'s stored rollup (atomic rename; concurrent builders
    converge on identical content — every artifact is deterministic)."""
    cells, ncent, coded, books = _ivfadc_fit(spark, sf_dir)
    base = _ivfadc_store(spark, sf_dir, coded, cells, ncent, books)
    return _ivfadc_serve_from(spark, sf_dir, base)


def _ivfadc_store(
    spark: SparkSession,
    sf_dir: str,
    coded: DataFrame,
    cells,
    ncent,
    books,
    variant: str = "full",
) -> str:
    """Write-once layout of a serving IVFADC index under /tmp: the codes
    parquet + the quantizer side-car, returned as the directory
    `_ivfadc_serve_from` reads. The memo key is the fixture basename AND
    a CONTENT fingerprint of the quantizer constants (sha256 over the
    canonical side-car JSON — cells, exact-decimal ncent, residual
    codebooks, all deterministic functions of the data): a regenerated
    fixture at the same path, or two fixture roots sharing a basename,
    trains different constants and therefore lands in a DIFFERENT
    directory instead of silently serving the stale index (r12 advisor).
    ``variant`` separates layouts whose CODES differ under the same
    quantizer (the compacted post-delete index vs the full one).
    Publication is the shared atomic-rename discipline: one winner,
    losers drop their work dir, non-race failures re-raise."""
    import hashlib
    import json
    import tempfile

    blob = json.dumps(
        {
            "cells": [int(c) for c in cells],
            "ncent": ncent,
            "books": books,
        },
        sort_keys=True,
    )
    fp = hashlib.sha256(blob.encode()).hexdigest()[:16]
    tag = f"{os.path.basename(os.path.normpath(sf_dir))}_{variant}_{fp}"
    root = os.path.join(
        tempfile.gettempdir(), "rosbag2parquet_spark_ivfadc_index"
    )
    base = os.path.join(root, tag)
    if not os.path.isdir(base):
        os.makedirs(root, exist_ok=True)
        work = tempfile.mkdtemp(prefix=f"{tag}_", dir=root)
        coded.write.parquet(os.path.join(work, "codes"))
        with open(os.path.join(work, "quantizer.json"), "w") as f:
            f.write(blob)
        publish_scratch(work, base)
    return base


def q_ivfadc_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index COMPACTION — the optional STORAGE pass `ivfadc-delete`'s
    contract names (and FAISS deployments run after enough remove_ids
    tombstones accumulate): rewrite the SURVIVING rows' codes into a
    fresh stored index and drop the tombstone set entirely, so the
    serve stops paying the per-query tombstone filter and storage stops
    carrying dead codes. Correctness rests on the already-pinned
    identity (tombstone-filtered index == frozen-quantizer re-encode of
    the survivors, byte-for-byte): compaction is a pure COPY of
    surviving codes — quantizer, ncent, codebooks untouched, no row
    re-encoded — so the rewritten index serves batch `ivfadc-delete`'s
    answer row-for-row with NO tombstone predicate anywhere in the
    plan. The oracle is `ivfadc-delete`'s verbatim: the driver row
    proves rewrite == filter. At 100 TB the rewrite is one map-side
    scan of the codes table (tombstone anti-filter, no shuffle, no
    float read) — `vacuum`'s economics applied to the ANN index, which
    completes the delete story the way `vacuum` completed the layout's.
    The rewritten artifact shares `ivfadc-persist`'s layout (codes
    parquet + quantizer side-car, fingerprint-keyed, atomic publish)
    and is served by the same cold-capable `_ivfadc_serve_from` path."""
    cells, ncent, coded, books = _ivfadc_fit(spark, sf_dir)
    survivors = coded.filter((F.col("vec_id") % DELETE_MOD) != 0)
    # the variant key carries the survivor predicate: the quantizer
    # fingerprint can't see WHICH rows were kept, so a changed
    # DELETE_MOD must land in a fresh directory, never serve the old
    # survivor set from a warm /tmp (r13 review)
    base = _ivfadc_store(
        spark, sf_dir, survivors, cells, ncent, books,
        variant=f"compact{DELETE_MOD}",
    )
    return _ivfadc_serve_from(spark, sf_dir, base)


def _ivfadc_serve_from(
    spark: SparkSession, sf_dir: str, index_dir: str
) -> DataFrame:
    """Serve from a PERSISTED index directory alone (codes parquet +
    quantizer side-car) — no `_ivfadc_fit`, no training, no fit-cache
    access; the `ivfadc-persist` read path, callable from any session."""
    import json

    with open(os.path.join(index_dir, "quantizer.json")) as f:
        meta = json.load(f)
    coded = spark.read.parquet(os.path.join(index_dir, "codes"))
    score = _ivfadc_score_expr(
        spark, sf_dir, meta["ncent"], meta["books"]
    )
    base = coded.filter(F.col("vec_id") != KNN_QUERY_ID).filter(
        F.col("cluster").isin([int(c) for c in meta["cells"]])
    )
    return _shortlist_rerank(spark, sf_dir, base, score)


def q_knn_opq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`knn-pq` with the OPQ rotation on: codes, codebooks, and the ADC
    lookup table live in the ROTATED space (see `opq_rotation`); the
    stage-2 exact re-rank reads the original vectors, so any shortlist
    member ranks exactly as in `knn`. Same plan shape and byte economics
    as `knn-pq` — the rotation is one more map-side Arrow step fused into
    the quantize pass — but the subspace split now crosses decorrelated
    coordinates, which is where PQ loses the least (Ge et al. 2013).
    The measured gain is the `opq-recall` vs `pq-recall` driver pair."""
    return _adc_search(spark, sf_dir, members=None, rotated=True)


def q_opq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of the rotated-PQ two-stage search against the exact scan —
    `pq-recall`'s measurement with the rotation on. On the fixture the
    rotation lifts shortlist recall@10 from 8/10 to 10/10 at the driver
    gate's sf0.01 (and 6/10 → 9/10 at sf0.001): the driver pair IS the
    measured proof the OPQ rung earns its place above PQ."""
    return _recall_vs_exact(spark, sf_dir, q_knn_opq)


# ------------------------------------------------------------- oracles


def _pq_cte_sql(
    rotated: bool = False,
    residual: bool = False,
    prefix: str = "",
    emit_km: bool = True,
) -> str:
    """Per-subspace unrolled k-means CTE chains over the NORMALIZED
    embedding dims (global 1-based pos keys; subspace m covers pos in
    [m*PQ_SUB+1, (m+1)*PQ_SUB]) — the kmeans_cte_sql construction
    (functions/kmeans.py:156) sliced per subspace. Final codes CTE:
    ``codes (vec_id, c0..c{M-1})``. With ``rotated``, an ``rdims`` CTE
    applies the literal OPQ rotation with the engine's exact
    floor(x·r·1e12)/1e12 quantization and the chains (init, distances,
    means) read it instead of ``dims``. With ``residual``, the km_
    coarse-quantizer chain (raw space, knn-ivf's) plus an exact-decimal
    normalized-space cell-centroid CTE (``ncent``) define ``rsdims`` =
    dims minus the row's cell centroid, and the chains quantize THAT —
    the IVFADC residual encoding. ``prefix`` renames every CTE this
    function emits (the kmeans_cte_sql composition rule) so TWO chains —
    e.g. the cutover oracle's old identity index and new rotated index —
    coexist in one statement; the km_ coarse chain keeps its fixed name
    (the raw-space cells are SHARED between bases — rotation never moves
    a vector between cells), so the second chain passes ``emit_km=False``
    to reuse the first's."""
    pfx = prefix
    dsrc = (
        f"{pfx}rsdims"
        if residual
        else (f"{pfx}rdims" if rotated else f"{pfx}dims")
    )
    # the basis the residual step reads: rotated coordinates when both
    # rungs compose (`knn-ivfadc-opq`), plain normalized dims otherwise
    rbase = f"{pfx}rdims" if rotated else f"{pfx}dims"
    parts = [
        f"""
{pfx}n AS MATERIALIZED (
  SELECT vec_id, label,
         list_transform(embedding::DOUBLE[],
             x -> x / sqrt(list_dot_product(embedding::DOUBLE[],
                                            embedding::DOUBLE[]))) AS en
  FROM embeddings
),
{pfx}dims AS MATERIALIZED (
  SELECT vec_id, i AS pos, en[i] AS x
  FROM {pfx}n, unnest(generate_series(1, 64)) AS t(i)
)"""
    ]
    if rotated:
        rm_lit = (
            "["
            + ",".join(
                "[" + ",".join(f"{x!r}" for x in row) + "]"
                for row in opq_rotation()
            )
            + "]"
        )
        # coordinate j = toDouble(sum_i floor(x_i * R[j][i] * 1e12)) / 1e12
        # — identical operand order to the engine's numpy pass; the int
        # sum <= 6.4e13 is exact in the DOUBLE the CAST produces
        parts.append(
            f"""
{pfx}opq_rm AS MATERIALIZED (SELECT {rm_lit} AS rm),
{pfx}rdims AS MATERIALIZED (
  SELECT d.vec_id, j.j AS pos,
         CAST(sum(CAST(floor(d.x * rm.rm[j.j][d.pos] * 1e12) AS BIGINT)) AS DOUBLE) / 1e12 AS x
  FROM {pfx}dims d, {pfx}opq_rm rm, unnest(generate_series(1, {EMBED_DIM})) AS j(j)
  GROUP BY d.vec_id, j.j
)"""
        )
    if residual:
        from rosbag2parquet_spark.functions.kmeans import (
            N_ITER as _KM_N_ITER,
        )
        from rosbag2parquet_spark.functions.kmeans import kmeans_cte_sql

        if emit_km:
            km = kmeans_cte_sql(prefix="km_")
            assert km.startswith("WITH ")
            parts.append(km[len("WITH ") :])
        # ncent = kmeans mean-update expression verbatim (exact decimal
        # sum / count) over the NORMALIZED dims grouped by the raw-space
        # coarse cell; rsdims = the residual each row's PQ code describes
        parts.append(
            f"""
{pfx}ncent AS MATERIALIZED (
  SELECT a.cl, d.pos,
         CAST(sum(CAST(d.x AS {_DEC})) AS DOUBLE) / count(*) AS m
  FROM {rbase} d JOIN km_a{_KM_N_ITER} a USING (vec_id)
  GROUP BY a.cl, d.pos
),
{pfx}rsdims AS MATERIALIZED (
  SELECT d.vec_id, d.pos, d.x - nc.m AS x
  FROM {rbase} d
  JOIN km_a{_KM_N_ITER} a USING (vec_id)
  JOIN {pfx}ncent nc ON nc.cl = a.cl AND nc.pos = d.pos
)"""
        )
    for m in range(PQ_M):
        lo, hi = m * PQ_SUB + 1, (m + 1) * PQ_SUB
        parts.append(
            f"""
{pfx}c0_{m} AS MATERIALIZED (
  SELECT r.cl, d.pos, d.x AS m
  FROM (SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS cl
        FROM embeddings ORDER BY vec_id LIMIT {PQ_K}) r
  JOIN {dsrc} d USING (vec_id)
  WHERE d.pos BETWEEN {lo} AND {hi}
)"""
        )
        for t in range(PQ_N_ITER + 1):
            parts.append(
                f"""
{pfx}d{t}_{m} AS MATERIALIZED (
  SELECT d.vec_id, c.cl,
         sum(CAST(floor((d.x - c.m) * (d.x - c.m) * 1e12) AS BIGINT)) AS dist
  FROM {dsrc} d JOIN {pfx}c{t}_{m} c USING (pos)
  WHERE d.pos BETWEEN {lo} AND {hi}
  GROUP BY d.vec_id, c.cl
),
{pfx}a{t}_{m} AS MATERIALIZED (
  SELECT vec_id, cl FROM (
    SELECT vec_id, cl,
           row_number() OVER (PARTITION BY vec_id ORDER BY dist, cl) AS rk
    FROM {pfx}d{t}_{m}
  ) WHERE rk = 1
)"""
            )
            if t < PQ_N_ITER:
                parts.append(
                    f"""
{pfx}c{t + 1}_{m} AS MATERIALIZED (
  SELECT a.cl, d.pos,
         CAST(sum(CAST(d.x AS {_DEC})) AS DOUBLE) / count(*) AS m
  FROM {dsrc} d JOIN {pfx}a{t}_{m} a USING (vec_id)
  WHERE d.pos BETWEEN {lo} AND {hi}
  GROUP BY a.cl, d.pos
  UNION ALL
  SELECT c.cl, c.pos, c.m FROM {pfx}c{t}_{m} c
  WHERE c.cl NOT IN (SELECT DISTINCT cl FROM {pfx}a{t}_{m})
)"""
                )
    code_cols = ", ".join(
        f"{pfx}a{PQ_N_ITER}_{m}.cl AS c{m}" for m in range(PQ_M)
    )
    joins = " ".join(
        f"JOIN {pfx}a{PQ_N_ITER}_{m} ON {pfx}a{PQ_N_ITER}_{m}.vec_id = n.vec_id"
        for m in range(PQ_M)
    )
    parts.append(
        f"""
{pfx}codes AS MATERIALIZED (
  SELECT n.vec_id, n.label, {code_cols}
  FROM {pfx}n n {joins}
)"""
    )
    return "WITH " + ",".join(parts)


def _oracle_pq_quantize() -> str:
    cols = ", ".join(f"CAST(c{m} AS INTEGER) AS c{m}" for m in range(PQ_M))
    return (
        _pq_cte_sql()
        + f"""
SELECT vec_id, {cols} FROM codes ORDER BY vec_id
"""
    )


def _adc_oracle(
    extra_ctes: str = "",
    member_pred: str = "",
    rotated: bool = False,
    residual: bool = False,
    shortlist: "int | None" = None,
) -> str:
    """The ADC + exact-re-rank oracle tail over the PQ CTE chain. LUT per
    (subspace, codeword): decimal-exact dot of the query's normalized
    subvector with the final codebook entry, cast to double — identical
    to the engine's driver-side computation. ``extra_ctes`` (leading
    comma included) and ``member_pred`` (an ``AND …`` on codes.vec_id)
    inject the IVF membership restriction for `knn-ivf-pq`; ``rotated``
    moves codes and LUT into the OPQ-rotated space (`knn-opq`) while the
    re-rank stays on the original ``n``; ``residual`` scores the IVFADC
    decomposition — per-cell constant dot(q, ncent[cl]) plus LUTs built
    from the query's NORMALIZED dims against the RESIDUAL codebooks, the
    candidate set restricted to the probed cells, addition order
    (constant first, then subspaces 0..M-1) mirroring the engine's
    expression text."""
    # residual LUTs pair the query's normalized dims (rotated dims when
    # the OPQ basis composes in) with residual-space codebooks
    # (dot(q, r̂) — resp. dot(Rq, r̂) — in the IVFADC decomposition)
    lut_dsrc = "rdims" if rotated else "dims"
    lut_ctes = ",".join(
        f"""
lut_{m} AS MATERIALIZED (
  SELECT c.cl, CAST(sum(CAST(c.m * d.x AS {_DEC})) AS DOUBLE) AS v
  FROM c{PQ_N_ITER}_{m} c
  JOIN {lut_dsrc} d ON d.pos = c.pos AND d.vec_id = {KNN_QUERY_ID}
  GROUP BY c.cl
)"""
        for m in range(PQ_M)
    )
    score = " + ".join(f"lut_{m}.v" for m in range(PQ_M))
    joins = " ".join(
        f"JOIN lut_{m} ON lut_{m}.cl = codes.c{m}" for m in range(PQ_M)
    )
    if residual:
        from rosbag2parquet_spark.functions.kmeans import (
            N_ITER as _KM_N_ITER,
        )

        lut_ctes += f""",
cellconst AS MATERIALIZED (
  SELECT nc.cl, CAST(sum(CAST(nc.m * d.x AS {_DEC})) AS DOUBLE) AS v
  FROM ncent nc
  JOIN {lut_dsrc} d ON d.pos = nc.pos AND d.vec_id = {KNN_QUERY_ID}
  GROUP BY nc.cl
)"""
        score = "cellconst.v + " + score
        joins = (
            f"JOIN km_a{_KM_N_ITER} ka ON ka.vec_id = codes.vec_id "
            "JOIN cellconst ON cellconst.cl = ka.cl " + joins
        )
        member_pred = (
            member_pred + " AND ka.cl IN (SELECT cl FROM ivf_cells)"
        )
    return (
        _pq_cte_sql(rotated, residual)
        + extra_ctes
        + ","
        + lut_ctes
        + f""",
shortlist AS MATERIALIZED (
  SELECT codes.vec_id
  FROM codes {joins}
  WHERE codes.vec_id != {KNN_QUERY_ID}{member_pred}
  ORDER BY {score} DESC, codes.vec_id LIMIT {PQ_SHORTLIST if shortlist is None else shortlist}
),
q AS (SELECT en AS qen FROM n WHERE vec_id = {KNN_QUERY_ID})
SELECT n.vec_id, n.label,
       round(list_dot_product(n.en, q.qen), 6) AS cos_sim
FROM n JOIN shortlist USING (vec_id) CROSS JOIN q
ORDER BY cos_sim DESC, n.vec_id LIMIT {KNN_K}
"""
    )


def _oracle_knn_pq() -> str:
    return _adc_oracle()


def _ivf_cells_cte(nprobe: "int | None" = None) -> str:
    """The probe-cell CTE alone (knn-ivf's integer-quantized cell scores
    over the km_-prefixed chain, which the caller must have emitted) —
    leading comma included. ``nprobe`` mirrors the engine's per-query
    probe-depth parameter (deployed IVF_NPROBE when None)."""
    from rosbag2parquet_spark.functions.kmeans import N_ITER
    from rosbag2parquet_spark.functions.similarity import IVF_NPROBE

    return f""",
ivf_cells AS (
  SELECT cl FROM (
    SELECT c.cl,
           CAST(sum(CAST(floor(c.m * qd.x * 1e12) AS BIGINT)) AS DOUBLE)
             / sqrt(CAST(sum(CAST(floor(c.m * c.m * 1e12) AS BIGINT)) AS DOUBLE)) AS score
    FROM km_c{N_ITER} c
    JOIN (SELECT pos, x FROM km_dims WHERE vec_id = {KNN_QUERY_ID}) qd USING (pos)
    GROUP BY c.cl
  ) ORDER BY score DESC, cl LIMIT {IVF_NPROBE if nprobe is None else nprobe}
)"""


def _ivf_member_ctes() -> str:
    """The IVF side of the knn-ivf-pq oracle: the km_-prefixed kmeans
    chain over RAW embeddings (the PQ chain's ``dims`` is normalized —
    prefix avoids the collision), the integer-quantized probe-cell
    scores (knn-ivf's cells CTE verbatim, over km_ names), and the
    probed cells' membership."""
    from rosbag2parquet_spark.functions.kmeans import N_ITER, kmeans_cte_sql

    km = kmeans_cte_sql(prefix="km_")
    assert km.startswith("WITH ")
    return (
        ","
        + km[len("WITH ") :]
        + _ivf_cells_cte()
        + f""",
ivf_members AS (
  SELECT vec_id FROM km_a{N_ITER} WHERE cl IN (SELECT cl FROM ivf_cells)
)"""
    )


def _oracle_knn_ivf_pq() -> str:
    return _adc_oracle(
        extra_ctes=_ivf_member_ctes(),
        member_pred=" AND codes.vec_id IN (SELECT vec_id FROM ivf_members)",
    )


def _oracle_knn_opq() -> str:
    return _adc_oracle(rotated=True)


def _oracle_knn_ivfadc() -> str:
    return _adc_oracle(extra_ctes=_ivf_cells_cte(), residual=True)


def _oracle_knn_ivfadc_opq() -> str:
    return _adc_oracle(
        extra_ctes=_ivf_cells_cte(), rotated=True, residual=True
    )


def _oracle_knn_ivfadc_np4() -> str:
    # the same oracle CTE family as knn-ivfadc, probe depth widened to
    # the engine's per-query override — both sides slice the SAME ranking
    return _adc_oracle(
        extra_ctes=_ivf_cells_cte(IVFADC_NP_DEEP), residual=True
    )


def _adc_lut_ctes(pfx: str, dsrc: str) -> str:
    """The residual-ADC LUT + cell-constant CTEs over a (possibly
    prefixed) `_pq_cte_sql` chain — shared by the cutover and
    shortlist-curve oracles (the `_adc_oracle` construction factored
    for multi-chain / multi-cut statements)."""
    out = ",".join(
        f"""
{pfx}lut_{m} AS MATERIALIZED (
  SELECT c.cl, CAST(sum(CAST(c.m * d.x AS {_DEC})) AS DOUBLE) AS v
  FROM {pfx}c{PQ_N_ITER}_{m} c
  JOIN {dsrc} d ON d.pos = c.pos AND d.vec_id = {KNN_QUERY_ID}
  GROUP BY c.cl
)"""
        for m in range(PQ_M)
    )
    return (
        out
        + f""",
{pfx}cellconst AS MATERIALIZED (
  SELECT nc.cl, CAST(sum(CAST(nc.m * d.x AS {_DEC})) AS DOUBLE) AS v
  FROM {pfx}ncent nc
  JOIN {dsrc} d ON d.pos = nc.pos AND d.vec_id = {KNN_QUERY_ID}
  GROUP BY nc.cl
)"""
    )


def _adc_shortlist_cte(
    pfx: str, name: str, side_pred: str = "TRUE", limit: "int | None" = None
) -> str:
    """One stage-1 ADC shortlist CTE (leading comma included) over a
    (possibly prefixed) chain + its `_adc_lut_ctes` — probe-cell
    restricted, deterministic (score DESC, vec_id) cut at ``limit``
    (deployed PQ_SHORTLIST when None)."""
    from rosbag2parquet_spark.functions.kmeans import N_ITER as _KM_N

    score = f"{pfx}cellconst.v + " + " + ".join(
        f"{pfx}lut_{m}.v" for m in range(PQ_M)
    )
    joins = (
        f"JOIN km_a{_KM_N} ka ON ka.vec_id = {pfx}codes.vec_id "
        f"JOIN {pfx}cellconst ON {pfx}cellconst.cl = ka.cl "
        + " ".join(
            f"JOIN {pfx}lut_{m} ON {pfx}lut_{m}.cl = {pfx}codes.c{m}"
            for m in range(PQ_M)
        )
    )
    return f""",
{name} AS MATERIALIZED (
  SELECT {pfx}codes.vec_id
  FROM {pfx}codes {joins}
  WHERE {pfx}codes.vec_id != {KNN_QUERY_ID} AND {side_pred}
    AND ka.cl IN (SELECT cl FROM ivf_cells)
  ORDER BY {score} DESC, {pfx}codes.vec_id LIMIT {PQ_SHORTLIST if limit is None else limit}
)"""


def _oracle_ivf_shortlist_curve() -> str:
    """One residual chain + per-depth shortlist CTEs off the SAME luts
    (the engine's one-scan-many-cuts shape), per-depth exact re-rank in
    the ADC oracle's normalized form, overlap vs the exact top-k in
    ORACLE_KNN's raw-quotient form — each side the formulation its
    engine twin is hash-proven against."""
    from rosbag2parquet_spark.functions.similarity import KNN_QUERY_ID as _Q

    sls = "".join(
        _adc_shortlist_cte("", f"sl_{d}", limit=d) for d in SHORTLIST_CURVE
    )
    score6 = (
        "round(list_dot_product(e.embedding::DOUBLE[], qraw.qe)"
        " / (sqrt(list_dot_product(e.embedding::DOUBLE[],"
        " e.embedding::DOUBLE[])) * sqrt(list_dot_product(qraw.qe,"
        " qraw.qe))), 6)"
    )
    rrs = "".join(
        f""",
rr_{d} AS (
  SELECT n.vec_id FROM n JOIN sl_{d} USING (vec_id) CROSS JOIN q
  ORDER BY round(list_dot_product(n.en, q.qen), 6) DESC, n.vec_id
  LIMIT {KNN_K}
)"""
        for d in SHORTLIST_CURVE
    )
    rows = " UNION ALL ".join(
        f"""
SELECT CAST({d} AS INTEGER) AS shortlist,
       CAST(count(*) AS BIGINT) AS n_overlap,
       CAST(count(*) * 10000 // {KNN_K} AS BIGINT) AS recall_bps
FROM exact JOIN rr_{d} USING (vec_id)"""
        for d in SHORTLIST_CURVE
    )
    return (
        _pq_cte_sql(residual=True)
        + _ivf_cells_cte(IVFADC_NP_DEEP)
        + ","
        + _adc_lut_ctes("", "dims")
        + sls
        + f""",
q AS (SELECT en AS qen FROM n WHERE vec_id = {_Q}),
qraw AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = {_Q}),
exact AS (
  SELECT e.vec_id FROM embeddings e, qraw
  WHERE e.vec_id != {_Q}
  ORDER BY {score6} DESC, e.vec_id LIMIT {KNN_K}
)"""
        + rrs
        + "\nSELECT * FROM ("
        + rows
        + "\n) ORDER BY shortlist\n"
    )


def _oracle_ivfadc_cutover() -> str:
    """The cutover oracle: BOTH index chains in one statement — the old
    identity-residual chain unprefixed, the new rotated-residual chain
    under the ``nw_`` prefix reusing the SHARED km_ coarse chain
    (`_pq_cte_sql(emit_km=False)`) — each with its own LUT/cell-constant
    CTEs, each shortlist sliced to its migration side, UNION (dedupe by
    vec_id) into one exact re-rank. Mirrors `_ivfadc_cutover_search`
    term for term."""
    old_chain = _pq_cte_sql(rotated=False, residual=True)
    new_chain = _pq_cte_sql(
        rotated=True, residual=True, prefix="nw_", emit_km=False
    )
    assert new_chain.startswith("WITH ")
    return (
        old_chain
        + ","
        + new_chain[len("WITH ") :]
        + _ivf_cells_cte()
        + ","
        + _adc_lut_ctes("", "dims")
        + ","
        + _adc_lut_ctes("nw_", "nw_rdims")
        + _adc_shortlist_cte(
            "", "sl_old", f"codes.vec_id % {CUTOVER_MOD} != 0"
        )
        + _adc_shortlist_cte(
            "nw_", "sl_new", f"nw_codes.vec_id % {CUTOVER_MOD} = 0"
        )
        + f""",
shortlist AS (SELECT vec_id FROM sl_old UNION SELECT vec_id FROM sl_new),
q AS (SELECT en AS qen FROM n WHERE vec_id = {KNN_QUERY_ID})
SELECT n.vec_id, n.label,
       round(list_dot_product(n.en, q.qen), 6) AS cos_sim
FROM n JOIN shortlist USING (vec_id) CROSS JOIN q
ORDER BY cos_sim DESC, n.vec_id LIMIT {KNN_K}
"""
    )


def _oracle_ivfadc_delete() -> str:
    # knn-ivfadc's oracle with the tombstone predicate on the shortlist
    # scan — the member_pred hook the IVF membership restriction already
    # uses; the final re-rank joins the shortlist, so deleted vectors
    # cannot re-enter
    return _adc_oracle(
        extra_ctes=_ivf_cells_cte(),
        member_pred=f" AND codes.vec_id % {DELETE_MOD} != 0",
        residual=True,
    )


def _oracle_knn_ivfadc_sl() -> str:
    # knn-ivfadc-np4's oracle with the shortlist LIMIT widened the same
    # way the engine widens it — the two per-query knobs parameterize the
    # SAME CTE family, so an engine/oracle desync on either is impossible
    return _adc_oracle(
        extra_ctes=_ivf_cells_cte(IVFADC_NP_DEEP),
        residual=True,
        shortlist=IVFADC_SL_DEEP,
    )


def _recall_vs_exact(spark: SparkSession, sf_dir: str, approx) -> DataFrame:
    """Recall@KNN_K of an approximate search against the exact scan —
    the single-sourced measurement every ANN rung's `*-recall` row uses.
    Both sides are the engine's own deterministic queries, so recall is
    a reproducible integer, not a sample estimate — the driver row IS
    the measured-accuracy proof."""
    from rosbag2parquet_spark.functions.similarity import q_knn

    exact = q_knn(spark, sf_dir).select("vec_id")
    got = approx(spark, sf_dir).select("vec_id")
    return (
        exact.join(got, "vec_id")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
        .select(
            F.lit(KNN_K).cast("int").alias("k"),
            "n_overlap",
            F.expr(f"CAST(n_overlap * 10000 div {KNN_K} AS BIGINT)").alias(
                "recall_bps"
            ),
        )
    )


def _oracle_recall(approx_sql: str) -> str:
    from rosbag2parquet_spark.functions.similarity import ORACLE_KNN

    return f"""
SELECT CAST({KNN_K} AS INTEGER) AS k,
       CAST(count(*) AS BIGINT) AS n_overlap,
       CAST(count(*) * 10000 // {KNN_K} AS BIGINT) AS recall_bps
FROM ({ORACLE_KNN}) e JOIN ({approx_sql}) p USING (vec_id)
"""


def q_pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of the two-stage PQ search against the exact scan — the
    quality number a PQ index is tuned by (PQ_M/PQ_K/PQ_SHORTLIST trade),
    the `knn-recall` posture for the compression ladder's coarsest rung
    (8/10 -> 8000 bps on the fixture's near-noise embeddings at
    shortlist 50 with the integer-quantized argmin; the r8 decimal
    argmin trained marginally different codebooks and measured 6/10)."""
    return _recall_vs_exact(spark, sf_dir, q_knn_pq)


def _oracle_pq_recall() -> str:
    return _oracle_recall(_oracle_knn_pq())


def _oracle_ivf_pq_recall() -> str:
    return _oracle_recall(_oracle_knn_ivf_pq())


def _oracle_opq_recall() -> str:
    return _oracle_recall(_oracle_knn_opq())


def _oracle_ivfadc_recall() -> str:
    return _oracle_recall(_oracle_knn_ivfadc())


def _oracle_ivfadc_opq_recall() -> str:
    return _oracle_recall(_oracle_knn_ivfadc_opq())


QUERIES = {
    "pq-quantize": q_pq_quantize,
    "knn-pq": q_knn_pq,
    "pq-recall": q_pq_recall,
    "knn-ivf-pq": q_knn_ivf_pq,
    "ivf-pq-recall": q_ivf_pq_recall,
    "knn-ivfadc": q_knn_ivfadc,
    "ivfadc-recall": q_ivfadc_recall,
    "knn-ivfadc-opq": q_knn_ivfadc_opq,
    "ivfadc-opq-recall": q_ivfadc_opq_recall,
    "knn-ivfadc-np4": q_knn_ivfadc_np4,
    "ivfadc-np4-recall": q_ivfadc_np4_recall,
    "knn-ivfadc-sl": q_knn_ivfadc_sl,
    "ivfadc-sl-recall": q_ivfadc_sl_recall,
    "ivfadc-cutover": q_ivfadc_cutover,
    "ivfadc-shard-merge": q_ivfadc_shard_merge,
    "ivfadc-delete": q_ivfadc_delete,
    "ivfadc-compact": q_ivfadc_compact,
    "knn-ivfadc-filtered": q_knn_ivfadc_filtered,
    "ivf-shortlist-curve": q_ivf_shortlist_curve,
    "ivfadc-persist": q_ivfadc_persist,
    "knn-opq": q_knn_opq,
    "opq-recall": q_opq_recall,
    "pq-pack": q_pq_pack,
    "knn-pq-packed": q_knn_pq_packed,
}

#: constructed once — the delete row and the compact row share the SAME
#: oracle text (rewrite == filter is exactly what the shared string proves)
_ORACLE_IVFADC_DELETE = _oracle_ivfadc_delete()

ORACLES = {
    "pq-quantize": _oracle_pq_quantize(),
    "knn-pq": _oracle_knn_pq(),
    "pq-recall": _oracle_pq_recall(),
    "knn-ivf-pq": _oracle_knn_ivf_pq(),
    "ivf-pq-recall": _oracle_ivf_pq_recall(),
    "knn-ivfadc": _oracle_knn_ivfadc(),
    "ivfadc-recall": _oracle_ivfadc_recall(),
    "knn-ivfadc-opq": _oracle_knn_ivfadc_opq(),
    "ivfadc-opq-recall": _oracle_ivfadc_opq_recall(),
    "knn-ivfadc-np4": _oracle_knn_ivfadc_np4(),
    "ivfadc-np4-recall": _oracle_recall(_oracle_knn_ivfadc_np4()),
    "knn-ivfadc-sl": _oracle_knn_ivfadc_sl(),
    "ivfadc-sl-recall": _oracle_recall(_oracle_knn_ivfadc_sl()),
    "ivfadc-cutover": _oracle_ivfadc_cutover(),
    # the merged index serves the single-build answer EXACTLY (map-side
    # per-row encode under the frozen quantizer) — oracle shared verbatim
    "ivfadc-shard-merge": _oracle_knn_ivfadc(),
    "ivfadc-delete": _ORACLE_IVFADC_DELETE,
    # the compacted index is a pure copy of the surviving codes — the
    # rewrite must serve the tombstone-filtered answer EXACTLY, so the
    # driver row proves rewrite == filter by sharing delete's oracle
    # (the ONE constructed string, not a second expansion)
    "ivfadc-compact": _ORACLE_IVFADC_DELETE,
    "knn-ivfadc-filtered": _oracle_knn_ivfadc_filtered(),
    "ivf-shortlist-curve": _oracle_ivf_shortlist_curve(),
    # the persisted index serves the build session's answer EXACTLY
    # (repr-exact JSON floats, deterministic codes) — oracle verbatim
    "ivfadc-persist": _oracle_knn_ivfadc(),
    "knn-opq": _oracle_knn_opq(),
    "opq-recall": _oracle_opq_recall(),
    "pq-pack": _oracle_pq_pack(),
    # the packed serve is value-identical to knn-pq by construction
    # (same codes, same LUT, same addition order) — sharing the oracle
    # makes the driver prove exactly that
    "knn-pq-packed": _oracle_knn_pq(),
}
