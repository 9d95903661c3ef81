"""Structured Streaming smoke: the streaming windowed plan over the finite
fixture must produce the batch answer (incrementalization correctness)."""

import pytest

from rosbag2parquet_spark.operators.windows import q_window_tumbling
from rosbag2parquet_spark.streaming.windowed import (
    run_to_memory,
    stream_events,
    windowed_counts,
)
from tests.conftest import SF_DIR


@pytest.mark.slow
def test_streaming_tumbling_equals_batch(spark):
    events = stream_events(spark, SF_DIR)
    agg = windowed_counts(events)
    run_to_memory(agg, "stream_tumbling", mode="complete")
    streamed = spark.sql("SELECT * FROM stream_tumbling")
    batch = q_window_tumbling(spark, SF_DIR)
    assert streamed.count() > 0
    assert streamed.exceptAll(batch).count() == 0
    assert batch.exceptAll(streamed).count() == 0


@pytest.mark.slow
def test_cdc_landing_incremental_drop_converges(spark):
    """The CDC file-landing contract: run the merge apply over a landing
    dir holding ONLY the base snapshot (checkpointed), then DROP the
    change-batch files and RESUME from the same checkpoint — the union of
    both runs' emissions must converge to exactly the batch
    `merge-upsert` answer (the per-key state is commutative argmaxes, so
    any batch split converges). This is the test the registered
    `stream-cdc-apply` docstring promises."""
    import os
    import shutil
    import tempfile

    from rosbag2parquet_spark.operators.behavior import (
        _MERGE_CUTOFF_US,
        q_merge_upsert,
    )
    from rosbag2parquet_spark.streaming.queries import (
        _merge_finisher,
        write_cdc_landing,
    )
    from rosbag2parquet_spark.streaming.stateful import running_merge_upsert

    staged, schema = write_cdc_landing(spark, SF_DIR)
    landing = tempfile.mkdtemp(prefix="cdc_test_landing_")
    ckpt = tempfile.mkdtemp(prefix="cdc_test_ckpt_")
    emissions = []

    def drain():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(landing)
        )
        q = (
            running_merge_upsert(stream, _MERGE_CUTOFF_US)
            .writeStream.outputMode("update")
            .option("checkpointLocation", ckpt)
            .foreachBatch(
                lambda df, _eid: emissions.append(df.toPandas())
            )
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    try:
        files = sorted(os.listdir(staged))
        assert files[0].startswith("000_base") and len(files) == 4
        # drop 1: the base snapshot only
        shutil.copy(os.path.join(staged, files[0]), landing)
        drain()
        n_base_emissions = sum(len(p) for p in emissions)
        assert n_base_emissions > 0
        # drop 2: the three change batches land later; RESUME from the
        # checkpoint — only the new files process
        for f in files[1:]:
            shutil.copy(os.path.join(staged, f), landing)
        drain()
        assert sum(len(p) for p in emissions) > n_base_emissions
        import pandas as pd

        all_em = spark.createDataFrame(
            pd.concat(emissions, ignore_index=True)
        )
        got = _merge_finisher(all_em)
        batch = q_merge_upsert(spark, SF_DIR)
        assert got.exceptAll(batch).count() == 0
        assert batch.exceptAll(got).count() == 0
    finally:
        shutil.rmtree(staged, ignore_errors=True)
        shutil.rmtree(landing, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


@pytest.mark.slow
def test_stream_knn_ivf_equals_batch(spark):
    """The live composed IVF serve must produce EXACTLY the batch
    `knn-ivf` rows — vec_id set, labels, and the rounded cosines. This is
    the parity pin for the streaming kernel's third arithmetic (numpy
    norm + BLAS dot + round-6): the round absorbs fold-order low bits
    (the stream-knn/semdedup precedent), and this test is what keeps that
    claim measured rather than assumed."""
    from rosbag2parquet_spark.functions.similarity import q_knn_ivf
    from rosbag2parquet_spark.streaming.queries import q_stream_knn_ivf

    batch = q_knn_ivf(spark, SF_DIR).select("vec_id", "label", "cos_sim")
    streamed = q_stream_knn_ivf(spark, SF_DIR).select(
        "vec_id", "label", "cos_sim"
    )
    assert streamed.count() == batch.count() == 10
    assert streamed.exceptAll(batch).count() == 0
    assert batch.exceptAll(streamed).count() == 0


@pytest.mark.slow
def test_stream_knn_ivfadc_equals_batch(spark):
    """Incremental IVFADC maintenance parity: codes appended for arriving
    vectors under the frozen quantizer must serve EXACTLY the batch
    `knn-ivfadc` answer — same shortlist (same codes + same frozen ADC
    constants + the same (score DESC, vec_id) rule), same exact re-rank.
    This is the pin that the live index and a full rebuild are
    indistinguishable to a query."""
    from rosbag2parquet_spark.functions.pq import q_knn_ivfadc
    from rosbag2parquet_spark.streaming.queries import q_stream_knn_ivfadc

    batch = q_knn_ivfadc(spark, SF_DIR).select("vec_id", "label", "cos_sim")
    streamed = q_stream_knn_ivfadc(spark, SF_DIR).select(
        "vec_id", "label", "cos_sim"
    )
    assert streamed.count() == batch.count() == 10
    assert streamed.exceptAll(batch).count() == 0
    assert batch.exceptAll(streamed).count() == 0


@pytest.mark.slow
def test_stream_knn_ivfadc_per_query_nprobe_equals_batch(spark):
    """The per-query probe-depth override applies to the LIVE serve too
    (the batch `knn-ivfadc-np4` knob, §7.2 symmetry): live at nprobe=4
    must equal batch at nprobe=4 row-for-row — one more ranked cell's
    arrivals pass the ingest filter, nothing about the frozen quantizer
    or the state changes."""
    from rosbag2parquet_spark.functions.pq import IVFADC_NP_DEEP, _ivfadc_search
    from rosbag2parquet_spark.streaming.queries import q_stream_knn_ivfadc

    batch = _ivfadc_search(spark, SF_DIR, nprobe=IVFADC_NP_DEEP).select(
        "vec_id", "label", "cos_sim"
    )
    streamed = q_stream_knn_ivfadc(
        spark, SF_DIR, nprobe=IVFADC_NP_DEEP
    ).select("vec_id", "label", "cos_sim")
    assert streamed.count() == batch.count() == 10
    assert streamed.exceptAll(batch).count() == 0
    assert batch.exceptAll(streamed).count() == 0


@pytest.mark.slow
def test_stream_knn_ivfadc_per_query_shortlist_equals_batch(spark):
    """The per-query ADC shortlist override applies to the LIVE serve
    too (the batch `knn-ivfadc-sl` knob, r12 symmetry): live at
    (nprobe=4, shortlist=100) must equal batch at the same knobs
    row-for-row — the running top-N state keeps more candidates,
    nothing about the frozen quantizer changes."""
    from rosbag2parquet_spark.functions.pq import (
        IVFADC_NP_DEEP,
        IVFADC_SL_DEEP,
        _ivfadc_search,
    )
    from rosbag2parquet_spark.streaming.queries import q_stream_knn_ivfadc

    batch = _ivfadc_search(
        spark, SF_DIR, nprobe=IVFADC_NP_DEEP, shortlist=IVFADC_SL_DEEP
    ).select("vec_id", "label", "cos_sim")
    streamed = q_stream_knn_ivfadc(
        spark, SF_DIR, nprobe=IVFADC_NP_DEEP, shortlist=IVFADC_SL_DEEP
    ).select("vec_id", "label", "cos_sim")
    assert streamed.count() == batch.count() == 10
    assert streamed.exceptAll(batch).count() == 0
    assert batch.exceptAll(streamed).count() == 0


@pytest.mark.slow
def test_stream_ivfadc_delete_equals_batch(spark):
    """X3/X11 (r12): adds and tombstones interleaving on streams must
    serve exactly the batch tombstone-filtered index — deletion is a
    serve-time bitmap, so arrival order (even delete-after-add) cannot
    change the answer; no deleted vec_id appears."""
    from rosbag2parquet_spark.functions.pq import DELETE_MOD, q_ivfadc_delete
    from rosbag2parquet_spark.streaming.queries import q_stream_ivfadc_delete

    batch = [
        tuple(r)
        for r in q_ivfadc_delete(spark, SF_DIR)
        .select("vec_id", "label", "cos_sim")
        .collect()
    ]
    streamed_df = q_stream_ivfadc_delete(spark, SF_DIR)
    streamed = [
        tuple(r)
        for r in streamed_df.select("vec_id", "label", "cos_sim").collect()
    ]
    assert streamed == batch
    assert all(v % DELETE_MOD != 0 for v, _, _ in streamed)


@pytest.mark.slow
def test_stream_bm25_equals_batch(spark):
    """X4/X11 (r12): the incrementally-built BM25 forward index must
    score IDENTICALLY to the batch pass once drained — same top-20,
    same n_terms_matched, same doubles (the shared _BM25_TERM_SCORE
    expression text; corpus constants derived from the live index at
    query time)."""
    from rosbag2parquet_spark.functions.text import q_bm25_search
    from rosbag2parquet_spark.streaming.queries import q_stream_bm25

    batch = [tuple(r) for r in q_bm25_search(spark, SF_DIR).collect()]
    streamed = [tuple(r) for r in q_stream_bm25(spark, SF_DIR).collect()]
    assert streamed == batch
    assert len(batch) == 20


@pytest.mark.slow
def test_cdc_landing_schema_evolution_converges(spark):
    """The evolve-append contract on the STREAMING path (the batch
    `_pad_union` behavior, convert.py:999): the landing's later change
    drops ADD a nullable ``source_seq`` column. The stream declares the
    union schema; a checkpointed first run sees only pre-evolution files
    (NULL-filled), the resume ingests the evolved drops, and the merged
    union of both runs' emissions equals the registered single-pass
    `stream-cdc-apply` answer — with NULL source_seq for every base-only
    key and for keys last changed before the evolution, and real values
    after it."""
    import os
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from rosbag2parquet_spark.operators.behavior import _MERGE_CUTOFF_US
    from rosbag2parquet_spark.streaming.queries import (
        _merge_finisher,
        landing_union_schema,
        q_stream_cdc_apply,
        write_cdc_landing,
    )
    from rosbag2parquet_spark.streaming.stateful import running_merge_upsert

    staged, _ = write_cdc_landing(spark, SF_DIR, evolve=True)
    landing = tempfile.mkdtemp(prefix="cdc_evolve_landing_")
    ckpt = tempfile.mkdtemp(prefix="cdc_evolve_ckpt_")
    emissions = []

    # the union schema comes from the full staged drop set — the shape a
    # restart declares once the producer upgrade is known
    union = landing_union_schema(spark, staged)
    assert "source_seq" in union.fieldNames()

    def drain():
        stream = (
            spark.readStream.schema(union)
            .option("maxFilesPerTrigger", 1)
            .parquet(landing)
        )
        q = (
            running_merge_upsert(
                stream, _MERGE_CUTOFF_US, extra_col="source_seq"
            )
            .writeStream.outputMode("update")
            .option("checkpointLocation", ckpt)
            .foreachBatch(lambda df, _eid: emissions.append(df.toPandas()))
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    try:
        files = sorted(os.listdir(staged))
        assert len(files) == 4
        # phase 1: only the PRE-evolution files land (base + change drop 1,
        # neither carries source_seq) — the union-schema read NULL-fills
        for f in files[:2]:
            shutil.copy(os.path.join(staged, f), landing)
        drain()
        n_phase1 = sum(len(p) for p in emissions)
        assert n_phase1 > 0
        import pandas as pd

        # pre-evolution files NULL-fill: every phase-1 emission carries
        # NULL source_seq (the union-schema read invented the column)
        phase1 = pd.concat(emissions, ignore_index=True)
        assert phase1["source_seq"].isna().all()
        # phase 2: the evolved drops land; RESUME from the checkpoint
        for f in files[2:]:
            shutil.copy(os.path.join(staged, f), landing)
        drain()
        assert sum(len(p) for p in emissions) > n_phase1
        got = _merge_finisher(
            spark.createDataFrame(pd.concat(emissions, ignore_index=True)),
            extra_col="source_seq",
        )
        single_pass = q_stream_cdc_apply(spark, SF_DIR)
        assert got.exceptAll(single_pass).count() == 0
        assert single_pass.exceptAll(got).count() == 0
        # the evolved drops stamp real values (on this fixture every
        # user's LATEST change falls in an evolved drop — the NULL-filled
        # history is pinned at the emissions level above, where phase 1
        # is entirely pre-evolution)
        assert got.filter(F.col("source_seq").isNotNull()).count() > 0
        # non-NULL stamps appear on change rows only, verbatim event ids
        assert (
            got.filter(F.col("source_seq").isNotNull())
            .filter(F.col("src") != "change")
            .count()
            == 0
        )
    finally:
        shutil.rmtree(staged, ignore_errors=True)
        shutil.rmtree(landing, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_cdc_landing_ignores_extra_columns(spark, tmp_path):
    """The landing-directory read contract under producer drift: a later
    change batch carrying an EXTRA column (a CDC extractor upgraded
    mid-stream) still applies cleanly — the declared stream schema reads
    by name, the extra column is ignored, and the merge converges to the
    same batch answer. (Surfacing a NEW column to consumers requires a
    declared-schema change + checkpointed restart — the documented
    evolve path; silently widening mid-query would change emission
    schemas under the sink.)"""
    import os
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as papq

    from rosbag2parquet_spark.operators.behavior import (
        _MERGE_CUTOFF_US,
        q_merge_upsert,
    )
    from rosbag2parquet_spark.streaming.queries import (
        _merge_finisher,
        write_cdc_landing,
    )
    from rosbag2parquet_spark.streaming.stateful import running_merge_upsert

    staged, schema = write_cdc_landing(spark, SF_DIR)
    try:
        files = sorted(os.listdir(staged))
        # widen the LAST change batch with an extra column
        last = os.path.join(staged, files[-1])
        t = papq.read_table(last)
        widened = t.append_column(
            "extractor_version", pa.array(["v2"] * len(t))
        )
        papq.write_table(widened, last)

        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(staged)
        )
        from pyspark.sql import functions as F  # noqa: F401

        tbl = "cdc_evolve_test"
        q = (
            running_merge_upsert(stream, _MERGE_CUTOFF_US)
            .writeStream.outputMode("update")
            .format("memory")
            .queryName(tbl)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        got = _merge_finisher(spark.table(tbl))
        batch = q_merge_upsert(spark, SF_DIR)
        assert got.exceptAll(batch).count() == 0
        assert batch.exceptAll(got).count() == 0
    finally:
        shutil.rmtree(staged, ignore_errors=True)


def test_stream_alert_transitions_edge_semantics(spark):
    """X15 alert routing: the emitted rows are exactly the verdict EDGES —
    per rule they strictly alternate ok False/True, the FIRST emitted row
    is always a violation (the monitor baseline is ok, so a leading
    all-green prefix emits nothing), and recoveries are present on the
    fixture (both directions of the page/recover loop are live)."""
    from rosbag2parquet_spark.streaming.queries import (
        q_stream_alert_transitions,
    )

    rows = q_stream_alert_transitions(spark, SF_DIR).collect()
    assert rows, "fixture produced no verdict edges"
    by_rule = {}
    for r in rows:
        by_rule.setdefault(r.rule, []).append(r)
    assert set(by_rule) == {"errshare:<=2000bps", "volume:>=95pct-mean"}
    for rule, rs in by_rule.items():
        oks = [r.ok for r in rs]
        assert oks[0] is False, f"{rule}: first edge must be a violation"
        assert all(a != b for a, b in zip(oks, oks[1:])), (
            f"{rule}: edges must strictly alternate"
        )
        assert [r.start_us for r in rs] == sorted(r.start_us for r in rs)
    assert any(r.ok for r in rows), "no recovery edge on the fixture"


@pytest.mark.slow
def test_stream_ivfadc_cutover_equals_batch(spark):
    """X3/X11 (r13): the live migration serve — migrated vectors arrive
    on a stream and encode into the NEW rotated index while un-migrated
    rows keep serving from the OLD stored identity index — must equal
    batch `ivfadc-cutover`'s frozen mid-migration answer row-for-row
    (the zero-downtime re-train claim), with every returned vector
    served by exactly the index that holds it (dedupe by vec_id)."""
    from rosbag2parquet_spark.functions.pq import q_ivfadc_cutover
    from rosbag2parquet_spark.streaming.queries import q_stream_ivfadc_cutover

    batch = [
        tuple(r)
        for r in q_ivfadc_cutover(spark, SF_DIR)
        .select("vec_id", "label", "cos_sim")
        .collect()
    ]
    streamed = [
        tuple(r)
        for r in q_stream_ivfadc_cutover(spark, SF_DIR)
        .select("vec_id", "label", "cos_sim")
        .collect()
    ]
    assert streamed == batch
    assert len({v for v, _, _ in streamed}) == len(streamed)
