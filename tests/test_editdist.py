"""Pass-Join edit-distance tier semantics the fixture can't pin: the
pigeonhole + shift-window blocking must FIND pairs whose unedited segment
is displaced by insertions (the case the +-tau probe window exists for),
must EXCLUDE pairs just over the threshold, must emit an equal-length
pair exactly once despite double orientation, and must leave sub-tau-
length docs to the exact tiers."""

import os

import pytest

from rosbag2parquet_spark.functions.dedup import EDITDIST_TAU, q_dedup_editdist

BASE = "the quick brown fox jumps over the lazy dog near the riverbank"


@pytest.fixture(scope="module")
def layout(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("editdist"))
    # 4 chars INSERTED up front — every later segment shifts right by 4,
    # the maximum displacement the +-tau window must still catch
    shifted = "WXYZ" + BASE
    # 5 substitutions spread across all 5 segments: ed=5 > tau, and no
    # segment survives unedited (the blocking may or may not emit it as a
    # candidate; verification must kill it either way)
    over = list(BASE)
    for k in range(5):
        pos = 3 + k * (len(BASE) // 5)
        over[pos] = "#"
    over = "".join(over)
    # equal length, 2 substitutions: found via BOTH orientations, one row
    twin = BASE[:10] + "##" + BASE[12:]
    docs = [
        (1, BASE),
        (2, shifted),   # ed=4 (pure insertions)
        (3, over),      # ed=5 — excluded
        (4, twin),      # ed=2, same length as 1
        (5, "abc"),     # len <= tau: out of tier scope
        (6, "abc"),     # even though exactly equal to 5
        (7, BASE),      # ed=0 exact dup — still a pair
    ]
    spark.createDataFrame(docs, "doc_id long, text string").write.parquet(
        os.path.join(root, "documents.parquet")
    )
    return root


def test_pairs_and_exclusions(spark, layout):
    rows = {
        (r["a_id"], r["b_id"]): r["ed"]
        for r in q_dedup_editdist(spark, layout).collect()
    }
    # insertion-displaced pair caught at the full shift
    assert rows[(1, 2)] == 4
    assert rows[(2, 7)] == 4
    # exact dup is distance 0
    assert rows[(1, 7)] == 0
    # equal-length twin found once, ed exact
    assert rows[(1, 4)] == 2
    assert rows[(4, 7)] == 2
    # over-threshold and sub-tau-length docs never appear
    assert all(3 not in p and 5 not in p and 6 not in p for p in rows)
    # twin-vs-shifted: 2 subs + 4 inserts = ed 6 — absent
    assert (2, 4) not in rows
    assert len(rows) == 5


def test_window_bound_is_tau(spark, layout):
    """tau+1 leading insertions push every segment one past the probe
    window; blocking correctly has no obligation there (ed > tau anyway),
    pinning that the +-tau window matches the threshold it serves."""
    assert EDITDIST_TAU == 4
    with_5 = "VWXYZ" + BASE  # ed=5
    extra = [(1, BASE), (2, with_5)]
    import tempfile

    root = tempfile.mkdtemp(prefix="editdist2_")
    spark.createDataFrame(extra, "doc_id long, text string").write.parquet(
        os.path.join(root, "documents.parquet")
    )
    assert q_dedup_editdist(spark, root).count() == 0


def test_blocking_is_equi_join(spark, layout):
    """The whole point of Pass-Join blocking: candidate generation must
    plan as an EQUI join on the segment key — never a nested-loop/cartesian
    over doc pairs (the O(n^2) this tier exists to avoid)."""
    from rosbag2parquet_spark.plans.inspect import physical_plan

    plan = physical_plan(q_dedup_editdist(spark, layout))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_scrub_dup_spans_boilerplate(spark, tmp_path):
    """The removal semantics on crafted docs: a 7-word paragraph shared by
    two docs is deleted from BOTH while each doc's unique prose survives;
    within one doc, only tokens covered by a duplicated 5-window go; a doc
    with no duplicated span is untouched."""
    import os

    from rosbag2parquet_spark.functions.dedup import q_scrub_dup_spans

    boiler = "please subscribe to our newsletter for more updates"  # 8 words
    docs = [
        (1, "alpha beta gamma delta " + boiler),
        (2, boiler + " epsilon zeta eta theta"),
        (3, "one two three four five six seven eight nine"),
    ]
    root = str(tmp_path / "lay")
    spark.createDataFrame(docs, "doc_id long, text string").write.parquet(
        os.path.join(root, "documents.parquet")
    )
    out = {
        r["doc_id"]: (r["n_tokens"], r["n_removed"], r["clean_text"])
        for r in q_scrub_dup_spans(spark, root).collect()
    }
    # every 5-window inside the shared 8-word run occurs in both docs ->
    # all 8 boilerplate tokens are covered in each; unique prose survives
    assert out[1] == (12, 8, "alpha beta gamma delta")
    assert out[2] == (12, 8, "epsilon zeta eta theta")
    # untouched doc comes back verbatim
    assert out[3] == (9, 0, "one two three four five six seven eight nine")


def test_editdist_fuzz_against_dp(spark, tmp_path):
    """30 seeded random pairs, each a base string plus <=6 random
    character edits, ground-truthed by a local DP levenshtein: every pair
    with true ed <= tau MUST be found with the exact distance (blocking
    has no permitted misses), and no reported distance may disagree with
    the DP. Each pair gets a disjoint id-token prefix so cross-pair
    near-matches can't occur by construction."""
    import os
    import random

    from rosbag2parquet_spark.functions.dedup import (
        EDITDIST_TAU,
        q_dedup_editdist,
    )

    def dp(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1,
                        prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    rng = random.Random(42)
    alpha = "abcdefghij"
    docs, expected = [], {}
    for k in range(30):
        base = f"pair{k:02d}x" + "".join(
            rng.choice(alpha) for _ in range(rng.randint(20, 60))
        )
        s = list(base)
        for _ in range(rng.randint(0, 6)):
            op = rng.choice("ins del sub".split())
            p = rng.randrange(len(s))
            if op == "ins":
                s.insert(p, rng.choice(alpha))
            elif op == "del" and len(s) > 10:
                del s[p]
            else:
                s[p] = rng.choice(alpha)
        other = "".join(s)
        a_id, b_id = 2 * k, 2 * k + 1
        docs += [(a_id, base), (b_id, other)]
        ed = dp(base, other)
        if ed <= EDITDIST_TAU:
            expected[(a_id, b_id)] = ed

    root = str(tmp_path / "lay")
    spark.createDataFrame(docs, "doc_id long, text string").write.parquet(
        os.path.join(root, "documents.parquet")
    )
    texts = dict(docs)
    got = {
        (r["a_id"], r["b_id"]): r["ed"]
        for r in q_dedup_editdist(spark, root).collect()
    }
    # exact recall: every true <=tau pair found with the right distance
    for pair, ed in expected.items():
        assert got.get(pair) == ed, f"missed/wrong {pair}: {got.get(pair)} != {ed}"
    # soundness: everything reported matches the DP truth
    for (a, b), ed in got.items():
        assert dp(texts[a], texts[b]) == ed
    assert expected, "fuzz produced no <=tau pairs — broaden the generator"
