"""Mirror of the driver's correctness gate: every queries() entry must
match its oracle_sql() twin on DuckDB (row count + schema-ish + values,
order-insensitive, columns sorted by name)."""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402

SF_DIR = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.001")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"create view {t} as select * from '{SF_DIR}/{t}.parquet'")
    return con


def _norm(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].astype(str)
        elif "float" in str(pdf[c].dtype):
            pdf[c] = pdf[c].astype("float64").round(6)
        elif "int" in str(pdf[c].dtype).lower():
            pdf[c] = pdf[c].astype("int64")
    return pdf.sort_values(list(pdf.columns), kind="mergesort").reset_index(drop=True)


ORACLES = entrymod.oracle_sql()
QUERIES = entrymod.queries()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_vs_oracle(spark, name):
    got = _norm(QUERIES[name](spark, SF_DIR).toPandas())
    con = _duck()
    exp = _norm(con.sql(ORACLES[name]).df())
    con.close()
    assert list(got.columns) == list(exp.columns), (
        f"{name}: columns {list(got.columns)} vs {list(exp.columns)}")
    assert len(got) == len(exp), f"{name}: {len(got)} vs {len(exp)} rows"
    pd.testing.assert_frame_equal(got, exp, check_dtype=False,
                                  check_exact=False, rtol=0, atol=1e-9)


def test_driver_window_rotation():
    """The driver oracle-checks the first 50 queries() entries; the
    stale-first ordering must (a) keep the pinned core keys up front,
    (b) never lose or duplicate a key, (c) put every key the committed
    artifacts have never covered inside this round's window (up to its
    capacity), and (d) simulated forward, re-cover every key within
    ceil((N - pinned) / (50 - pinned)) rounds."""
    canon = list(entrymod._queries_canonical())
    ordered = list(QUERIES)
    assert sorted(canon) == sorted(ordered)
    pinned = list(entrymod._PINNED)
    assert ordered[:len(pinned)] == pinned
    free = entrymod._WINDOW - len(pinned)

    # (c) this round: never-covered keys all sort into the live window.
    # When there are MORE never-covered keys than free slots (final-round
    # saturation), the window must still be spent entirely on
    # never-covered keys (the minimum-possible spill), and every spilled
    # key must carry committed evidence in the full-surface sweep
    # artifact the driver window cannot provide.
    last = entrymod._coverage_rounds()
    never = [k for k in canon if k not in pinned and last.get(k, 0) == 0]
    window_now = set(ordered[:entrymod._WINDOW])
    if len(never) <= free:
        assert set(never) <= window_now
    else:
        assert all(last.get(k, 0) == 0 for k in ordered[:entrymod._WINDOW]), (
            "window slot wasted on an already-covered key while "
            "never-covered keys spill")
        spilled = sorted(set(never) - window_now)
        assert len(spilled) == len(never) - free
        sweep = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "..", "BENCH", "ORACLE_SWEEP_r05.md")
        with open(sweep) as fh:
            rows = [ln for ln in fh if ln.startswith("|")]
        for k in spilled:
            hit = [ln for ln in rows if f"| {k} |" in ln]
            assert hit and all("OK" in ln for ln in hit), (
                f"spilled key {k} lacks a green committed sweep row")

    # (d) steady state: simulate rounds where each covers its window
    idx = {k: i for i, k in enumerate(canon)}
    rest = [k for k in canon if k not in pinned]
    sim = {k: last.get(k, 0) for k in rest}
    horizon = -(-len(rest) // free)  # ceil
    base_round = max(sim.values(), default=0)
    for r in range(1, horizon + 2):
        order = sorted(rest, key=lambda k: (sim[k], idx[k]))
        for k in order[:free]:
            sim[k] = base_round + r
    assert min(sim.values()) > base_round, (
        "some key never re-enters the window under stale-first rotation")


def test_rows_only_queries_run(spark):
    for name in sorted(set(QUERIES) - set(ORACLES)):
        df = QUERIES[name](spark, SF_DIR)
        assert df.count() >= 0, name


def test_ngram_jaccard_hot_shingle_bounded(spark):
    """Skew guard: one stop-phrase shingle shared by EVERY doc must not
    produce O(docs^2) candidate pairs — the document-frequency cap
    drops it before the self-join, and genuine duplicates (sharing
    plenty of low-DF shingles) still surface."""
    n = 120
    stop = "the quick brown"
    rows = [(i, f"{stop} fox{i} jumps{i} over{i} dog{i} again{i}")
            for i in range(n)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    assert entrymod.ngram_jaccard_pairs(docs).count() == 0
    rows.append((n, rows[0][1]))  # a true duplicate of doc 0
    docs2 = spark.createDataFrame(rows, "doc_id long, text string")
    got = entrymod.ngram_jaccard_pairs(docs2).collect()
    assert [(r.doc_a, r.doc_b) for r in got] == [(0, n)]
    assert got[0].jaccard == 1.0


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert len(df.schema.fields) > 0


def test_connected_components_chain_and_cliques(spark):
    """Hash-min components: a 5-node chain (worst diameter) collapses
    to one cluster with min-id representative; disjoint pairs stay
    separate; drop_near_duplicates keeps exactly the representatives."""
    from vrtility_spark.dedup import (
        connected_components, dedup_clusters, drop_near_duplicates,
    )
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (20, 21), (21, 20)],
        "doc_a long, doc_b long")
    comp = {r.id: r.comp for r in
            connected_components(edges, "doc_a", "doc_b").collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1,
                    10: 10, 11: 10, 20: 20, 21: 20}
    cl = dedup_clusters(edges).toPandas()
    assert dict(zip(cl.doc_id, cl.cluster_size)) == {
        1: 5, 2: 5, 3: 5, 4: 5, 5: 5, 10: 2, 11: 2, 20: 2, 21: 2}
    corpus = spark.range(0, 25).withColumnRenamed("id", "doc_id")
    kept = {r.doc_id for r in
            drop_near_duplicates(corpus, edges).collect()}
    assert kept == set(range(25)) - {2, 3, 4, 5, 11, 21}


def test_reliable_checkpoint_requires_dir(spark):
    """Without a context checkpoint dir, reliable=True raises a clear
    error instead of Spark's deep-stack SparkException. (Defined BEFORE
    the reliable-CC test: that one sets the context-global dir.)"""
    import pytest

    from vrtility_spark.checkpointing import truncate_lineage

    if spark.sparkContext.getCheckpointDir() is None:
        with pytest.raises(ValueError, match="checkpoint directory"):
            truncate_lineage(spark.range(3), reliable=True)


def test_connected_components_reliable_checkpoint(spark, tmp_path):
    """reliable=True runs CC on durable checkpoints: labels identical
    to the local path, lineage truncated (the result plan reads the
    checkpointed RDD, not the edge pipeline), and the checkpoint files
    actually land in the durable dir — the 100-TB fault-tolerance
    path."""
    import os

    from vrtility_spark.dedup import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (20, 21)],
        "doc_a long, doc_b long")
    ckdir = str(tmp_path / "ck")
    rel = connected_components(edges, "doc_a", "doc_b",
                               reliable=True, checkpoint_dir=ckdir)
    local = connected_components(edges, "doc_a", "doc_b")
    assert ({(r.id, r.comp) for r in rel.collect()}
            == {(r.id, r.comp) for r in local.collect()})
    # durable state exists on disk (per-round RDD checkpoint dirs)
    ckfiles = [os.path.join(dp, f)
               for dp, _dn, fns in os.walk(ckdir) for f in fns]
    assert ckfiles, "reliable CC wrote no checkpoint files"
    # lineage is truncated: the analyzed plan is rooted at a scan of
    # the checkpointed relation, with no join/aggregate replay above it
    plan = rel._jdf.queryExecution().analyzed().toString()
    assert "LogicalRDD" in plan or "Checkpoint" in plan
    assert "Join" not in plan


def test_every_query_has_an_oracle_and_bench_key():
    """Surface congruence: every queries() key carries a value-exact
    oracle twin, and bench.py benches every key (minus the one
    documented exclusion) so correctness and performance surfaces
    cannot drift apart."""
    assert set(ORACLES) == set(QUERIES)
    import importlib
    bench = importlib.import_module("bench")
    assert set(bench.BENCH_QUERIES) == set(QUERIES) - {
        "image_median_composite"}
