"""Round-13 fixes and seams.

Covers the round-12 ADVICE items on sources/versioned.py — the
schema-changing-overwrite Bloom property reset (medium), the
merge-path Bloom probe dtype gate (low), URL-encoded input_file_name
URIs on exotic table paths (low), and the vacuumed-legacy-checkpoint
property loss (low) — plus the round-12 verdict tasks that live at
test level: the cross-process commit race, reliable checkpointing for
iterative operators, the AQE skew-join gate, MERGE schema evolution,
and the JDBC sink contract.
"""

from __future__ import annotations

import json
import os

import pytest

from covid_19_data_engineering_spark.sources.versioned import (
    _checkpoint_path,
    compact_versioned,
    delete_versioned,
    merge_versioned,
    read_versioned,
    table_bloom_cols,
    table_versions,
    vacuum_versioned,
    write_versioned,
)


def _kv(spark, rows):
    return spark.createDataFrame(rows, "k long, v string")


# --------------------------------------------------------------------------
# ADVICE medium: schema-changing overwrite must RESET the bloom_cols
# property, and a stale declaration must never crash the index build.
# --------------------------------------------------------------------------

def test_overwrite_resets_bloom_property_and_compact_survives(spark, tmp_path):
    path = str(tmp_path / "t")
    write_versioned(_kv(spark, [(1, "a"), (2, "b")]), path, bloom_cols=["k"])
    assert table_bloom_cols(path) == ["k"]
    # plain overwrite with a DIFFERENT schema, no bloom_cols restated
    new = spark.createDataFrame([(10, 1.5)], "x long, y double")
    write_versioned(new, path, mode="overwrite")
    assert table_bloom_cols(path) == []
    # pre-fix this crashed: compact consulted the stale property and
    # built a Bloom filter on the vanished column `k`
    v = compact_versioned(spark, path)
    assert v == 3
    assert [r["x"] for r in read_versioned(spark, path).collect()] == [10]


def test_stale_bloom_declaration_is_narrowed_not_fatal(spark, tmp_path):
    """Belt-and-braces half of the fix: even when a caller passes a
    bloom_cols list naming a column the frame lacks, the build narrows
    to present columns instead of raising, and the recorded property
    matches what was actually indexed."""
    path = str(tmp_path / "t")
    df = spark.createDataFrame([(1, "a")], "k long, v string")
    write_versioned(df, path, bloom_cols=["k", "ghost"])
    assert table_bloom_cols(path) == ["k"]


def test_alter_column_type_rearms_bloom_index(spark, tmp_path):
    from covid_19_data_engineering_spark.sources.versioned import (
        alter_versioned_column_type,
        snapshot_pruned_files,
    )

    path = str(tmp_path / "t")
    write_versioned(_kv(spark, [(1, "a"), (2, "b")]), path, bloom_cols=["k"])
    alter_versioned_column_type(spark, path, "k", "int")
    # the managed rewrite restates the property (an unmanaged overwrite
    # would reset it) and the rebuilt filter still answers point probes
    assert table_bloom_cols(path) == ["k"]
    v = table_versions(path)[-1]
    kept = snapshot_pruned_files(path, v, point={"k": 999_999})
    assert kept == []  # absent key provably misses every file


# --------------------------------------------------------------------------
# ADVICE low: merge's Bloom probe must be gated on key dtype — a float
# key's str() diverges from Spark's CAST AS STRING and the resulting
# false negative would skip the containing file, leaving a DUPLICATE.
# --------------------------------------------------------------------------

def test_merge_bloom_probe_gated_on_float_key_dtype(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.createDataFrame([(1e20, "a"), (2.0, "b")], "k double, v string")
    write_versioned(df, path, bloom_cols=["k"])
    # str(1e20) = '1e+20' but the build side hashed '1.0E20' — pre-fix
    # the probe false-negatived, the file was carried untouched, and the
    # merge INSERTED a duplicate k=1e20 row beside the stale one
    merge_versioned(spark, path,
                    spark.createDataFrame([(1e20, "A")], "k double, v string"),
                    key="k")
    rows = {(r["k"], r["v"]) for r in read_versioned(spark, path).collect()}
    assert rows == {(1e20, "A"), (2.0, "b")}


def test_merge_bloom_probe_gated_on_bool_key_dtype(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.createDataFrame([(True, "a"), (False, "b")],
                               "k boolean, v string")
    write_versioned(df, path, bloom_cols=["k"])  # str(True)='True' vs 'true'
    merge_versioned(spark, path,
                    spark.createDataFrame([(True, "A")], "k boolean, v string"),
                    key="k")
    rows = {(r["k"], r["v"]) for r in read_versioned(spark, path).collect()}
    assert rows == {(True, "A"), (False, "b")}


def test_merge_bloom_probe_still_prunes_int_keys(spark, tmp_path):
    """The gate must not disable pruning where the contract holds: an
    int-keyed upsert still carries untouched files by reference."""
    path = str(tmp_path / "t")
    base = spark.range(0, 1000).selectExpr("id AS k", "CAST(id AS STRING) AS v")
    write_versioned(base.repartition(8), path, bloom_cols=["k"])
    v = merge_versioned(
        spark, path,
        spark.createDataFrame([(3, "X")], "k long, v string"), key="k")
    from covid_19_data_engineering_spark.sources.versioned import _read_commit

    c = _read_commit(path, v)
    assert c["files_carried"] >= 1  # at least one file untouched
    assert read_versioned(spark, path).where("k = 3").collect()[0]["v"] == "X"


# --------------------------------------------------------------------------
# ADVICE low: DELETE on a table path containing spaces / non-ASCII —
# input_file_name() URL-encodes such paths.
# --------------------------------------------------------------------------

def test_delete_versioned_on_path_with_spaces_and_unicode(spark, tmp_path):
    path = str(tmp_path / "w i t h spaces" / "tàble")
    write_versioned(_kv(spark, [(1, "a"), (2, "b"), (3, "c")]), path)
    delete_versioned(spark, path, "k = 2")
    rows = sorted(r["k"] for r in read_versioned(spark, path).collect())
    assert rows == [1, 3]  # pre-fix: touched=[] and k=2 silently survived


def test_bloom_index_builds_on_path_with_spaces(spark, tmp_path):
    from covid_19_data_engineering_spark.sources.versioned import (
        snapshot_pruned_files,
    )

    path = str(tmp_path / "bloom dir" / "t")
    write_versioned(_kv(spark, [(1, "a"), (2, "b")]), path, bloom_cols=["k"])
    kept = snapshot_pruned_files(path, 1, point={"k": 424242})
    assert kept == []


# --------------------------------------------------------------------------
# Round-12 verdict #2: the optimistic-commit protocol across REAL process
# boundaries — two subprocess appenders racing a subprocess pruned MERGE,
# and a subprocess reader racing vacuum. The threaded races in
# test_versioned.py share one JVM; the deployment shape is separate jobs.
# --------------------------------------------------------------------------

_WORKER = os.path.join(os.path.dirname(__file__), "race_worker.py")


def _spawn(*args):
    import subprocess
    import sys as _sys

    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(_WORKER))
    return subprocess.Popen(
        [_sys.executable, _WORKER, *[str(a) for a in args]],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True)



def test_cross_process_appends_race_pruned_merge(spark, tmp_path):
    path = str(tmp_path / "t")
    seed = spark.createDataFrame(
        [(k, "base") for k in range(10)], "k long, v string")
    write_versioned(seed.repartition(4), path)

    n_appends = 6
    procs = [
        _spawn("append", path, "A", n_appends, 100),
        _spawn("append", path, "B", n_appends, 200),
        _spawn("merge", path, 5),
    ]
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err[-2000:]}"

    # no lost update: every commit from every process landed exactly once
    rows = {(r["k"], r["v"])
            for r in read_versioned(spark, path).collect()}
    expect = (
        {(k, "merged") for k in range(5)}
        | {(k, "base") for k in range(5, 10)}
        | {(100 + i, f"A:{i}") for i in range(n_appends)}
        | {(200 + i, f"B:{i}") for i in range(n_appends)}
    )
    assert rows == expect
    # exactly seed + 12 appends + 1 merge commits — a lost race retries
    # into a NEW slot, never double-commits or erases a slot
    assert len(table_versions(path)) == 1 + 2 * n_appends + 1



def test_cross_process_reader_never_sees_torn_snapshot_under_vacuum(
        spark, tmp_path):
    path = str(tmp_path / "t")
    write_versioned(_kv(spark, [(0, "seed")]), path)
    reader = _spawn("read", path, 25)
    # appends + repeated vacuums racing the reader; default retention
    # spares young unreferenced files, so a reader planning the latest
    # snapshot must never hit a deleted file or a shrinking table
    for i in range(1, 13):
        write_versioned(_kv(spark, [(i, "x")]), path, mode="append")
        if i % 3 == 0:
            vacuum_versioned(path, keep_versions=2)
    out, err = reader.communicate(timeout=600)
    assert reader.returncode == 0, f"reader failed:\n{out}\n{err[-2000:]}"
    counts = [int(line.split("=")[1]) for line in out.splitlines()
              if line.startswith("count=")]
    assert len(counts) == 25 and counts == sorted(counts)


# --------------------------------------------------------------------------
# Seeded model check over the round-13 semantics: vacuum interleaved with
# the rewrite ops, and the bloom_cols property's full transition system
# (restated by managed rewrites, reset by plain overwrite, preserved by
# vacuum through the anchor checkpoint).
# --------------------------------------------------------------------------

def test_mutation_sequence_with_vacuum_and_property_model(spark, tmp_path):
    import random

    def snapshot(path) -> dict:
        return {r["k"]: r["v"]
                for r in read_versioned(spark, path).collect()}

    for seed in (7, 23):
        rng = random.Random(seed)
        model = {k: rng.randint(0, 99) for k in range(30)}
        prop = ["k"]
        path = str(tmp_path / f"seq_{seed}")
        write_versioned(
            spark.createDataFrame(list(model.items()), "k long, v long")
            .repartitionByRange(6, "k"),
            path, bloom_cols=prop)
        fresh = 1000
        for step in range(8):
            op = rng.choice(("merge", "delete", "append", "compact",
                             "vacuum", "overwrite"))
            if op == "merge":
                upd = {k: rng.randint(0, 99)
                       for k in rng.sample(sorted(model), min(3, len(model)))}
                upd[fresh] = rng.randint(0, 99)
                fresh += 1
                merge_versioned(
                    spark, path,
                    spark.createDataFrame(list(upd.items()),
                                          "k long, v long"), key="k")
                model.update(upd)  # managed rewrite restates the property
            elif op == "delete":
                r = rng.randrange(5)
                delete_versioned(spark, path, f"v % 5 = {r}")
                model = {k: v for k, v in model.items() if v % 5 != r}
            elif op == "append":
                rows = {fresh + i: rng.randint(0, 99) for i in range(3)}
                fresh += 10
                write_versioned(
                    spark.createDataFrame(list(rows.items()),
                                          "k long, v long"),
                    path, mode="append")
                model.update(rows)
            elif op == "compact":
                compact_versioned(spark, path, target_files=3)
            elif op == "vacuum":
                # data and the bloom property must both survive history
                # truncation (the anchor checkpoint carries the property)
                vacuum_versioned(path, keep_versions=2, retention_s=0.0)
            else:  # plain overwrite: fresh snapshot, random property fate
                model = {fresh + i: rng.randint(0, 99) for i in range(10)}
                fresh += 20
                restate = rng.random() < 0.5
                write_versioned(
                    spark.createDataFrame(list(model.items()),
                                          "k long, v long")
                    .repartitionByRange(4, "k"),
                    path, mode="overwrite",
                    bloom_cols=["k"] if restate else None)
                prop = ["k"] if restate else []
            assert snapshot(path) == model, (seed, step, op)
            assert table_bloom_cols(path) == prop, (seed, step, op)


# --------------------------------------------------------------------------
# Round-12 verdict #7: additive schema evolution THROUGH the file-pruned
# MERGE path (it was append-only before) and through the change feed
# across the evolution boundary.
# --------------------------------------------------------------------------

def test_merge_schema_evolution_through_merge(spark, tmp_path):
    from covid_19_data_engineering_spark.sources.versioned import (
        _read_commit,
        read_change_feed,
    )

    path = str(tmp_path / "t")
    base = spark.range(0, 1000).selectExpr(
        "id AS k", "CAST(id AS STRING) AS v")
    write_versioned(base.repartition(8), path)
    updates = spark.createDataFrame(
        [(3, "X", 1.5), (2000, "new", 2.5)], "k long, v string, score double")
    v2 = merge_versioned(spark, path, updates, key="k", merge_schema=True)

    snap = read_versioned(spark, path)
    assert snap.columns == ["k", "v", "score"]
    rows = {r["k"]: (r["v"], r["score"]) for r in snap.collect()}
    assert len(rows) == 1001
    assert rows[3] == ("X", 1.5) and rows[2000] == ("new", 2.5)
    assert rows[7] == ("7", None)  # pre-evolution row null-fills
    # file pruning survived the evolution: untouched files carried
    assert _read_commit(path, v2)["files_carried"] >= 1
    # time travel keeps the pre-evolution schema
    assert read_versioned(spark, path, version=1).columns == ["k", "v"]
    # the change feed aligns by name across the boundary: deletes from
    # the rewritten pre-evolution files null-fill the new column
    feed = read_change_feed(spark, path, from_version=1).collect()
    dels = [r for r in feed if r["_change_type"] == "delete"]
    ins = [r for r in feed if r["_change_type"] == "insert"]
    assert all(r["score"] is None for r in dels)
    assert {r["k"] for r in ins} >= {3, 2000}
    assert {(r["k"], r["score"]) for r in ins
            if r["k"] in (3, 2000)} == {(3, 1.5), (2000, 2.5)}


def test_merge_schema_merge_rejects_drops_and_retypes(spark, tmp_path):
    path = str(tmp_path / "t")
    write_versioned(_kv(spark, [(1, "a")]), path)
    with pytest.raises(ValueError, match="drops base columns"):
        merge_versioned(
            spark, path,
            spark.createDataFrame([(1,)], "k long"), key="k",
            merge_schema=True)
    with pytest.raises(ValueError, match="types must match"):
        merge_versioned(
            spark, path,
            spark.createDataFrame([(1, 2)], "k long, v int"), key="k",
            merge_schema=True)
    # without the flag, extra columns are still rejected loudly
    with pytest.raises(ValueError, match="merge schema mismatch"):
        merge_versioned(
            spark, path,
            spark.createDataFrame([(1, "a", 0.5)],
                                  "k long, v string, s double"), key="k")


# --------------------------------------------------------------------------
# Unigram-style tokenizer: Viterbi DP segmentation under the integer
# surrogate objective (fewest pieces, then highest frequency, then
# leftmost-longest) — planted corpus with hand-computed optimum.
# --------------------------------------------------------------------------

def test_unigram_viterbi_planted_optimum(spark):
    from covid_19_data_engineering_spark.operators.unigram import (
        unigram_piece_usage,
    )

    # words: banana x2, nab x1. Optimal segmentations under the
    # objective: banana -> [bana, na] (2 pieces; weights bana=2 + na=5
    # beat ban+ana=6 and ba+nana=4), nab -> [nab] (itself a candidate).
    docs = spark.createDataFrame(
        [(1, "banana banana nab")], "doc_id long, text string")
    rows = {r["piece"]: r["used_total"]
            for r in unigram_piece_usage(docs).collect()}
    assert rows == {"bana": 2, "na": 2, "nab": 1}


def test_unigram_viterbi_deterministic_and_jvm_only(spark):
    from covid_19_data_engineering_spark.operators.unigram import (
        unigram_viterbi_tokens,
    )

    a = [tuple(r) for r in
         unigram_viterbi_tokens(spark, "/root/testdata/sf0.001").collect()]
    b = [tuple(r) for r in
         unigram_viterbi_tokens(spark, "/root/testdata/sf0.001").collect()]
    assert a == b and len(a) == 30
    plan = (unigram_viterbi_tokens(spark, "/root/testdata/sf0.001")
            ._jdf.queryExecution().executedPlan().toString())
    assert "BatchEvalPython" not in plan  # the DP is a JVM fold


def test_unigram_every_word_segmentable(spark):
    from covid_19_data_engineering_spark.operators.unigram import (
        unigram_piece_usage,
    )

    # rare characters only ever seen once: the single-char vocabulary
    # floor must keep every word segmentable (no empty argmin)
    docs = spark.createDataFrame(
        [(1, "xyzzy qqq été")], "doc_id long, text string")
    rows = {r["piece"]: r["used_total"]
            for r in unigram_piece_usage(docs).collect()}
    assert sum(rows.values()) >= 3  # every word produced >= 1 piece


# --------------------------------------------------------------------------
# Metadata-only aggregates: COUNT/MIN/MAX answered from commit-recorded
# footer metadata, surviving the whole mutation surface, with a loud
# None fallback wherever metadata is missing.
# --------------------------------------------------------------------------

def test_metadata_aggregates_track_mutations(spark, tmp_path):
    from covid_19_data_engineering_spark.sources.versioned import (
        snapshot_metadata_aggregates,
    )

    path = str(tmp_path / "t")
    base = spark.createDataFrame(
        [(k, k * 2) for k in range(500)], "k long, v long")
    write_versioned(base.repartitionByRange(6, "k"), path)

    def check():
        agg = snapshot_metadata_aggregates(path, cols=("k", "v"))
        snap = read_versioned(spark, path)
        exact = snap.selectExpr(
            "count(*) AS n", "min(k) AS klo", "max(k) AS khi",
            "min(v) AS vlo", "max(v) AS vhi").collect()[0]
        assert agg["n_rows"] == exact["n"]
        assert agg["min_max"]["k"] == [exact["klo"], exact["khi"]]
        assert agg["min_max"]["v"] == [exact["vlo"], exact["vhi"]]

    check()
    write_versioned(
        spark.createDataFrame([(1000, 7)], "k long, v long"),
        path, mode="append")
    check()
    merge_versioned(
        spark, path,
        spark.createDataFrame([(3, -50), (2000, 9)], "k long, v long"),
        key="k")
    check()  # replace commits: carried rows + rewritten rows recompose
    delete_versioned(spark, path, "k >= 1000")
    check()
    compact_versioned(spark, path, target_files=2)
    check()


def test_metadata_aggregates_none_on_missing_metadata(spark, tmp_path):
    import covid_19_data_engineering_spark.sources.versioned as V

    path = str(tmp_path / "t")
    write_versioned(_kv(spark, [(1, "a"), (2, "b")]), path)
    # simulate a legacy commit (written before rows/stats were recorded)
    cpath = V._commit_path(path, 1)
    with open(cpath) as f:
        c = json.load(f)
    c.pop("rows", None)
    c.pop("stats", None)
    tmp = cpath + ".tmp"
    with open(tmp, "w") as f:
        json.dump(c, f)
    os.replace(tmp, cpath)
    agg = V.snapshot_metadata_aggregates(path, cols=("k",))
    assert agg["n_rows"] is None          # fall back to a scan, loudly
    assert agg["min_max"]["k"] is None
    assert agg["n_files"] >= 1


def test_metadata_aggregates_skip_empty_files(spark, tmp_path):
    from covid_19_data_engineering_spark.sources.versioned import (
        snapshot_metadata_aggregates,
    )

    path = str(tmp_path / "t")
    # force empty partition files beside populated ones
    df = spark.createDataFrame([(5, "x"), (9, "y")], "k long, v string")
    write_versioned(df.repartition(6), path)
    agg = snapshot_metadata_aggregates(path, cols=("k",))
    assert agg["n_rows"] == 2
    assert agg["min_max"]["k"] == [5, 9]


# --------------------------------------------------------------------------
# Round-12 verdict #6: the JDBC warehouse sink seam — contract-pinned
# like the Kafka connector (no driver jar / warehouse in this container;
# SPARK_GRAFT_JDBC_URL drives the live path end-to-end elsewhere).
# --------------------------------------------------------------------------

def test_jdbc_ddl_type_mapping_both_dialects():
    from pyspark.sql import types as T

    from covid_19_data_engineering_spark.sources.jdbc import (
        create_table_column_types,
        spark_type_to_sql,
    )

    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("qty", T.ShortType()),
        T.StructField("price", T.DecimalType(20, 6)),
        T.StructField("ratio", T.DoubleType()),
        T.StructField("name", T.StringType()),
        T.StructField("flag", T.BooleanType()),
        T.StructField("d", T.DateType()),
        T.StructField("ts", T.TimestampType()),
    ])
    assert create_table_column_types(schema, "postgresql") == (
        "id bigint, qty smallint, price numeric(20,6), "
        "ratio double precision, name text, flag boolean, d date, "
        "ts timestamp")
    assert create_table_column_types(schema, "vertica") == (
        "id bigint, qty smallint, price numeric(20,6), ratio float, "
        "name varchar(65000), flag boolean, d date, ts timestamp")
    with pytest.raises(ValueError, match="flat relational"):
        spark_type_to_sql(T.ArrayType(T.LongType()), "postgresql")
    with pytest.raises(ValueError, match="dialect"):
        spark_type_to_sql(T.LongType(), "oracle")


def test_jdbc_option_contracts():
    from pyspark.sql import types as T

    from covid_19_data_engineering_spark.sources.jdbc import (
        jdbc_read_options,
        jdbc_write_options,
    )

    schema = T.StructType([T.StructField("k", T.LongType()),
                           T.StructField("v", T.StringType())])
    w = jdbc_write_options("jdbc:postgresql://wh:5432/db", "s.t", schema,
                           driver="org.postgresql.Driver")
    assert w == {
        "url": "jdbc:postgresql://wh:5432/db",
        "dbtable": "s.t",
        "batchsize": "10000",
        "isolationLevel": "READ_COMMITTED",
        "createTableColumnTypes": "k bigint, v text",
        "driver": "org.postgresql.Driver",
    }
    r = jdbc_read_options("jdbc:postgresql://wh:5432/db", "s.t",
                          partition_column="k", lower_bound=0,
                          upper_bound=1_000_000, num_partitions=32)
    assert r["partitionColumn"] == "k" and r["numPartitions"] == "32"
    assert r["lowerBound"] == "0" and r["upperBound"] == "1000000"
    with pytest.raises(ValueError, match="together"):
        jdbc_read_options("u", "t", partition_column="k")


def test_jdbc_write_reaches_driver_resolution_seam(spark):
    """Executed, not skipped: without a driver jar the write must fail
    at the JVM's DriverManager resolution — proving the option plumbing
    and writer wiring are real — and with SPARK_GRAFT_JDBC_URL set the
    same call writes a live warehouse table and reads it back."""
    from covid_19_data_engineering_spark.sources.jdbc import (
        live_jdbc_url,
        read_jdbc,
        write_jdbc,
    )

    df = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    url = live_jdbc_url()
    if url:
        write_jdbc(df, url, "spark_graft_jdbc_smoke", mode="overwrite")
        back = read_jdbc(spark, url, "spark_graft_jdbc_smoke")
        assert sorted((r["k"], r["v"]) for r in back.collect()) == [
            (1, "a"), (2, "b")]
        return
    with pytest.raises(Exception) as exc:
        write_jdbc(df, "jdbc:postgresql://localhost:1/nope", "t",
                   mode="append")
    msg = str(exc.value)
    assert ("No suitable driver" in msg
            or "ClassNotFoundException" in msg
            or "CANNOT_FIND_JDBC_DRIVER" in msg), msg


# --------------------------------------------------------------------------
# Round-12 verdict #5: the documented executor-loss-safe cluster posture
# (reliable checkpoint() instead of localCheckpoint) must actually run.
# --------------------------------------------------------------------------

@pytest.mark.parametrize("algorithm", ["star", "label", "auto"])
def test_connected_components_through_reliable_checkpoint(
        spark, tmp_path, algorithm):
    from covid_19_data_engineering_spark.operators.clustering import (
        connected_components,
    )
    from covid_19_data_engineering_spark.operators.lineage import (
        reliable_checkpoint_dir,
        set_reliable_checkpoint_dir,
    )

    # a chain (forces multiple rounds) plus a triangle and a singleton edge
    pairs = [(i, i + 1) for i in range(30)] + [(100, 101), (101, 102),
                                               (100, 102), (200, 200)]
    edges = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    expected = sorted(
        (r["node"], r["component"])
        for r in connected_components(edges, algorithm=algorithm).collect())
    ckpt = str(tmp_path / "ckpt")
    set_reliable_checkpoint_dir(spark, ckpt)
    try:
        got = sorted(
            (r["node"], r["component"])
            for r in connected_components(edges,
                                          algorithm=algorithm).collect())
        # the run actually wrote DFS-backed checkpoint data
        wrote = any(files for _, _, files in os.walk(ckpt))
        assert wrote, "reliable checkpoint dir stayed empty"
    finally:
        set_reliable_checkpoint_dir(spark, None)
    assert got == expected
    assert reliable_checkpoint_dir() is None


# --------------------------------------------------------------------------
# Round-12 verdict #3: the sketch-only production path must actually be
# sketch-only — no exact-distinct expand anywhere in its physical plan.
# --------------------------------------------------------------------------

def test_hourly_sketch_plan_has_no_exact_distinct(spark):
    import pyspark.sql.functions as F

    from covid_19_data_engineering_spark.plans.advanced import (
        hourly_user_sketches,
    )

    e = spark.range(0, 10_000).select(
        (F.col("id") % 97).alias("user_id"),
        F.timestamp_seconds(F.lit(1_700_000_000) + F.col("id")).alias("ts"),
    )
    plan = (hourly_user_sketches(e)
            ._jdf.queryExecution().executedPlan().toString())
    # countDistinct compiles to an Expand node (or a `distinct` marker in
    # the aggregate expressions); the sketch path must carry neither
    assert "Expand" not in plan, plan
    assert "distinct" not in plan.lower().replace("hll_sketch", ""), plan
    assert "hll_sketch_agg" in plan


def test_hourly_sketch_estimates_track_exact(spark):
    import pyspark.sql.functions as F

    from covid_19_data_engineering_spark.plans.advanced import (
        hourly_user_sketches,
    )

    e = spark.range(0, 20_000).select(
        (F.col("id") % 1013).alias("user_id"),
        F.timestamp_seconds(F.lit(1_700_000_000) + F.col("id") % 7200)
        .alias("ts"),
    )
    est = {r["window_start"]: r["approx"] for r in
           hourly_user_sketches(e).select(
               "window_start",
               F.hll_sketch_estimate("sketch").alias("approx")).collect()}
    exact = {r["w"]["start"]: r["x"] for r in
             e.groupBy(F.window("ts", "1 hour").alias("w"))
             .agg(F.countDistinct("user_id").alias("x")).collect()}
    assert est.keys() == exact.keys() and len(est) >= 2
    for w, x in exact.items():
        assert abs(est[w] - x) <= max(5.0, 0.02 * x)


# --------------------------------------------------------------------------
# Round-12 verdict #1: PQ shortlist + exact re-rank must return REAL
# neighbors (the raw-ADC audit operator's top-10 is quantization noise).
# --------------------------------------------------------------------------

@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001",
                                    "/root/testdata/sf0.01"])
def test_pq_rerank_recall_at_10_vs_exact_l2(spark, sf_dir):
    import pyspark.sql.functions as F

    from covid_19_data_engineering_spark.operators.pq import (
        ann_pq_rerank_topk,
    )
    from covid_19_data_engineering_spark.sources.tables import load_table

    got = [r["vec_id"] for r in ann_pq_rerank_topk(spark, sf_dir).collect()]
    emb = load_table(spark, "embeddings", sf_dir).select(
        "vec_id", "embedding")
    q = [float(x) for x in
         emb.where(F.col("vec_id") == 0).first()["embedding"]]
    qlit = F.array(*[F.lit(x) for x in q])
    exact = emb.where("vec_id != 0").select(
        "vec_id",
        F.aggregate(
            F.zip_with(F.col("embedding").cast("array<double>"), qlit,
                       lambda a, b: (a - b) * (a - b)),
            F.lit(0.0), lambda acc, x: acc + x,
        ).alias("d"),
    )
    true10 = [r["vec_id"] for r in
              exact.orderBy("d", "vec_id").limit(10).collect()]
    recall = len(set(true10) & set(got)) / 10
    # measured 1.0 at sf0.001/sf0.01/sf0.1; pinned with margin
    assert recall >= 0.9, f"PQ re-rank recall@10 degraded: {recall}"


# --------------------------------------------------------------------------
# ADVICE low: vacuum must not strand the bloom_cols property behind a
# legacy checkpoint (one written without the key).
# --------------------------------------------------------------------------

def test_vacuum_upgrades_legacy_checkpoint_preserving_bloom_cols(
        spark, tmp_path):
    path = str(tmp_path / "t")
    write_versioned(_kv(spark, [(1, "a")]), path, bloom_cols=["k"])
    for i in range(2, 18):  # appends through the checkpoint at v16
        write_versioned(_kv(spark, [(i, "x")]), path, mode="append")
    cp_path = _checkpoint_path(path, 16)
    assert os.path.exists(cp_path)
    # simulate a pre-r12 checkpoint: strip the property keys
    with open(cp_path) as f:
        record = json.load(f)
    record.pop("bloom_cols", None)
    record.pop("txns", None)
    tmp = cp_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(record, f)
    os.replace(tmp, cp_path)
    vacuum_versioned(path, keep_versions=1, retention_s=0.0)
    # pre-fix: the walk fell off the vacuumed history below the legacy
    # checkpoint and the table silently read as un-indexed
    assert table_bloom_cols(path) == ["k"]
    with open(cp_path) as f:
        upgraded = json.load(f)
    assert upgraded["bloom_cols"] == ["k"]
    assert "txns" in upgraded
