"""Multi-format source/sink round-trips (sources/formats.py).

Each format round-trips a typed DataFrame through disk; partitioned writes
must produce a prunable directory layout; schemaless formats must refuse
inference-by-default.
"""

from __future__ import annotations

import os

import pytest

from covid_19_data_engineering_spark.sources.formats import read_table, write_table

SCHEMA = "k long, name string, price double, flag boolean"


@pytest.fixture()
def sample(spark):
    rows = [(1, "alpha", 1.5, True), (2, "beta", 2.25, False),
            (3, "gamma", -0.5, True), (4, "delta", 0.0, None)]
    return spark.createDataFrame(rows, SCHEMA)


@pytest.mark.parametrize("fmt", ["parquet", "orc", "json", "csv", "avro"])
def test_round_trip(fmt, spark, sample, tmp_path):
    path = str(tmp_path / f"rt_{fmt}")
    write_table(sample, path, fmt=fmt)
    back = read_table(spark, path, fmt=fmt,
                      schema=None if fmt in ("parquet", "orc", "avro")
                      else SCHEMA)
    got = sorted(tuple(r) for r in back.collect())
    want = sorted(tuple(r) for r in sample.collect())
    assert got == want
    assert dict(back.dtypes) == dict(sample.dtypes)


def test_partitioned_write_prunes_layout(spark, sample, tmp_path):
    path = str(tmp_path / "parts")
    write_table(sample, path, fmt="parquet", partition_by=("flag",))
    dirs = {d for d in os.listdir(path) if d.startswith("flag=")}
    assert dirs == {"flag=true", "flag=false", "flag=__HIVE_DEFAULT_PARTITION__"}
    # a filter on the partition column must become a PartitionFilter, not a scan
    df = read_table(spark, path).where("flag = true")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "isnotnull(flag" in plan
    assert {r["k"] for r in df.collect()} == {1, 3}


def test_schemaless_formats_require_schema(spark, tmp_path):
    for fmt in ("json", "csv"):
        with pytest.raises(ValueError, match="not self-describing"):
            read_table(spark, str(tmp_path), fmt=fmt)


def test_unknown_format_rejected(spark, sample, tmp_path):
    with pytest.raises(ValueError, match="unknown format"):
        write_table(sample, str(tmp_path / "x"), fmt="xml")


def test_max_records_per_file_splits(spark, tmp_path):
    df = spark.range(1000).withColumnRenamed("id", "k")
    path = str(tmp_path / "split")
    write_table(df.repartition(1), path, fmt="parquet", max_records_per_file=100)
    files = [f for f in os.listdir(path) if f.endswith(".parquet")]
    assert len(files) >= 10  # 1000 rows / 100-per-file cap


# --------------------------------------------------------------------------
# Avro container format (sources/avrofmt.py — pure-stdlib OCF codec)
# --------------------------------------------------------------------------


def test_avro_interop_with_jvm_reference_reader(spark, tmp_path):
    """Files written by the stdlib codec must parse with Apache Avro's own
    JVM reference implementation (avro-1.12.1.jar ships in Spark core) —
    the strongest available pin that the OCF bytes are spec-correct."""
    import pyspark.sql.functions as F

    df = spark.range(100).select(
        F.col("id").alias("k"),
        (F.col("id") * 1.5).alias("v"),
        F.concat(F.lit("s"), F.col("id")).alias("name"),
        F.when(F.col("id") % 5 == 0, None)
        .otherwise(F.col("id") % 2 == 0).alias("flag"),
    )
    path = str(tmp_path / "jvm_check")
    write_table(df.repartition(3), path, fmt="avro")

    jvm = spark._jvm
    total, ks = 0, []
    for fname in sorted(os.listdir(path)):
        if not fname.endswith(".avro"):
            continue
        reader = jvm.org.apache.avro.file.DataFileReader(
            jvm.java.io.File(os.path.join(path, fname)),
            jvm.org.apache.avro.generic.GenericDatumReader())
        while reader.hasNext():
            rec = reader.next()
            ks.append(rec.get("k"))
            total += 1
        reader.close()
    assert total == 100
    assert sorted(ks) == list(range(100))


def test_avro_reads_jvm_written_file(spark, tmp_path):
    """The reverse direction: a container file written by the JVM
    reference implementation must read back through the stdlib codec."""
    from pyspark.sql import types as T

    from covid_19_data_engineering_spark.sources.avrofmt import read_avro

    jvm = spark._jvm
    schema_json = (
        '{"type":"record","name":"r","fields":['
        '{"name":"k","type":"long"},'
        '{"name":"name","type":["null","string"]}]}'
    )
    avro_schema = jvm.org.apache.avro.Schema.Parser().parse(schema_json)
    path = str(tmp_path / "jvm_written")
    os.makedirs(path)
    writer = jvm.org.apache.avro.file.DataFileWriter(
        jvm.org.apache.avro.generic.GenericDatumWriter(avro_schema))
    writer.create(avro_schema,
                  jvm.java.io.File(os.path.join(path, "jvm.avro")))
    for i in range(10):
        rec = jvm.org.apache.avro.generic.GenericData.Record(avro_schema)
        rec.put("k", i)
        rec.put("name", None if i % 3 == 0 else f"row{i}")
        writer.append(rec)
    writer.close()

    back = read_avro(spark, path)
    assert back.schema == T.StructType([
        T.StructField("k", T.LongType(), False),
        T.StructField("name", T.StringType(), True)])
    rows = sorted((r["k"], r["name"]) for r in back.collect())
    assert rows == [(i, None if i % 3 == 0 else f"row{i}")
                    for i in range(10)]


def test_avro_deflate_codec_and_timestamps(spark, tmp_path):
    """deflate-compressed blocks plus timestamp/date/array columns
    round-trip; the JVM reader also accepts the deflate file."""
    import pyspark.sql.functions as F

    from covid_19_data_engineering_spark.sources.avrofmt import (
        read_avro,
        write_avro,
    )

    df = spark.range(50).select(
        F.col("id").alias("k"),
        F.timestamp_seconds(F.col("id") * 86400 + 1234).alias("ts"),
        F.date_add(F.lit("2024-01-01").cast("date"),
                   F.col("id").cast("int")).alias("d"),
        F.array(F.col("id") * 1.0, F.col("id") * 2.0).alias("vec"),
    )
    path = str(tmp_path / "deflate")
    write_avro(df, path, codec="deflate")
    back = read_avro(spark, path)
    assert sorted(map(tuple, back.collect())) == \
        sorted(map(tuple, df.collect()))

    jvm = spark._jvm
    fname = next(f for f in sorted(os.listdir(path))
                 if f.endswith(".avro"))
    reader = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(os.path.join(path, fname)),
        jvm.org.apache.avro.generic.GenericDatumReader())
    n = sum(1 for _ in iter(reader.hasNext, False) if reader.next() or True)
    reader.close()
    assert n > 0


def test_avro_write_modes(spark, sample, tmp_path):
    path = str(tmp_path / "modes")
    write_table(sample, path, fmt="avro")
    with pytest.raises(ValueError, match="path exists"):
        write_table(sample, path, fmt="avro", mode="error")
    write_table(sample, path, fmt="avro", mode="overwrite")
    back = read_table(spark, path, fmt="avro")
    assert back.count() == 4
    # append would silently REPLACE files under the deterministic
    # part-{pid:05d} naming — it must be rejected, not fall through
    with pytest.raises(ValueError, match="append.*not supported|mode 'append'"):
        write_table(sample, path, fmt="avro", mode="append")
    # ignore skips the write entirely when the directory exists
    write_table(sample.limit(1), path, fmt="avro", mode="ignore")
    assert read_table(spark, path, fmt="avro").count() == 4


def test_avro_union_value_first_branch_order(spark, tmp_path):
    """A spec-legal [T, "null"] union (value = branch 0, null = branch 1)
    must decode by the FILE's branch order — assuming index 0 is null
    would turn every value into None and desync the block stream."""
    from covid_19_data_engineering_spark.sources.avrofmt import read_avro

    jvm = spark._jvm
    schema_json = (
        '{"type":"record","name":"r","fields":['
        '{"name":"k","type":"long"},'
        '{"name":"name","type":["string","null"]}]}'
    )
    avro_schema = jvm.org.apache.avro.Schema.Parser().parse(schema_json)
    path = str(tmp_path / "value_first_union")
    os.makedirs(path)
    writer = jvm.org.apache.avro.file.DataFileWriter(
        jvm.org.apache.avro.generic.GenericDatumWriter(avro_schema))
    writer.create(avro_schema,
                  jvm.java.io.File(os.path.join(path, "jvm.avro")))
    for i in range(10):
        rec = jvm.org.apache.avro.generic.GenericData.Record(avro_schema)
        rec.put("k", i)
        rec.put("name", None if i % 3 == 0 else f"row{i}")
        writer.append(rec)
    writer.close()

    back = read_avro(spark, path)
    rows = sorted((r["k"], r["name"]) for r in back.collect())
    assert rows == [(i, None if i % 3 == 0 else f"row{i}")
                    for i in range(10)]


def test_avro_empty_frame_roundtrip(spark, sample, tmp_path):
    """An empty frame still writes a schema-only container so a
    schemaless read recovers the schema instead of failing on an
    .avro-less directory."""
    path = str(tmp_path / "empty_rt")
    empty = sample.limit(0)
    write_table(empty, path, fmt="avro")
    back = read_table(spark, path, fmt="avro")
    assert back.count() == 0
    assert [f.name for f in back.schema.fields] == \
        [f.name for f in sample.schema.fields]
