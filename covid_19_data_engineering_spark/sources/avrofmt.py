"""Avro Object Container File source/sink — pure stdlib, no connector jar.

The data-exchange format the reference's warehouse peers speak
(tdiprima/covid-19-data-engineering lands CSV and delegates storage —
SURVEY §2 A-extensions); Spark's own `format("avro")` lives in the
external spark-avro module, which (like the Kafka connector) does not
ship in Spark core. Rather than carrying a jar-class gap, this module
implements the Avro 1.x Object Container File format from the public
specification (avro.apache.org/docs/current/specification) the same way
the multimodal layer implements PPM/BMP/PNG/JPEG/WAV/Y4M: stdlib binary
codecs behind the Arrow seam.

Coverage: flat records of the Avro primitives (null, boolean, int, long,
float, double, bytes, string), the timestamp-micros / date logical
types, nullable fields as ["null", T] unions, and arrays of primitives
(the `array<double>` embeddings column). Deflate codec on write is
supported via stdlib zlib; "null" is the default.

Correctness is pinned two ways (tests/test_formats.py):
- round-trip: write with this codec, read back, rows identical;
- interop: files written here parse with Apache Avro's own JVM
  reference implementation (avro-1.12.1.jar ships in Spark core), and
  files written by the JVM implementation read back here.

Scale posture:
- the WRITE is one distributed job: each partition encodes its rows and
  writes one container file (mapInPandas; Arrow transport; the returned
  manifest is one row per partition). Files land on a filesystem every
  executor can reach — same contract as any Spark file sink.
- the READ parallelizes per file (binaryFile source + mapInPandas
  decode). Avro blocks are sync-marker-delimited so a splitting reader
  is possible; per-file parallelism matches how Spark schedules
  moderate-sized container files, and max_records_per_file on the write
  side is the knob that keeps files balanced (SURVEY §3 layout rule).
- the schema comes from ONE O(KB) header read on the driver (the format
  is self-describing); no sampling scan.
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib
from hashlib import md5

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

MAGIC = b"Obj\x01"

# --------------------------------------------------------------------------
# binary primitives (Avro spec: zigzag varint longs, LE IEEE floats)
# --------------------------------------------------------------------------


def _zig(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _unzig(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _w_long(buf: io.BytesIO, n: int) -> None:
    z = _zig(n) & 0xFFFFFFFFFFFFFFFF
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            buf.write(bytes((b | 0x80,)))
        else:
            buf.write(bytes((b,)))
            return


def _r_long(buf: io.BufferedReader) -> int:
    shift = 0
    acc = 0
    while True:
        byte = buf.read(1)
        if not byte:
            raise EOFError("truncated varint")
        b = byte[0]
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            return _unzig(acc)
        shift += 7


def _w_bytes(buf: io.BytesIO, b: bytes) -> None:
    _w_long(buf, len(b))
    buf.write(b)


def _r_bytes(buf: io.BufferedReader) -> bytes:
    n = _r_long(buf)
    out = buf.read(n)
    if len(out) != n:
        raise EOFError("truncated bytes")
    return out


# --------------------------------------------------------------------------
# schema mapping Spark <-> Avro (flat records + primitive arrays)
# --------------------------------------------------------------------------

_PRIM = {
    T.BooleanType(): "boolean",
    T.IntegerType(): "int",
    T.ShortType(): "int",
    T.ByteType(): "int",
    T.LongType(): "long",
    T.FloatType(): "float",
    T.DoubleType(): "double",
    T.StringType(): "string",
    T.BinaryType(): "bytes",
}
_LOGICAL = {
    T.TimestampType(): {"type": "long", "logicalType": "timestamp-micros"},
    T.TimestampNTZType(): {"type": "long",
                           "logicalType": "local-timestamp-micros"},
    T.DateType(): {"type": "int", "logicalType": "date"},
}


def _field_avro_type(dt: T.DataType):
    if dt in _PRIM:
        return _PRIM[dt]
    if dt in _LOGICAL:
        return dict(_LOGICAL[dt])
    if isinstance(dt, T.ArrayType):
        item = dt.elementType
        if item not in _PRIM:
            raise ValueError(f"unsupported avro array item type: {item}")
        return {"type": "array", "items": _PRIM[item]}
    raise ValueError(
        f"unsupported avro field type: {dt} (flat records of primitives, "
        "timestamp/date logical types, and primitive arrays are covered)")


def schema_to_avro(schema: T.StructType, name: str = "spark_row") -> dict:
    fields = []
    for f in schema.fields:
        t = _field_avro_type(f.dataType)
        fields.append({
            "name": f.name,
            "type": ["null", t] if f.nullable else t,
        })
    return {"type": "record", "name": name, "fields": fields}


def avro_to_schema(avro_schema: dict) -> T.StructType:
    rev = {v: k for k, v in _PRIM.items()}

    def one(t) -> tuple[T.DataType, bool]:
        if isinstance(t, list):  # two-branch null union, either order
            inner = [x for x in t if x != "null"]
            if len(t) != 2 or len(inner) != 1:
                raise ValueError(f"unsupported union: {t}")
            dt, _ = one(inner[0])
            return dt, True
        if isinstance(t, str):
            if t not in rev:
                raise ValueError(f"unsupported avro type: {t}")
            return rev[t], False
        lt = t.get("logicalType")
        if lt == "timestamp-micros":
            return T.TimestampType(), False
        if lt == "local-timestamp-micros":
            return T.TimestampNTZType(), False
        if lt == "date":
            return T.DateType(), False
        if t.get("type") == "array":
            item, _ = one(t["items"])
            return T.ArrayType(item, containsNull=False), False
        if lt is not None:  # unknown logical type: fall back to base
            return one(t["type"])
        raise ValueError(f"unsupported avro type: {t}")

    fields = []
    for f in avro_schema["fields"]:
        dt, nullable = one(f["type"])
        fields.append(T.StructField(f["name"], dt, nullable))
    return T.StructType(fields)


# --------------------------------------------------------------------------
# value codecs driven by the SPARK schema (one closure per field, built
# once per file — no per-value type dispatch in the row loop)
# --------------------------------------------------------------------------


def _encoder(dt: T.DataType):
    if dt in (T.IntegerType(), T.ShortType(), T.ByteType(), T.LongType()):
        return lambda buf, v: _w_long(buf, int(v))
    if dt == T.BooleanType():
        return lambda buf, v: buf.write(b"\x01" if v else b"\x00")
    if dt == T.FloatType():
        return lambda buf, v: buf.write(struct.pack("<f", float(v)))
    if dt == T.DoubleType():
        return lambda buf, v: buf.write(struct.pack("<d", float(v)))
    if dt == T.StringType():
        return lambda buf, v: _w_bytes(buf, str(v).encode("utf-8"))
    if dt == T.BinaryType():
        return lambda buf, v: _w_bytes(buf, bytes(v))
    if dt in (T.TimestampType(), T.TimestampNTZType()):
        # pandas Timestamp carries ns; Avro timestamp-micros is a long
        return lambda buf, v: _w_long(buf, v.value // 1000)
    if dt == T.DateType():
        return lambda buf, v: _w_long(buf, v.toordinal() - 719163)
    if isinstance(dt, T.ArrayType):
        item = _encoder(dt.elementType)

        def enc_array(buf, v):
            vals = list(v)
            if vals:
                _w_long(buf, len(vals))
                for x in vals:
                    item(buf, x)
            _w_long(buf, 0)
        return enc_array
    raise ValueError(f"unsupported avro field type: {dt}")


def _decoder(dt: T.DataType):
    if dt in (T.IntegerType(), T.ShortType(), T.ByteType(), T.LongType()):
        return _r_long
    if dt == T.BooleanType():
        return lambda buf: buf.read(1) == b"\x01"
    if dt == T.FloatType():
        return lambda buf: struct.unpack("<f", buf.read(4))[0]
    if dt == T.DoubleType():
        return lambda buf: struct.unpack("<d", buf.read(8))[0]
    if dt == T.StringType():
        return lambda buf: _r_bytes(buf).decode("utf-8")
    if dt == T.BinaryType():
        return _r_bytes
    if dt in (T.TimestampType(), T.TimestampNTZType()):
        import pandas as pd
        return lambda buf: pd.Timestamp(_r_long(buf) * 1000)
    if dt == T.DateType():
        import datetime
        return lambda buf: datetime.date.fromordinal(_r_long(buf) + 719163)
    if isinstance(dt, T.ArrayType):
        item = _decoder(dt.elementType)

        def dec_array(buf):
            out = []
            while True:
                n = _r_long(buf)
                if n == 0:
                    return out
                if n < 0:  # block with byte-size prefix (spec-legal)
                    n = -n
                    _r_long(buf)
                for _ in range(n):
                    out.append(item(buf))
        return dec_array
    raise ValueError(f"unsupported avro field type: {dt}")


# --------------------------------------------------------------------------
# container file write / read
# --------------------------------------------------------------------------

_BLOCK_RECORDS = 4096


def encode_container(pdf, schema: T.StructType, sync: bytes,
                     codec: str = "null") -> bytes:
    """One Avro OCF as bytes from a pandas batch under a Spark schema."""
    import pandas as pd

    avro_schema = schema_to_avro(schema)
    head = io.BytesIO()
    head.write(MAGIC)
    meta = {
        "avro.schema": json.dumps(avro_schema).encode("utf-8"),
        "avro.codec": codec.encode("utf-8"),
    }
    _w_long(head, len(meta))
    for k, v in meta.items():
        _w_bytes(head, k.encode("utf-8"))
        _w_bytes(head, v)
    _w_long(head, 0)
    head.write(sync)

    def is_null(v) -> bool:
        if v is None or v is pd.NaT:
            return True
        if isinstance(v, (str, bytes)) or hasattr(v, "__len__"):
            return False  # containers are never scalar-NA
        try:
            return bool(pd.isna(v))
        except (TypeError, ValueError):
            return False

    encs = [(f.name, f.nullable, _encoder(f.dataType)) for f in schema.fields]
    cols = {f.name: pdf[f.name] for f in schema.fields}
    n = len(pdf)
    for i in range(0, n, _BLOCK_RECORDS):
        block = io.BytesIO()
        hi = min(i + _BLOCK_RECORDS, n)
        for r in range(i, hi):
            for name, nullable, enc in encs:
                v = cols[name].iloc[r]
                if nullable:
                    if is_null(v):
                        _w_long(block, 0)
                        continue
                    _w_long(block, 1)
                elif is_null(v):
                    raise ValueError(f"NULL in non-nullable field {name}")
                enc(block, v)
        payload = block.getvalue()
        if codec == "deflate":
            payload = zlib.compress(payload)[2:-4]  # raw, per spec
        _w_long(head, hi - i)
        _w_long(head, len(payload))
        head.write(payload)
        head.write(sync)
    return head.getvalue()


def read_header(raw: io.BufferedReader) -> tuple[dict, str, bytes]:
    """(avro json schema, codec, sync) from an OCF header."""
    if raw.read(4) != MAGIC:
        raise ValueError("not an Avro object container file")
    meta: dict[str, bytes] = {}
    while True:
        n = _r_long(raw)
        if n == 0:
            break
        if n < 0:  # negative block count: byte size follows
            n = -n
            _r_long(raw)
        for _ in range(n):
            k = _r_bytes(raw).decode("utf-8")
            meta[k] = _r_bytes(raw)
    sync = raw.read(16)
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    return schema, codec, sync


def decode_container(data: bytes, schema: T.StructType | None = None):
    """List of row dicts (+ the Spark schema) from OCF bytes.

    Union handling is driven by the FILE's own schema, not the caller's:
    a spec-legal writer may emit ``[T, "null"]`` (null = branch index 1),
    so the per-field null branch index is recorded during header parse and
    the row decoder branches on it — assuming index 0 is always null would
    silently misdecode such files (every value -> None, stream desync).
    """
    raw = io.BufferedReader(io.BytesIO(data))
    avro_schema, codec, sync = read_header(raw)
    if schema is None:
        schema = avro_to_schema(avro_schema)

    def null_branch(t) -> int | None:
        """Index of "null" in a two-branch union, None for non-unions."""
        if not isinstance(t, list):
            return None
        if len(t) != 2 or "null" not in t:
            raise ValueError(f"unsupported union: {t}")
        return t.index("null")

    file_fields = {f["name"]: f["type"] for f in avro_schema["fields"]}
    decs = []
    for f in schema.fields:
        # fall back to the Spark schema's ["null", T] convention only if
        # the file header somehow lacks the field (explicit-schema reads)
        t = file_fields.get(f.name, ["null", None] if f.nullable else None)
        decs.append((f.name, null_branch(t), _decoder(f.dataType)))
    rows: list[dict] = []
    while True:
        try:
            count = _r_long(raw)
        except EOFError:
            break
        size = _r_long(raw)
        payload = raw.read(size)
        if codec == "deflate":
            payload = zlib.decompress(payload, wbits=-15)
        elif codec != "null":
            raise ValueError(f"unsupported avro codec: {codec}")
        block = io.BufferedReader(io.BytesIO(payload))
        for _ in range(count):
            row = {}
            for name, null_idx, dec in decs:
                if null_idx is not None:
                    if _r_long(block) == null_idx:
                        row[name] = None
                        continue
                row[name] = dec(block)
            rows.append(row)
        if raw.read(16) != sync:
            raise ValueError("sync marker mismatch (corrupt block)")
    return rows, schema


# --------------------------------------------------------------------------
# the Spark-side seam
# --------------------------------------------------------------------------


def write_avro(df: DataFrame, path: str, mode: str = "overwrite",
               codec: str = "null") -> None:
    """Distributed Avro sink: one container file per partition, written in
    ONE job through the Arrow seam; sync markers are deterministic
    (md5 of path + partition id). `mode` mirrors the DataFrame writer:
    overwrite replaces the directory, error refuses an existing one,
    ignore skips the write if the directory exists. append is REJECTED:
    the deterministic part-{pid:05d}.avro names would silently replace
    the previous run's files (data loss) rather than add to them."""
    import pandas as pd
    from pyspark import TaskContext

    if mode not in ("overwrite", "error", "errorifexists", "ignore"):
        raise ValueError(
            f"write_avro mode {mode!r} not supported "
            "(overwrite/error/errorifexists/ignore)")
    if os.path.exists(path):
        if mode == "overwrite":
            import shutil
            shutil.rmtree(path)
        elif mode == "ignore":
            return
        else:  # error / errorifexists
            raise ValueError(f"path exists: {path}")
    os.makedirs(path, exist_ok=True)
    schema = df.schema

    def gen(batches):
        pid = TaskContext.get().partitionId()
        parts = [b for b in batches if len(b)]
        if parts:
            pdf = pd.concat(parts, ignore_index=True)
            sync = md5(f"{path}:{pid}".encode()).digest()
            data = encode_container(pdf, schema, sync, codec=codec)
            out = os.path.join(path, f"part-{pid:05d}.avro")
            with open(out, "wb") as fh:
                fh.write(data)
            yield pd.DataFrame({"path": [out], "n_rows": [len(pdf)]})

    manifest = df.mapInPandas(gen, "path string, n_rows long")
    total = manifest.agg({"n_rows": "sum"}).first()[0] or 0
    if total == 0:
        # empty frame: no partition yields a file, but the directory must
        # still round-trip — write one schema-only container (header, zero
        # blocks) so a schemaless read_avro recovers the schema instead of
        # failing on an .avro-less directory
        empty = pd.DataFrame({f.name: [] for f in schema.fields})
        sync = md5(f"{path}:0".encode()).digest()
        with open(os.path.join(path, "part-00000.avro"), "wb") as fh:
            fh.write(encode_container(empty, schema, sync, codec=codec))
    with open(os.path.join(path, "_SUCCESS"), "w") as fh:
        fh.write(str(total))


def read_avro(spark: SparkSession, path: str,
              schema: T.StructType | None = None) -> DataFrame:
    """Distributed Avro source: schema from ONE O(KB) header read on the
    driver (self-describing), then per-file parallel decode through
    binaryFile + mapInPandas."""
    import glob as _glob

    import pandas as pd

    if schema is None:
        files = sorted(_glob.glob(os.path.join(path, "*.avro")))
        if not files:
            raise FileNotFoundError(f"no .avro files under {path}")
        with open(files[0], "rb") as fh:
            avro_schema, _, _ = read_header(
                io.BufferedReader(fh, buffer_size=1 << 16))
        schema = avro_to_schema(avro_schema)

    names = [f.name for f in schema.fields]

    def gen(batches):
        for b in batches:
            for content in b["content"]:
                rows, _ = decode_container(bytes(content), schema)
                if rows:
                    yield pd.DataFrame(
                        {n: [r[n] for r in rows] for n in names})

    binary = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.avro").load(path)
        .select("content")
    )
    return binary.mapInPandas(gen, schema)


# --------------------------------------------------------------------------
# oracle-checked registered query: the codec inside the correctness gate
# --------------------------------------------------------------------------

_AVRO_RT_VERSION = "avrort1"


def _avro_rt_dir(sf_dir: str) -> str:
    """Round-trip cache dir keyed on the events corpus fingerprint
    (regeneration invalidates; the WRITE runs once per corpus, every gate
    run exercises the distributed READ + decode)."""
    import re
    st = os.stat(os.path.join(sf_dir, "events.parquet"))
    slug = re.sub(r"[^A-Za-z0-9_.-]+", "_", sf_dir.strip("/"))
    root = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), ".state_cache")
    return os.path.join(root, _AVRO_RT_VERSION, slug,
                        f"{st.st_size}-{st.st_mtime_ns}", "events_avro")


def _register_roundtrip() -> None:
    from covid_19_data_engineering_spark.plans.registry import register
    from covid_19_data_engineering_spark.sources.tables import load_table

    @register(
        "avro_roundtrip_events",
        oracle="""
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                 AS value_cents,
               CAST(MIN(event_id) AS BIGINT) AS min_event_id,
               CAST(MAX(event_id) AS BIGINT) AS max_event_id,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
               CAST(MIN(CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS first_ts,
               CAST(MAX(CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS last_ts
        FROM events GROUP BY event_type ORDER BY event_type
        """,
        doc="Events profiled AFTER a full Avro container round-trip: the "
        "table is written once per corpus fingerprint with the stdlib OCF "
        "codec (distributed one-file-per-partition write), then every gate "
        "run reads it back through the parallel binaryFile decode and "
        "aggregates — so every column class the codec carries (long, "
        "double, string, nullable long, timestamp) must survive the bytes "
        "bit-exactly for the hash to match the oracle computed on the "
        "ORIGINAL parquet.",
    )
    def avro_roundtrip_events(spark: SparkSession, sf_dir: str) -> DataFrame:
        import pyspark.sql.functions as F

        path = _avro_rt_dir(sf_dir)
        if not os.path.exists(os.path.join(path, "_SUCCESS")):
            write_avro(load_table(spark, "events", sf_dir), path)
        back = read_avro(spark, path)
        return (
            back.groupBy("event_type")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum(F.expr("CAST(round(value * 100) AS BIGINT)"))
                .alias("value_cents"),
                F.min("event_id").alias("min_event_id"),
                F.max("event_id").alias("max_event_id"),
                F.countDistinct("user_id").alias("n_users"),
                F.min("ts").alias("first_ts"),
                F.max("ts").alias("last_ts"),
            )
            .orderBy("event_type")
        )


_register_roundtrip()
