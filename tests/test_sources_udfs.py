"""Source-format round-trips (B.1) and UDF surface (B.12) tests."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from timestream_travel_spark.functions.udfs import (
    mean_value_gagg,
    register_sql_udfs,
    trend_slope_per_user,
    weighted_value_udf,
)
from timestream_travel_spark.sources.formats import read_csv, read_json, write_csv, write_ndjson
from timestream_travel_spark.tables import load_table


def test_csv_roundtrip(spark, sf_dir, tmp_path):
    od = load_table(spark, sf_dir, "orders")
    path = str(tmp_path / "orders_csv")
    write_csv(od.withColumn("o_orderdate", F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss")), path)
    back = read_csv(
        spark,
        path,
        schema="o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING, "
        "o_totalprice DOUBLE, o_orderdate TIMESTAMP, o_orderpriority STRING",
    )
    assert back.count() == od.count()
    a = od.agg(F.sum(F.col("o_totalprice").cast("decimal(20,4)"))).collect()[0][0]
    b = back.agg(F.sum(F.col("o_totalprice").cast("decimal(20,4)"))).collect()[0][0]
    assert a == b


def test_ndjson_gzip_roundtrip(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "events_json")
    write_ndjson(ev, path, gzip=True, max_records_per_file=300)
    assert glob.glob(f"{path}/*.json.gz")
    back = read_json(
        spark,
        path,
        schema="event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE, props STRING",
    )
    assert back.count() == ev.count()
    assert back.agg(F.countDistinct("event_id")).collect()[0][0] == ev.count()


def test_csv_schema_inference(spark, tmp_path):
    df = spark.createDataFrame([(1, "a", 1.5), (2, "b", 2.5)], "x bigint, s string, v double")
    path = str(tmp_path / "infer_csv")
    write_csv(df, path)
    back = read_csv(spark, path)  # inferSchema path
    assert back.count() == 2
    assert dict(back.dtypes)["x"] in ("int", "bigint")


def test_scalar_pandas_udf_two_cols(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").limit(100)
    k = F.get_json_object("props", "$.k").cast("double")
    got = ev.select(
        "event_id",
        weighted_value_udf(F.col("value"), k).alias("w"),
        (F.col("value") * (1.0 + k / 100.0)).alias("expected"),
    ).collect()
    for r in got:
        assert abs(r["w"] - r["expected"]) < 1e-9


def test_grouped_agg_pandas_udf(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    got = {
        r["event_type"]: r["m"]
        for r in ev.groupBy("event_type").agg(mean_value_gagg("value").alias("m")).collect()
    }
    want = {
        r["event_type"]: r["m"] for r in ev.groupBy("event_type").agg(F.avg("value").alias("m")).collect()
    }
    for k in want:
        assert abs(got[k] - want[k]) < 1e-9


def test_sql_udf_registration(spark, sf_dir):
    register_sql_udfs(spark)
    load_table(spark, sf_dir, "embeddings").createOrReplaceTempView("emb_v")
    rows = spark.sql("SELECT vec_id, vector_norm(embedding) AS n FROM emb_v LIMIT 5").collect()
    assert all(r["n"] > 0 for r in rows)


def test_applyinpandas_slope_sign(spark):
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "user_id": [1] * 10 + [2] * 10,
            "ts": list(pd.date_range("2024-01-01", periods=10, freq="1h")) * 2,
            "value": list(range(10)) + list(range(10, 0, -1)),
        }
    )
    df = spark.createDataFrame(pdf)
    slopes = {r["user_id"]: r["slope"] for r in trend_slope_per_user(df).collect()}
    assert slopes[1] > 0 and slopes[2] < 0


def test_orc_roundtrip_with_pushdown(spark, sf_dir, tmp_path):
    """ORC write/read roundtrip; the range predicate reaches the ORC
    scan as a pushed filter (SearchArgument), like parquet."""
    from timestream_travel_spark.sources.formats import read_orc, write_orc

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "event_type", "value")
    path = str(tmp_path / "events_orc")
    write_orc(ev, path)
    back = read_orc(spark, path)
    assert back.count() == ev.count()
    assert dict(back.dtypes) == dict(ev.dtypes)
    q = back.filter(F.col("user_id") < 100).select("event_id", "user_id")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "user_id" in plan.split("PushedFilters")[1][:120]
    assert q.count() == ev.filter(F.col("user_id") < 100).count()


def test_xml_roundtrip(spark, sf_dir, tmp_path):
    """XML write/read roundtrip (Spark 4 built-in XML source)."""
    from timestream_travel_spark.sources.formats import read_xml, write_xml

    od = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    ).limit(500)
    path = str(tmp_path / "orders_xml")
    write_xml(od, path, row_tag="order")
    back = read_xml(spark, path, row_tag="order")
    assert back.count() == 500
    want = {r["o_orderkey"]: r["o_totalprice"] for r in od.collect()}
    got = {r["o_orderkey"]: r["o_totalprice"] for r in back.collect()}
    assert got == want


def test_python_udtf_chunker_parity(spark, sf_dir):
    """Python UDTF (Spark 4 table-function API): a chunking UDTF must
    emit exactly the rows of the JVM sequence+explode chunker
    (q_text_chunks). UDTFs are the API-surface demo — the registry
    query keeps the codegen fast path."""
    from pyspark.sql.functions import udtf

    import __spark_entry__ as entrymod

    CHUNK_SIZE, CHUNK_STEP = 200, 150

    @udtf(returnType="doc_id bigint, chunk_id int, chunk_start int, chunk string")
    class Chunker:
        def eval(self, doc_id: int, text: str):
            start, cid = 1, 0
            last = max(len(text) - CHUNK_STEP, 1)
            while start <= last:
                yield doc_id, cid, start, text[start - 1 : start - 1 + CHUNK_SIZE]
                start += CHUNK_STEP
                cid += 1

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    spark.udtf.register("chunker", Chunker)
    d.createOrReplaceTempView("docs_udtf")
    got = {
        (r["doc_id"], r["chunk_id"], r["chunk_start"], r["chunk"])
        for r in spark.sql(
            "SELECT c.* FROM docs_udtf, LATERAL chunker(doc_id, text) c"
        ).collect()
    }
    want = {
        (r["doc_id"], r["chunk_id"], r["chunk_start"], r["chunk"])
        for r in entrymod.queries()["q_text_chunks"](spark, sf_dir).filter(
            F.col("doc_id") < 50
        ).collect()
    }
    assert got == want and got


def test_orc_roundtrip_exact(spark, sf_dir, tmp_path):
    """ORC source/sink (Spark-native, no extra package): the events
    table written to ORC and read back is row-identical, including
    microsecond timestamps and doubles — the alternate columnar
    format a user migrating a warehouse would bring."""
    import os

    from timestream_travel_spark.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    dest = str(tmp_path / "events_orc")
    ev.write.mode("overwrite").orc(dest)
    back = spark.read.orc(dest)
    assert back.schema == ev.schema
    assert back.count() == ev.count()
    assert back.exceptAll(ev).count() == 0
    assert ev.exceptAll(back).count() == 0
    # predicate pushdown reaches the ORC scan too
    plan = (
        back.filter(F.col("event_type") == "purchase")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters" in plan and "event_type" in plan
