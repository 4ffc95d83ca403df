"""Source/sink behavior: heterogeneous CSV union-by-name (A1/U1),
tolerant single-file read (A2), partitioned+clustered writes (A5-A7),
bucketed co-located joins (A7 CLUSTER BY as shuffle elimination)."""

from __future__ import annotations

import pyspark.sql.functions as F

from event_driven_data_pipeline_for_e_commerce_spark.sources.io import (
    read_csv_dir,
    read_csv_quarantine,
    safe_read_csv,
    write_bucketed_table,
    write_table,
)


def test_read_csv_dir_heterogeneous_headers(spark, tmp_path):
    """Files with different headers must union by NAME (pd.concat
    parity) — Spark's positional multi-file scan would misalign them."""
    (tmp_path / "a.csv").write_text("id,name\n1,ann\n2,bob\n")
    (tmp_path / "b.csv").write_text("name,score,id\ncid,9.5,3\n")
    df = read_csv_dir(spark, str(tmp_path))
    rows = {r["id"]: r for r in df.collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[3]["name"] == "cid" and rows[3]["score"] == 9.5
    assert rows[1]["score"] is None  # missing column -> NULL, not misaligned
    assert rows[1]["source_table"] == "a" and rows[3]["source_table"] == "b"


def test_safe_read_csv_missing_file(spark, tmp_path):
    df = safe_read_csv(spark, str(tmp_path / "nope.csv"))
    assert df.count() == 0


def test_write_table_partition_pruning(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "2024-01-01"), (2, "2024-01-02"), (3, "2024-01-02")], "id long, d string"
    )
    out = str(tmp_path / "part_tbl")
    write_table(df, out, partition_by=["d"], cluster_by=["id"])
    back = spark.read.parquet(out).filter(F.col("d") == "2024-01-02")
    assert back.count() == 2
    # partition filter prunes at planning: only the matching dir is read
    scan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(d" in scan


def test_csv_quarantine_splits_bad_rows(spark, tmp_path):
    """Corrupt rows land in quarantine with their raw text; good rows
    parse cleanly — nothing dropped, nothing fatal."""
    p = tmp_path / "mixed.csv"
    p.write_text(
        "id,amount\n"
        "1,10.5\n"
        "not-a-number-row,\"unclosed\n"   # structurally corrupt
        "2,20.0\n"
        "3,oops\n"                        # type-corrupt: amount not double
    )
    good, bad = read_csv_quarantine(spark, str(p), "id int, amount double")
    good_rows = {r["id"]: r["amount"] for r in good.collect()}
    assert good_rows == {1: 10.5, 2: 20.0}
    raw_bad = [r["_corrupt_record"] for r in bad.collect()]
    assert len(raw_bad) == 2
    assert any("oops" in (s or "") for s in raw_bad)


def test_jsonl_quarantine_splits_bad_lines(spark, tmp_path):
    """JSONL twin: malformed JSON and type-mismatched fields quarantine
    with their raw line; well-formed objects parse; absent optional
    fields are NULL, not errors."""
    from event_driven_data_pipeline_for_e_commerce_spark.sources.io import (
        read_jsonl_quarantine,
    )

    p = tmp_path / "docs.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "hello world", "lang": "en"}\n'
        "this is not json at all\n"
        '{"doc_id": 2, "text": "bonjour"}\n'
        '{"doc_id": "not-a-number", "text": "bad id type"}\n'
        '{"doc_id": 3, "text": "ok", "lang": "de"}\n'
    )
    good, bad = read_jsonl_quarantine(
        spark, str(p), "doc_id bigint, text string, lang string"
    )
    rows = {r["doc_id"]: r for r in good.collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[2]["lang"] is None  # absent field -> NULL, not quarantine
    raw_bad = [r["_corrupt_record"] for r in bad.collect()]
    assert len(raw_bad) == 2
    assert any("not json" in (s or "") for s in raw_bad)
    assert any("not-a-number" in (s or "") for s in raw_bad)


def test_quarantine_schema_guard(spark, tmp_path):
    """ADVICE-r8: a caller schema that already contains the corrupt
    column raises a clear ValueError (not a duplicate-column analysis
    failure), a StructType raises TypeError (DDL strings only), and a
    custom corrupt_col name routes the quarantine column there."""
    import pytest
    from pyspark.sql.types import StructField, StructType, StringType
    from event_driven_data_pipeline_for_e_commerce_spark.sources.io import (
        read_jsonl_quarantine,
    )

    p = tmp_path / "docs.jsonl"
    p.write_text('{"doc_id": 1}\nnot json\n')
    with pytest.raises(ValueError, match="_corrupt_record"):
        read_jsonl_quarantine(
            spark, str(p), "doc_id bigint, _corrupt_record string"
        )
    with pytest.raises(TypeError, match="DDL schema string"):
        read_jsonl_quarantine(
            spark, str(p), StructType([StructField("doc_id", StringType())])
        )
    # caller-chosen corrupt column name — including one whose default
    # would collide — works end to end on both readers
    good, bad = read_jsonl_quarantine(
        spark, str(p), "doc_id bigint", corrupt_col="_raw_bad"
    )
    assert [r["doc_id"] for r in good.collect()] == [1]
    assert bad.columns == ["_raw_bad"] and bad.count() == 1
    c = tmp_path / "t.csv"
    c.write_text("id,amount\n1,2.0\n3,oops\n")
    with pytest.raises(ValueError, match="corrupt-record column"):
        read_csv_quarantine(
            spark, str(c), "id int, amount double, _corrupt_record string"
        )
    good, bad = read_csv_quarantine(
        spark, str(c), "id int, amount double", corrupt_col="_rej"
    )
    assert good.count() == 1 and bad.columns == ["_rej"]


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Two tables bucketed identically on the join key must sort-merge
    join with ZERO Exchange operators — the co-located layout."""
    left = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("lv")
    )
    right = spark.range(0, 500).select(
        F.col("id").alias("k"), (F.col("id") + 7).alias("rv")
    )
    spark.sql("DROP TABLE IF EXISTS bkt_left")
    spark.sql("DROP TABLE IF EXISTS bkt_right")
    write_bucketed_table(left, "bkt_left", ["k"], n_buckets=4, sort_cols=["k"])
    write_bucketed_table(right, "bkt_right", ["k"], n_buckets=4, sort_cols=["k"])
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("bkt_left").join(spark.table("bkt_right"), "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert joined.count() == 500
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bkt_left")
        spark.sql("DROP TABLE IF EXISTS bkt_right")


def test_catalog_roundtrip_idempotent(spark, sf_dir):
    """A8/A3/A5: CREATE DATABASE IF NOT EXISTS twice, managed-table
    overwrite twice, distributed spark.table scan reads it back."""
    from event_driven_data_pipeline_for_e_commerce_spark.sources.io import ensure_database, save_managed_table
    from event_driven_data_pipeline_for_e_commerce_spark.plans.tables import load_tables

    ensure_database(spark, "edp_test_db")
    ensure_database(spark, "edp_test_db")  # idempotent
    nation = load_tables(spark, sf_dir)["nation"]
    name = save_managed_table(nation, "nation_snap", database="edp_test_db")
    name = save_managed_table(nation, "nation_snap", database="edp_test_db")  # overwrite
    assert spark.table(name).count() == nation.count()
    spark.sql("DROP TABLE edp_test_db.nation_snap")
    spark.sql("DROP DATABASE edp_test_db")


def test_json_and_orc_roundtrip(spark, sf_dir, tmp_path):
    """Source-format breadth: the event stream written/read as JSON
    lines (the Kafka-payload shape) and ORC, both value-identical to
    the parquet original. JSON read uses an explicit schema — schema
    inference on JSON is a full extra pass at scale."""
    from event_driven_data_pipeline_for_e_commerce_spark.plans.tables import load_tables
    import pyspark.sql.functions as F

    events = load_tables(spark, sf_dir)["events"].select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    checksum = events.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("event_id").alias("ids"),
        F.sum(F.unix_micros("ts")).alias("ts_us"),
        F.round(F.sum("value"), 2).alias("v"),
    ).collect()[0]

    jpath, opath = str(tmp_path / "ev_json"), str(tmp_path / "ev_orc")
    # default JSON timestampFormat truncates to milliseconds — spell
    # out a microsecond format on both sides
    us_fmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
    events.write.mode("overwrite").option("timestampFormat", us_fmt).json(jpath)
    events.write.mode("overwrite").orc(opath)

    back_j = spark.read.schema(events.schema).option("timestampFormat", us_fmt).json(jpath)
    back_o = spark.read.orc(opath)
    for back in (back_j, back_o):
        got = back.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("event_id").alias("ids"),
            F.sum(F.unix_micros("ts")).alias("ts_us"),
            F.round(F.sum("value"), 2).alias("v"),
        ).collect()[0]
        assert tuple(got) == tuple(checksum)


def test_compact_parquet_small_files(spark, sf_dir, tmp_path):
    """64 micro-batch-sized files compact to a handful, values intact."""
    from event_driven_data_pipeline_for_e_commerce_spark.sources.io import compact_parquet
    from event_driven_data_pipeline_for_e_commerce_spark.plans.tables import load_tables
    import pyspark.sql.functions as F

    path = str(tmp_path / "frag")
    orders = load_tables(spark, sf_dir)["orders"]
    orders.repartition(64).write.mode("overwrite").parquet(path)
    import os
    n_before = sum(f.endswith(".parquet") for f in os.listdir(path))
    assert n_before == 64
    checksum = orders.agg(F.sum("o_orderkey"), F.count(F.lit(1))).collect()[0]

    compact_parquet(spark, path, target_file_bytes=1 << 30)
    n_after = sum(f.endswith(".parquet") for f in os.listdir(path))
    assert n_after == 1
    back = spark.read.parquet(path)
    assert tuple(back.agg(F.sum("o_orderkey"), F.count(F.lit(1))).collect()[0]) == tuple(checksum)


def test_parquet_schema_evolution_merge(spark, tmp_path):
    """Batches written before a column existed must read back with
    NULLs in that column (mergeSchema), not get positionally projected
    through whichever file's schema the scan picked."""
    from event_driven_data_pipeline_for_e_commerce_spark.sources.io import (
        read_parquet_evolving,
    )

    p = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a")], "id long, name string").write.mode(
        "append"
    ).parquet(p)
    spark.createDataFrame(
        [(2, "b", 9.5)], "id long, name string, score double"
    ).write.mode("append").parquet(p)
    rows = {r["id"]: r for r in read_parquet_evolving(spark, p).collect()}
    assert set(read_parquet_evolving(spark, p).columns) == {"id", "name", "score"}
    assert rows[1]["score"] is None
    assert rows[2]["score"] == 9.5


def test_quarantine_schema_nested_types(spark, tmp_path):
    """ADVICE-r9: the duplicate-column guard splits the DDL on
    TOP-LEVEL commas only, so map/struct element types and
    decimal(p,s) args don't produce garbage field tokens — the guard
    still fires on a real collision and stays silent without one."""
    import pytest
    from event_driven_data_pipeline_for_e_commerce_spark.sources.io import (
        _split_top_level,
        read_jsonl_quarantine,
    )

    ddl = (
        "doc_id bigint, props map<string,int>, "
        "geo struct<lat:double,lon:double>, amt decimal(10,2)"
    )
    assert [f.split()[0] for f in _split_top_level(ddl)] == [
        "doc_id", "props", "geo", "amt",
    ]
    # collision hidden AFTER a nested type still raises
    with pytest.raises(ValueError, match="corrupt-record column"):
        read_jsonl_quarantine(
            spark,
            str(tmp_path / "x.jsonl"),
            "props map<string,int>, _corrupt_record string",
        )
    # nested types alone pass the guard and read end to end
    p = tmp_path / "docs.jsonl"
    p.write_text('{"doc_id": 1, "props": {"a": 2}}\nnot json\n')
    good, bad = read_jsonl_quarantine(
        spark, str(p), "doc_id bigint, props map<string,int>"
    )
    assert good.collect()[0]["props"] == {"a": 2}
    assert bad.count() == 1
