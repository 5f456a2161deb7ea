"""Source/sink roundtrips + the partition-pruning scale witness."""

from __future__ import annotations

from pyspark.sql import functions as F

from onechronos_etl_takehome_spark.sources import (
    load_table,
    read_dirty_csv,
    write_json,
    write_parquet,
)

SF = "/root/testdata/sf0.001"


def test_partitioned_parquet_prunes(spark, tmp_path):
    e = load_table(spark, SF, "events")
    out = str(tmp_path / "events_by_type")
    write_parquet(e, out, partition_by=["event_type"])

    back = spark.read.parquet(out).filter(F.col("event_type") == "purchase")
    plan = back._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    # the filter must prune partitions at the source, not post-scan
    assert "PartitionFilters" in plan and "event_type" in plan.split("PartitionFilters")[1].splitlines()[0]
    assert back.count() == e.filter(F.col("event_type") == "purchase").count()


def test_json_sink_roundtrip_partitioned(spark, tmp_path):
    n = load_table(spark, SF, "nation")
    out = str(tmp_path / "nation_json")
    write_json(n, out)  # partitioned JSON-lines directory
    back = spark.read.json(out)
    assert back.count() == n.count()
    assert set(back.columns) == set(n.columns)


def test_json_sink_single_file_omits_nulls(spark, tmp_path):
    import json

    df = spark.createDataFrame([(1, None), (2, "x")], "id int, v string")
    path = str(tmp_path / "single.json")
    write_json(df, path, single_file=True)
    with open(path) as f:
        records = json.load(f)
    by_id = {r["id"]: r for r in records}
    assert "v" not in by_id[1]  # quirk Q3: NULL keys omitted
    assert by_id[2]["v"] == "x"


def test_dirty_csv_reader_all_strings(spark, tmp_path):
    p = tmp_path / "dirty.csv"
    p.write_text("a,b\n1,x\n,y\nbad,\n")
    df = read_dirty_csv(spark, str(p), ["a", "b"])
    assert [f.dataType.simpleString() for f in df.schema.fields] == [
        "string",
        "string",
    ]
    rows = {(r.a, r.b) for r in df.collect()}
    assert rows == {("1", "x"), (None, "y"), ("bad", None)}


def test_dirty_csv_rename_on_ingest(spark, tmp_path):
    p = tmp_path / "fills.csv"
    p.write_text("id,price\n7,1.5\n")
    df = read_dirty_csv(spark, str(p), rename={"price": "cp_price"})
    assert df.columns == ["id", "cp_price"]


def test_orc_roundtrip_fidelity(spark, tmp_path):
    """ORC write→read preserves types and values exactly, including the
    shapes that usually break format round-trips: timestamps, decimals,
    doubles, arrays, and NULLs."""
    from onechronos_etl_takehome_spark.sources import read_orc, write_orc

    src = spark.createDataFrame(
        [
            (1, "a", 1.5, [1.0, 2.0], "2024-01-15 10:00:00"),
            (2, None, float("nan"), [], None),
        ],
        "id long, s string, d double, arr array<double>, ts_s string",
    ).withColumns(
        {
            "ts": F.to_timestamp("ts_s"),
            "dec": F.col("d").cast("decimal(12,2)"),
        }
    )
    out = str(tmp_path / "roundtrip.orc")
    write_orc(src, out)
    back = read_orc(spark, out)
    assert back.schema == src.schema
    a = sorted(src.collect(), key=lambda r: r.id)
    b = sorted(back.collect(), key=lambda r: r.id)
    # NaN != NaN under ==; compare via repr-stable dicts
    assert [repr(r.asDict()) for r in a] == [repr(r.asDict()) for r in b]


def test_orc_partitioned_write_prunes(spark, tmp_path):
    from onechronos_etl_takehome_spark.sources import read_orc, write_orc

    e = load_table(spark, SF, "events")
    out = str(tmp_path / "events_orc")
    write_orc(e, out, partition_by=["event_type"])
    pruned = read_orc(spark, out).filter(F.col("event_type") == "view")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    # the filter must land in PartitionFilters (directory pruning),
    # not as a post-scan row filter
    assert "PartitionFilters" in plan and "event_type" in plan.split(
        "PartitionFilters", 1
    )[1].split("]", 1)[0]
    n_all = load_table(spark, SF, "events").filter(
        F.col("event_type") == "view"
    ).count()
    assert pruned.count() == n_all


def test_read_binary_dir_feeds_multimodal(spark, tmp_path):
    # real binaryFile ingestion: bytes round-trip exactly, modality
    # maps from extension, glob prunes before read, and the frame
    # drives the multimodal block-map dedup end-to-end
    import os

    from onechronos_etl_takehome_spark.operators.multimodal import (
        binary_chunk_neardup,
        binary_metadata,
    )
    from onechronos_etl_takehome_spark.sources.readers import read_binary_dir

    d = tmp_path / "media"
    os.makedirs(d)
    payload = b"\x00\x01binary-ish" + bytes(range(200))
    (d / "a.png").write_bytes(payload)
    (d / "b.txt").write_text("hello media world")
    (d / "c.weird").write_bytes(b"xyz")
    (d / "dup.png").write_bytes(payload)  # exact duplicate of a.png

    df = read_binary_dir(spark, str(d))
    rows = {os.path.basename(r.id): r for r in df.collect()}
    assert rows["a.png"].modality == "image"
    assert rows["b.txt"].modality == "text"
    assert rows["c.weird"].modality == "binary"
    assert bytes(rows["a.png"].content) == payload
    assert rows["a.png"].n_bytes == len(payload)

    only_png = read_binary_dir(spark, str(d), glob="*.png")
    assert only_png.count() == 2

    meta = {os.path.basename(r.id): r.checksum for r in binary_metadata(df).collect()}
    assert meta["a.png"] == meta["dup.png"]

    pairs = binary_chunk_neardup(df, chunk_bytes=64).collect()
    assert len(pairs) == 1 and pairs[0].containment == 1.0
    assert {os.path.basename(p) for p in (pairs[0].id_a, pairs[0].id_b)} == {
        "a.png", "dup.png"
    }


def test_xml_roundtrip_fidelity(spark, tmp_path):
    """XML write→read (Spark 4 built-in source) preserves values for
    the scalar/array shapes a feed export carries; NULL fields are
    omitted elements (the sink's Q3 posture) and come back NULL."""
    from onechronos_etl_takehome_spark.sources import read_xml, write_xml

    src = spark.createDataFrame(
        [
            (1, "a", 1.5, [1.0, 2.0], "2024-01-15 10:00:00"),
            (2, None, -3.25, [], None),
        ],
        "id long, s string, d double, arr array<double>, ts_s string",
    ).withColumn("ts", F.to_timestamp("ts_s"))
    out = str(tmp_path / "roundtrip.xml")
    write_xml(src, out, row_tag="rec", root_tag="recs")
    back = read_xml(spark, str(out), row_tag="rec", schema=src.schema)
    assert back.schema == src.schema
    a = sorted(src.collect(), key=lambda r: r.id)
    b = sorted(back.collect(), key=lambda r: r.id)
    # XML has no empty-array representation: [] round-trips as NULL.
    assert [r.asDict() for r in a[:1]] == [r.asDict() for r in b[:1]]
    d2 = b[1].asDict()
    assert d2["s"] is None and d2["ts"] is None and d2["arr"] in (None, [])
    assert d2["d"] == -3.25


def test_xml_partitioned_write_prunes(spark, tmp_path):
    from onechronos_etl_takehome_spark.sources import read_xml, write_xml

    e = load_table(spark, SF, "events").select(
        "event_id", "user_id", "event_type"
    )
    out = str(tmp_path / "events_xml")
    write_xml(e, out, partition_by=["event_type"])
    back = read_xml(spark, out, schema=e.drop("event_type").schema)
    pruned = back.filter(F.col("event_type") == "view")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "event_type" in plan.split(
        "PartitionFilters", 1
    )[1].split("]", 1)[0]
    n_all = load_table(spark, SF, "events").filter(
        F.col("event_type") == "view"
    ).count()
    assert pruned.count() == n_all


def test_read_text_corpus_modes(spark, tmp_path):
    from onechronos_etl_takehome_spark.sources.readers import read_text_corpus

    d = tmp_path / "corpus"
    d.mkdir()
    (d / "a.txt").write_text("hello world\nsecond line")
    (d / "b.txt").write_text("solo doc")

    files = read_text_corpus(spark, str(d), mode="file").collect()
    by_name = {r.doc_path.rsplit("/", 1)[-1]: r.text for r in files}
    assert by_name == {"a.txt": "hello world\nsecond line", "b.txt": "solo doc"}

    lines = read_text_corpus(spark, str(d), mode="line").collect()
    got = {(r.doc_path.rsplit("/", 1)[-1], r.text) for r in lines}
    assert got == {
        ("a.txt", "hello world"),
        ("a.txt", "second line"),
        ("b.txt", "solo doc"),
    }

    import pytest

    with pytest.raises(ValueError):
        read_text_corpus(spark, str(d), mode="bogus")
