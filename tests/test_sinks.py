"""Sink round-trips + the bucketed-join no-shuffle guarantee."""

from __future__ import annotations

from pyspark.sql import functions as F

from severless_data_pipeline_aws_spark.io import Tables
from severless_data_pipeline_aws_spark.sources.generator import generate_readings
from severless_data_pipeline_aws_spark.sources import sinks


def test_console_sink_prints_batch(spark, sf_dir, capsys):
    df = Tables(spark, sf_dir).events.limit(3)
    sinks.write_console(df, n=1)
    out = capsys.readouterr().out
    assert "event_id" in out


def test_json_sink_roundtrip(spark, sf_dir, tmp_path):
    df = Tables(spark, sf_dir).events.filter(F.col("user_id") <= 5)
    path = str(tmp_path / "events_json")
    sinks.write_json(df, path)
    back = spark.read.json(path)
    assert back.count() == df.count()


def test_csv_sink_flattens_nested(spark, tmp_path):
    nested = generate_readings(spark, n_devices=4, n_ticks=10)
    path = str(tmp_path / "readings_csv")
    sinks.write_csv_flat(nested, path)
    back = spark.read.option("header", True).csv(path)
    assert "temperature_value" in back.columns
    assert "readings" not in back.columns
    assert back.count() == nested.count()


def test_keyed_sink_partitions_by_key(spark, sf_dir, tmp_path):
    df = Tables(spark, sf_dir).events.filter(F.col("user_id") <= 5).withColumn(
        "device", F.concat(F.lit("u"), F.col("user_id"))
    )
    path = str(tmp_path / "keyed")
    sinks.write_keyed(df, path, key="device")
    back = spark.read.parquet(path)
    assert back.count() == df.count()
    # directory-per-key layout -> partition pruning on the key
    import os

    assert any(d.startswith("device=") for d in os.listdir(path))


def test_keyed_layout_enables_partition_pruning(spark, sf_dir, tmp_path):
    """Reading one key from the partitionBy layout scans one directory."""
    df = Tables(spark, sf_dir).events.select("event_id", "value", "event_type")
    path = str(tmp_path / "pruned")
    sinks.write_keyed(df, path, key="event_type")
    back = spark.read.parquet(path).filter(F.col("event_type") == "click")
    from severless_data_pipeline_aws_spark.plans import explain_str

    plan = explain_str(back)
    assert "PartitionFilters" in plan and "event_type" in plan.split("PartitionFilters")[1][:200]
    assert back.count() == df.filter(F.col("event_type") == "click").count()


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    t = Tables(spark, sf_dir)
    sinks.write_bucketed(t.orders, "b_orders", "o_orderkey", n_buckets=8)
    sinks.write_bucketed(
        t.lineitem.withColumnRenamed("l_orderkey", "o_orderkey"), "b_lineitem", "o_orderkey", n_buckets=8
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # small test tables would otherwise broadcast; the bucketed path is
        # the one that matters at 100 TB, where neither side broadcasts
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("b_orders").join(spark.table("b_lineitem"), "o_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, plan
        assert "SortMergeJoin" in plan, plan
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_compact_parquet_reduces_files_and_prunes(spark, sf_dir, tmp_path):
    t = Tables(spark, sf_dir)
    frag = str(tmp_path / "fragmented")
    compacted = str(tmp_path / "compacted")
    # simulate a micro-batched landing: many tiny files
    t.events.repartition(40).write.mode("overwrite").parquet(frag)
    import glob

    assert len(glob.glob(f"{frag}/part-*.parquet")) == 40
    n = sinks.compact_parquet(spark, frag, compacted, target_files=4, cluster_by="user_id")
    out_files = glob.glob(f"{compacted}/part-*.parquet")
    assert len(out_files) == 4
    assert n == t.events.count()
    # clustering must make the key a row-group pruning predicate: a
    # user_id filter should read fewer rows than the full table
    import pyarrow.parquet as pq

    stats = []
    for f in out_files:
        md = pq.ParquetFile(f).metadata
        names = [md.schema.column(i).name for i in range(len(md.schema))]
        col_idx = names.index("user_id")
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(col_idx).statistics
            stats.append((st.min, st.max))
    # sorted-within-files => at least one file whose whole range misses user_id 1
    assert any(mn > 1 or mx < 1 for mn, mx in stats)


def test_zorder_prunes_both_dimensions(spark, sf_dir, tmp_path):
    """Z-ordered layout must give row-group pruning on EITHER key —
    1-D sort would prune only its own column."""
    import pyarrow.parquet as pq

    t = Tables(spark, sf_dir)
    path = str(tmp_path / "zordered")
    # two high-cardinality dimensions (a 15-distinct-value key like
    # user_id can't form small rectangles over 8 files)
    sinks.write_zordered(spark, t.events, path, "event_id", "value", target_files=8)
    import glob

    files = glob.glob(f"{path}/part-*.parquet")
    assert len(files) == 8

    def ranges(col):
        out = []
        for f in files:
            md = pq.ParquetFile(f).metadata
            names = [md.schema.column(i).name for i in range(len(md.schema))]
            idx = names.index(col)
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                out.append((st.min, st.max))
        return out

    for col in ("event_id", "value"):
        rs = ranges(col)
        lo = min(mn for mn, _ in rs)
        # a point-lookup at the global minimum must skip >= half the row
        # groups on BOTH dimensions (the Morton rectangle property)
        missed = sum(1 for mn, mx in rs if not (mn <= lo <= mx))
        assert missed >= len(rs) // 2, (col, rs)
    # and the data survives the rewrite intact
    assert spark.read.parquet(path).count() == t.events.count()


def test_backfill_overwrites_only_touched_partitions(spark, sf_dir, tmp_path):
    t = Tables(spark, sf_dir)
    path = str(tmp_path / "landed_by_type")
    base = t.events.select("event_id", "value", "event_type")
    base.write.mode("overwrite").partitionBy("event_type").parquet(path)

    corrected = base.filter(F.col("event_type") == "click").withColumn(
        "value", F.col("value") * 2
    )
    sinks.backfill_partitions(spark, corrected, path, "event_type")

    after = spark.read.parquet(path)
    # untouched partitions identical
    want_other = base.filter(F.col("event_type") != "click")
    got_other = after.filter(F.col("event_type") != "click")
    assert got_other.count() == want_other.count()
    assert got_other.exceptAll(want_other.select(*got_other.columns)).count() == 0
    # backfilled partition fully replaced with corrected values
    got_click = after.filter(F.col("event_type") == "click")
    assert got_click.count() == corrected.count()
    assert got_click.exceptAll(corrected.select(*got_click.columns)).count() == 0
    # idempotence: re-running the same backfill changes nothing
    n_after = after.count()
    sinks.backfill_partitions(spark, corrected, path, "event_type")
    assert spark.read.parquet(path).count() == n_after


def test_tolerant_csv_quarantines_malformed_rows(spark, tmp_path):
    """PERMISSIVE ingest: clean rows parse fully, schema-violating rows
    survive with the raw line in _corrupt_record — no silent drops, no
    job abort."""
    from severless_data_pipeline_aws_spark.io import read_csv_tolerant

    p = tmp_path / "landing"
    p.mkdir()
    (p / "part-0.csv").write_text(
        "device_id,reading,ts\n"
        "dev_1,21.5,2024-01-01T00:00:00\n"
        "dev_2,not_a_number,2024-01-01T00:01:00\n"
        "dev_3,19.0,2024-01-01T00:02:00\n"
    )
    df = read_csv_tolerant(
        spark, str(p), "device_id STRING, reading DOUBLE, ts TIMESTAMP"
    ).cache()
    clean = df.filter(F.col("_corrupt_record").isNull())
    bad = df.filter(F.col("_corrupt_record").isNotNull())
    assert df.count() == 3
    assert clean.count() == 2
    assert bad.count() == 1
    row = bad.first()
    assert row["reading"] is None  # the violating field nulls out
    assert "not_a_number" in row["_corrupt_record"]  # raw line preserved


def test_training_shards_manifest_roundtrip(spark, sf_dir, tmp_path):
    """Shard writer: per-split layout + manifest counts match the data;
    manifest-validated read returns every row; a tampered corpus fails
    validation loudly."""
    import json

    from severless_data_pipeline_aws_spark.sources.sinks import (
        read_training_shards,
        write_training_shards,
    )

    docs = Tables(spark, sf_dir).documents.withColumn(
        "split", F.when(F.col("doc_id") % 10 < 8, "train").otherwise("val")
    )
    out = str(tmp_path / "corpus")
    manifest = write_training_shards(docs, out, target_rows_per_file=100)
    assert set(manifest["splits"]) == {"train", "val"}
    n_total = docs.count()
    assert sum(v["n_rows"] for v in manifest["splits"].values()) == n_total

    back = read_training_shards(spark, out)
    assert back.count() == n_total

    # tamper: drop a shard file -> validation must fail
    import glob
    import os

    victim = glob.glob(os.path.join(out, "split=train", "part-*.parquet"))[0]
    os.remove(victim)
    try:
        read_training_shards(spark, out)
        raise AssertionError("tampered corpus passed validation")
    except ValueError as e:
        assert "does not match manifest" in str(e)


def test_orc_roundtrip_preserves_rows(spark, sf_dir, tmp_path):
    """ORC sink/source: write the nation dim to ORC, read it back, and
    the row multiset must be identical (schema nullability aside)."""
    from severless_data_pipeline_aws_spark.io import Tables
    from severless_data_pipeline_aws_spark.sources import sinks

    d = str(tmp_path / "nation_orc")
    nation = Tables(spark, sf_dir).nation
    sinks.write_orc(nation, d)
    back = sinks.read_orc(spark, d)
    assert back.schema.fieldNames() == nation.schema.fieldNames()
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, nation.collect()))


def test_corrupt_parquet_file_policy(spark, sf_dir, tmp_path):
    """Landed-zone ops policy for a corrupt shard: the default read
    FAILS LOUDLY (silent data loss is worse than a failed job), and
    the explicit recovery path (`ignoreCorruptFiles`) reads every
    healthy row so a backfill can proceed while the shard is repaired."""
    import pytest

    from severless_data_pipeline_aws_spark.io import load_table

    d = tmp_path / "landed"
    nation = load_table(spark, sf_dir, "nation")
    nation.repartition(4).write.parquet(str(d))
    # clobber one shard with garbage that has no parquet magic bytes
    part = sorted(p for p in d.iterdir() if p.name.endswith(".parquet"))[0]
    part.write_bytes(b"not a parquet file at all")

    with pytest.raises(Exception):
        spark.read.parquet(str(d)).count()  # loud by default

    # recovery read pins the schema (footer inference would touch the
    # corrupt shard before the ignore option can skip it)
    healthy = (
        spark.read.schema(nation.schema)
        .option("ignoreCorruptFiles", "true")
        .parquet(str(d))
        .count()
    )
    assert 0 < healthy < nation.count() + 1


def test_tolerant_jsonl_quarantines_malformed_rows(spark, tmp_path):
    """PERMISSIVE JSON-lines ingest: clean rows parse, truncated/type-
    violating lines survive with the raw payload in _corrupt_record."""
    from severless_data_pipeline_aws_spark.io import read_jsonl_tolerant

    p = tmp_path / "landing_json"
    p.mkdir()
    (p / "part-0.jsonl").write_text(
        '{"device_id": "dev_1", "reading": 21.5}\n'
        '{"device_id": "dev_2", "reading": }\n'
        '{"device_id": "dev_3", "reading": 19.0}\n'
    )
    df = read_jsonl_tolerant(spark, str(p), "device_id STRING, reading DOUBLE").cache()
    clean = df.filter(F.col("_corrupt_record").isNull())
    bad = df.filter(F.col("_corrupt_record").isNotNull())
    assert df.count() == 3
    assert clean.count() == 2
    assert bad.count() == 1
    assert '"reading": }' in bad.first()["_corrupt_record"]


def test_schema_contract_gate(spark, sf_dir):
    """assert_schema passes a conforming table unchanged and names every
    drift class (missing / unexpected / retyped) in the failure."""
    import pytest

    from severless_data_pipeline_aws_spark.io import (
        SchemaContractError,
        Tables,
        assert_schema,
    )

    nation = Tables(spark, sf_dir).nation
    ddl = "n_nationkey INT, n_name STRING, n_regionkey INT"
    assert assert_schema(nation, ddl) is nation

    drifted = nation.drop("n_name").withColumn("extra", nation.n_regionkey).withColumn(
        "n_nationkey", nation.n_nationkey.cast("string")
    )
    with pytest.raises(SchemaContractError) as e:
        assert_schema(drifted, ddl)
    msg = str(e.value)
    assert "missing column n_name" in msg
    assert "unexpected column extra" in msg
    assert "type drift on n_nationkey" in msg


def test_storage_layout_report(spark, sf_dir, tmp_path):
    """The layout audit reads footers only, counts rows/groups
    correctly, and flags the small files compact_parquet would fix."""
    from severless_data_pipeline_aws_spark.io import Tables
    from severless_data_pipeline_aws_spark.sources.sinks import storage_layout_report

    out = str(tmp_path / "frag")
    Tables(spark, sf_dir).orders.repartition(6).write.parquet(out)
    rep = storage_layout_report(out)
    assert len(rep) == 6
    assert sum(r["n_rows"] for r in rep) == Tables(spark, sf_dir).orders.count()
    assert all(r["n_row_groups"] >= 1 for r in rep)
    assert all(r["small_file"] for r in rep)  # sf0.001 shards are tiny
    assert all(r["min_row_group_rows"] >= 0 for r in rep)
