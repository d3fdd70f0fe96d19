"""Structured Streaming validation: same rules, streaming source."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ndto_spark.streaming import validate_stream, windowed_verdicts

EVENT_RULES = {
    "event_type": {"enum": ["click", "view", "purchase", "signup"]},
    "value": {"type": "float", "minimum": 0, "exclusive_minimum": True, "maximum": 400},
}


@pytest.fixture()
def events_stream(spark, tmp_path):
    src = str(tmp_path / "src")
    batch = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    batch.write.parquet(src)
    return spark.readStream.schema(batch.schema).parquet(src), batch


def test_stream_violations_match_batch(spark, events_stream, tmp_path):
    stream, batch = events_stream
    out = validate_stream(stream, EVENT_RULES, key="event_id")
    q = (
        out.writeStream.format("memory")
        .queryName("viols")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from viols")
    from ndto_spark.runner import validate

    want = validate(batch, EVENT_RULES, key="event_id").violations.drop("partition_id")
    assert got.count() == want.count() > 0
    key = ["event_id", "column", "schema_path", "keyword", "description"]
    assert sorted(map(tuple, got.select(*key).collect())) == sorted(
        map(tuple, want.select(*key).collect())
    )


def test_windowed_verdicts(spark, events_stream, tmp_path):
    stream, batch = events_stream
    out = windowed_verdicts(
        stream, EVENT_RULES, ts_col="ts", window_duration="1 hour"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("verdicts")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from verdicts").collect()
    assert sum(r.n_rows for r in rows) == batch.count()
    assert any(not r["pass"] for r in rows)
