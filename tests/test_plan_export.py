"""Plan export (the ndto:write/2 analog): stable, inspectable artifacts."""

from __future__ import annotations

import json

from ndto_spark import fixtures
from ndto_spark.images import IMAGE_METADATA_RULES
from ndto_spark.plan_export import export_ruleset, write_plan


def test_plan_export_stable_and_inspectable(spark, tmp_path):
    df = fixtures.synth_images(spark, 10, n_partitions=1, seed=42)
    p1 = export_ruleset(df, IMAGE_METADATA_RULES)
    p2 = export_ruleset(df, IMAGE_METADATA_RULES)
    assert p1 == p2, "export must be deterministic for the same ruleset"
    assert set(p1["columns"]) == set(IMAGE_METADATA_RULES)
    cap = p1["columns"]["caption"]
    assert cap["spark_type"] == "string"
    assert "256" in cap["predicate"]  # the max_length bound is visible
    assert "String length" in cap["violation"]  # and the message template

    out = tmp_path / "plan.json"
    plan = write_plan(str(out), df, IMAGE_METADATA_RULES)
    on_disk = json.loads(out.read_text())
    assert on_disk["plan_hash"] == plan["plan_hash"]
    assert on_disk["format"] == "ndto_spark-plan/1"

    # the hash fingerprints the compiled form, not just the spec dict
    changed = dict(IMAGE_METADATA_RULES)
    changed["w"] = {"type": "integer", "minimum": 2}
    assert export_ruleset(df, changed)["plan_hash"] != plan["plan_hash"]
