"""Schema evolution end-to-end (M6): structured add_column events with
default backfill, mixed-version segments, lazy lake-file upgrade.

Mirrors OracleDdlParserTest.java:79-103 (ALTER TABLE add/drop assertions) and
the schema-history recovery semantics (OracleConnectorTask.java:73-76) — but
with structured control events instead of DDL text.
"""

import numpy as np
import pyarrow as pa

from debezium_incubator_ray import gen
from debezium_incubator_ray import schema as S
from debezium_incubator_ray.config import EngineConfig
from debezium_incubator_ray.pipelines.cdc import CdcEngine

from tests.conftest import assert_tables_equal


def _world(tmp_path, at_lsn):
    spec = gen.BinlogSpec(
        n_events=500,
        n_initial=100,
        seg_rows=80,
        num_partitions=4,
        seed=21,
        schema_changes=[
            S.SchemaChange("add_column", "fetch_status", "int32", 200, at_lsn=at_lsn)
        ],
    )
    ev = gen.gen_events(spec)
    binlog = str(tmp_path / "binlog")
    gen.write_binlog(binlog, spec, ev)
    return spec, ev, binlog, str(tmp_path / "lake")


def test_schema_evolution_mid_stream(tmp_path):
    spec, ev, binlog, lake = _world(tmp_path, at_lsn=250)
    cfg = EngineConfig(num_partitions=4, target_rows_per_file=64, apply_concurrency=2)
    eng = CdcEngine(lake, cfg, payload_schema=S.pages_schema())
    eng.snapshot(gen.make_pages(spec.n_initial))
    eng.run(binlog)

    oracle = gen.oracle_final_state(spec, ev)
    got = eng.lake_table()
    assert "fetch_status" in got.column_names
    assert got.schema.field("fetch_status").type == pa.int32()
    assert_tables_equal(got, oracle, sort_by="url")

    # rows last written before the change carry the default backfill
    fs = got["fetch_status"].to_pylist()
    assert 200 in fs  # some backfilled
    assert any(v != 200 for v in fs)  # some carried real values

    # manifest recorded the schema history with its activation lsn (T3)
    versions = eng.manifest.doc["schemas"]
    assert [v["version"] for v in versions] == [1, 2]
    assert versions[1]["changes"][0]["column"] == "fetch_status"


def test_schema_evolution_survives_restart(tmp_path):
    spec, ev, binlog, lake = _world(tmp_path, at_lsn=250)
    cfg = EngineConfig(num_partitions=4, target_rows_per_file=64, apply_concurrency=2)
    eng = CdcEngine(lake, cfg, payload_schema=S.pages_schema())
    eng.snapshot(gen.make_pages(spec.n_initial))
    eng.apply_epoch(binlog, max_segments=2)
    del eng

    eng2 = CdcEngine(lake)  # schema history must come back from the manifest
    eng2.run(binlog)
    oracle = gen.oracle_final_state(spec, ev)
    assert_tables_equal(eng2.lake_table(), oracle, sort_by="url")

    # idempotent DDL replay: a second epoch planning pass must not re-apply
    v = eng2.manifest.doc["schemas"][-1]["version"]
    eng2.apply_epoch(binlog)
    assert eng2.manifest.doc["schemas"][-1]["version"] == v


def test_schema_compatibility_gate(tmp_path):
    """schema_compatibility='backward' refuses a drop_column DDL before
    any data applies; 'additive' refuses widen; 'full' allows all."""
    import pytest
    from debezium_incubator_ray.pipelines.cdc import SchemaCompatibilityError

    def world(tag, change):
        spec = gen.BinlogSpec(
            n_events=200, n_initial=50, seg_rows=80, num_partitions=4,
            seed=5, schema_changes=[change],
        )
        ev = gen.gen_events(spec)
        binlog = str(tmp_path / f"binlog-{tag}")
        gen.write_binlog(binlog, spec, ev)
        return spec, binlog, str(tmp_path / f"lake-{tag}")

    drop = S.SchemaChange("drop_column", "lang", None, None, at_lsn=100)
    widen = S.SchemaChange("widen_type", "fetch_ms", "int64", None,
                           at_lsn=100)

    # backward refuses drop; the lake is untouched (manifest version 1)
    spec, binlog, lake = world("bw", drop)
    cfg = EngineConfig(num_partitions=4, apply_concurrency=2,
                       schema_compatibility="backward")
    eng = CdcEngine(lake, cfg, payload_schema=S.pages_schema())
    eng.snapshot(gen.make_pages(spec.n_initial))
    v0 = eng.manifest.doc["version"]
    with pytest.raises(SchemaCompatibilityError, match="drop_column"):
        eng.run(binlog)
    eng2 = CdcEngine(lake)  # reopen: nothing from the epoch landed
    assert len(eng2.manifest.doc["schemas"]) == 1
    assert eng2.manifest.doc["version"] == v0
    eng.close()
    eng2.close()

    # additive refuses widen
    spec, binlog, lake = world("add", widen)
    cfg = EngineConfig(num_partitions=4, apply_concurrency=2,
                       schema_compatibility="additive")
    eng = CdcEngine(lake, cfg, payload_schema=S.pages_schema())
    eng.snapshot(gen.make_pages(spec.n_initial))
    with pytest.raises(SchemaCompatibilityError, match="widen_type"):
        eng.run(binlog)
    eng.close()

    # full allows the drop end-to-end
    spec, binlog, lake = world("full", drop)
    cfg = EngineConfig(num_partitions=4, apply_concurrency=2,
                       schema_compatibility="full")
    eng = CdcEngine(lake, cfg, payload_schema=S.pages_schema())
    eng.snapshot(gen.make_pages(spec.n_initial))
    eng.run(binlog)
    assert "lang" not in eng.lake_table().column_names
    eng.close()
