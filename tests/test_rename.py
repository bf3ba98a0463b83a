"""rename_column schema evolution: old-name lake files rename lazily via
the manifest's cumulative rename map, old-name writer envelopes re-alias at
normalize, chains (a->b->c) resolve in one hop, and the guardrails hold
(key renames refused; compatibility contract enforced)."""

import os

import pyarrow as pa
import pytest

from debezium_incubator_ray import schema as S
from debezium_incubator_ray.ddl import parse_ddl
from debezium_incubator_ray.pipelines import events_cdc as EC

from tests.conftest import assert_tables_equal

SF = "/root/testdata/sf0.001"


def test_parse_ddl_rename_column():
    table, changes = parse_ddl(
        "ALTER TABLE events RENAME COLUMN props TO attrs", at_lsn=7
    )
    assert table == "events"
    assert len(changes) == 1
    ch = changes[0]
    assert (ch.change, ch.column, ch.to, ch.at_lsn) == (
        "rename_column", "props", "attrs", 7
    )


def test_apply_change_rename_moves_default_and_is_idempotent():
    schema = pa.schema([
        pa.field("k", pa.int64()), pa.field("a", pa.string()),
    ])
    defaults = {"a": "x"}
    ch = S.SchemaChange("rename_column", "a", to="b", at_lsn=0)
    s2 = S.apply_change(schema, defaults, ch)
    assert s2.names == ["k", "b"]
    assert defaults == {"b": "x"}
    assert S.apply_change(s2, defaults, ch) is s2  # replayed DDL: no-op


def test_chained_rename_resolves_v1_files(ray_session):
    """props -> attrs -> meta across two epochs: v1 files (props) and v2
    files (attrs) both resolve to the final name on read, and old-name
    writer envelopes keep applying."""
    import json

    env = EC.events_envelopes(SF)
    root = EC.scratch_dir("rename-chain")
    binlog, lake = os.path.join(root, "binlog"), os.path.join(root, "lake")
    EC.write_env_binlog(env, binlog)
    eng = EC.make_engine(lake)
    eng.apply_epoch(binlog, max_segments=EC.NUM_PARTITIONS // 2)
    with open(os.path.join(binlog, "_schema_changes.json"), "w") as f:
        json.dump(
            [S.SchemaChange("rename_column", "props", to="attrs",
                            at_lsn=0).to_json()], f
        )
    eng.apply_epoch(binlog, max_segments=EC.NUM_PARTITIONS // 4)
    with open(os.path.join(binlog, "_schema_changes.json"), "w") as f:
        json.dump(
            [S.SchemaChange("rename_column", "props", to="attrs",
                            at_lsn=0).to_json(),
             S.SchemaChange("rename_column", "attrs", to="meta",
                            at_lsn=1).to_json()], f
        )
    eng.run(binlog)
    # cumulative map chases the chain
    ren = eng.manifest.doc["defaults"][S.RENAMES_KEY]
    assert ren == {"props": "meta", "attrs": "meta"}
    got = eng.lake_table(include_lsn=True)
    assert "meta" in got.schema.names and "props" not in got.schema.names
    baseline = EC.final_state(SF).rename_columns(
        [c if c != "props" else "meta" for c in
         EC.final_state(SF).column_names]
    )
    i = got.schema.get_field_index(S.LSN)
    got = got.set_column(i, pa.field("lsn", pa.int64()), got[S.LSN])
    assert_tables_equal(
        got.sort_by([("user_id", "ascending")]),
        baseline.sort_by([("user_id", "ascending")]),
    )


def test_rename_key_refused(ray_session):
    import json

    from debezium_incubator_ray.pipelines.cdc import SchemaCompatibilityError

    env = EC.events_envelopes(SF)
    root = EC.scratch_dir("rename-key")
    binlog, lake = os.path.join(root, "binlog"), os.path.join(root, "lake")
    EC.write_env_binlog(env, binlog)
    eng = EC.make_engine(lake)
    with open(os.path.join(binlog, "_schema_changes.json"), "w") as f:
        json.dump(
            [S.SchemaChange("rename_column", "user_id", to="uid",
                            at_lsn=0).to_json()], f
        )
    with pytest.raises(SchemaCompatibilityError):
        eng.run(binlog)


def test_rename_requires_full_compatibility(ray_session):
    import json

    from debezium_incubator_ray.pipelines.cdc import SchemaCompatibilityError

    env = EC.events_envelopes(SF)
    root = EC.scratch_dir("rename-compat")
    binlog, lake = os.path.join(root, "binlog"), os.path.join(root, "lake")
    EC.write_env_binlog(env, binlog)
    eng = EC.make_engine(lake, schema_compatibility="backward")
    with open(os.path.join(binlog, "_schema_changes.json"), "w") as f:
        json.dump(
            [S.SchemaChange("rename_column", "props", to="attrs",
                            at_lsn=0).to_json()], f
        )
    with pytest.raises(SchemaCompatibilityError):
        eng.run(binlog)
