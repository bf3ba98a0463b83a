"""Textual DDL parser goldens + end-to-end DDL-text-driven evolution.

Mirrors the reference's ANTLR listener surface
(AlterTableParserListener.java:76-133 add/drop multi-column clauses,
ColumnDefinitionParserListener.java:57-130 type resolution)."""

import json
import os

import pyarrow as pa
import pytest

from debezium_incubator_ray import gen
from debezium_incubator_ray import schema as S
from debezium_incubator_ray.config import EngineConfig
from debezium_incubator_ray.ddl import DdlParseError, parse_ddl
from debezium_incubator_ray.pipelines.cdc import CdcEngine

from tests.conftest import assert_tables_equal


def test_add_single_with_default():
    t, chs = parse_ddl(
        "ALTER TABLE pages ADD COLUMN score DOUBLE DEFAULT 0.5", at_lsn=7
    )
    assert t == "pages"
    (c,) = chs
    assert (c.change, c.column, c.type, c.default, c.at_lsn) == (
        "add_column", "score", "double", 0.5, 7,
    )


def test_add_multi_column_parenthesized():
    # enterAdd_column_clause with several column_definition children
    t, chs = parse_ddl(
        "ALTER TABLE s.pages ADD (rank NUMBER(9) DEFAULT 0, note VARCHAR2(30), flag BOOLEAN)"
    )
    assert t == "pages"  # qualified name → bare table
    assert [(c.change, c.column, c.type) for c in chs] == [
        ("add_column", "rank", "int32"),
        ("add_column", "note", "string"),
        ("add_column", "flag", "bool"),
    ]
    assert chs[0].default == 0


def test_drop_forms():
    _, chs = parse_ddl("ALTER TABLE pages DROP COLUMN html")
    assert [(c.change, c.column) for c in chs] == [("drop_column", "html")]
    _, chs = parse_ddl('ALTER TABLE pages DROP ("KeepCase", b)')
    assert [(c.change, c.column) for c in chs] == [
        ("drop_column", "KeepCase"),  # quoted keeps case
        ("drop_column", "b"),
    ]


def test_modify_and_ansi_alter_column_are_widen():
    _, chs = parse_ddl("ALTER TABLE pages MODIFY fetch_ms BIGINT")
    assert [(c.change, c.column, c.type) for c in chs] == [
        ("widen_type", "fetch_ms", "int64")
    ]
    _, chs = parse_ddl("ALTER TABLE pages ALTER COLUMN fetch_ms SET DATA TYPE DOUBLE")
    assert [(c.change, c.column, c.type) for c in chs] == [
        ("widen_type", "fetch_ms", "double")
    ]


def test_number_precision_mapping():
    # NUMBER precision→width (OracleValueConverters narrowing convention)
    cases = {
        "NUMBER(2)": "int8",
        "NUMBER(4)": "int16",
        "NUMBER(9)": "int32",
        "NUMBER(18)": "int64",
        "NUMBER(20)": "decimal128(20,0)",
        "NUMBER": "decimal128(38,0)",
        "NUMBER(10,2)": "decimal128(10,2)",
        "DECIMAL(5,1)": "decimal128(5,1)",
    }
    for sql, arrow in cases.items():
        _, (c,) = parse_ddl(f"ALTER TABLE t ADD c {sql}")
        assert c.type == arrow, sql
        S.type_by_name(arrow)  # every emitted name must resolve


def test_timestamp_and_date_forms():
    for sql in (
        "TIMESTAMP", "TIMESTAMP(6)", "TIMESTAMP WITH TIME ZONE",
        "TIMESTAMP(9) WITH LOCAL TIME ZONE", "DATE",
    ):
        _, (c,) = parse_ddl(f"ALTER TABLE t ADD c {sql}")
        assert c.type == "timestamp[us]", sql


def test_constraints_swallowed_and_string_default():
    _, (c,) = parse_ddl(
        "ALTER TABLE t ADD c VARCHAR2(10) DEFAULT 'it''s' NOT NULL UNIQUE"
    )
    assert c.default == "it's"


def test_parse_errors():
    with pytest.raises(DdlParseError):
        parse_ddl("CREATE TABLE t (a INT)")  # not ALTER
    with pytest.raises(DdlParseError):
        parse_ddl("ALTER TABLE t")  # no clause
    with pytest.raises(DdlParseError):
        parse_ddl("ALTER TABLE t ADD c FANCYTYPE")


def test_engine_evolution_driven_by_ddl_text(tmp_path):
    """The raw-DDL entry shape in _schema_changes.json drives the identical
    structured evolution path end-to-end (add with backfill default)."""
    spec = gen.BinlogSpec(
        n_events=300, n_initial=60, seg_rows=64, num_partitions=2, seed=11
    )
    ev = gen.gen_events(spec)
    binlog = str(tmp_path / "binlog")
    gen.write_binlog(binlog, spec, ev)
    mid = int(ev["lsn"][len(ev["lsn"]) // 2])
    with open(os.path.join(binlog, "_schema_changes.json"), "w") as f:
        json.dump(
            [{"ddl": "ALTER TABLE pages ADD crawl_tier NUMBER(4) DEFAULT 3",
              "at_lsn": mid}],
            f,
        )

    lake = str(tmp_path / "lake")
    eng = CdcEngine(
        lake,
        EngineConfig(num_partitions=2, target_rows_per_file=64),
        payload_schema=S.pages_schema(),
    )
    eng.snapshot(gen.make_pages(spec.n_initial))
    eng.run(binlog)

    lt = eng.lake_table()
    assert lt.schema.field("crawl_tier").type == pa.int16()
    assert lt["crawl_tier"].null_count == 0
    assert set(lt["crawl_tier"].to_pylist()) == {3}  # backfill default
    oracle = gen.oracle_final_state(spec, ev)
    assert_tables_equal(
        lt.drop_columns(["crawl_tier"]), oracle, sort_by="url"
    )
