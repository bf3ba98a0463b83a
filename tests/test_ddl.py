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


# ---------------------------------------------------------------------------
# CREATE TABLE / DROP TABLE (CreateTableParserListener.java:28-49,
# DropTableParserListener.java:24-43; goldens mirror
# OracleDdlParserTest.java:43-113 over test resource ddl/create_table.sql)

CREATE_TABLE_GOLDEN = """create table DEBEZIUM
(id number(19) not null,
col1 number(4,2),
col2 varchar2(255) default 'debezium' not null ,
col3 nvarchar2(255) not null,
col4 char(4),
col5 nchar(4),
col6 float(126),
col7 date,
col8 timestamp,
col9 blob,
col10 clob,
primary key (id));"""


def test_parse_create_table_golden():
    from debezium_incubator_ray.ddl import parse_statement

    kind, tdef = parse_statement(CREATE_TABLE_GOLDEN)
    assert kind == "create"
    assert tdef.name == "debezium"
    names = [c[0] for c in tdef.columns]
    assert names == ["id", "col1", "col2", "col3", "col4", "col5", "col6",
                     "col7", "col8", "col9", "col10"]
    types = {c[0]: c[1] for c in tdef.columns}
    assert types["id"] == "decimal128(19,0)"    # number(19)
    assert types["col1"] == "decimal128(4,2)"   # number(4,2)
    assert types["col2"] == "string"            # varchar2(255)
    assert types["col6"] == "float"             # float(126)
    assert types["col7"] == "timestamp[us]"     # oracle DATE carries time
    assert types["col8"] == "timestamp[us]"
    assert types["col9"] == "binary"            # blob
    assert types["col10"] == "string"           # clob
    assert tdef.primary_key == ["id"]
    assert tdef.defaults() == {"col2": "debezium"}
    nullable = {c[0]: c[3] for c in tdef.columns}
    assert not nullable["id"] and not nullable["col2"] and nullable["col1"]
    sch = tdef.arrow_schema()
    assert sch.field("id").type == pa.decimal128(19, 0)
    assert not sch.field("id").nullable
    assert sch.field("col1").nullable


def test_parse_create_inline_pk_and_composite():
    from debezium_incubator_ray.ddl import parse_statement

    _, tdef = parse_statement(
        "CREATE TABLE t (id NUMBER(18) PRIMARY KEY, v CLOB)"
    )
    assert tdef.primary_key == ["id"]
    assert not tdef.arrow_schema().field("id").nullable

    _, tdef = parse_statement(
        "CREATE TABLE t2 (a NUMBER(9), b VARCHAR2(10), v BINARY_DOUBLE, "
        "PRIMARY KEY (a, b))"
    )
    assert tdef.primary_key == ["a", "b"]
    assert [c[1] for c in tdef.columns] == ["int32", "string", "double"]


def test_parse_drop_table():
    from debezium_incubator_ray.ddl import parse_statement

    assert parse_statement("drop table DEBEZIUM;") == (
        "drop", "debezium", {"purge": False})
    assert parse_statement(
        "drop table sch.DEBEZIUM cascade constraints purge") == (
        "drop", "debezium", {"purge": True})
    with pytest.raises(DdlParseError):
        parse_statement("DROP TABLE t NONSENSE")


def test_parse_statement_alter_delegates():
    from debezium_incubator_ray.ddl import parse_statement

    kind, t, chs = parse_statement(
        "ALTER TABLE DEBEZIUM add (col21 varchar2(20), col22 number(19));"
    )
    assert (kind, t) == ("alter", "debezium")
    assert [(c.change, c.column, c.type) for c in chs] == [
        ("add_column", "col21", "string"),
        ("add_column", "col22", "decimal128(19,0)"),
    ]


def test_lake_lifecycle_from_ddl_control_segment(tmp_path):
    """CREATE + decoy CREATE + DROP PURGE driven from the binlog's
    _schema_changes.json via Lake.process_ddl_segment; the created engine
    then ingests the pages stream and matches the oracle. The same control
    file's ALTER entry still reaches the engine's own epoch path."""
    from debezium_incubator_ray.pipelines.lake import Lake

    spec = gen.BinlogSpec(n_events=300, n_initial=60, seg_rows=64,
                          num_partitions=2, seed=5)
    ev = gen.gen_events(spec)
    binlog = str(tmp_path / "binlog")
    gen.write_binlog(binlog, spec, ev)
    with open(os.path.join(binlog, "_schema_changes.json"), "w") as f:
        json.dump([
            {"ddl": "CREATE TABLE pages (url VARCHAR2(2048) PRIMARY KEY, "
                    "warc_ts TIMESTAMP, html BLOB, text CLOB, "
                    "lang VARCHAR2(8))"},
            {"ddl": "CREATE TABLE decoy (id NUMBER(19) PRIMARY KEY, v CLOB)"},
            {"ddl": "DROP TABLE decoy PURGE"},
        ], f)

    lake = Lake(str(tmp_path / "lake"))
    cfg = EngineConfig(num_partitions=2, target_rows_per_file=64)
    ops = lake.process_ddl_segment(binlog, config=cfg)
    assert ops == [("create", "pages"), ("create", "decoy"),
                   ("drop", "decoy")]
    assert lake.table_names() == ["pages"]
    assert not os.path.exists(str(tmp_path / "lake" / "decoy"))
    eng = lake["pages"]
    assert eng.cfg.key == "url"  # from the parsed PRIMARY KEY

    eng.snapshot(gen.make_pages(spec.n_initial))
    eng.run(binlog)
    lt = eng.lake_table()
    oracle = gen.oracle_final_state(spec, ev)
    # DDL-created schema uses string/binary (not large_*): compare values
    assert_tables_equal(lt, oracle, sort_by="url")


def test_apply_ddl_alter_and_guards(tmp_path):
    """apply_ddl's three review-pinned laws: ALTER actually evolves the
    table's schema durably (replay = no-op); a PK-less CREATE without a
    valid config key is rejected; re-CREATE of an existing table is a
    pure attach that ignores the new statement's defaults/key."""
    from debezium_incubator_ray.pipelines.lake import Lake

    lake = Lake(str(tmp_path / "lake"))
    cfg = EngineConfig(num_partitions=2, target_rows_per_file=64)

    # PK-less CREATE: rejected without a config key that exists
    with pytest.raises(ValueError, match="no PRIMARY KEY"):
        lake.apply_ddl("CREATE TABLE nokey (a NUMBER(9), b CLOB)")
    with pytest.raises(ValueError, match="no PRIMARY KEY"):
        lake.apply_ddl("CREATE TABLE nokey (a NUMBER(9), b CLOB)",
                       config=EngineConfig(key="missing"))
    # ...accepted when the config names a real column
    kind, eng0 = lake.apply_ddl(
        "CREATE TABLE nokey (a NUMBER(18), b CLOB)",
        config=EngineConfig(key="a", num_partitions=2),
    )
    assert kind == "create" and eng0.cfg.key == "a"

    kind, eng = lake.apply_ddl(
        "CREATE TABLE t (id NUMBER(18) PRIMARY KEY, "
        "v VARCHAR2(10) DEFAULT 'x')", config=cfg)
    assert kind == "create"
    assert eng.manifest.doc["defaults"] == {"v": "x"}

    # ALTER applies through the validated history path, durably
    kind, name, chs = lake.apply_ddl(
        "ALTER TABLE t ADD score BINARY_DOUBLE DEFAULT -1.0", at_lsn=5)
    assert (kind, name) == ("alter", "t") and len(chs) == 1
    assert eng.manifest.current_schema().field("score").type == pa.float64()
    assert eng.manifest.doc["defaults"]["score"] == -1.0
    v = eng.manifest.version
    # replaying the same DDL is a no-op (same (change, column, at_lsn))
    lake.apply_ddl("ALTER TABLE t ADD score BINARY_DOUBLE DEFAULT -1.0",
                   at_lsn=5)
    assert eng.manifest.version == v

    # ALTER on an unknown table is an error, not a silent return
    with pytest.raises(KeyError):
        lake.apply_ddl("ALTER TABLE ghost ADD c INT")

    # re-CREATE: pure attach — new defaults/key/schema ignored
    kind, eng2 = lake.apply_ddl(
        "CREATE TABLE t (other NUMBER(18) PRIMARY KEY, w CLOB DEFAULT 'y')")
    assert eng2 is eng
    assert "w" not in eng.manifest.doc["defaults"]
    assert eng.cfg.key == "id"
