"""Textual DDL parser: ALTER TABLE statements → structured SchemaChange.

Reference parity: the Oracle connector parses DDL text with ANTLR and a
listener stack — OracleDdlParser.java:44-110 dispatches into
AlterTableParserListener.java:76-133 (enterAdd_column_clause /
enterDrop_column_clause, multi-column forms) with type resolution in
ColumnDefinitionParserListener.java:57-130 (NUMBER precision→width,
DATE→timestamp, TIMESTAMP [WITH [LOCAL] TIME ZONE], VARCHAR2, etc.).

This engine's control plane is structured (schema.SchemaChange), so the
ANTLR grammar is replaced by a small tokenizer over the ALTER TABLE subset
the listeners actually implement: ADD (single + parenthesized multi-column,
DEFAULT literals), DROP COLUMN (single + parenthesized list), and
MODIFY/ALTER COLUMN type changes (→ widen_type; the structured
apply_change enforces the widen-only rule exactly as the engine does for
structured events). Everything downstream — history persistence, lazy lake
upgrade, default backfill — is the one structured path.

Identifier case follows the reference's dialect rule: unquoted identifiers
fold (to lower — our lake columns are lower-case), double-quoted keep case.
"""

from __future__ import annotations

import dataclasses
import re
from typing import Any, List, Optional, Tuple

from debezium_incubator_ray.schema import SchemaChange


class DdlParseError(ValueError):
    pass


@dataclasses.dataclass
class TableDef:
    """Structured CREATE TABLE result (the reference's
    CreateTableParserListener.java:28-49 builds a TableEditor the same
    way: column list in DDL order + the primary-key name set).

    ``columns``: (name, arrow type name, default literal or None,
    nullable) — NOT NULL / PRIMARY KEY columns parse as non-nullable,
    mirroring the reference's Column.isOptional()."""

    name: str
    columns: List[Tuple[str, str, Any, bool]]
    primary_key: List[str]

    def arrow_schema(self):
        import pyarrow as pa

        from debezium_incubator_ray import schema as S

        pk = {c for c in self.primary_key}
        return pa.schema(
            [
                pa.field(n, S.type_by_name(t),
                         nullable=nullable and n not in pk)
                for n, t, _, nullable in self.columns
            ]
        )

    def defaults(self) -> dict:
        return {n: d for n, t, d, _ in self.columns if d is not None}


# SQL type → arrow type name (schema.type_by_name). NUMBER precision→width
# mirrors OracleValueConverters' integer narrowing (p<3 → int8, <5 → int16,
# <10 → int32, <19 → int64, else decimal128) and functions/typeconv.py's
# narrow_int_by_width widths.
def _map_number(precision: Optional[int], scale: Optional[int]) -> str:
    if scale not in (None, 0):
        return f"decimal128({precision or 38},{scale})"
    if precision is None:  # NUMBER with no precision: variable scale
        return "decimal128(38,0)"
    if precision < 3:
        return "int8"
    if precision < 5:
        return "int16"
    if precision < 10:
        return "int32"
    if precision < 19:
        return "int64"
    return f"decimal128({precision},0)"


_SIMPLE_TYPES = {
    "TINYINT": "int8",
    "SMALLINT": "int16",
    "INT": "int64",
    "INTEGER": "int64",
    "BIGINT": "int64",
    "FLOAT": "float",
    "REAL": "float",
    "BINARY_FLOAT": "float",
    "BINARY_DOUBLE": "double",
    "VARCHAR": "string",
    "VARCHAR2": "string",
    "NVARCHAR2": "string",
    "CHAR": "string",
    "NCHAR": "string",
    "TEXT": "string",
    "STRING": "string",
    "CLOB": "string",
    "BLOB": "binary",
    "RAW": "binary",
    "BINARY": "binary",
    "BOOLEAN": "bool",
    "BOOL": "bool",
    # Oracle DATE carries time — the JDBC driver reports TIMESTAMP
    # (ColumnDefinitionParserListener.java:80-84)
    "DATE": "timestamp[us]",
    "TIMESTAMP": "timestamp[us]",
}

_TOKEN_RE = re.compile(
    r"""\s*(?:
        (?P<quoted>"[^"]*")
      | (?P<str>'(?:[^']|'')*')
      | (?P<num>-?\d+(?:\.\d+)?)
      | (?P<word>[A-Za-z_][A-Za-z0-9_$#]*)
      | (?P<punct>[(),.;])
    )""",
    re.VERBOSE,
)


def _tokenize(text: str) -> List[str]:
    out, pos = [], 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if not m:
            if text[pos:].strip() == "":
                break
            raise DdlParseError(f"unparseable DDL at {text[pos:pos+20]!r}")
        out.append(m.group(0).strip())
        pos = m.end()
    return out


class _Cursor:
    def __init__(self, toks: List[str]):
        self.toks = toks
        self.i = 0

    def peek(self) -> Optional[str]:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def peek_kw(self) -> Optional[str]:
        t = self.peek()
        return t.upper() if t is not None else None

    def next(self) -> str:
        t = self.peek()
        if t is None:
            raise DdlParseError("unexpected end of DDL")
        self.i += 1
        return t

    def expect_kw(self, *kws: str) -> str:
        t = self.next().upper()
        if t not in kws:
            raise DdlParseError(f"expected {'/'.join(kws)}, got {t!r}")
        return t

    def accept_kw(self, *kws: str) -> bool:
        if self.peek_kw() in kws:
            self.i += 1
            return True
        return False


def _ident(cur: _Cursor) -> str:
    t = cur.next()
    if t.startswith('"'):
        return t[1:-1]  # quoted: keep case
    if not re.match(r"[A-Za-z_]", t):
        raise DdlParseError(f"expected identifier, got {t!r}")
    return t.lower()  # unquoted: fold


def _qualified_ident(cur: _Cursor) -> str:
    """schema.table / catalog.schema.table → last component (TableId
    semantics — the engine is per-table; Lake routes by bare name)."""
    name = _ident(cur)
    while cur.peek() == ".":
        cur.next()
        name = _ident(cur)
    return name


def _parse_type(cur: _Cursor) -> str:
    kw = cur.next().upper()
    precision = scale = None
    if kw in ("NUMBER", "NUMERIC", "DECIMAL", "DEC"):
        if cur.peek() == "(":
            cur.next()
            precision = int(cur.next())
            if cur.peek() == ",":
                cur.next()
                scale = int(cur.next())
            cur.expect_kw(")")
        return _map_number(precision, scale)
    if kw == "DOUBLE":
        cur.accept_kw("PRECISION")
        return "double"
    if kw == "LONG":  # Oracle LONG text
        return "string"
    if kw not in _SIMPLE_TYPES:
        raise DdlParseError(f"unsupported type {kw!r}")
    arrow = _SIMPLE_TYPES[kw]
    # length/precision part: VARCHAR2(30), TIMESTAMP(6), CHAR(1 BYTE)...
    if cur.peek() == "(":
        cur.next()
        while cur.peek() != ")":
            cur.next()
        cur.next()
    if kw == "TIMESTAMP" and cur.peek_kw() == "WITH":
        # TIMESTAMP WITH [LOCAL] TIME ZONE → zoned values arrive via
        # typeconv.timestamptz_to_iso; storage type stays timestamp[us]
        cur.expect_kw("WITH")
        cur.accept_kw("LOCAL")
        cur.expect_kw("TIME")
        cur.expect_kw("ZONE")
    return arrow


def _parse_default(cur: _Cursor) -> Any:
    t = cur.next()
    u = t.upper()
    if u == "NULL":
        return None
    if u == "TRUE":
        return True
    if u == "FALSE":
        return False
    if t.startswith("'"):
        return t[1:-1].replace("''", "'")
    try:
        return int(t)
    except ValueError:
        try:
            return float(t)
        except ValueError:
            raise DdlParseError(f"unsupported DEFAULT literal {t!r}")


def _skip_constraints(cur: _Cursor) -> None:
    """Swallow trailing column constraints (NOT NULL, PRIMARY KEY, UNIQUE)
    — nullability/keys don't evolve the arrow payload schema here."""
    while True:
        kw = cur.peek_kw()
        if kw == "NOT":
            cur.next()
            cur.expect_kw("NULL")
        elif kw == "PRIMARY":
            cur.next()
            cur.expect_kw("KEY")
        elif kw in ("UNIQUE", "NULL"):
            cur.next()
        else:
            return


def _one_add(cur: _Cursor, at_lsn: int) -> SchemaChange:
    col = _ident(cur)
    typ = _parse_type(cur)
    default = None
    if cur.accept_kw("DEFAULT"):
        default = _parse_default(cur)
    _skip_constraints(cur)
    return SchemaChange("add_column", col, type=typ, default=default, at_lsn=at_lsn)


def _one_modify(cur: _Cursor, at_lsn: int) -> SchemaChange:
    col = _ident(cur)
    typ = _parse_type(cur)
    _skip_constraints(cur)
    return SchemaChange("widen_type", col, type=typ, at_lsn=at_lsn)


def _parse_create_table(cur: _Cursor) -> TableDef:
    """CREATE TABLE t (col type [DEFAULT lit] [constraints]..., PRIMARY KEY
    (c1, ...)) — the CreateTableParserListener.java:28-49 surface driven
    through OracleDdlParserTest.java:43-113's create_table.sql golden.
    Inline ``PRIMARY KEY`` on a column definition is accepted too."""
    name = _qualified_ident(cur)
    cur.expect_kw("(")
    columns: List[Tuple[str, str, Any]] = []
    pk: List[str] = []
    while True:
        if cur.peek_kw() == "PRIMARY":  # table-level PRIMARY KEY (c1, ...)
            cur.next()
            cur.expect_kw("KEY")
            cur.expect_kw("(")
            while True:
                pk.append(_ident(cur))
                if cur.peek() == ",":
                    cur.next()
                    continue
                cur.expect_kw(")")
                break
        else:
            col = _ident(cur)
            typ = _parse_type(cur)
            default = None
            nullable = True
            # constraints may precede/follow DEFAULT in Oracle DDL
            while True:
                kw = cur.peek_kw()
                if kw == "PRIMARY":  # inline: col type PRIMARY KEY
                    cur.next()
                    cur.expect_kw("KEY")
                    pk.append(col)
                elif kw == "DEFAULT":
                    cur.next()
                    default = _parse_default(cur)
                elif kw == "NOT":
                    cur.next()
                    cur.expect_kw("NULL")
                    nullable = False
                elif kw in ("UNIQUE", "NULL"):
                    cur.next()
                else:
                    break
            columns.append((col, typ, default, nullable))
        if cur.peek() == ",":
            cur.next()
            continue
        cur.expect_kw(")")
        break
    if cur.peek() == ";":
        cur.next()
    if not columns:
        raise DdlParseError("CREATE TABLE with no columns")
    return TableDef(name=name, columns=columns, primary_key=pk)


def parse_statement(text: str, at_lsn: int = 0):
    """Parse ONE DDL statement into a structured op — the full
    OracleDdlParser.java:44-110 listener surface:

      ("create", TableDef)                      CreateTableParserListener
      ("drop", table_name, {"purge": bool})     DropTableParserListener
      ("alter", table_name, [SchemaChange...])  AlterTableParserListener

    DROP TABLE accepts the Oracle trailers ``CASCADE CONSTRAINTS`` and
    ``PURGE`` (purge = skip the recycle bin → Lake maps it to
    delete_files=True)."""
    cur = _Cursor(_tokenize(text))
    head = cur.expect_kw("CREATE", "DROP", "ALTER")
    if head == "CREATE":
        cur.expect_kw("TABLE")
        return ("create", _parse_create_table(cur))
    if head == "DROP":
        cur.expect_kw("TABLE")
        name = _qualified_ident(cur)
        purge = False
        while cur.peek() is not None and cur.peek() != ";":
            kw = cur.expect_kw("CASCADE", "CONSTRAINTS", "CONSTRAINS",
                               "PURGE")
            if kw == "PURGE":
                purge = True
        return ("drop", name, {"purge": purge})
    table, changes = _parse_alter_body(cur, at_lsn)
    return ("alter", table, changes)


def parse_ddl(text: str, at_lsn: int = 0) -> Tuple[str, List[SchemaChange]]:
    """Parse one ALTER TABLE statement → (table_name, [SchemaChange...]).

    Supported (the AlterTableParserListener surface):
      ALTER TABLE t ADD [COLUMN] c TYPE [DEFAULT lit] [constraints]
      ALTER TABLE t ADD (c1 T1 [DEFAULT l1], c2 T2, ...)
      ALTER TABLE t DROP COLUMN c   |   DROP (c1, c2, ...)
      ALTER TABLE t MODIFY c TYPE   |   MODIFY (c1 T1, c2 T2, ...)
      ALTER TABLE t ALTER [COLUMN] c [SET DATA] TYPE T   (ANSI spelling)
      ALTER TABLE t RENAME COLUMN a TO b
    """
    cur = _Cursor(_tokenize(text))
    cur.expect_kw("ALTER")
    return _parse_alter_body(cur, at_lsn)


def _parse_alter_body(cur: _Cursor, at_lsn: int) -> Tuple[str, List[SchemaChange]]:
    cur.expect_kw("TABLE")
    table = _qualified_ident(cur)
    changes: List[SchemaChange] = []
    while cur.peek() is not None:
        if cur.peek() == ";":
            cur.next()
            continue
        verb = cur.expect_kw("ADD", "DROP", "MODIFY", "ALTER", "RENAME")
        if verb == "ADD":
            cur.accept_kw("COLUMN")
            if cur.peek() == "(":
                cur.next()
                while True:
                    changes.append(_one_add(cur, at_lsn))
                    if cur.peek() == ",":
                        cur.next()
                        continue
                    cur.expect_kw(")")
                    break
            else:
                changes.append(_one_add(cur, at_lsn))
        elif verb == "DROP":
            if cur.peek() == "(":
                cur.next()
                while True:
                    changes.append(
                        SchemaChange("drop_column", _ident(cur), at_lsn=at_lsn)
                    )
                    if cur.peek() == ",":
                        cur.next()
                        continue
                    cur.expect_kw(")")
                    break
            else:
                cur.accept_kw("COLUMN")
                changes.append(
                    SchemaChange("drop_column", _ident(cur), at_lsn=at_lsn)
                )
        elif verb == "MODIFY":
            if cur.peek() == "(":
                cur.next()
                while True:
                    changes.append(_one_modify(cur, at_lsn))
                    if cur.peek() == ",":
                        cur.next()
                        continue
                    cur.expect_kw(")")
                    break
            else:
                changes.append(_one_modify(cur, at_lsn))
        elif verb == "RENAME":  # RENAME COLUMN a TO b
            cur.expect_kw("COLUMN")
            old_name = _ident(cur)
            cur.expect_kw("TO")
            changes.append(
                SchemaChange(
                    "rename_column", old_name, to=_ident(cur), at_lsn=at_lsn
                )
            )
        else:  # ALTER [COLUMN] c [SET DATA] TYPE T
            cur.accept_kw("COLUMN")
            col = _ident(cur)
            if cur.accept_kw("SET"):
                cur.expect_kw("DATA")
            cur.expect_kw("TYPE")
            typ = _parse_type(cur)
            _skip_constraints(cur)
            changes.append(SchemaChange("widen_type", col, type=typ, at_lsn=at_lsn))
    if not changes:
        raise DdlParseError("ALTER TABLE with no column clause")
    return table, changes
