"""Run the reference's sqllogictest files on Spark.

The reference ships its behavioral-SQL contract as DuckDB
sqllogictest files (``test/sql/*.test``): DDL + INSERTs building a
tiny corpus, then behavioral queries with golden results inline. This
module executes those files VERBATIM — DDL through ``spark.sql``
(with a minimal dialect shim), queries through
:func:`duckdb_behavioral_spark.sql_surface.behavioral_sql` — and
checks each result against the file's own expected block. Passing
here means a reference user's exact SQL, and the reference author's
own acceptance tests, run unchanged on this engine.

Comparison is order-insensitive (rows sorted after rendering): the
files' ORDER BY output order encodes DuckDB's NULLS-LAST default,
which is a display concern, not behavioral semantics.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import SparkSession

_RESERVED_RESULT_SEP = "----"


@dataclass
class SltBlock:
    kind: str  # 'statement_ok' | 'statement_error' | 'query'
    sql: str
    expected: list[str] = field(default_factory=list)
    line: int = 0


def parse_slt(text: str) -> list[SltBlock]:
    lines = text.splitlines()
    blocks: list[SltBlock] = []
    i = 0
    while i < len(lines):
        ln = lines[i].strip()
        if not ln or ln.startswith("#") or ln.startswith("require"):
            i += 1
            continue
        if ln.startswith("statement") or ln.startswith("query"):
            kind = (
                "statement_error"
                if ln.startswith("statement error")
                else "statement_ok"
                if ln.startswith("statement")
                else "query"
            )
            start = i + 1
            i = start
            sql_lines: list[str] = []
            while i < len(lines) and lines[i].strip() not in ("", _RESERVED_RESULT_SEP):
                sql_lines.append(lines[i])
                i += 1
            expected: list[str] = []
            if i < len(lines) and lines[i].strip() == _RESERVED_RESULT_SEP:
                i += 1
                while i < len(lines) and lines[i].strip() != "":
                    expected.append(lines[i].rstrip("\n"))
                    i += 1
            blocks.append(
                SltBlock(kind, "\n".join(sql_lines).strip().rstrip(";"), expected, start)
            )
        else:  # stray line (shouldn't happen in well-formed files)
            i += 1
    return blocks


def _shim_ddl(spark: SparkSession, sql: str) -> list[str]:
    """Translate DuckDB DDL to Spark SQL; may expand to several
    statements (a DROP guard before CREATE)."""
    m = re.match(r"\s*CREATE\s+TABLE\s+(\w+)\s*(.*)", sql, re.IGNORECASE | re.DOTALL)
    if m:
        name, rest = m.group(1), m.group(2)
        rest = re.sub(r"\bVARCHAR\b", "STRING", rest, flags=re.IGNORECASE)
        if re.match(r"\s*AS\b", rest, re.IGNORECASE):
            create = f"CREATE TABLE {name} USING PARQUET {rest}"
        else:
            create = f"CREATE TABLE {name} {rest} USING PARQUET"
        # DROP only clears the CURRENT session's catalog; a previous
        # process may have left the managed location behind, which
        # makes CREATE fail with LOCATION_ALREADY_EXISTS
        import shutil

        wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
        shutil.rmtree(f"{wh}/{name}", ignore_errors=True)
        return [f"DROP TABLE IF EXISTS {name}", create]
    m = re.match(r"\s*INSERT\s+INTO\s+(\w+)\s+VALUES\s*(.*)", sql, re.IGNORECASE | re.DOTALL)
    if m:
        # DuckDB coerces '2024-01-01' into DATE/TIMESTAMP columns;
        # Spark's ANSI store-assignment refuses STRING→TIMESTAMP, so
        # cast each VALUES column to the target table's type.
        name, vals = m.group(1), m.group(2)
        casts = ", ".join(
            f"CAST(col{i + 1} AS {f.dataType.simpleString()}) AS {f.name}"
            for i, f in enumerate(spark.table(name).schema.fields)
        )
        return [f"INSERT INTO {name} SELECT {casts} FROM (VALUES {vals})"]
    return [sql]


def _render(v) -> str:
    from datetime import date, datetime

    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, datetime):
        s = v.strftime("%Y-%m-%d %H:%M:%S")
        if v.microsecond:
            s += f".{v.microsecond:06d}".rstrip("0")
        return s
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ", ".join(_render_elem(x) for x in v) + "]"
    return str(v)


def _render_elem(v) -> str:
    # DuckDB quotes string-ish values inside list renderings
    from datetime import date, datetime

    if isinstance(v, (datetime, date, str)):
        return f"'{_render(v)}'"
    return _render(v)


def _canon_rows(rendered: list[str]) -> list[list[str]]:
    return sorted(ln.split("\t") for ln in rendered)


def split_sql_script(text: str) -> list[str]:
    """Split a .sql script into statements on top-level semicolons
    (string-literal aware, ``--`` comments stripped)."""
    out, cur, i = [], [], 0
    while i < len(text):
        c = text[i]
        if c == "'":
            j = i + 1
            while j < len(text) and text[j] != "'":
                j += 1
            cur.append(text[i : j + 1])
            i = j + 1
            continue
        if c == "-" and text[i : i + 2] == "--":
            while i < len(text) and text[i] != "\n":
                i += 1
            continue
        if c == ";":
            stmt = "".join(cur).strip()
            if stmt:
                out.append(stmt)
            cur = []
            i += 1
            continue
        cur.append(c)
        i += 1
    tail = "".join(cur).strip()
    if tail:
        out.append(tail)
    return out


def run_sql_script(spark: SparkSession, text: str) -> list[tuple[str, int]]:
    """Execute a reference example script (e.g. ``examples/*.sql``)
    verbatim: DDL through the dialect shim, every SELECT through
    ``behavioral_sql``. Returns (statement head, row count) per SELECT
    so callers can assert the script's queries all produced output."""
    from duckdb_behavioral_spark.sql_surface import behavioral_sql

    results: list[tuple[str, int]] = []
    for stmt in split_sql_script(text):
        head = re.sub(r"\s+", " ", stmt)[:60]
        m = re.match(
            r"\s*CREATE\s+(?:OR\s+REPLACE\s+)?TABLE\s+(\w+)\s*(.*)",
            stmt,
            re.IGNORECASE | re.DOTALL,
        )
        if m:
            for s in _shim_ddl(spark, f"CREATE TABLE {m.group(1)} {m.group(2)}"):
                spark.sql(s)
            continue
        if re.match(r"\s*(SELECT|WITH)\b", stmt, re.IGNORECASE):
            results.append((head, len(behavioral_sql(spark, stmt).collect())))
        else:  # other DDL (INSERT etc.) through the shim
            for s in _shim_ddl(spark, stmt):
                spark.sql(s)
    return results


@dataclass
class SltResult:
    queries: int = 0
    failures: list[str] = field(default_factory=list)


def run_slt(spark: SparkSession, text: str, name: str = "<slt>") -> SltResult:
    """Execute one .test file's blocks; returns per-query outcomes."""
    from duckdb_behavioral_spark.sql_surface import behavioral_sql

    res = SltResult()
    for blk in parse_slt(text):
        if blk.kind == "statement_ok":
            for stmt in _shim_ddl(spark, blk.sql):
                spark.sql(stmt)
            continue
        if blk.kind == "statement_error":
            try:
                behavioral_sql(spark, blk.sql).collect()
            except Exception:
                continue
            res.failures.append(f"{name}:{blk.line}: expected an error, got success")
            continue
        res.queries += 1
        try:
            rows = behavioral_sql(spark, blk.sql).collect()
        except Exception as exc:  # noqa: BLE001 — reported, not fatal
            res.failures.append(f"{name}:{blk.line}: raised {exc}")
            continue
        got = _canon_rows(["\t".join(_render(v) for v in row) for row in rows])
        want = _canon_rows(blk.expected)
        if got != want:
            res.failures.append(
                f"{name}:{blk.line}:\n  want={want}\n  got ={got}"
            )
    return res
