"""SQL DML over registered txlog tables (round-10 ask #2).

``txlog.register_table`` made transactional snapshots SQL-readable; the
first thing a SQL-first user does next is ``INSERT INTO`` /
``DELETE FROM`` / ``MERGE INTO`` (the reference's lake exists to be
queried — /root/reference/README.md:3 — and a queryable lake that can
only be mutated through a Python API is half a surface).
:func:`execute_sql` is the single entry point: it routes the DML verbs
to the transactional Python API with IDENTICAL conflict/CDF semantics
and hands every other statement to ``spark.sql`` unchanged.

Routing (the documented subset — a statement outside it raises a
curated error naming the restriction and the Python-API escape hatch):

- ``INSERT INTO <table> [(cols)] <SELECT …|VALUES …>`` → :func:`txlog.append`
- ``INSERT OVERWRITE <table> <SELECT …|VALUES …>`` → :func:`txlog.overwrite_table`
- ``DELETE FROM <table> [WHERE <cond>]`` → :func:`txlog.delete_where`
- ``UPDATE <table> SET c = e, … [WHERE <cond>]`` → :func:`txlog.update_where`
  (ANSI: every RHS sees the old row; store-assignment casts; never
  evolves a schema)
- ``ALTER TABLE <table> RENAME COLUMN a TO b | DROP COLUMN a |
  ALTER/CHANGE COLUMN a TYPE t | SET/UNSET TBLPROPERTIES (…)`` →
  :func:`txlog.rename_column` / :func:`txlog.drop_column` /
  :func:`txlog.widen_column` / :func:`txlog.set_table_properties`
- ``OPTIMIZE <table>`` → :func:`txlog.optimize` (policy-driven);
  ``VACUUM <table> [RETAIN n HOURS]`` → :func:`txlog.vacuum`
- ``DESCRIBE HISTORY <table>`` → :func:`txlog.history` as a DataFrame;
  ``RESTORE TABLE <table> TO VERSION AS OF n`` → :func:`txlog.restore`
  (with ``cdc=True`` so the change feed stays replayable across it)
- ``MERGE INTO <table> [AS] t USING <view|(subquery)> [AS] s
  ON t.k = s.k [AND …]
  [WHEN MATCHED [AND <c>] THEN UPDATE SET *]
  [WHEN MATCHED [AND <c>] THEN DELETE]
  [WHEN NOT MATCHED [AND <c>] THEN INSERT *]``
  → :func:`txlog.merge_upsert` with the clause surface. First-match-wins
  clause order is honored by condition composition (an update clause
  listed before a delete clause shadows it where both match, and vice
  versa — ANSI/Delta MERGE semantics). ``SET *`` / ``INSERT *`` only:
  the row-level rewrite replaces whole rows by key; column-level SET
  lists are the Python API's job. Clause conditions evaluate over the
  SOURCE row (qualify with the source alias or leave unqualified).
- anything else → ``spark.sql(statement)`` verbatim (SELECT, DDL, …).

After a successful DML the registered view is re-pinned at the new
snapshot (``refresh_table``), so the SQL user's next SELECT sees their
own write — the read-your-writes ergonomics a SQL session expects,
while OTHER sessions' registered views keep snapshot isolation.

Scale note: this module only PARSES; every routed statement executes
the same distributed plans as the Python API (part-pruned rewrites,
key-shuffled merges, manifest commits) — nothing here adds a
driver-side data path.
"""

from __future__ import annotations

import json
import re

from pyspark.sql import DataFrame, SparkSession

from es_analytics_spark import txlog

_IDENT = r"[A-Za-z_][A-Za-z0-9_.]*"


class SqlDmlError(ValueError):
    """A DML statement outside the documented routed subset."""


def _table_path(spark: SparkSession, name: str, verb: str) -> str:
    path = txlog.registered_table_path(spark, name)
    if path is None:
        raise SqlDmlError(
            f"{verb}: {name!r} is not a registered txlog table in this "
            "session — call txlog.register_table(spark, name, path) first"
        )
    return path


def _quote_segments(s: str) -> list[tuple[bool, str]]:
    """Split into (is_string_literal, text) segments so alias handling
    never touches quoted content (``val = 's.x'`` keeps its literal)."""
    out: list[tuple[bool, str]] = []
    quote: str | None = None
    start = 0
    i, n = 0, len(s)
    while i < n:
        ch = s[i]
        if quote is None and ch in "'\"`":
            out.append((False, s[start:i]))
            start, quote = i, ch
        elif quote is not None and ch == quote:
            if quote == "'" and i + 1 < n and s[i + 1] == "'":
                i += 2
                continue
            out.append((True, s[start:i + 1]))
            start, quote = i + 1, None
        i += 1
    out.append((quote is not None, s[start:]))
    return out


def _strip_alias(cond: str, src_alias: str | None, tgt_alias: str | None,
                 what: str) -> str:
    """Clause conditions evaluate over the SOURCE row: strip the source
    alias qualifier, refuse target-qualified references honestly.
    String literals pass through untouched (an alias-lookalike inside
    quotes is data, not a reference)."""
    segs = _quote_segments(cond)
    out = []
    for is_lit, text in segs:
        if is_lit:
            out.append(text)
            continue
        if tgt_alias and re.search(rf"\b{re.escape(tgt_alias)}\s*\.", text):
            raise SqlDmlError(
                f"{what}: clause conditions evaluate over the source row "
                f"only (found a {tgt_alias!r}-qualified reference); "
                "conditions over the target row need the Python API "
                "(txlog.merge_upsert)"
            )
        if src_alias:
            text = re.sub(rf"\b{re.escape(src_alias)}\s*\.", "", text)
        out.append(text)
    return "".join(out).strip()


def _cast_to_table(spark: SparkSession, path: str, df: DataFrame, st=None) -> DataFrame:
    """SQL store-assignment: cast the statement's columns to the target
    table's committed types (a VALUES literal types as decimal/int, not
    the table's double/long; ANSI DML casts on assignment). Columns the
    table does not know pass through unchanged."""
    from pyspark.sql import functions as F

    st = st if st is not None else txlog.table_schema(spark, path)
    if st is None:
        return df
    types = {f.name: f.dataType for f in st.fields}
    return df.select(
        *[
            F.col(c).cast(types[c]).alias(c) if c in types else F.col(c)
            for c in df.columns
        ]
    )


def _insert_frame(spark: SparkSession, path: str, df: DataFrame,
                  cols: list[str] | None) -> tuple[DataFrame, bool]:
    """Align an INSERT's SELECT/VALUES result with the table schema:
    explicit column lists bind positionally (standard SQL); without one,
    name-matched frames pass through and arity-matched frames bind
    positionally (VALUES produces col1..colN). Returns (frame, evolve) —
    evolve=True only for the null-filled-omission case, and ONLY after
    proving every named column already exists (so a typo can never
    silently evolve the schema)."""
    st = txlog.table_schema(spark, path)
    table_cols = [f.name for f in st.fields] if st is not None else None

    def _assign(out: DataFrame) -> DataFrame:
        return _cast_to_table(spark, path, out, st=st)

    if cols:
        unknown = [c for c in cols if table_cols is not None and c not in table_cols]
        if unknown:
            raise SqlDmlError(
                f"INSERT: column(s) {unknown} are not in the table schema "
                f"{table_cols} — execute_sql never evolves a schema from an "
                "INSERT (use txlog.append(evolve=True) deliberately)"
            )
        if len(cols) != len(df.columns):
            raise SqlDmlError(
                f"INSERT: {len(cols)} target column(s) but the query "
                f"produces {len(df.columns)}"
            )
        out = _assign(df.toDF(*cols))
        # a subset column list means the omitted columns null-fill —
        # append's evolve contract, provably additive-only here
        return out, bool(table_cols) and len(cols) < len(table_cols)
    if table_cols is None:
        return _assign(df), False
    if len(df.columns) == len(table_cols):
        # ANSI ordinal binding: INSERT without a column list assigns by
        # POSITION, exactly like spark.sql / any SQL engine — even when
        # the query's names coincide with the table's in another order
        # (name-binding here would make the same statement return
        # different data than the engine it claims parity with)
        return _assign(df.toDF(*table_cols)), False
    raise SqlDmlError(
        f"INSERT: query produces {len(df.columns)} column(s) "
        f"({df.columns}) for a {len(table_cols)}-column table "
        f"({table_cols}) — name the target columns: "
        "INSERT INTO t (c1, c2, ...) ..."
    )


def _scan_top_level(s: str):
    """Yield (index, char) for characters at paren depth 0 OUTSIDE
    string literals (single quotes with '' escaping, double quotes,
    backticks) — the quote/paren awareness every splitter here needs."""
    depth = 0
    quote: str | None = None
    i, n = 0, len(s)
    while i < n:
        ch = s[i]
        if quote is not None:
            if ch == quote:
                if quote == "'" and i + 1 < n and s[i + 1] == "'":
                    i += 2  # escaped '' inside a single-quoted literal
                    continue
                quote = None
            i += 1
            continue
        if ch in "'\"`":
            quote = ch
        elif ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        elif depth == 0:
            yield i, ch
        i += 1


def _split_top_level(s: str, sep: str = ",") -> list[str]:
    """Split on ``sep`` at depth 0 outside string literals — a comma in
    ``'Smith, John'`` or inside ``f(a, b)`` never splits."""
    parts, last = [], 0
    for i, ch in _scan_top_level(s):
        if ch == sep:
            parts.append(s[last:i])
            last = i + 1
    parts.append(s[last:])
    return parts


def _find_top_level_word(s: str, word: str, start: int = 0) -> int:
    """Index of the first standalone (case-insensitive) ``word`` at
    depth 0 outside string literals, or -1."""
    w = word.upper()
    L = len(w)
    for i, ch in _scan_top_level(s):
        if i < start or ch.upper() != w[0]:
            continue
        if s[i:i + L].upper() != w:
            continue
        before_ok = i == 0 or not (s[i - 1].isalnum() or s[i - 1] == "_")
        j = i + L
        after_ok = j >= len(s) or not (s[j].isalnum() or s[j] == "_")
        if before_ok and after_ok:
            return i
    return -1


def _parse_merge_clauses(tail: str, src_alias: str | None,
                         tgt_alias: str | None) -> dict:
    """The WHEN clause list → merge_upsert kwargs, honoring ANSI
    first-match-wins by condition composition. The WHOLE tail must
    parse: any fragment the clause grammar cannot consume raises —
    silently dropping an unrecognized clause (e.g. ``WHEN NOT MATCHED
    BY SOURCE``) would mean silently not running part of the user's
    DML."""
    pat = re.compile(
        r"WHEN\s+(NOT\s+)?MATCHED(?:\s+BY\s+(TARGET|SOURCE))?"
        r"\s*(?:AND\s+(.*?))?\s*THEN\s+"
        r"(UPDATE\s+SET\s+\*|DELETE|INSERT\s+\*|UPDATE\s+SET\s+[^W]*|INSERT\s*\([^)]*\)[^W]*)",
        re.IGNORECASE | re.DOTALL,
    )
    upd = dele = ins = None  # (position, condition)
    pos = 0
    consumed = 0
    for m in pat.finditer(tail):
        if tail[consumed:m.start()].strip():
            raise SqlDmlError(
                f"MERGE: cannot parse clause fragment "
                f"{tail[consumed:m.start()].strip()!r} — the routed grammar "
                "is WHEN [NOT] MATCHED [AND <cond>] THEN "
                "UPDATE SET * | DELETE | INSERT *"
            )
        consumed = m.end()
        negated, by_word, cond, action = (
            m.group(1), m.group(2), m.group(3), m.group(4).strip()
        )
        if by_word is not None and by_word.upper() == "SOURCE":
            raise SqlDmlError(
                "MERGE: WHEN NOT MATCHED BY SOURCE is not routed (it acts "
                "on target rows absent from the source) — use the Python "
                "API (e.g. delete_where with an anti-join condition)"
            )
        # "BY TARGET" is the explicit spelling of plain NOT MATCHED
        cond = _strip_alias(cond, src_alias, tgt_alias, "MERGE") if cond else None
        act = re.sub(r"\s+", " ", action.upper())
        if negated:
            if act != "INSERT *":
                raise SqlDmlError(
                    f"MERGE: unsupported NOT MATCHED action {action!r} — "
                    "INSERT * only (the merge inserts the whole source row)"
                )
            if ins is not None:
                raise SqlDmlError("MERGE: multiple WHEN NOT MATCHED clauses")
            ins = (pos, cond)
        elif act == "UPDATE SET *":
            if upd is not None:
                raise SqlDmlError("MERGE: multiple WHEN MATCHED ... UPDATE clauses")
            upd = (pos, cond)
        elif act == "DELETE":
            if dele is not None:
                raise SqlDmlError("MERGE: multiple WHEN MATCHED ... DELETE clauses")
            dele = (pos, cond)
        else:
            raise SqlDmlError(
                f"MERGE: unsupported action {action!r} — UPDATE SET *, "
                "DELETE, and INSERT * are routed; column-level SET lists "
                "need the Python API (txlog.merge_upsert)"
            )
        pos += 1
    if tail[consumed:].strip():
        raise SqlDmlError(
            f"MERGE: cannot parse clause fragment {tail[consumed:].strip()!r}"
            " — the routed grammar is WHEN [NOT] MATCHED [AND <cond>] THEN "
            "UPDATE SET * | DELETE | INSERT *"
        )
    if upd is None and dele is None and ins is None:
        raise SqlDmlError("MERGE: no WHEN clause found")
    kwargs: dict = {}
    # first-match-wins: when both matched clauses exist, the LATER one
    # only fires where the earlier one's condition does not
    if dele is not None:
        d = dele[1] or "true"
        if upd is not None and upd[0] < dele[0]:
            u = upd[1] or "true"
            d = f"(NOT ({u})) AND ({d})"
        kwargs["when_matched_delete"] = d
    if upd is not None:
        # merge_upsert already applies delete-before-update on ~delete,
        # which equals first-match-wins when the delete clause led; the
        # update-led ordering was folded into the delete condition above
        kwargs["when_matched_update"] = upd[1] or "true"
    elif dele is not None:
        # DELETE-only matched clause: matched rows not matching it stay
        kwargs["when_matched_update"] = "false"
    if ins is not None:
        if ins[1]:
            kwargs["when_not_matched_insert"] = ins[1]
    else:
        # no NOT MATCHED clause: unmatched source rows do NOT insert
        kwargs["when_not_matched_insert"] = "false"
    return kwargs


def _take_balanced(s: str) -> tuple[str, str]:
    """``s`` starts with '(' — return (the balanced ``(...)`` prefix,
    the remainder), quote-aware at ANY nesting depth."""
    depth = 0
    quote: str | None = None
    i, n = 0, len(s)
    while i < n:
        ch = s[i]
        if quote is not None:
            if ch == quote:
                if quote == "'" and i + 1 < n and s[i + 1] == "'":
                    i += 2
                    continue
                quote = None
        elif ch in "'\"`":
            quote = ch
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                return s[:i + 1], s[i + 1:]
        i += 1
    raise SqlDmlError("MERGE: unbalanced parentheses in USING (...)")


def _parse_merge_stmt(sql: str):
    """Staged MERGE parse — regex for the fixed heads, a balanced-paren
    scan for the USING subquery (ANY nesting depth, quote-aware), and a
    top-level split for ON vs the WHEN tail (a WHEN inside a string
    literal or subselect never splits). Returns ``(name, t_alias,
    source, s_alias, on, tail)`` or None when the statement is not a
    MERGE (falls through to spark.sql for its own error)."""
    m = re.match(
        rf"MERGE\s+INTO\s+({_IDENT})(?:\s+AS)?(?:\s+(?!USING\b)({_IDENT}))?"
        rf"\s+USING\s+",
        sql, re.IGNORECASE | re.DOTALL,
    )
    if m is None:
        return None
    name, t_alias = m.group(1), m.group(2)
    rest = sql[m.end():].lstrip()
    if rest.startswith("("):
        source, rest = _take_balanced(rest)
    else:
        m2 = re.match(rf"({_IDENT})", rest)
        if m2 is None:
            raise SqlDmlError(f"MERGE: cannot parse USING source at {rest[:40]!r}")
        source, rest = m2.group(1), rest[m2.end():]
    m3 = re.match(
        rf"\s*(?:AS\s+)?(?!ON\b)({_IDENT})\s+ON\s+", rest,
        re.IGNORECASE | re.DOTALL,
    )
    if m3 is not None:
        s_alias, rest = m3.group(1), rest[m3.end():]
    else:
        m3 = re.match(r"\s*ON\s+", rest, re.IGNORECASE | re.DOTALL)
        if m3 is None:
            raise SqlDmlError(
                f"MERGE: expected [AS alias] ON ... at {rest[:40]!r}"
            )
        s_alias, rest = None, rest[m3.end():]
    w = _find_top_level_word(rest, "WHEN")
    if w < 0:
        raise SqlDmlError("MERGE: no WHEN clause found")
    return name, t_alias, source, s_alias, rest[:w].strip(), rest[w:]


def _parse_on_keys(on: str, t_alias: str, s_alias: str) -> list[str]:
    keys = []
    for conj in re.split(r"\bAND\b", on, flags=re.IGNORECASE):
        m = re.fullmatch(
            rf"\s*({_IDENT})\s*\.\s*({_IDENT})\s*=\s*({_IDENT})\s*\.\s*({_IDENT})\s*",
            conj,
        )
        if not m:
            raise SqlDmlError(
                f"MERGE: ON must be a conjunction of alias-qualified "
                f"equi-predicates (t.k = s.k), got {conj.strip()!r}"
            )
        a1, c1, a2, c2 = m.groups()
        if {a1, a2} != {t_alias, s_alias}:
            raise SqlDmlError(
                f"MERGE: ON predicate {conj.strip()!r} must join the target "
                f"({t_alias!r}) to the source ({s_alias!r})"
            )
        if c1 != c2:
            raise SqlDmlError(
                f"MERGE: key columns must share a name on both sides "
                f"(got {c1!r} = {c2!r}) — rename in the USING subquery, or "
                "use the Python API"
            )
        keys.append(c1)
    return keys


def execute_sql(spark: SparkSession, statement: str):
    """Route one SQL statement: DML verbs hit the transactional txlog
    API (see module docstring for the exact subset and semantics);
    everything else returns ``spark.sql(statement)`` unchanged. DML
    returns the underlying API's result dict, augmented with
    ``{"operation", "table", "path"}``."""
    sql = statement.strip().rstrip(";").strip()

    m = re.match(
        rf"INSERT\s+(INTO|OVERWRITE)\s+(?:TABLE\s+)?({_IDENT})\s*(\(([^)]*)\))?\s*(.+)",
        sql, re.IGNORECASE | re.DOTALL,
    )
    if m:
        mode, name, _clist, cols_raw, query = m.groups()
        path = _table_path(spark, name, "INSERT")
        cols = [c.strip() for c in cols_raw.split(",")] if cols_raw else None
        if cols and mode.upper() == "OVERWRITE":
            raise SqlDmlError("INSERT OVERWRITE takes no column list here — "
                              "provide the full row shape in the query")
        df = spark.sql(query)
        frame, evolve = _insert_frame(spark, path, df, cols)
        if mode.upper() == "OVERWRITE":
            res = txlog.overwrite_table(spark, path, frame)
        else:
            res = txlog.append(spark, path, frame, evolve=evolve)
        txlog.refresh_table(spark, name)
        return dict(res, operation=f"insert_{mode.lower()}", table=name, path=path)

    m = re.match(
        rf"DELETE\s+FROM\s+({_IDENT})(?:\s+WHERE\s+(.+))?$",
        sql, re.IGNORECASE | re.DOTALL,
    )
    if m:
        name, cond = m.groups()
        path = _table_path(spark, name, "DELETE")
        res = txlog.delete_where(spark, path, cond.strip() if cond else "true")
        txlog.refresh_table(spark, name)
        return dict(res, operation="delete", table=name, path=path)

    parsed = _parse_merge_stmt(sql)
    if parsed is not None:
        name, t_alias, source, s_alias, on, tail = parsed
        path = _table_path(spark, name, "MERGE")
        t_alias = t_alias or name
        s_alias = s_alias or (None if source.startswith("(") else source)
        if s_alias is None:
            raise SqlDmlError("MERGE: a USING (subquery) needs an alias")
        src = (
            spark.sql(source[1:-1]) if source.startswith("(")
            else spark.table(source)
        )
        src = _cast_to_table(spark, path, src)
        keys = _parse_on_keys(on, t_alias, s_alias)
        kwargs = _parse_merge_clauses(tail, s_alias, t_alias)
        st = txlog.table_schema(spark, path)
        if st is not None:
            # SET * / INSERT * expand to TARGET columns (ANSI/Delta):
            # source columns the table does not know — a CDC _deleted
            # flag referenced only in clause conditions — are condition
            # inputs, not payload, and must never evolve the schema
            table_cols = {f.name for f in st.fields}
            extra = [c for c in src.columns if c not in table_cols]
            if extra:
                kwargs["drop_cols"] = extra
        res = txlog.merge_upsert(spark, path, src, keys, **kwargs)
        txlog.refresh_table(spark, name)
        return dict(res, operation="merge", table=name, path=path)

    m = re.match(
        rf"UPDATE\s+({_IDENT})\s+SET\s+(.+?)(?:\s+WHERE\s+(.+))?$",
        sql, re.IGNORECASE | re.DOTALL,
    )
    if m:
        name, set_raw, cond = m.groups()
        path = _table_path(spark, name, "UPDATE")
        res = txlog.update_where(
            spark, path, _parse_set_list(set_raw),
            cond.strip() if cond else "true",
        )
        txlog.refresh_table(spark, name)
        return dict(res, operation="update", table=name, path=path)

    m = re.match(rf"ALTER\s+TABLE\s+({_IDENT})\s+(.+)$", sql,
                 re.IGNORECASE | re.DOTALL)
    if m:
        name, action = m.group(1), m.group(2).strip()
        path = _table_path(spark, name, "ALTER TABLE")
        res = _route_alter(spark, path, action)
        txlog.refresh_table(spark, name)
        return dict(res, operation="alter_table", table=name, path=path)

    m = re.match(rf"DESCRIBE\s+HISTORY\s+({_IDENT})$", sql, re.IGNORECASE)
    if m:
        name = m.group(1)
        path = _table_path(spark, name, "DESCRIBE HISTORY")
        hist = txlog.history(spark, path)
        return spark.createDataFrame(
            [(h["version"], h["operation"], h["n_adds"], h["n_removes"],
              json.dumps(h["partition"]) if h["partition"] else None,
              float(h["ts"]) if h.get("ts") is not None else None)
             for h in hist],
            "version long, operation string, n_adds long, n_removes long, "
            "scope_partition string, ts double",
        )

    m = re.match(
        rf"RESTORE\s+TABLE\s+({_IDENT})\s+TO\s+VERSION\s+AS\s+OF\s+(\d+)$",
        sql, re.IGNORECASE,
    )
    if m:
        name, version = m.group(1), int(m.group(2))
        path = _table_path(spark, name, "RESTORE TABLE")
        res = txlog.restore(spark, path, version, cdc=True)
        txlog.refresh_table(spark, name)
        return dict(res, operation="restore", table=name, path=path)

    m = re.match(rf"OPTIMIZE\s+({_IDENT})$", sql, re.IGNORECASE)
    if m:
        name = m.group(1)
        path = _table_path(spark, name, "OPTIMIZE")
        res = txlog.optimize(spark, path)
        txlog.refresh_table(spark, name)
        return dict(res, operation="optimize", table=name, path=path)

    m = re.match(
        rf"VACUUM\s+({_IDENT})(?:\s+RETAIN\s+(\d+(?:\.\d+)?)\s+HOURS)?$",
        sql, re.IGNORECASE,
    )
    if m:
        name, hours = m.groups()
        path = _table_path(spark, name, "VACUUM")
        reaped = txlog.vacuum(
            spark, path,
            retention_seconds=float(hours) * 3600 if hours else 24 * 3600,
        )
        return {"operation": "vacuum", "table": name, "path": path,
                "reaped": len(reaped)}

    return spark.sql(sql)


def _parse_set_list(raw: str) -> dict:
    """``SET a = e1, b = e2`` → {a: e1, b: e2}, splitting on top-level
    commas only — commas inside parens AND inside string literals
    (``SET name = 'Smith, John'``) never split."""
    out = {}
    for p in _split_top_level(raw):
        m = re.fullmatch(rf"\s*({_IDENT})\s*=\s*(.+?)\s*", p, re.DOTALL)
        if not m:
            raise SqlDmlError(f"UPDATE: cannot parse SET item {p.strip()!r}")
        out[m.group(1)] = m.group(2)
    return out


def _route_alter(spark: SparkSession, path: str, action: str) -> dict:
    m = re.fullmatch(rf"RENAME\s+COLUMN\s+({_IDENT})\s+TO\s+({_IDENT})",
                     action, re.IGNORECASE)
    if m:
        return txlog.rename_column(spark, path, m.group(1), m.group(2))
    m = re.fullmatch(rf"DROP\s+COLUMN\s+({_IDENT})", action, re.IGNORECASE)
    if m:
        return txlog.drop_column(spark, path, m.group(1))
    m = re.fullmatch(
        rf"(?:ALTER|CHANGE)\s+COLUMN\s+({_IDENT})\s+TYPE\s+([A-Za-z_]+(?:\s*\(\s*\d+\s*,\s*\d+\s*\))?)",
        action, re.IGNORECASE,
    )
    if m:
        return txlog.widen_column(spark, path, m.group(1), m.group(2))
    m = re.fullmatch(r"SET\s+TBLPROPERTIES\s*\((.+)\)", action,
                     re.IGNORECASE | re.DOTALL)
    if m:
        props = {}
        for kv in _split_top_level(m.group(1)):
            km = re.fullmatch(r"\s*'([^']*)'\s*=\s*'((?:[^']|'')*)'\s*"
                              r"|\s*\"([^\"]*)\"\s*=\s*\"([^\"]*)\"\s*", kv)
            if km is None:
                raise SqlDmlError(
                    f"ALTER TABLE SET TBLPROPERTIES: cannot parse {kv.strip()!r}"
                    " — expected 'key' = 'value' pairs"
                )
            k = km.group(1) if km.group(1) is not None else km.group(3)
            v = km.group(2) if km.group(2) is not None else km.group(4)
            props[k] = v.replace("''", "'") if km.group(2) is not None else v
        return txlog.set_table_properties(spark, path, props)
    m = re.fullmatch(r"UNSET\s+TBLPROPERTIES\s*\((.+)\)", action,
                     re.IGNORECASE | re.DOTALL)
    if m:
        keys = [k.strip().strip("'\"") for k in m.group(1).split(",")]
        return txlog.set_table_properties(spark, path, {k: None for k in keys})
    raise SqlDmlError(
        f"ALTER TABLE: unsupported action {action!r} — RENAME COLUMN, "
        "DROP COLUMN, ALTER/CHANGE COLUMN ... TYPE (lossless widening), "
        "and SET/UNSET TBLPROPERTIES are routed; everything else needs "
        "the Python API"
    )
