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
  ON t.k = s.k [AND …]`` with the FULL public Delta clause grammar →
  :func:`txlog.merge`:

  - ``WHEN MATCHED [AND <c>] THEN UPDATE SET * | UPDATE SET col =
    expr, … | DELETE`` (any number, first-match-wins in listed order);
  - ``WHEN NOT MATCHED [BY TARGET] [AND <c>] THEN INSERT * |
    INSERT (cols) VALUES (exprs) | INSERT VALUES (exprs)`` (the
    column-less VALUES binds positionally over the target schema);
  - ``WHEN NOT MATCHED BY SOURCE [AND <c>] THEN DELETE |
    UPDATE SET col = expr, …``.

  Conditions and expressions may qualify with either alias; matched
  clauses see both rows, NOT MATCHED only the source row, BY SOURCE
  only the target row (violations get a curated error). An
  UNQUALIFIED column resolves source-first, then target (the
  documented back-compat rule; qualify to disambiguate). ``SET *`` /
  ``INSERT *`` expand over TARGET columns, so a condition-only source
  column (a CDC ``_deleted`` flag) never enters the schema.
- anything else → ``spark.sql(statement)`` verbatim (SELECT, DDL, …).
  DML verbs against a table that is NOT txlog-registered but resolves
  in the session catalog also pass through unchanged (the module
  contract: only registered txlog tables are intercepted); an
  unresolvable name still gets the curated registration hint.

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


def _table_path(spark: SparkSession, name: str, verb: str) -> str | None:
    """Resolve a DML target. Registered txlog table → its path. A name
    that is NOT registered but resolves in the session catalog returns
    None — the caller passes the statement to ``spark.sql`` unchanged
    (the module contract: only txlog tables are intercepted). A name
    resolving nowhere gets the curated registration hint."""
    path = txlog.registered_table_path(spark, name)
    if path is not None:
        return path
    try:
        in_catalog = spark.catalog.tableExists(name)
    except Exception:
        in_catalog = False
    if in_catalog:
        return None
    raise SqlDmlError(
        f"{verb}: {name!r} is not a registered txlog table in this "
        "session (and resolves to no catalog table) — call "
        "txlog.register_table(spark, name, path) first"
    )


def _quote_segments(s: str) -> list[tuple[bool, str]]:
    """Split into (is_string_literal, text) segments so alias handling
    never touches quoted content (``val = 's.x'`` keeps its literal).
    Doubled-quote escaping is honored for ALL three quote kinds — ``''``
    in single quotes, ``""`` in double-quoted identifiers, ``` `` ```
    in backticks — so an escaped quote never ends a segment early."""
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
            if i + 1 < n and s[i + 1] == quote:
                i += 2
                continue
            out.append((True, s[start:i + 1]))
            start, quote = i + 1, None
        i += 1
    out.append((quote is not None, s[start:]))
    return out


_SQL_WORD = re.compile(r"[A-Za-z_][A-Za-z0-9_]*")

#: bare words NEVER rewritten to column references even when a column
#: shares the name: SQL keyword operators and literals — the
#: reserved-word rule every SQL dialect applies. A column colliding
#: with one of these must be alias-qualified (``s.end``).
_SQL_NONCOLUMN_WORDS = frozenset("""
and or not in is like rlike ilike between escape exists all any some
case when then else end cast try_cast as distinct from div
true false null interval asc desc
""".split())

#: EXTRACT-field operands (``EXTRACT(YEAR FROM ts)``): protected only
#: when the NEXT word is FROM — that syntactic position is never a
#: column reference, while a bare ``year = 2024`` over a table with a
#: ``year`` column (common in analytics) still resolves.
_SQL_EXTRACT_FIELDS = frozenset("""
year years quarter quarters month months week weeks day days dayofweek
dayofyear doy dow hour hours minute minutes second seconds millisecond
milliseconds microsecond microseconds nanosecond nanoseconds epoch
""".split())


def _rewrite_expr(expr: str, alias_map: dict, bare, refuse: dict,
                  what: str) -> str:
    """Rewrite a clause condition / SET / VALUES expression onto the
    engine's two row structs: the statement's aliases map to ``t`` /
    ``s`` (``alias_map``: {lower_alias: "t"|"s"}), a qualification with
    an alias the clause may not see raises the curated message
    (``refuse``: {lower_alias: message}), and a BARE identifier is
    resolved by ``bare(lower_name) -> "t"|"s"|None|SqlDmlError-message``
    (None leaves it untouched — a function name, SQL keyword, or
    CAST-type is not a column reference). String literals pass through
    byte-identical; a word followed by ``(`` is a function call; a word
    preceded or followed by ``.`` is already part of a qualified chain;
    a word in :data:`_SQL_NONCOLUMN_WORDS`, or one directly preceding a
    string literal (a ``DATE '2024-01-01'`` typed-literal prefix), is
    never a column reference."""
    out = []
    segs = _quote_segments(expr)
    for si, (is_lit, text) in enumerate(segs):
        if is_lit:
            out.append(text)
            continue
        next_is_lit = si + 1 < len(segs) and segs[si + 1][0]
        res: list[str] = []
        i, n = 0, len(text)
        while i < n:
            m = _SQL_WORD.match(text, i)
            if not m:
                res.append(text[i])
                i += 1
                continue
            w, j = m.group(0), m.end()
            prev = text[i - 1] if i > 0 else ""
            k = j
            while k < n and text[k] in " \t\r\n":
                k += 1
            nxt = text[k] if k < n else ""
            lw = w.lower()
            if prev == ".":
                res.append(w)  # field of an already-qualified chain
            elif nxt == "." and lw in refuse:
                raise SqlDmlError(f"{what}: {refuse[lw]}")
            elif nxt == "." and lw in alias_map:
                res.append(alias_map[lw])  # alias → struct name
            elif nxt in ("(", "."):
                res.append(w)  # function call / other qualified chain
            elif lw in _SQL_NONCOLUMN_WORDS or (k >= n and next_is_lit):
                res.append(w)  # keyword / typed-literal prefix (DATE '…')
            elif lw in _SQL_EXTRACT_FIELDS and (
                text[k:k + 4].lower() == "from"
                and not (text[k + 4:k + 5].isalnum() or text[k + 4:k + 5] == "_")
            ):
                res.append(w)  # EXTRACT(YEAR FROM …) operand position
            else:
                got = bare(lw)
                if isinstance(got, str) and got not in ("t", "s"):
                    raise SqlDmlError(f"{what}: {got}")
                res.append(f"{got}.`{w}`" if got else w)
            i = j
        out.append("".join(res))
    return "".join(out).strip()


def _set_items(raw: str, t_alias: str, s_alias: str, what: str) -> dict:
    """``SET a = e, t.b = e2`` → ordered {target_col: raw_rhs}. The LHS
    may qualify with the TARGET alias (stripped); a source-alias LHS is
    refused (you cannot assign into the source)."""
    out: dict[str, str] = {}
    for p in _split_top_level(raw):
        m = re.fullmatch(
            rf"\s*(?:({_IDENT})\s*\.\s*)?([A-Za-z_][A-Za-z0-9_]*)\s*=\s*(.+?)\s*",
            p, re.DOTALL,
        )
        if not m:
            raise SqlDmlError(f"{what}: cannot parse SET item {p.strip()!r}")
        qual, col, rhs = m.groups()
        if qual is not None:
            if qual.lower() == s_alias.lower():
                raise SqlDmlError(
                    f"{what}: SET assigns into the TARGET row — "
                    f"{qual}.{col} qualifies the source alias"
                )
            if qual.lower() != t_alias.lower():
                raise SqlDmlError(
                    f"{what}: unknown alias {qual!r} in SET target "
                    f"{qual}.{col} (target alias is {t_alias!r})"
                )
        if col in out:
            raise SqlDmlError(f"{what}: column {col!r} assigned twice in one SET")
        out[col] = rhs
    return out


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
                if i + 1 < n and s[i + 1] == quote:
                    i += 2  # doubled-quote escape inside the literal
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
    depth 0 outside string literals AND outside ``CASE … END``
    expressions, or -1. The CASE-awareness is what lets an
    unparenthesized ``CASE WHEN … THEN … END`` live inside a MERGE
    clause condition or SET expression without its WHEN/THEN being
    mistaken for clause structure (CASE/END inside parens are invisible
    here and balance themselves)."""
    w = word.upper()
    case_depth = 0
    n = len(s)
    for i, ch in _scan_top_level(s):
        if not (ch.isalpha() or ch == "_"):
            continue
        prev = s[i - 1] if i > 0 else ""
        if prev.isalnum() or prev == "_":
            continue  # mid-word
        j = i
        while j < n and (s[j].isalnum() or s[j] == "_"):
            j += 1
        tok = s[i:j].upper()
        if prev != ".":
            if tok == "CASE":
                case_depth += 1
                continue
            if tok == "END" and case_depth > 0:
                case_depth -= 1
                continue
        if i >= start and tok == w and case_depth == 0:
            return i
    return -1


def _split_when_clauses(tail: str) -> list[str]:
    """The WHEN tail → one string per clause, split at top-level WHEN
    tokens (a WHEN inside a string literal, CASE expression paren, or
    subselect never splits). The whole tail must be consumed: a
    fragment before the first WHEN raises — silently dropping it would
    mean silently not running part of the user's DML."""
    starts = []
    pos = 0
    while True:
        w = _find_top_level_word(tail, "WHEN", pos)
        if w < 0:
            break
        starts.append(w)
        pos = w + 4
    if not starts:
        raise SqlDmlError("MERGE: no WHEN clause found")
    if tail[:starts[0]].strip():
        raise SqlDmlError(
            f"MERGE: cannot parse clause fragment {tail[:starts[0]].strip()!r}"
        )
    bounds = starts + [len(tail)]
    return [tail[bounds[i]:bounds[i + 1]].strip() for i in range(len(starts))]


def _parse_merge_clauses(tail: str, t_alias: str, s_alias: str,
                         scols: list[str], tcols: list[str]) -> dict:
    """The WHEN clause list → :func:`txlog.merge` clause-list kwargs.
    Every condition / SET RHS / VALUES expression is rewritten onto the
    engine's ``t`` / ``s`` row structs (see :func:`_rewrite_expr`):
    statement aliases map, bare identifiers resolve source-first then
    target, and a reference to the row a clause cannot see gets a
    curated error here — not a late analyzer one. Clause ORDER within
    each category is preserved (first-match-wins is the engine's job)."""
    scl = {c.lower() for c in scols}
    tcl = {c.lower() for c in tcols}
    ta, sa = t_alias.lower(), s_alias.lower()

    def _bare_matched(w):
        return "s" if w in scl else ("t" if w in tcl else None)

    def _bare_not_matched(w):
        if w in scl:
            return "s"
        if w in tcl:
            return (
                f"a NOT MATCHED clause sees only the source row, but "
                f"{w!r} is a target-only column — no target row exists "
                "for an insert"
            )
        return None

    def _bare_by_source(w):
        if w in tcl:
            return "t"
        if w in scl:
            return (
                f"a NOT MATCHED BY SOURCE clause sees only the target row, "
                f"but {w!r} is a source-only column — no source row matched"
            )
        return None

    shapes = {
        "matched": (
            {ta: "t", sa: "s"}, {}, _bare_matched,
        ),
        "not_matched": (
            {sa: "s"},
            {ta: "a NOT MATCHED clause cannot reference the target row "
                 f"({t_alias}.) — no target row exists for an insert"},
            _bare_not_matched,
        ),
        "by_source": (
            {ta: "t"},
            {sa: "a NOT MATCHED BY SOURCE clause cannot reference the "
                 f"source row ({s_alias}.) — no source row matched"},
            _bare_by_source,
        ),
    }

    def _rw(expr, kind):
        amap, refuse, bare = shapes[kind]
        return _rewrite_expr(expr, amap, bare, refuse, "MERGE")

    matched: list[dict] = []
    not_matched: list[dict] = []
    by_source: list[dict] = []
    head = re.compile(
        r"WHEN\s+(NOT\s+)?MATCHED(?:\s+BY\s+(TARGET|SOURCE))?\b",
        re.IGNORECASE,
    )
    for clause in _split_when_clauses(tail):
        m = head.match(clause)
        if m is None:
            raise SqlDmlError(f"MERGE: cannot parse clause {clause[:60]!r}")
        negated = m.group(1) is not None
        by = (m.group(2) or "").upper()
        if by and not negated:
            raise SqlDmlError(
                f"MERGE: BY {by} only follows WHEN NOT MATCHED"
            )
        rest = clause[m.end():].strip()
        then = _find_top_level_word(rest, "THEN")
        if then < 0:
            raise SqlDmlError(f"MERGE: clause has no THEN: {clause[:60]!r}")
        pre, action = rest[:then].strip(), rest[then + 4:].strip()
        cond_raw = None
        if pre:
            am = re.match(r"AND\s+(.+)$", pre, re.IGNORECASE | re.DOTALL)
            if am is None:
                raise SqlDmlError(
                    f"MERGE: expected [AND <cond>] THEN, got {pre[:60]!r}"
                )
            cond_raw = am.group(1).strip()
        kind = (
            "by_source" if negated and by == "SOURCE"
            else "not_matched" if negated
            else "matched"
        )
        cond = _rw(cond_raw, kind) if cond_raw else None
        dm = re.match(r"DELETE\b(.*)$", action, re.IGNORECASE | re.DOTALL)
        if dm is not None and dm.group(1).strip():
            raise SqlDmlError(
                "MERGE: cannot parse clause fragment "
                f"{dm.group(1).strip()!r} after DELETE"
            )
        if dm is not None:
            if kind == "not_matched":
                raise SqlDmlError(
                    "MERGE: WHEN NOT MATCHED cannot DELETE — there is no "
                    "target row (did you mean NOT MATCHED BY SOURCE?)"
                )
            (matched if kind == "matched" else by_source).append(
                {"action": "delete", "condition": cond}
            )
            continue
        um = re.match(r"UPDATE\s+SET\s+(.+)$", action, re.IGNORECASE | re.DOTALL)
        if um is not None:
            if kind == "not_matched":
                raise SqlDmlError(
                    "MERGE: WHEN NOT MATCHED cannot UPDATE — there is no "
                    "target row (did you mean INSERT, or BY SOURCE?)"
                )
            raw = um.group(1).strip()
            if raw == "*":
                if kind == "by_source":
                    raise SqlDmlError(
                        "MERGE: NOT MATCHED BY SOURCE needs an explicit SET "
                        "list — there is no source row to star-expand from"
                    )
                setmap = None
            else:
                setmap = {
                    c: _rw(rhs, kind)
                    for c, rhs in _set_items(raw, t_alias, s_alias, "MERGE").items()
                }
            (matched if kind == "matched" else by_source).append(
                {"action": "update", "set": setmap, "condition": cond}
            )
            continue
        im = re.match(r"INSERT\b\s*(.*)$", action, re.IGNORECASE | re.DOTALL)
        if im is not None:
            if kind != "not_matched":
                raise SqlDmlError(
                    "MERGE: INSERT only follows WHEN NOT MATCHED "
                    "(a matched / by-source row already exists)"
                )
            raw = im.group(1).strip()
            if raw == "*":
                not_matched.append(
                    {"action": "insert", "values": None, "condition": cond}
                )
                continue
            cols: list[str] | None = None
            if raw.startswith("("):
                clist, raw = _take_balanced(raw)
                cols = []
                for c in _split_top_level(clist[1:-1]):
                    cm = re.fullmatch(
                        rf"\s*(?:({_IDENT})\s*\.\s*)?([A-Za-z_][A-Za-z0-9_]*)\s*",
                        c,
                    )
                    if cm is None:
                        raise SqlDmlError(
                            f"MERGE: cannot parse INSERT column {c.strip()!r}"
                        )
                    if cm.group(1) is not None and cm.group(1).lower() != ta:
                        raise SqlDmlError(
                            f"MERGE: INSERT columns name TARGET columns — "
                            f"{c.strip()!r} qualifies {cm.group(1)!r}"
                        )
                    cols.append(cm.group(2))
                raw = raw.strip()
            vm = re.match(r"VALUES\s*(\(.*\))\s*$", raw, re.IGNORECASE | re.DOTALL)
            if vm is None:
                raise SqlDmlError(
                    f"MERGE: cannot parse INSERT action {action[:60]!r} — "
                    "INSERT * | INSERT [(cols)] VALUES (exprs)"
                )
            vals_raw, leftover = _take_balanced(vm.group(1))
            if leftover.strip():
                raise SqlDmlError(
                    f"MERGE: trailing text after VALUES: {leftover.strip()!r}"
                )
            exprs = [
                _rw(e.strip(), kind)
                for e in _split_top_level(vals_raw[1:-1])
            ]
            if cols is None:
                # column-less VALUES binds positionally over the target
                # schema, standard SQL ordinal binding
                if len(exprs) != len(tcols):
                    raise SqlDmlError(
                        f"MERGE: INSERT VALUES has {len(exprs)} expression(s) "
                        f"for a {len(tcols)}-column table ({tcols}) — name "
                        "the columns: INSERT (c1, ...) VALUES (...)"
                    )
                cols = list(tcols)
            elif len(cols) != len(exprs):
                raise SqlDmlError(
                    f"MERGE: INSERT names {len(cols)} column(s) but VALUES "
                    f"has {len(exprs)} expression(s)"
                )
            if len(set(cols)) != len(cols):
                dupes = sorted({c for c in cols if cols.count(c) > 1})
                raise SqlDmlError(
                    f"MERGE: INSERT column(s) {dupes} listed more than once"
                )
            not_matched.append(
                {"action": "insert", "values": dict(zip(cols, exprs)),
                 "condition": cond}
            )
            continue
        raise SqlDmlError(
            f"MERGE: unsupported action {action[:60]!r} — UPDATE SET, "
            "DELETE, and INSERT are the clause actions"
        )
    return {
        "matched": matched or None,
        "not_matched": not_matched or None,
        "not_matched_by_source": by_source or None,
    }


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
                if i + 1 < n and s[i + 1] == quote:
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
        if {a1.lower(), a2.lower()} != {t_alias.lower(), s_alias.lower()}:
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


def _parse_props(raw: str) -> dict:
    """TBLPROPERTIES pair list → {key: value}; quoted commas and
    doubled-quote escapes survive."""
    props: dict[str, str] = {}
    for kv in _split_top_level(raw):
        km = re.fullmatch(r"\s*'([^']*)'\s*=\s*'((?:[^']|'')*)'\s*"
                          r"|\s*\"([^\"]*)\"\s*=\s*\"([^\"]*)\"\s*", kv)
        if km is None:
            raise SqlDmlError(
                f"TBLPROPERTIES: cannot parse {kv.strip()!r} — expected "
                "'key' = 'value' pairs"
            )
        k = km.group(1) if km.group(1) is not None else km.group(3)
        v = km.group(2) if km.group(2) is not None else km.group(4)
        props[k] = v.replace("''", "'") if km.group(2) is not None else v
    return props


def _pin_time_travel(spark: SparkSession, sql: str) -> str:
    """Rewrite ``<registered-name> VERSION AS OF <n>`` /
    ``<name> TIMESTAMP AS OF <unix-seconds | 'ISO-8601'>`` references
    (at any query depth) to session temp views pinned at that snapshot
    via :func:`txlog.read_table` — the time-travel SELECT spelling.
    Occurrences inside string literals are data and stay untouched;
    unregistered names pass through for Spark's own resolution."""
    reg = {
        n.lower(): (n, p)
        for n, p in (txlog._TABLE_REGISTRY.get(spark) or {}).items()
    }
    if not reg:
        return sql

    def _literal_spans(s: str):
        spans = []
        pos = 0
        for is_lit, text in _quote_segments(s):
            if is_lit:
                spans.append((pos, pos + len(text)))
            pos += len(text)
        return spans

    # Delta's table_changes TVF spelling for the row-level change feed:
    # table_changes('name', since[, until]) → rows changed in versions
    # (since, until]  (the table_changes_cdf window contract). Matches
    # INSIDE string literals are data, not calls — the TVF's own quoted
    # name argument starts AFTER the matched prefix, so the match
    # position itself is outside any literal in a real call.
    tvf_spans = _literal_spans(sql)
    tvf = re.compile(
        r"\btable_changes\s*\(\s*'([^']+)'\s*,\s*(\d+)\s*(?:,\s*(\d+)\s*)?\)",
        re.IGNORECASE,
    )
    out0: list[str] = []
    last0 = 0
    for m in tvf.finditer(sql):
        if any(a <= m.start() < b for a, b in tvf_spans):
            continue
        lname = m.group(1).lower()
        if lname not in reg:
            raise SqlDmlError(
                f"table_changes: {m.group(1)!r} is not a registered txlog "
                "table in this session"
            )
        name, path = reg[lname]
        since = int(m.group(2))
        until = int(m.group(3)) if m.group(3) is not None else None
        df = txlog.table_changes_cdf(spark, path, since, until)
        view = f"__cdf_{name}_{since}_{until if until is not None else 'latest'}"
        df.createOrReplaceTempView(view)
        out0.append(sql[last0:m.start()])
        out0.append(view)
        last0 = m.end()
    if out0:
        out0.append(sql[last0:])
        sql = "".join(out0)
    if not re.search(r"\bAS\s+OF\b", sql, re.IGNORECASE):
        return sql
    spans = _literal_spans(sql)

    def _in_lit(i: int) -> bool:
        return any(a <= i < b for a, b in spans)

    pat = re.compile(
        r"\b(" + "|".join(re.escape(n) for n in sorted(reg, key=len, reverse=True))
        + r")\s+(VERSION|TIMESTAMP)\s+AS\s+OF\s+",
        re.IGNORECASE,
    )
    out: list[str] = []
    last = 0
    for m in pat.finditer(sql):
        if _in_lit(m.start()) or m.start() < last:
            continue
        lname, kind = m.group(1).lower(), m.group(2).upper()
        name, path = reg[lname]
        i = m.end()
        if i < len(sql) and sql[i] == "'":
            j = i + 1
            while j < len(sql):
                if sql[j] == "'":
                    if j + 1 < len(sql) and sql[j + 1] == "'":
                        j += 2
                        continue
                    break
                j += 1
            if j >= len(sql):
                raise SqlDmlError("AS OF: unterminated string literal")
            raw, end = sql[i + 1:j].replace("''", "'"), j + 1
        else:
            mv = re.match(r"[^\s,()]+", sql[i:])
            if mv is None:
                raise SqlDmlError(f"AS OF: missing version/timestamp after "
                                  f"{sql[m.start():i]!r}")
            raw, end = mv.group(0), i + mv.end()
        if kind == "VERSION":
            if not re.fullmatch(r"\d+", raw):
                raise SqlDmlError(
                    f"VERSION AS OF needs an integer version, got {raw!r}"
                )
            df = txlog.read_table(spark, path, version=int(raw))
            view = f"__asof_{name}_v{raw}"
        else:
            from es_analytics_spark.sources.txlog_source import _parse_ts_option

            ts = _parse_ts_option(raw)
            df = txlog.read_table(spark, path, timestamp=ts)
            view = f"__asof_{name}_t{int(ts * 1000)}"
        df.createOrReplaceTempView(view)
        out.append(sql[last:m.start()])
        out.append(view)
        last = end
    out.append(sql[last:])
    return "".join(out)


def _route_create_table(spark: SparkSession, sql: str):
    """``CREATE TABLE … USING txlog LOCATION '<path>'`` (empty create or
    CTAS) → :func:`txlog.create_table` / :func:`txlog.append`, then
    :func:`txlog.register_table` — the SQL-first bootstrap, so a SQL
    session never needs a Python txlog call. Returns None when the
    statement is not a txlog CREATE (falls through to spark.sql)."""
    m = re.match(
        rf"CREATE\s+(OR\s+REPLACE\s+)?TABLE\s+(IF\s+NOT\s+EXISTS\s+)?({_IDENT})\s*(.*)$",
        sql, re.IGNORECASE | re.DOTALL,
    )
    if m is None:
        return None
    or_replace, if_not_exists, name, rest = (
        m.group(1) is not None, m.group(2) is not None, m.group(3),
        m.group(4).strip(),
    )
    coldefs = None
    if rest.startswith("("):
        coldefs, rest = _take_balanced(rest)
        coldefs, rest = coldefs[1:-1].strip(), rest.strip()
    mu = re.match(r"USING\s+([A-Za-z_][A-Za-z0-9_]*)\s*", rest, re.IGNORECASE)
    if mu is None or mu.group(1).lower() != "txlog":
        return None  # ordinary catalog CREATE — spark.sql's business
    rest = rest[mu.end():].strip()
    ml = re.match(r"LOCATION\s+'((?:[^']|'')+)'\s*", rest, re.IGNORECASE)
    if ml is None:
        raise SqlDmlError(
            "CREATE TABLE ... USING txlog needs LOCATION '<path>' — the "
            "engine pins tables to explicit paths (no metastore default)"
        )
    path, rest = ml.group(1).replace("''", "'"), rest[ml.end():].strip()
    props = None
    mp = re.match(r"TBLPROPERTIES\s*(\()", rest, re.IGNORECASE)
    if mp is not None:
        praw, rest = _take_balanced(rest[mp.start(1):])
        props, rest = _parse_props(praw[1:-1]), rest.strip()
    select = None
    ma = re.match(r"AS\s+(.+)$", rest, re.IGNORECASE | re.DOTALL)
    if ma is not None:
        select, rest = ma.group(1).strip(), ""
    if rest.strip():
        raise SqlDmlError(
            f"CREATE TABLE: cannot parse trailing {rest.strip()[:60]!r} — "
            "the routed grammar is CREATE [OR REPLACE] TABLE [IF NOT "
            "EXISTS] name [(cols)] USING txlog LOCATION '<path>' "
            "[TBLPROPERTIES (...)] [AS <select>]"
        )
    if or_replace and if_not_exists:
        raise SqlDmlError("CREATE TABLE: OR REPLACE and IF NOT EXISTS conflict")
    if select is None:
        if coldefs is None:
            raise SqlDmlError(
                "CREATE TABLE: declare columns — (col type, ...) — or use "
                "CTAS (AS SELECT ...)"
            )
        if or_replace:
            raise SqlDmlError(
                "CREATE OR REPLACE TABLE needs AS <select> (replacing a "
                "table with an empty one loses data; DELETE FROM instead)"
            )
        try:
            res = txlog.create_table(spark, path, coldefs,
                                     if_not_exists=if_not_exists)
        except ValueError as e:
            raise SqlDmlError(str(e)) from e
    else:
        if coldefs is not None:
            raise SqlDmlError("CREATE TABLE AS SELECT takes no column list — "
                              "the query defines the schema")
        df = spark.sql(_pin_time_travel(spark, select))
        existing = txlog.current_version(spark, path) > 0
        if existing and if_not_exists:
            res = {"version": txlog.current_version(spark, path), "created": False}
        elif existing and not or_replace:
            raise SqlDmlError(
                f"CREATE TABLE: {path!r} already exists — use OR REPLACE "
                "(transactional overwrite) or IF NOT EXISTS"
            )
        elif existing:
            res = dict(txlog.overwrite_table(spark, path, df), created=True)
        else:
            res = dict(txlog.append(spark, path, df), created=True)
    if props and res.get("created"):
        # IF NOT EXISTS hitting an existing table is a full no-op —
        # committing the statement's TBLPROPERTIES would silently
        # mutate metadata the statement promised to leave alone
        txlog.set_table_properties(spark, path, props)
    txlog.register_table(spark, name, path)
    return dict(res, operation="create_table", table=name, path=path)


def execute_sql(spark: SparkSession, statement: str):
    """Route one SQL statement: DML verbs hit the transactional txlog
    API (see module docstring for the exact subset and semantics);
    everything else returns ``spark.sql(statement)`` unchanged — with
    ``<name> VERSION|TIMESTAMP AS OF <v>`` references to registered
    txlog tables pinned to snapshot temp views first (time-travel
    SELECT). DML returns the underlying API's result dict, augmented
    with ``{"operation", "table", "path"}``."""
    sql = statement.strip().rstrip(";").strip()

    created = _route_create_table(spark, sql)
    if created is not None:
        return created

    m = re.match(
        rf"INSERT\s+(INTO|OVERWRITE)\s+(?:TABLE\s+)?({_IDENT})\s*(\(([^)]*)\))?\s*(.+)",
        sql, re.IGNORECASE | re.DOTALL,
    )
    if m:
        mode, name, _clist, cols_raw, query = m.groups()
        path = _table_path(spark, name, "INSERT")
        if path is None:
            return spark.sql(sql)
        cols = [c.strip() for c in cols_raw.split(",")] if cols_raw else None
        if cols and mode.upper() == "OVERWRITE":
            raise SqlDmlError("INSERT OVERWRITE takes no column list here — "
                              "provide the full row shape in the query")
        df = spark.sql(_pin_time_travel(spark, query))
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
        if path is None:
            return spark.sql(sql)
        res = txlog.delete_where(spark, path, cond.strip() if cond else "true")
        txlog.refresh_table(spark, name)
        return dict(res, operation="delete", table=name, path=path)

    parsed = _parse_merge_stmt(sql)
    if parsed is not None:
        name, t_alias, source, s_alias, on, tail = parsed
        path = _table_path(spark, name, "MERGE")
        if path is None:
            return spark.sql(sql)
        t_alias = t_alias or name
        s_alias = s_alias or (None if source.startswith("(") else source)
        if s_alias is None:
            raise SqlDmlError("MERGE: a USING (subquery) needs an alias")
        src = (
            spark.sql(_pin_time_travel(spark, source[1:-1]))
            if source.startswith("(") else spark.table(source)
        )
        src = _cast_to_table(spark, path, src)
        keys = _parse_on_keys(on, t_alias, s_alias)
        st = txlog.table_schema(spark, path)
        # SET * / INSERT * expand to TARGET columns inside txlog.merge
        # (ANSI/Delta): a condition-only source column — a CDC _deleted
        # flag — is a condition input, not payload, and never evolves
        # the schema
        tcols = [f.name for f in st.fields] if st is not None else list(src.columns)
        clauses = _parse_merge_clauses(tail, t_alias, s_alias, src.columns, tcols)
        res = txlog.merge(spark, path, src, keys, **clauses)
        txlog.refresh_table(spark, name)
        return dict(res, operation="merge", table=name, path=path)

    m = re.match(
        rf"UPDATE\s+({_IDENT})\s+SET\s+(.+)$",
        sql, re.IGNORECASE | re.DOTALL,
    )
    if m:
        name, rest = m.groups()
        path = _table_path(spark, name, "UPDATE")
        if path is None:
            return spark.sql(sql)
        # locate WHERE quote/paren-aware: a ' WHERE ' inside a SET
        # string literal must not split the statement
        w = _find_top_level_word(rest, "WHERE")
        set_raw, cond = (rest[:w], rest[w + 5:]) if w >= 0 else (rest, None)
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
        if path is None:
            return spark.sql(sql)
        res = _route_alter(spark, path, action)
        txlog.refresh_table(spark, name)
        return dict(res, operation="alter_table", table=name, path=path)

    m = re.match(rf"DESCRIBE\s+CONSTRAINTS\s+({_IDENT})$", sql, re.IGNORECASE)
    if m:
        name = m.group(1)
        path = _table_path(spark, name, "DESCRIBE CONSTRAINTS")
        if path is None:
            return spark.sql(sql)
        cons = txlog.table_constraints(spark, path)
        return spark.createDataFrame(
            sorted(cons.items()), "name string, expr string"
        )

    m = re.match(rf"DESCRIBE\s+HISTORY\s+({_IDENT})$", sql, re.IGNORECASE)
    if m:
        name = m.group(1)
        path = _table_path(spark, name, "DESCRIBE HISTORY")
        if path is None:
            return spark.sql(sql)
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
        if path is None:
            return spark.sql(sql)
        res = txlog.restore(spark, path, version, cdc=True)
        txlog.refresh_table(spark, name)
        return dict(res, operation="restore", table=name, path=path)

    m = re.match(rf"OPTIMIZE\s+({_IDENT})$", sql, re.IGNORECASE)
    if m:
        name = m.group(1)
        path = _table_path(spark, name, "OPTIMIZE")
        if path is None:
            return spark.sql(sql)
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
        if path is None:
            return spark.sql(sql)
        reaped = txlog.vacuum(
            spark, path,
            retention_seconds=float(hours) * 3600 if hours else 24 * 3600,
        )
        return {"operation": "vacuum", "table": name, "path": path,
                "reaped": len(reaped)}

    return spark.sql(_pin_time_travel(spark, sql))


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
    m = re.fullmatch(
        r"ADD\s+CONSTRAINT\s+([A-Za-z_][A-Za-z0-9_]*)\s+CHECK\s*(\(.+\))",
        action, re.IGNORECASE | re.DOTALL,
    )
    if m:
        expr, leftover = _take_balanced(m.group(2).strip())
        if leftover.strip():
            raise SqlDmlError(
                f"ADD CONSTRAINT: trailing text after CHECK (...): "
                f"{leftover.strip()!r}"
            )
        try:
            return txlog.add_constraint(spark, path, m.group(1), expr[1:-1].strip())
        except ValueError as e:
            raise SqlDmlError(str(e)) from e
    m = re.fullmatch(r"DROP\s+CONSTRAINT\s+([A-Za-z_][A-Za-z0-9_]*)",
                     action, re.IGNORECASE)
    if m:
        try:
            return txlog.drop_constraint(spark, path, m.group(1))
        except ValueError as e:
            raise SqlDmlError(str(e)) from e
    m = re.fullmatch(
        rf"(?:ALTER|CHANGE)\s+COLUMN\s+({_IDENT})\s+(SET|DROP)\s+NOT\s+NULL",
        action, re.IGNORECASE,
    )
    if m:
        # the Delta NOT NULL spelling, recorded as a named CHECK
        col, verb = m.group(1), m.group(2).upper()
        name = f"notnull_{col}"
        try:
            if verb == "SET":
                return txlog.add_constraint(spark, path, name, f"{col} IS NOT NULL")
            return txlog.drop_constraint(spark, path, name)
        except ValueError as e:
            raise SqlDmlError(str(e)) from e
    raise SqlDmlError(
        f"ALTER TABLE: unsupported action {action!r} — RENAME COLUMN, "
        "DROP COLUMN, ALTER/CHANGE COLUMN ... TYPE (lossless widening), "
        "ALTER COLUMN ... SET/DROP NOT NULL, ADD/DROP CONSTRAINT, "
        "and SET/UNSET TBLPROPERTIES are routed; everything else needs "
        "the Python API"
    )
