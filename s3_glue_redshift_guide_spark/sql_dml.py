"""Warehouse-SQL front-end for the snapshot table format: a thin
dispatcher mapping ``MERGE INTO`` / ``UPDATE`` / ``DELETE`` /
``OPTIMIZE`` / ``DESCRIBE HISTORY`` / ``DESCRIBE DETAIL`` / ``RESTORE``
/ ``VACUUM`` SQL strings onto the existing ``SnapshotTable`` methods —
the reference's load target speaks warehouse SQL over JDBC
(``/root/reference/README.md:150``), so the table-format DML surface
should be drivable the way warehouse users actually drive it: as SQL
text, not Python method calls.

Deliberately a THIN PARSER, not Catalyst surgery: statements are
recognized with anchored regexes, expressions inside them are handed to
``F.expr`` (Spark's own SQL expression compiler) after alias
translation, and every statement resolves to exactly one existing
method call — the semantics (atomicity, conflict detection, constraint
enforcement, CDF rows) are the methods', proven by their own oracle
rows. Table references are ``pysnapshot.`/table/root``` (or a bare
backtick-quoted path).

MERGE alias translation: the source side of a MERGE joins under the
``__src_<col>`` namespace in ``merge_mor``; conditions and assignments
written as ``s.col`` / ``t.col`` rewrite to ``__src_col`` / ``col``
respectively, skipping single-quoted string literals. The ON clause
must be an equi-conjunction (``t.k = s.k [AND ...]``) — the same
constraint ``merge_mor`` itself imposes.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession, functions as F

from .sources.snapshots import SnapshotTable

_TBL = r"(?:pysnapshot\s*\.\s*)?`(?P<root>[^`]+)`"


def _translate(expr: str, talias: str, salias: str) -> str:
    """Rewrite ``salias.col`` -> ``__src_col`` and ``talias.col`` ->
    ``col`` outside single-quoted string literals."""
    out = []
    for i, seg in enumerate(re.split(r"('(?:[^']|'')*')", expr)):
        if i % 2 == 1:  # a quoted literal: untouched
            out.append(seg)
            continue
        seg = re.sub(
            rf"\b{re.escape(salias)}\.(\w+)", r"__src_\1", seg
        )
        seg = re.sub(rf"\b{re.escape(talias)}\.(\w+)", r"\1", seg)
        out.append(seg)
    return "".join(out)


def _split_top(s: str, sep: str = ",") -> list[str]:
    """Split on top-level separators (ignores parens and quotes)."""
    parts, depth, start, i = [], 0, 0, 0
    in_str = False
    while i < len(s):
        c = s[i]
        if in_str:
            if c == "'":
                in_str = False
        elif c == "'":
            in_str = True
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif c == sep and depth == 0:
            parts.append(s[start:i])
            start = i + 1
        i += 1
    parts.append(s[start:])
    return [p.strip() for p in parts if p.strip()]


def _assignments(
    set_clause: str, talias: str = "", salias: str = ""
) -> dict:
    out = {}
    for a in _split_top(set_clause):
        m = re.match(r"(?:\w+\.)?(\w+)\s*=\s*(.+)$", a, re.S)
        if not m:
            raise ValueError(f"cannot parse assignment {a!r}")
        expr = m.group(2)
        if talias:
            expr = _translate(expr, talias, salias)
        out[m.group(1)] = F.expr(expr)
    return out


def _on_keys(on: str, talias: str, salias: str) -> list[str]:
    keys = []
    for conj in re.split(r"\bAND\b", on, flags=re.I):
        m = re.match(
            r"\s*(\w+)\.(\w+)\s*=\s*(\w+)\.(\w+)\s*$", conj
        )
        if not m:
            raise ValueError(
                f"MERGE ON must be an equi-conjunction of "
                f"t.col = s.col terms; got {conj.strip()!r}"
            )
        a1, c1, a2, c2 = m.groups()
        if {a1, a2} != {talias, salias} or c1 != c2:
            raise ValueError(
                f"ON term {conj.strip()!r} must equate the SAME "
                "column across the two aliases (merge_mor joins on "
                "shared key names)"
            )
        keys.append(c1)
    return keys


_MERGE = re.compile(
    rf"^\s*MERGE\s+INTO\s+{_TBL}\s+(?:AS\s+)?(?P<t>\w+)\s+"
    r"USING\s+(?P<src>\(.*\)"
    # a bare snapshot ref (optionally time-travelled) as the source —
    # MERGE ... USING pysnapshot.`root` [VERSION AS OF n | TIMESTAMP
    # AS OF 'ts' | TAG 'x' | BRANCH 'x'] s ON ...
    r"|pysnapshot\s*\.\s*`[^`]+`"
    r"(?:\s+(?:VERSION\s+AS\s+OF\s+\d+|TIMESTAMP\s+AS\s+OF\s+'[^']+'"
    r"|TAG\s+'[^']+'|BRANCH\s+'[^']+'))?"
    r"|\w+)\s+(?:AS\s+)?(?P<s>\w+)\s+"
    r"ON\s+(?P<on>.*?)\s*(?P<clauses>\bWHEN\b.*)$",
    re.I | re.S,
)
_WHEN = re.compile(
    r"WHEN\s+(?P<not>NOT\s+)?MATCHED(?:\s+BY\s+SOURCE)?"
    r"(?:\s+AND\s+(?P<cond>.*?))?\s+THEN\s+"
    r"(?P<act>UPDATE\s+SET\s+.*?|DELETE|INSERT\s+\*)\s*"
    r"(?=WHEN\s+(?:NOT\s+)?MATCHED|$)",
    re.I | re.S,
)


def _merge(
    spark: SparkSession, m: re.Match, clock, txn_update=None
) -> int:
    t = SnapshotTable(spark, m.group("root"), clock=clock)
    talias, salias = m.group("t"), m.group("s")
    src_sql = m.group("src")
    if src_sql.startswith("("):
        source = _body_df(spark, src_sql[1:-1])
    elif re.match(r"^\s*pysnapshot\s*\.", src_sql, re.I):
        # bare snapshot ref as the MERGE source: route it through the
        # connector view rewriter (time-travel suffixes included)
        source = _body_df(spark, f"SELECT * FROM {src_sql}")
    else:
        source = spark.table(src_sql)
    on = _on_keys(m.group("on"), talias, salias)
    kw: dict = {"insert_not_matched": False}
    clauses = m.group("clauses")
    matched_any = False
    # WHEN MATCHED clauses evaluate IN ORDER (Delta/SQL:2016): the
    # first clause whose condition holds claims the row. merge_mor's
    # primitives are order-blind (delete beats update), so each
    # clause's condition is rewritten to ``own AND NOT (any earlier
    # matched clause's condition)`` — with that rewrite the effective
    # sets are disjoint and delete-priority composition is exact in
    # either clause order. ``matched_prior`` accumulates the
    # NULL-safe OR of earlier matched-clause conditions.
    matched_prior = None
    for w in _WHEN.finditer(clauses):
        is_not = bool(w.group("not"))
        by_source = re.search(
            r"BY\s+SOURCE", w.group(0), re.I
        ) is not None
        cond = w.group("cond")
        act = w.group("act")
        col = (
            F.expr(_translate(cond, talias, salias))
            if cond
            else None
        )
        if by_source:
            if not re.match(r"DELETE", act, re.I):
                raise ValueError(
                    "WHEN NOT MATCHED BY SOURCE supports THEN DELETE"
                )
            kw["when_not_matched_by_source_delete"] = (
                col if col is not None else True
            )
        elif is_not:
            if not re.match(r"INSERT\s*\*", act, re.I):
                raise ValueError(
                    "WHEN NOT MATCHED supports THEN INSERT * (the "
                    "source's columns insert as-is)"
                )
            kw["insert_not_matched"] = (
                col if col is not None else True
            )
        elif re.match(r"DELETE", act, re.I):
            if "when_matched_delete" in kw:
                raise ValueError(
                    "at most one WHEN MATCHED ... DELETE clause"
                )
            own = col if col is not None else F.lit(True)
            kw["when_matched_delete"] = (
                own if matched_prior is None else own & ~matched_prior
            )
            own_t = own.eqNullSafe(F.lit(True))
            matched_prior = (
                own_t if matched_prior is None
                else matched_prior | own_t
            )
            matched_any = True
        else:  # UPDATE SET, optionally conditional (Delta's
            # WHEN MATCHED AND <cond> THEN UPDATE: rows failing the
            # condition stay untouched — no tombstone, no CDF pair)
            if "when_matched_update" in kw:
                raise ValueError(
                    "at most one WHEN MATCHED ... UPDATE clause"
                )
            own = col if col is not None else F.lit(True)
            if col is not None or matched_prior is not None:
                kw["when_matched_update_condition"] = (
                    own
                    if matched_prior is None
                    else own & ~matched_prior
                )
            set_clause = re.sub(
                r"^UPDATE\s+SET\s+", "", act, flags=re.I
            )
            kw["when_matched_update"] = _assignments(
                set_clause, talias, salias
            )
            own_t = own.eqNullSafe(F.lit(True))
            matched_prior = (
                own_t if matched_prior is None
                else matched_prior | own_t
            )
            matched_any = True
    if not matched_any and "when_not_matched_by_source_delete" not in kw \
            and kw["insert_not_matched"] is False:
        raise ValueError("MERGE with no WHEN clauses is a no-op")
    return t.merge_mor(source, on=on, txn_update=txn_update, **kw)


_UPDATE = re.compile(
    rf"^\s*UPDATE\s+{_TBL}\s+SET\s+(?P<set>.*?)"
    r"(?:\s+WHERE\s+(?P<where>.*))?\s*$",
    re.I | re.S,
)
_DELETE = re.compile(
    rf"^\s*DELETE\s+FROM\s+{_TBL}"
    r"(?:\s+WHERE\s+(?P<where>.*))?\s*$",
    re.I | re.S,
)
_REWRITE_PHYS = re.compile(
    rf"^\s*OPTIMIZE\s+{_TBL}\s+REWRITE\s+PHYSICAL\s*$", re.I
)
_OPTIMIZE = re.compile(
    rf"^\s*OPTIMIZE\s+{_TBL}"
    r"(?:\s+WHERE\s+(?P<where>.*?))?"
    r"(?:\s+ZORDER\s+BY\s*\(\s*(?P<za>\w+)\s*,\s*(?P<zb>\w+)\s*\))?"
    r"\s*$",
    re.I | re.S,
)
_ANN_BUILD = re.compile(
    rf"^\s*CREATE\s+ANN\s+INDEX\s+ON\s+{_TBL}\s*"
    r"\(\s*(?P<vec>\w+)\s*\)\s*WITH\s*\((?P<opts>.*)\)\s*$",
    re.I | re.S,
)
_ANN_REFRESH = re.compile(
    rf"^\s*REFRESH\s+ANN\s+INDEX\s+ON\s+{_TBL}\s*$", re.I
)
_ANN_OPTIMIZE = re.compile(
    rf"^\s*OPTIMIZE\s+ANN\s+INDEX\s+ON\s+{_TBL}\s*$", re.I
)
_HISTORY = re.compile(
    rf"^\s*DESCRIBE\s+HISTORY\s+{_TBL}\s*$", re.I
)
_DETAIL = re.compile(
    rf"^\s*DESCRIBE\s+DETAIL\s+{_TBL}\s*$", re.I
)
_RESTORE = re.compile(
    rf"^\s*RESTORE\s+{_TBL}\s+TO\s+(?:VERSION\s+AS\s+OF\s+"
    r"(?P<v>\d+)|TIMESTAMP\s+AS\s+OF\s+'(?P<ts>[^']+)')\s*$",
    re.I,
)
_VACUUM = re.compile(
    rf"^\s*VACUUM\s+{_TBL}\s+RETAIN\s+(?P<n>\d+)\s+"
    r"(?P<unit>VERSIONS|HOURS)"
    r"(?P<dry>\s+DRY\s+RUN)?\s*$",
    re.I,
)
_REORG = re.compile(
    rf"^\s*REORG\s+TABLE\s+{_TBL}\s+APPLY\s*\(\s*PURGE\s*\)\s*$", re.I
)
_ADD_CONSTRAINT = re.compile(
    rf"^\s*ALTER\s+TABLE\s+{_TBL}\s+ADD\s+CONSTRAINT\s+(?P<name>\w+)\s+"
    r"CHECK\s*\((?P<expr>.*)\)\s*$",
    re.I | re.S,
)
_DROP_CONSTRAINT = re.compile(
    rf"^\s*ALTER\s+TABLE\s+{_TBL}\s+DROP\s+CONSTRAINT\s+(?P<name>\w+)\s*$",
    re.I,
)
_COPY_INTO = re.compile(
    rf"^\s*COPY\s+INTO\s+{_TBL}\s+FROM\s+(?P<srcs>'[^']+'(?:\s*,\s*'[^']+')*)"
    r"(?:\s+PATTERN\s*=?\s*'(?P<pat>[^']+)')?"
    r"(?:\s+FILEFORMAT\s*=\s*(?P<fmt>\w+))?\s*$",
    re.I | re.S,
)
_CREATE_TAG = re.compile(
    rf"^\s*ALTER\s+TABLE\s+{_TBL}\s+CREATE\s+TAG\s+(?P<name>\w+)"
    r"(?:\s+AS\s+OF\s+VERSION\s+(?P<v>\d+))?\s*$",
    re.I,
)
_ANALYZE = re.compile(
    rf"^\s*ANALYZE\s+TABLE\s+{_TBL}\s+COMPUTE\s+STATISTICS\s+"
    r"FOR\s+COLUMNS\s+(?P<cols>\w+(?:\s*,\s*\w+)*)"
    r"(?P<hist>\s+WITH\s+HISTOGRAM(?:\s*\(\s*(?P<bins>\d+)\s*\))?)?\s*$",
    re.I,
)
_SHOW_PARTS = re.compile(
    rf"^\s*SHOW\s+PARTITIONS\s+{_TBL}\s*$", re.I
)
_SELECT = re.compile(
    rf"^\s*SELECT\s+\*\s+FROM\s+{_TBL}"
    r"(?:\s+VERSION\s+AS\s+OF\s+(?P<v>\d+)"
    r"|\s+TIMESTAMP\s+AS\s+OF\s+'(?P<ts>[^']+)'"
    r"|\s+TAG\s+'(?P<tag>[^']+)'"
    r"|\s+BRANCH\s+'(?P<branch>[^']+)')?"
    r"(?:\s+WHERE\s+(?P<where>.*))?\s*$",
    re.I | re.S,
)

_CREATE_TABLE = re.compile(
    rf"^\s*CREATE\s+TABLE\s+{_TBL}\s*\((?P<rest>.*)$", re.I | re.S
)
_CTAS = re.compile(
    rf"^\s*CREATE\s+TABLE\s+{_TBL}\s+(?P<rest>(?:PARTITIONED|"
    r"CLUSTERED|CLUSTER|TBLPROPERTIES|AS)\s.*)$",
    re.I | re.S,
)
_SHOW_PROPS = re.compile(
    rf"^\s*SHOW\s+TBLPROPERTIES\s+{_TBL}\s*$", re.I
)
_INSERT = re.compile(
    rf"^\s*INSERT\s+INTO\s+{_TBL}"
    r"(?:\s*\((?P<cols>[\w\s,]+)\))?"
    r"\s+(?P<body>VALUES\s+.*|SELECT\s+.*)$",
    re.I | re.S,
)
_REPLACE_WHERE = re.compile(
    rf"^\s*INSERT\s+INTO\s+{_TBL}\s+REPLACE\s+WHERE\s+"
    r"(?P<where>.+?)\s+(?P<body>VALUES\s+.*|SELECT\s+.*)$",
    re.I | re.S,
)
_INSERT_OVERWRITE = re.compile(
    rf"^\s*INSERT\s+OVERWRITE\s+(?:TABLE\s+)?{_TBL}"
    r"(?:\s*\((?P<cols>[\w\s,]+)\))?"
    r"\s+(?P<body>VALUES\s+.*|SELECT\s+.*)$",
    re.I | re.S,
)
_ADD_COLUMN = re.compile(
    rf"^\s*ALTER\s+TABLE\s+{_TBL}\s+ADD\s+COLUMN\s+(?P<name>\w+)\s+"
    r"(?P<type>\w+(?:\s*\(\s*\d+\s*(?:,\s*\d+\s*)?\))?)\s*$",
    re.I,
)
_RENAME_COLUMN = re.compile(
    rf"^\s*ALTER\s+TABLE\s+{_TBL}\s+RENAME\s+COLUMN\s+(?P<old>\w+)\s+"
    r"TO\s+(?P<new>\w+)\s*$",
    re.I,
)
_ALTER_TYPE = re.compile(
    rf"^\s*ALTER\s+TABLE\s+{_TBL}\s+ALTER\s+COLUMN\s+(?P<col>\w+)\s+"
    r"TYPE\s+(?P<type>\w+(?:\s*\(\s*\d+\s*(?:,\s*\d+\s*)?\))?)\s*$",
    re.I,
)
_TABLE_CHANGES = re.compile(
    rf"^\s*SELECT\s+\*\s+FROM\s+table_changes\s*\(\s*{_TBL}\s*,\s*"
    r"(?P<from>\d+)\s*(?:,\s*(?P<to>\d+)\s*)?\)\s*$",
    re.I,
)
_CREATE_BRANCH = re.compile(
    rf"^\s*ALTER\s+TABLE\s+{_TBL}\s+CREATE\s+BRANCH\s+(?P<name>\w+)"
    r"(?:\s+AS\s+OF\s+VERSION\s+(?P<v>\d+))?\s*$",
    re.I,
)
_DROP_BRANCH = re.compile(
    rf"^\s*ALTER\s+TABLE\s+{_TBL}\s+DROP\s+BRANCH\s+(?P<name>\w+)\s*$",
    re.I,
)
_FAST_FORWARD = re.compile(
    rf"^\s*ALTER\s+TABLE\s+{_TBL}\s+FAST\s+FORWARD\s+TO\s+BRANCH\s+"
    r"(?P<name>\w+)\s*$",
    re.I,
)
_DROP_COLUMN = re.compile(
    rf"^\s*ALTER\s+TABLE\s+{_TBL}\s+DROP\s+COLUMN\s+(?P<name>\w+)\s*$",
    re.I,
)
_TRUNCATE = re.compile(
    rf"^\s*TRUNCATE\s+TABLE\s+{_TBL}\s*$", re.I
)
_SET_DEFAULT = re.compile(
    rf"^\s*ALTER\s+TABLE\s+{_TBL}\s+ALTER\s+COLUMN\s+(?P<col>\w+)\s+"
    r"SET\s+DEFAULT\s+(?P<expr>.+)$",
    re.I | re.S,
)
_DROP_DEFAULT = re.compile(
    rf"^\s*ALTER\s+TABLE\s+{_TBL}\s+ALTER\s+COLUMN\s+(?P<col>\w+)\s+"
    r"DROP\s+DEFAULT\s*$",
    re.I,
)
_DROP_PARTITION = re.compile(
    rf"^\s*ALTER\s+TABLE\s+{_TBL}\s+DROP\s+PARTITION\s*"
    r"\((?P<kvs>[^)]*)\)\s*$",
    re.I | re.S,
)
_SET_PROPS = re.compile(
    rf"^\s*ALTER\s+TABLE\s+{_TBL}\s+SET\s+TBLPROPERTIES\s*"
    r"\((?P<props>.*)\)\s*$",
    re.I | re.S,
)
_SHOW_CREATE = re.compile(
    rf"^\s*SHOW\s+CREATE\s+TABLE\s+{_TBL}\s*$", re.I
)
_CONVERT = re.compile(
    r"^\s*CONVERT\s+TO\s+SNAPSHOT\s+parquet\s*\.\s*`(?P<path>[^`]+)`"
    r"(?:\s+STATS\s+FOR\s+COLUMNS\s+(?P<cols>\w+(?:\s*,\s*\w+)*))?\s*$",
    re.I,
)
_EXPLAIN = re.compile(
    r"^\s*EXPLAIN\s+(?P<stmt>SELECT\s.*)$", re.I | re.S
)


def _balanced(s: str) -> tuple[str, str]:
    """Split ``s`` (starting INSIDE an already-open paren) at the
    matching close — returns (inside, remainder). Paren-aware so
    ``decimal(10,2)`` column types survive."""
    depth, in_str = 1, False
    for i, c in enumerate(s):
        if in_str:
            in_str = c != "'"
        elif c == "'":
            in_str = True
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                return s[:i], s[i + 1:]
    raise ValueError("unbalanced parentheses in statement")


def _props_dict(props: str) -> dict:
    out = {}
    for kv in _split_top(props):
        m = re.match(r"'([^']+)'\s*=\s*'([^']*)'\s*$", kv.strip())
        if not m:
            raise ValueError(
                f"TBLPROPERTIES takes 'key'='value' pairs; got {kv!r}"
            )
        out[m.group(1)] = m.group(2)
    return out


def _table_opts(rest: str):
    """Parse the optional ``PARTITIONED BY (...) [CLUSTERED BY (col)
    INTO n BUCKETS | CLUSTER BY (...)] TBLPROPERTIES (...)`` clauses
    (balanced-paren aware — transform specs nest parens); returns
    (spec, props, remainder). ``CLUSTER BY (a, b)`` lands as the
    ``cluster.by`` table property — every subsequent append lays
    itself out along the Morton key; ``CLUSTERED BY (col) INTO n
    BUCKETS`` (the Hive/Spark declaration) lands as ``bucket.by`` —
    every append routes through the native bucketed writer for
    shuffle-free co-partitioned joins (S73)."""
    rest = rest.strip()
    spec = None
    mm = re.match(
        r"^PARTITIONED\s+BY\s*\((?P<rest>.*)$", rest, re.I | re.S
    )
    if mm:
        inside, rest = _balanced(mm.group("rest"))
        spec = [e.strip() for e in _split_top(inside)]
        rest = rest.strip()
    bucket = None
    mm = re.match(
        r"^CLUSTERED\s+BY\s*\((?P<col>\w+)\s*\)\s+INTO\s+"
        r"(?P<n>\d+)\s+BUCKETS\s*(?P<rest>.*)$",
        rest,
        re.I | re.S,
    )
    if mm:
        # Hive/Spark's bucketed-table declaration → the bucket.by
        # property: every append routes through the native bucketed
        # writer and register_bucketed_view serves shuffle-free joins
        bucket = f"{mm.group('col')}:{int(mm.group('n'))}"
        rest = mm.group("rest").strip()
    cluster = None
    mm = re.match(
        r"^CLUSTER\s+BY\s*\((?P<rest>.*)$", rest, re.I | re.S
    )
    if mm:
        inside, rest = _balanced(mm.group("rest"))
        cluster = [e.strip() for e in _split_top(inside)]
        if not 2 <= len(cluster) <= 4:
            raise ValueError(
                "CLUSTER BY takes 2-4 columns (each gets "
                "floor(63/N) interleave bits; beyond 4 the "
                f"per-column ranges are too coarse to prune): "
                f"got {cluster!r}"
            )
        rest = rest.strip()
    if bucket and cluster:
        raise ValueError(
            "CLUSTERED BY ... INTO n BUCKETS and CLUSTER BY are "
            "mutually exclusive layouts"
        )
    props = None
    mm = re.match(
        r"^TBLPROPERTIES\s*\((?P<rest>.*)$", rest, re.I | re.S
    )
    if mm:
        inside, rest = _balanced(mm.group("rest"))
        props = _props_dict(inside)
        rest = rest.strip()
    if cluster:
        props = dict(props or {})
        props["cluster.by"] = ",".join(cluster)
    if bucket:
        props = dict(props or {})
        props["bucket.by"] = bucket
    return spec, props, rest


def _split_cols(schema: str) -> list[str]:
    """Top-level comma split of a column list, aware of BOTH paren
    nesting (decimal(10,2), generated exprs) and angle-bracket nesting
    (map<string,int>, array<struct<...>>). The two nestings track
    SEPARATELY, and angles only count outside parens — a comparison
    ``>`` inside a DEFAULT/GENERATED expression (``if(a > b, 1, 2)``)
    must not close a phantom angle bracket and leak its commas to the
    top level."""
    out, buf, paren, angle, in_str = [], [], 0, 0, False
    for ch in schema:
        if ch == "'":
            in_str = not in_str  # quote-aware, like _split_top
        elif in_str:
            pass  # a ',', '(' or '>' inside a string literal is text
        elif ch == "(":
            paren += 1
        elif ch == ")":
            paren -= 1
        elif ch == "<" and paren == 0:
            angle += 1
        elif ch == ">" and paren == 0 and angle > 0:
            angle -= 1
        elif ch == "," and paren == 0 and angle == 0:
            out.append("".join(buf).strip())
            buf = []
            continue
        buf.append(ch)
    tail = "".join(buf).strip()
    if tail:
        out.append(tail)
    return out


_COL_CLAUSE = re.compile(r"\b(GENERATED|DEFAULT)\b", re.I)


def _parse_column_clauses(schema: str):
    """Strip per-column ``DEFAULT <expr>`` / ``GENERATED ALWAYS AS
    (expr)`` / ``GENERATED ALWAYS AS IDENTITY [(START WITH n
    [INCREMENT BY m])]`` clauses out of a CREATE TABLE column list —
    returns (plain DDL for create_table, defaults, generated,
    identities). Clause keywords are only honored at nesting depth 0,
    so a struct field named ``default`` or an expr containing the word
    stays untouched."""
    cols: list[str] = []
    defaults: dict[str, str] = {}
    generated: dict[str, str] = {}
    identities: dict[str, tuple[int, int]] = {}
    for c in _split_cols(schema):
        mm = _COL_CLAUSE.search(c)
        # keyword inside <> or () nesting is part of a type/expr
        while mm and (
            c[: mm.start()].count("(") - c[: mm.start()].count(")") > 0
            or c[: mm.start()].count("<") - c[: mm.start()].count(">")
            > 0
        ):
            mm = _COL_CLAUSE.search(c, mm.end())
        base, clause = (
            (c[: mm.start()].strip(), c[mm.start():].strip())
            if mm
            else (c, "")
        )
        nm = re.match(r"^`?(\w+)`?\s+(.+)$", base, re.S)
        if not nm:
            raise ValueError(f"cannot parse column definition: {c!r}")
        name = nm.group(1)
        cols.append(f"`{name}` {nm.group(2).strip()}")
        if not clause:
            continue
        im = re.match(
            r"^GENERATED\s+ALWAYS\s+AS\s+IDENTITY"
            r"(?:\s*\(\s*START\s+WITH\s+(?P<start>-?\d+)"
            r"(?:\s+INCREMENT\s+BY\s+(?P<step>-?\d+))?\s*\))?\s*$",
            clause,
            re.I,
        )
        if im:
            identities[name] = (
                int(im.group("start") or 1),
                int(im.group("step") or 1),
            )
            continue
        gm = re.match(
            r"^GENERATED\s+ALWAYS\s+AS\s*\((?P<rest>.*)$",
            clause,
            re.I | re.S,
        )
        if gm:
            expr, tail = _balanced(gm.group("rest"))
            if tail.strip():
                raise ValueError(
                    f"unparsed tail after generated expr: {tail!r}"
                )
            generated[name] = expr.strip()
            continue
        dm = re.match(r"^DEFAULT\s+(?P<expr>.+)$", clause, re.I | re.S)
        if dm:
            defaults[name] = dm.group("expr").strip()
            continue
        raise ValueError(f"unrecognized column clause: {clause!r}")
    return ", ".join(cols), defaults, generated, identities


def _create_table(spark: SparkSession, m: re.Match, clock) -> int:
    schema, rest = _balanced(m.group("rest"))
    spec, props, rest = _table_opts(rest)
    if rest:
        raise ValueError(f"unparsed CREATE TABLE tail: {rest!r}")
    plain, defaults, generated, identities = _parse_column_clauses(
        schema
    )
    t = SnapshotTable(spark, m.group("root"), clock=clock)
    v = t.create_table(plain, partition_by=spec, properties=props)
    # column contracts register as follow-on metadata commits through
    # the same methods their ALTER verbs use (each validates itself)
    for name, expr in generated.items():
        v = t.add_generated_column(name, expr)
    for name, expr in defaults.items():
        v = t.add_column_default(name, expr)
    for name, (start, step) in identities.items():
        v = t.add_identity_column(name, start=start, step=step)
    return v


def _ctas(spark: SparkSession, m: re.Match, clock) -> int:
    """CREATE TABLE ... AS SELECT: the schema is the SELECT's, declared
    on the new table (so enforcement/reads behave exactly as an
    explicit CREATE), then the result lands as the first data commit —
    v1 metadata + v2 data, both through existing methods."""
    spec, props, rest = _table_opts(m.group("rest"))
    sel = re.match(r"^AS\s+(?P<select>SELECT\s+.*)$", rest, re.I | re.S)
    if not sel:
        raise ValueError(f"unparsed CREATE TABLE tail: {rest[:80]!r}")
    df = _body_df(spark, sel.group("select"))
    t = SnapshotTable(spark, m.group("root"), clock=clock)
    schema = ", ".join(f"`{n}` {dt}" for n, dt in df.dtypes)
    t.create_table(schema, partition_by=spec, properties=props)
    return t.commit_append(df)


def _qcol(name: str):
    """Column by EXACT name: quote (and escape embedded backticks) so a
    generated name containing dots/backticks — e.g. an unaliased string
    literal's auto-name — never parses as a nested-field path."""
    return F.col("`" + name.replace("`", "``") + "`")


def _insert(spark: SparkSession, m: re.Match, clock) -> int:
    t = SnapshotTable(spark, m.group("root"), clock=clock)
    src = _body_df(spark, m.group("body"))
    target = t.read()
    cols = (
        [c.strip() for c in m.group("cols").split(",")]
        if m.group("cols")
        else list(target.columns)
    )
    missing = [c for c in cols if c not in target.columns]
    if missing:
        raise ValueError(f"INSERT columns not in table: {missing}")
    if len(src.columns) != len(cols):
        raise ValueError(
            f"INSERT arity mismatch: {len(src.columns)} values for "
            f"{len(cols)} columns"
        )
    dts = dict(target.dtypes)
    aligned = src.select(
        *[
            _qcol(src.columns[i]).cast(dts[c]).alias(c)
            for i, c in enumerate(cols)
        ]
    )
    return t.commit_append(aligned)


#: OPTIMIZE defaults when the statement carries no sizing knobs: the
#: same "compact under 32 MiB into ~128 MiB outputs" shape Delta uses
OPTIMIZE_SMALL = 32 << 20
OPTIMIZE_TARGET = 128 << 20


def _split_conjuncts(where: str) -> list[str]:
    """Split a WHERE clause on top-level ANDs, BETWEEN-aware (the AND
    inside ``x BETWEEN a AND b`` belongs to the BETWEEN), paren-aware
    (ANDs inside parens stay with their conjunct) and quote-aware (an
    AND or paren inside a string literal like ``name = 'A AND B'`` is
    literal text, not an operator — same contract as _split_top)."""
    # mask string literals so the token split can't see their contents;
    # \x00 placeholders carry no word chars or parens, then unmask per
    # conjunct at the end
    lits: list[str] = []

    def _mask(m: "re.Match[str]") -> str:
        lits.append(m.group(0))
        return f"\x00{len(lits) - 1}\x00"

    where = re.sub(r"'[^']*'", _mask, where)

    def _unmask(s: str) -> str:
        return re.sub(r"\x00(\d+)\x00", lambda m: lits[int(m.group(1))], s)

    out: list[str] = []
    buf: list[str] = []
    depth, between = 0, False
    for tok in re.split(r"(\bAND\b|[()])", where, flags=re.I):
        if tok == "(":
            depth += 1
        elif tok == ")":
            depth -= 1
        elif re.fullmatch(r"AND", tok.strip(), flags=re.I) and depth == 0:
            if between:
                between = False  # the BETWEEN's own AND
            else:
                if "".join(buf).strip():
                    out.append(_unmask("".join(buf).strip()))
                buf = []
                continue
        elif re.search(r"\bBETWEEN\b", tok, flags=re.I) and depth == 0:
            # a parenthesized BETWEEN keeps its AND inside the parens —
            # flagging it would swallow the NEXT top-level AND
            between = True
        buf.append(tok)
    if "".join(buf).strip():
        out.append(_unmask("".join(buf).strip()))
    return out


def _lit(s_lit, raw):
    """A parsed literal in the zone-map/partition stat domain: quoted
    strings stay strings (dates/timestamps compare as ISO text, the
    domain the manifests bank), bare tokens parse numeric."""
    if s_lit is not None:
        return s_lit
    try:
        return int(raw)
    except ValueError:
        try:
            return float(raw)
        except ValueError:
            return raw


def _parse_pushable(where: str):
    """Split a WHERE conjunction into prune-pushable terms — equality,
    IN lists, BETWEEN / one-sided ranges — plus the residual conjuncts
    the planner can't push (they still row-filter at scan, exactly as
    in the SELECT path). Strict < / > push as inclusive bounds:
    pruning at partition/zone grain may widen, never narrow."""
    eq: dict = {}
    any_of: dict = {}
    ranges: dict = {}
    residual: list[str] = []
    for c in _split_conjuncts(where):
        m = re.match(r"^(\w+)\s*=\s*(?:'([^']*)'|(\S+))$", c)
        if m:
            eq[m.group(1)] = _lit(m.group(2), m.group(3))
            continue
        m = re.match(r"^(\w+)\s+IN\s*\((.*)\)$", c, re.I | re.S)
        if m:
            opts = []
            ok = True
            for x in _split_top(m.group(2)):
                mm = re.match(r"^(?:'([^']*)'|(\S+))$", x.strip())
                if not mm:
                    ok = False
                    break
                opts.append(_lit(mm.group(1), mm.group(2)))
            if ok:
                any_of[m.group(1)] = opts
                continue
        m = re.match(
            r"^(\w+)\s+BETWEEN\s+(?:'([^']*)'|(\S+))\s+AND\s+"
            r"(?:'([^']*)'|(\S+))$",
            c,
            re.I,
        )
        if m:
            ranges[m.group(1)] = (
                _lit(m.group(2), m.group(3)),
                _lit(m.group(4), m.group(5)),
            )
            continue
        m = re.match(r"^(\w+)\s*(<=|>=|<|>)\s*(?:'([^']*)'|(\S+))$", c)
        if m:
            col, op = m.group(1), m.group(2)
            v = _lit(m.group(3), m.group(4))
            lo, hi = ranges.get(col, (None, None))
            if op in (">", ">="):
                lo = v
            else:
                hi = v
            ranges[col] = (lo, hi)
            continue
        m = re.match(r"^(\w+)\s+LIKE\s+'([^'%_]+)%'$", c, re.I)
        if m:
            # prefix LIKE prunes as a lexicographic range — the same
            # [prefix, next-prefix) bound the connector derives from a
            # pushed StringStartsWith (the residual LIKE still
            # row-filters at scan)
            from .sources.pyds import _prefix_upper

            col, p = m.group(1), m.group(2)
            up = _prefix_upper(p)
            ranges[col] = (p, up)
            residual.append(c)
            continue
        residual.append(c)
    return eq, any_of, ranges, residual


def _explain(spark: SparkSession, m: re.Match, clock):
    """EXPLAIN SELECT: the PLAN-TIME scan facts — from metadata only,
    zero Spark jobs, zero file opens. Answers the question a 100 TB
    user asks before running anything: how many of the snapshot's
    files would this predicate actually schedule, through partition
    pruning (hidden-partitioning transforms included) and through
    log-banked zone maps, and which conjuncts can't prune and ride as
    row-level residuals."""
    from .sources.snapshots import load_manifest, version_as_of

    if m.group("branch"):
        raise ValueError("EXPLAIN does not support BRANCH reads")
    t = SnapshotTable(spark, m.group("root"), clock=clock)
    if m.group("v"):
        v = int(m.group("v"))
    elif m.group("ts"):
        from datetime import datetime, timezone

        v = version_as_of(
            t.root,
            datetime.fromisoformat(m.group("ts"))
            .replace(tzinfo=timezone.utc)
            .timestamp(),
        )
    elif m.group("tag"):
        v = t.tags()[m.group("tag")]
    else:
        v = t.current_version()
    man = load_manifest(t.root, v)
    total = len(man["files"])
    where = (m.group("where") or "").strip()
    if where:
        eq, any_of, ranges, residual = _parse_pushable(where)
    else:
        eq, any_of, ranges, residual = {}, {}, {}, []
    part_keep = set(
        t.partition_pruned_files(
            eq, version=v, ranges=ranges, any_of=any_of
        )
    )
    zone_keep = set(man["files"])
    bounds = dict(ranges)
    for col, val in eq.items():
        bounds.setdefault(col, (val, val))
    for col, opts in any_of.items():
        if opts and col not in bounds:
            try:
                bounds[col] = (min(opts), max(opts))
            except TypeError:
                pass  # mixed-type IN list: zone maps sit this one out
    for col, (lo, hi) in bounds.items():
        keep, _ = t.pruned_files(col, lo, hi, version=v)
        zone_keep &= set(keep)
    pushed = sorted(eq) + sorted(any_of) + sorted(ranges)
    return spark.createDataFrame(
        [
            (
                v,
                total,
                len(part_keep),
                len(zone_keep),
                len(part_keep & zone_keep),
                ", ".join(pushed),
                " AND ".join(residual),
            )
        ],
        "version int, files_total int, files_after_partition_prune "
        "int, files_after_zone_prune int, files_scanned int, "
        "pushed_prune_cols string, residual string",
    )


def _where_eq(where: str) -> dict:
    """OPTIMIZE ... WHERE takes an equi-conjunction over partition
    columns (Delta's partition-scoped OPTIMIZE)."""
    eq = {}
    for conj in re.split(r"\bAND\b", where, flags=re.I):
        m = re.match(
            r"\s*(\w+)\s*=\s*(?:'([^']*)'|(\S+))\s*$", conj
        )
        if not m:
            raise ValueError(
                f"OPTIMIZE WHERE takes col = literal terms; got "
                f"{conj.strip()!r}"
            )
        col, s_lit, raw = m.groups()
        eq[col] = s_lit if s_lit is not None else raw
    return eq


def snapshot_sql(
    spark: SparkSession, sql: str, clock=None, txn_update=None
):
    """Execute one warehouse-SQL statement against a pysnapshot table.

    Returns what the underlying method returns: the new version (int)
    for MERGE / UPDATE / DELETE / RESTORE, the compaction facts dict
    for OPTIMIZE, the deleted-path list for VACUUM, a DataFrame for
    DESCRIBE HISTORY, and the summary dict for DESCRIBE DETAIL.
    ``txn_update`` ({app_id: batch_id}) rides MERGE commits atomically
    — the idempotent-writer hook the streaming SQL sink uses."""
    m = _MERGE.match(sql)
    if m:
        return _merge(spark, m, clock, txn_update=txn_update)
    m = _CTAS.match(sql)
    if m:
        return _ctas(spark, m, clock)
    m = _CREATE_TABLE.match(sql)
    if m:
        return _create_table(spark, m, clock)
    m = _SHOW_PROPS.match(sql)
    if m:
        from .sources.snapshots import load_manifest

        t = SnapshotTable(spark, m.group("root"), clock=clock)
        v = t.current_version()
        props = (
            load_manifest(t.root, v).get("properties") or {}
            if v > 0
            else {}
        )
        return spark.createDataFrame(
            sorted(props.items()) or [("", "")],
            "key string, value string",
        ).filter("key <> ''")
    m = _REPLACE_WHERE.match(sql)
    if m:
        t = SnapshotTable(spark, m.group("root"), clock=clock)
        src = _body_df(spark, m.group("body"))
        dts = dict(t.read().dtypes)
        cols = list(dts)
        if len(src.columns) != len(cols):
            raise ValueError(
                f"REPLACE WHERE arity mismatch: {len(src.columns)} "
                f"values for {len(cols)} columns"
            )
        aligned = src.select(
            *[
                _qcol(src.columns[i]).cast(dts[c]).alias(c)
                for i, c in enumerate(cols)
            ]
        )
        return t.replace_where(F.expr(m.group("where")), aligned)
    m = _INSERT_OVERWRITE.match(sql)
    if m:
        # full-table replace in ONE atomic commit: replace_where(true)
        # removes every live file and lands the new rows — readers of
        # older versions keep their snapshot (Spark's INSERT OVERWRITE
        # semantics on a lakehouse table)
        t = SnapshotTable(spark, m.group("root"), clock=clock)
        src = _body_df(spark, m.group("body"))
        target = t.read()
        cols = (
            [c.strip() for c in m.group("cols").split(",")]
            if m.group("cols")
            else list(target.columns)
        )
        if len(src.columns) != len(cols):
            raise ValueError(
                "INSERT OVERWRITE arity mismatch: "
                f"{len(src.columns)} values for {len(cols)} columns"
            )
        dts = dict(target.dtypes)
        missing = [c for c in cols if c not in dts]
        if missing:
            raise ValueError(
                f"INSERT OVERWRITE columns not in table: {missing}"
            )
        uncovered = [c for c in dts if c not in cols]
        if uncovered:
            # a partial overwrite is ill-defined without column
            # defaults — the cleared rows have no value source for the
            # uncovered columns
            raise ValueError(
                "INSERT OVERWRITE must cover every table column; "
                f"missing {uncovered}"
            )
        aligned = src.select(
            *[
                _qcol(src.columns[i]).cast(dts[c]).alias(c)
                for i, c in enumerate(cols)
            ]
        )
        return t.replace_where(F.expr("true"), aligned)
    m = _INSERT.match(sql)
    if m:
        return _insert(spark, m, clock)
    m = _ADD_COLUMN.match(sql)
    if m:
        return SnapshotTable(
            spark, m.group("root"), clock=clock
        ).add_column(m.group("name"), m.group("type").lower())
    m = _RENAME_COLUMN.match(sql)
    if m:
        return SnapshotTable(
            spark, m.group("root"), clock=clock
        ).rename_column(m.group("old"), m.group("new"))
    m = _ALTER_TYPE.match(sql)
    if m:
        return SnapshotTable(
            spark, m.group("root"), clock=clock
        ).widen_column(m.group("col"), m.group("type").lower())
    m = _TABLE_CHANGES.match(sql)
    if m:
        # Delta's table_changes(tbl, start[, end]): PER-COMMIT changes
        # of commits start..end — intermediate churn attributed to its
        # commit, not telescoped away; end defaults to the head
        t = SnapshotTable(spark, m.group("root"), clock=clock)
        start = int(m.group("from"))
        if start < 1:
            raise ValueError("table_changes: start version must be >= 1")
        end = (
            int(m.group("to"))
            if m.group("to")
            else t.current_version()
        )
        return t.read_change_feed(start - 1, end)
    m = _CREATE_BRANCH.match(sql)
    if m:
        SnapshotTable(
            spark, m.group("root"), clock=clock
        ).create_branch(
            m.group("name"),
            int(m.group("v")) if m.group("v") else None,
        )
        return 1
    m = _DROP_BRANCH.match(sql)
    if m:
        SnapshotTable(
            spark, m.group("root"), clock=clock
        ).drop_branch(m.group("name"))
        return 1
    m = _FAST_FORWARD.match(sql)
    if m:
        return SnapshotTable(
            spark, m.group("root"), clock=clock
        ).fast_forward(m.group("name"))
    m = _DROP_COLUMN.match(sql)
    if m:
        return SnapshotTable(
            spark, m.group("root"), clock=clock
        ).drop_column(m.group("name"))
    m = _TRUNCATE.match(sql)
    if m:
        return SnapshotTable(
            spark, m.group("root"), clock=clock
        ).truncate()
    m = _SET_DEFAULT.match(sql)
    if m:
        return SnapshotTable(
            spark, m.group("root"), clock=clock
        ).add_column_default(m.group("col"), m.group("expr").strip())
    m = _DROP_DEFAULT.match(sql)
    if m:
        return SnapshotTable(
            spark, m.group("root"), clock=clock
        ).drop_column_default(m.group("col"))
    m = _DROP_PARTITION.match(sql)
    if m:
        eq = {}
        for kv in _split_top(m.group("kvs")):
            mm = re.match(
                r"(\w+)\s*=\s*(?:'([^']*)'|(\S+))\s*$", kv.strip()
            )
            if not mm:
                raise ValueError(
                    f"DROP PARTITION takes key = literal terms; got "
                    f"{kv!r}"
                )
            k, s_lit, raw = mm.groups()
            eq[k] = s_lit if s_lit is not None else raw
        return SnapshotTable(
            spark, m.group("root"), clock=clock
        ).drop_partitions(eq)
    m = _SET_PROPS.match(sql)
    if m:
        return SnapshotTable(
            spark, m.group("root"), clock=clock
        ).set_tblproperties(_props_dict(m.group("props")))
    m = _UPDATE.match(sql)
    if m:
        t = SnapshotTable(spark, m.group("root"), clock=clock)
        pred = (
            F.expr(m.group("where"))
            if m.group("where")
            else F.lit(True)
        )
        return t.update_where(pred, _assignments(m.group("set")))
    m = _DELETE.match(sql)
    if m:
        t = SnapshotTable(spark, m.group("root"), clock=clock)
        pred = (
            F.expr(m.group("where"))
            if m.group("where")
            else F.lit(True)
        )
        return t.delete_where(pred)
    m = _ANN_BUILD.match(sql)
    if m:
        # CREATE ANN INDEX ON tbl (vec_col) WITH (dim = 64, ...) —
        # the one maintenance family that was method-only until r9;
        # the SQL path delegates verbatim, so SQL ≡ method
        # byte-identically (deterministic training)
        from .llm.ann_index import ann_index_build

        opts: dict = {}
        for kv in _split_top(m.group("opts")):
            mm = re.match(
                r"^(\w+)\s*=\s*(?:'([^']*)'|(\S+))$", kv.strip()
            )
            if not mm:
                raise ValueError(
                    f"CREATE ANN INDEX WITH option {kv.strip()!r}: "
                    "use key = value"
                )
            opts[mm.group(1).lower()] = (
                mm.group(2) if mm.group(2) is not None else mm.group(3)
            )
        if "dim" not in opts:
            raise ValueError(
                "CREATE ANN INDEX requires WITH (dim = <n>, ...)"
            )
        unknown = set(opts) - {
            "dim", "id_col", "n_lists", "m", "k_codes", "iters"
        }
        if unknown:
            raise ValueError(
                f"CREATE ANN INDEX: unknown option(s) {sorted(unknown)}"
            )
        return ann_index_build(
            SnapshotTable(spark, m.group("root"), clock=clock),
            dim=int(opts["dim"]),
            id_col=str(opts.get("id_col", "vec_id")),
            vec_col=m.group("vec"),
            n_lists=int(opts.get("n_lists", 16)),
            m=int(opts.get("m", 8)),
            k_codes=int(opts.get("k_codes", 16)),
            kmeans_iters=int(opts.get("iters", 2)),
        )
    m = _ANN_REFRESH.match(sql)
    if m:
        from .llm.ann_index import ann_index_refresh

        return ann_index_refresh(
            SnapshotTable(spark, m.group("root"), clock=clock)
        )
    m = _ANN_OPTIMIZE.match(sql)
    if m:
        from .llm.ann_index import ann_index_optimize

        return ann_index_optimize(
            SnapshotTable(spark, m.group("root"), clock=clock)
        )
    m = _REWRITE_PHYS.match(sql)
    if m:
        # one-time physical rebind: fold renames/drops/DVs/widening
        # into the files and clear the schema map — restores bucketed
        # readback (zero-Exchange joins) after a BUCKET-column rename
        return SnapshotTable(
            spark, m.group("root"), clock=clock
        ).rewrite_physical()
    m = _OPTIMIZE.match(sql)
    if m:
        t = SnapshotTable(spark, m.group("root"), clock=clock)
        z = (
            (m.group("za"), m.group("zb"))
            if m.group("za")
            else None
        )
        return t.optimize_small_files(
            OPTIMIZE_SMALL,
            OPTIMIZE_TARGET,
            z_cols=z,
            where_eq=_where_eq(m.group("where"))
            if m.group("where")
            else None,
        )
    m = _HISTORY.match(sql)
    if m:
        return SnapshotTable(
            spark, m.group("root"), clock=clock
        ).history()
    m = _DETAIL.match(sql)
    if m:
        return SnapshotTable(
            spark, m.group("root"), clock=clock
        ).detail()
    m = _RESTORE.match(sql)
    if m:
        t = SnapshotTable(spark, m.group("root"), clock=clock)
        if m.group("ts"):
            from datetime import datetime, timezone

            from .sources.snapshots import version_as_of

            target = version_as_of(
                t.root,
                datetime.fromisoformat(m.group("ts"))
                .replace(tzinfo=timezone.utc)
                .timestamp(),
            )
            return t.restore(target)
        return t.restore(int(m.group("v")))
    m = _VACUUM.match(sql)
    if m:
        t = SnapshotTable(spark, m.group("root"), clock=clock)
        if m.group("unit").upper() == "HOURS":
            # Delta's RETAIN n HOURS: time-based retention (banked
            # commit timestamps); the version floor stays at 1 so the
            # time axis alone decides what survives
            return t.vacuum(
                retain_versions=1,
                retain_seconds=int(m.group("n")) * 3600,
                dry_run=bool(m.group("dry")),
            )
        return t.vacuum(
            retain_versions=int(m.group("n")),
            dry_run=bool(m.group("dry")),
        )
    m = _REORG.match(sql)
    if m:
        return SnapshotTable(
            spark, m.group("root"), clock=clock
        ).materialize_deletes()
    m = _ADD_CONSTRAINT.match(sql)
    if m:
        return SnapshotTable(
            spark, m.group("root"), clock=clock
        ).add_constraint(m.group("name"), m.group("expr").strip())
    m = _DROP_CONSTRAINT.match(sql)
    if m:
        return SnapshotTable(
            spark, m.group("root"), clock=clock
        ).drop_constraint(m.group("name"))
    m = _COPY_INTO.match(sql)
    if m:
        srcs = [
            s.strip().strip("'")
            for s in _split_top(m.group("srcs"))
        ]
        if m.group("pat"):
            # COPY INTO ... PATTERN: each source is a directory; the
            # glob expands DRIVER-SIDE at statement time so the
            # idempotence ledger keys on concrete file paths (a
            # re-run after new landings ingests only the new files)
            import glob as _glob
            import os as _os

            srcs = sorted(
                p
                for d in srcs
                for p in _glob.glob(
                    _os.path.join(d, "**", m.group("pat")),
                    recursive=True,
                )
            )
        return SnapshotTable(
            spark, m.group("root"), clock=clock
        ).copy_into(srcs, fmt=(m.group("fmt") or "parquet").lower())
    m = _CREATE_TAG.match(sql)
    if m:
        v = m.group("v")
        return SnapshotTable(
            spark, m.group("root"), clock=clock
        ).create_tag(m.group("name"), int(v) if v else None)
    m = _ANALYZE.match(sql)
    if m:
        cols = [c.strip() for c in m.group("cols").split(",")]
        t = SnapshotTable(spark, m.group("root"), clock=clock)
        if m.group("hist"):
            return t.analyze_histograms(
                cols,
                n_bins=int(m.group("bins")) if m.group("bins") else 32,
            )
        return t.analyze_columns(cols)
    m = _SHOW_PARTS.match(sql)
    if m:
        return SnapshotTable(
            spark, m.group("root"), clock=clock
        ).partitions()
    m = _CONVERT.match(sql)
    if m:
        cols = (
            [c.strip() for c in m.group("cols").split(",")]
            if m.group("cols")
            else None
        )
        return SnapshotTable.convert_parquet_dir(
            spark, m.group("path"), stats_cols=cols, clock=clock
        ).current_version()
    m = _SHOW_CREATE.match(sql)
    if m:
        return spark.createDataFrame(
            [
                (
                    SnapshotTable(
                        spark, m.group("root"), clock=clock
                    ).create_table_ddl(),
                )
            ],
            "createtab_stmt string",
        )
    m = _EXPLAIN.match(sql)
    if m:
        inner = _SELECT.match(m.group("stmt"))
        if inner:
            return _explain(spark, inner, clock)
        if re.search(r"pysnapshot\s*\.", m.group("stmt"), re.I):
            # general EXPLAIN (round 10): any SELECT the read surface
            # accepts explains through Catalyst — refs rewrite to
            # connector views, the formatted plan comes back as a row
            # (planning only; no job runs)
            df = _select_general(spark, m.group("stmt"))
            mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(  # noqa: E501
                "formatted"
            )
            plan = df._jdf.queryExecution().explainString(mode)
            return spark.createDataFrame([(plan,)], "plan string")
        raise ValueError(
            "EXPLAIN supports SELECT * FROM '<root>' [VERSION AS "
            "OF n | TIMESTAMP AS OF 'ts' | TAG 'name'] [WHERE ...], "
            "or any SELECT/WITH statement over pysnapshot refs"
        )
    m = _SELECT.match(sql)
    if m:
        t = SnapshotTable(spark, m.group("root"), clock=clock)
        if m.group("branch"):
            # the READ side of write-audit-publish: audit a staged
            # branch's state in SQL before fast-forwarding it to main
            df = t.branch(m.group("branch")).read()
            if m.group("where"):
                df = df.filter(F.expr(m.group("where")))
            return df
        as_of_ts = None
        if m.group("ts"):
            from datetime import datetime, timezone

            as_of_ts = (
                datetime.fromisoformat(m.group("ts"))
                .replace(tzinfo=timezone.utc)
                .timestamp()
            )
        df = t.read(
            version=int(m.group("v")) if m.group("v") else None,
            as_of_ts=as_of_ts,
            tag=m.group("tag"),
        )
        if m.group("where"):
            df = df.filter(F.expr(m.group("where")))
        return df
    if re.match(r"^\s*(\(\s*)*(SELECT|WITH)\b", sql, re.I) and re.search(
        r"pysnapshot\s*\.", sql, re.I
    ):
        # parenthesized operands cover top-level set operations:
        # (SELECT ... FROM ref) UNION/EXCEPT/INTERSECT (SELECT ...)
        return _select_general(spark, sql)
    raise ValueError(
        "unrecognized statement (supported: CREATE TABLE ... "
        "[PARTITIONED BY] [TBLPROPERTIES] [AS SELECT], INSERT INTO "
        "... VALUES/SELECT, INSERT OVERWRITE [TABLE] ... "
        "VALUES/SELECT, MERGE INTO, UPDATE, DELETE FROM, OPTIMIZE "
        "[WHERE] [ZORDER BY], DESCRIBE HISTORY, DESCRIBE DETAIL, "
        "RESTORE ... TO VERSION AS OF, VACUUM ... RETAIN n VERSIONS, "
        "REORG TABLE ... APPLY (PURGE), ALTER TABLE ... ADD/DROP "
        "CONSTRAINT / ADD COLUMN / RENAME COLUMN / ALTER COLUMN TYPE "
        "/ SET TBLPROPERTIES / CREATE TAG, COPY INTO ... FROM, "
        "SHOW CREATE TABLE, EXPLAIN SELECT, CONVERT TO SNAPSHOT "
        "parquet.`dir`, TRUNCATE TABLE, DROP COLUMN, SET/DROP "
        "DEFAULT, INSERT INTO ... REPLACE WHERE, "
        "SELECT * FROM ... [VERSION AS OF n | TIMESTAMP AS OF 'ts' | "
        "TAG 'name'] [WHERE ...], CREATE ANN INDEX ON tbl (col) WITH "
        "(dim = n, ...), REFRESH ANN INDEX ON tbl, OPTIMIZE ANN "
        "INDEX ON tbl): " + sql[:120]
    )


# --------------- general SELECT over snapshot tables (Q7, round 9) -----
#: quoted operands also match their masked form (\x00N\x00): the
#: rewrite runs over literal-MASKED text, so ``TIMESTAMP AS OF '...'``
#: arrives as a placeholder and unmasks inside ``_view``
_SNAP_REF = re.compile(
    r"pysnapshot\s*\.\s*`(?P<root>[^`]+)`"
    r"(?:\s+(?:VERSION\s+AS\s+OF\s+(?P<v>\d+)"
    r"|TIMESTAMP\s+AS\s+OF\s+(?P<ts>'[^']+'|\x00\d+\x00)"
    r"|TAG\s+(?P<tag>'[^']+'|\x00\d+\x00)"
    r"|BRANCH\s+(?P<branch>'[^']+'|\x00\d+\x00)))?",
    re.I,
)


# broadcast-threshold parsing + manifest-byte ref sizing moved to
# sources.pyds (broadcast_threshold_bytes / ref_file_bytes) so the
# DataFrame-API helper read_snapshot and this SQL surface share ONE
# sizing path (VERDICT-r10 directive #5).


def _rewrite_snapshot_refs(spark: SparkSession, sql: str) -> str:
    """Swap every ``pysnapshot.`root``` reference (optionally suffixed
    ``VERSION AS OF n`` / ``TIMESTAMP AS OF 'ts'`` / ``TAG 'name'`` /
    ``BRANCH 'name'``) for a temp view reading through the CONNECTOR
    (``format("pysnapshot")``) and return the rewritten statement text.
    Shared by the read surface (_select_general) and the verbs whose
    BODIES read snapshot tables — INSERT ... SELECT, CTAS, REPLACE
    WHERE, MERGE ... USING (VERDICT-r9 directive #2). View names are
    content-addressed on (root, ref) so repeated references share one
    view and re-runs are idempotent. String literals are masked before
    the rewrite — a quoted 'pysnapshot.`x`' is data, not a table
    reference."""
    import hashlib

    from .sources.pyds import read_snapshot, register_snapshot_source

    register_snapshot_source(spark)
    lits: list[str] = []

    def _mask(m: "re.Match[str]") -> str:
        lits.append(m.group(0))
        return f"\x00{len(lits) - 1}\x00"

    # one alternation so mixed quoting nests correctly left-to-right:
    # Spark parses double-quoted text as a STRING literal by default
    # (spark.sql.ansi.doubleQuotedIdentifiers off), so "pysnapshot.`x`"
    # is data on either quote style (VERDICT-r10 directive #7)
    masked = re.sub(r"'[^']*'|\"[^\"]*\"", _mask, sql)

    def _unmask(s: str) -> str:
        return re.sub(
            r"\x00(\d+)\x00", lambda m: lits[int(m.group(1))], s
        )

    def _view(m: "re.Match[str]") -> str:
        groups = {
            g: _unmask(m.group(g) or "").strip("'")
            for g in ("root", "v", "ts", "tag", "branch")
        }
        key = "|".join(groups[g] for g in sorted(groups))
        name = "__pysnap_" + hashlib.sha1(key.encode()).hexdigest()[:12]
        if groups["ts"]:
            # the connector takes epoch seconds; the SQL form is ISO
            # text (UTC, matching the RESTORE/_SELECT verbs)
            from datetime import datetime, timezone

            groups["ts"] = str(
                datetime.fromisoformat(groups["ts"])
                .replace(tzinfo=timezone.utc)
                .timestamp()
            )
        # read_snapshot carries the manifest-sized broadcast hint
        # (the table statistic Catalyst can't get from a Python
        # DataSource), so SQL-surface users get broadcast star joins
        # without knowing the advisor exists — and DataFrame-API users
        # of read_snapshot get the identical plan (r10 directive #5).
        df = read_snapshot(
            spark,
            groups["root"],
            version=groups["v"] or None,
            timestamp_as_of=groups["ts"] or None,
            tag=groups["tag"] or None,
            branch=groups["branch"] or None,
        )
        df.createOrReplaceTempView(name)
        return name

    return _unmask(_SNAP_REF.sub(_view, masked))


def _body_df(spark: SparkSession, body: str):
    """Run a verb's SELECT/VALUES body, rewriting any ``pysnapshot.``
    table references through the connector first (the no-ref fast path
    skips the masking pass entirely)."""
    if re.search(r"pysnapshot\s*\.", body, re.I):
        body = _rewrite_snapshot_refs(spark, body)
    return spark.sql(body)


def _select_general(spark: SparkSession, sql: str):
    """ARBITRARY SELECT / WITH statements over snapshot tables — the
    read-complete warehouse surface (VERDICT-r8 directive #7): refs are
    swapped for connector-backed temp views, then the whole statement
    runs through Spark SQL — full projections, joins, aggregates,
    windows, CTEs, with Catalyst pushing filters/columns into the
    connector scan (planning-time partition/zone/bloom pruning
    included)."""
    return spark.sql(_rewrite_snapshot_refs(spark, sql))
