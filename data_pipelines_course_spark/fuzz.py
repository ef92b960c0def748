"""Seeded randomized differential query generator (VERDICT r7 #3).

SURVEY §5.1 lists "randomized query gen: NOT present" in the reference —
its nearest analog is the Hypothesis strategy-refinement style of
`Chapter 7 - Testing with Hypothesis.ipynb:35-310`, applied to one scalar
function. This module extends that idea from a scalar to the QUERY
surface: a small grammar over lineitem/orders/customer emits, from one
seeded AST, BOTH a DataFrame-API plan and the equivalent ANSI SQL, and
tests/test_fuzz_parity.py compares the two engines with the suite's
driver-style comparator (row count + schema + normalized values) for a
committed corpus of seeds.

Grammar (deliberately inside known-portable territory, with the F10/F13
shims where engine semantics genuinely diverge):

    query  := agg | projection
    source := lineitem | orders | customer
            | lineitem⋈orders | orders⋈customer | lineitem⋈orders⋈customer
    pred   := num-cmp | cat-eq | cat-in | date-cmp | weekday-eq (F10 shim)
            | substring-contains (F8)
    agg    := GROUP BY 0-2 keys, 1-3 of {count(*), sum, avg, min, max}
              [HAVING count(*) >= k]
    proj   := 1-4 of {raw col, disc_price/charge exprs, year/month,
              weekday (F10), upper, length} [DISTINCT]
              [ORDER BY all cols LIMIT k — only when every output column
               is discrete, so the cut is deterministic]

Portability rules encoded here (each learned from a real divergence,
see functions/scalar.py and VERDICT r2-r5):
  * constants render via repr() → both engines parse the identical
    double; float equality predicates are never generated.
  * integer-typed sums are cast to double on BOTH sides (DuckDB returns
    HUGEINT, which pandas would widen lossily).
  * weekday uses Monday=0 semantics: Spark `weekday()`, DuckDB
    `isodow()-1` (F10).
  * ORDER BY in the SQL side always states NULLS FIRST (Spark's ASC
    default; DuckDB defaults NULLS LAST).
  * float-valued columns never appear in ordered-LIMIT queries — a
    last-bit difference at the cut boundary would be a false positive.

Grammar v2 (generate_v2, separate frozen digest) adds the null-semantics
territory v1 deliberately avoided: LEFT OUTER joins with count(col) vs
count(*), COALESCE, CASE WHEN buckets, and IS NULL anti-join shapes —
see the v2 section below for the null-portability rules.
"""

from __future__ import annotations

import random
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .datasets import load
from .functions.scalar import weekday_py

# --------------------------------------------------------------------------
# Column metadata (sf-independent: domains are the generator's constants
# pool, not assertions about the data — a predicate matching 0 rows is a
# valid query).
# --------------------------------------------------------------------------

NUMERIC = {
    "lineitem": {
        # col -> (lo, hi, decimals, integer-typed)
        "l_quantity": (1, 50, 0, False),
        "l_extendedprice": (5000, 100000, 2, False),
        "l_discount": (0.01, 0.09, 2, False),
        "l_tax": (0.01, 0.07, 2, False),
        "l_linenumber": (1, 7, 0, True),
        "l_suppkey": (1, 100, 0, True),
    },
    "orders": {
        "o_totalprice": (5000, 450000, 2, False),
        "o_custkey": (1, 1500, 0, True),
    },
    "customer": {
        "c_acctbal": (-500, 9000, 2, False),
        "c_nationkey": (0, 24, 0, True),
    },
}

CATEGORICAL = {
    "lineitem": {
        "l_returnflag": ["A", "N", "R"],
        "l_linestatus": ["F", "O"],
    },
    "orders": {
        "o_orderstatus": ["F", "O", "P"],
        "o_orderpriority": ["1-URGENT", "2-HIGH", "3-MEDIUM",
                            "4-NOT SPECIFIED", "5-LOW"],
    },
    "customer": {
        "c_mktsegment": ["AUTOMOBILE", "BUILDING", "FURNITURE",
                         "HOUSEHOLD", "MACHINERY"],
    },
}

DATES = {"lineitem": ["l_shipdate"], "orders": ["o_orderdate"]}

CONTAINS = {  # col -> needle pool (no LIKE wildcards in needles)
    "orders": {"o_orderpriority": ["URGENT", "HIGH", "MED", "LOW", "SPEC"]},
    "customer": {"c_mktsegment": ["BUIL", "AUTO", "HOLD", "MACH"]},
}

SOURCES: list[tuple[str, tuple[str, ...], str]] = [
    # (key, tables, SQL FROM clause) — Spark side joins in _source_df.
    ("lineitem", ("lineitem",), "lineitem"),
    ("orders", ("orders",), "orders"),
    ("customer", ("customer",), "customer"),
    ("li_o", ("lineitem", "orders"),
     "lineitem JOIN orders ON l_orderkey = o_orderkey"),
    ("o_c", ("orders", "customer"),
     "orders JOIN customer ON o_custkey = c_custkey"),
    ("li_o_c", ("lineitem", "orders", "customer"),
     "lineitem JOIN orders ON l_orderkey = o_orderkey "
     "JOIN customer ON o_custkey = c_custkey"),
]
SOURCE_WEIGHTS = [6, 4, 3, 3, 2, 2]


def _source_df(spark: SparkSession, sf_dir: str,
               tables: tuple[str, ...]) -> DataFrame:
    df = load(spark, sf_dir, tables[0])
    if "orders" in tables[1:]:
        df = df.join(load(spark, sf_dir, "orders"),
                     F.col("l_orderkey") == F.col("o_orderkey"))
    if "customer" in tables[1:]:
        df = df.join(load(spark, sf_dir, "customer"),
                     F.col("o_custkey") == F.col("c_custkey"))
    return df


# --------------------------------------------------------------------------
# Dual-rendered expression: a late-bound Spark Column + SQL text.
# --------------------------------------------------------------------------

@dataclass(frozen=True)
class Expr:
    make: Callable[[], "F.Column"]
    sql: str
    name: str
    discrete: bool  # safe as a sort/limit key (no float representation)

    def col(self):
        return self.make().alias(self.name)


def _raw(c: str, discrete: bool) -> Expr:
    return Expr(lambda: F.col(c), c, c, discrete)


def _derived_pool(tables: tuple[str, ...]) -> list[Expr]:
    out: list[Expr] = []
    if "lineitem" in tables:
        out += [
            Expr(lambda: F.col("l_extendedprice") * (1 - F.col("l_discount")),
                 "l_extendedprice * (1 - l_discount)", "disc_price", False),
            Expr(lambda: F.col("l_extendedprice") * (1 - F.col("l_discount"))
                 * (1 + F.col("l_tax")),
                 "l_extendedprice * (1 - l_discount) * (1 + l_tax)",
                 "charge", False),
            Expr(lambda: F.year("l_shipdate"),
                 "year(l_shipdate)", "ship_year", True),
        ]
    if "orders" in tables:
        out += [
            Expr(lambda: F.year("o_orderdate"),
                 "year(o_orderdate)", "o_year", True),
            Expr(lambda: F.month("o_orderdate"),
                 "month(o_orderdate)", "o_month", True),
            Expr(lambda: weekday_py("o_orderdate"),
                 "isodow(o_orderdate) - 1", "o_weekday", True),
        ]
    if "customer" in tables:
        out += [
            Expr(lambda: F.upper("c_mktsegment"),
                 "upper(c_mktsegment)", "segment_uc", True),
            Expr(lambda: F.length("c_name"),
                 "length(c_name)", "name_len", True),
        ]
    return out


# --------------------------------------------------------------------------
# Predicates.
# --------------------------------------------------------------------------

@dataclass(frozen=True)
class Pred:
    make: Callable[[], "F.Column"]
    sql: str


def _gen_pred(rng: random.Random, tables: tuple[str, ...]) -> Pred:
    kinds = ["num", "cat", "date", "weekday", "contains"]
    while True:
        kind = rng.choice(kinds)
        if kind == "num":
            pools = [(t, c) for t in tables for c in NUMERIC.get(t, {})]
            t, c = rng.choice(pools)
            lo, hi, dec, _ = NUMERIC[t][c]
            v = round(rng.uniform(lo, hi), dec)
            v = int(v) if dec == 0 else v
            op = rng.choice(["<", "<=", ">", ">="])
            sql = f"{c} {op} {v!r}"
            return Pred(lambda c=c, op=op, v=v: {
                "<": F.col(c) < v, "<=": F.col(c) <= v,
                ">": F.col(c) > v, ">=": F.col(c) >= v}[op], sql)
        if kind == "cat":
            pools = [(t, c) for t in tables for c in CATEGORICAL.get(t, {})]
            if not pools:
                continue
            t, c = rng.choice(pools)
            dom = CATEGORICAL[t][c]
            if rng.random() < 0.5:
                v = rng.choice(dom)
                return Pred(lambda c=c, v=v: F.col(c) == v, f"{c} = '{v}'")
            vs = rng.sample(dom, k=min(len(dom), rng.randint(2, 3)))
            inlist = ", ".join(f"'{v}'" for v in vs)
            return Pred(lambda c=c, vs=vs: F.col(c).isin(vs),
                        f"{c} IN ({inlist})")
        if kind == "date":
            pools = [c for t in tables for c in DATES.get(t, [])]
            if not pools:
                continue
            c = rng.choice(pools)
            y, m, d = rng.randint(1995, 2001), rng.randint(1, 12), \
                rng.randint(1, 28)
            lit = f"{y:04d}-{m:02d}-{d:02d}"
            op = rng.choice([">=", "<"])
            return Pred(
                lambda c=c, op=op, lit=lit:
                (F.col(c) >= F.lit(lit).cast("timestamp")) if op == ">="
                else (F.col(c) < F.lit(lit).cast("timestamp")),
                f"{c} {op} TIMESTAMP '{lit}'")
        if kind == "weekday":
            pools = [c for t in tables for c in DATES.get(t, [])]
            if not pools:
                continue
            c = rng.choice(pools)
            k = rng.randint(0, 6)
            return Pred(lambda c=c, k=k: weekday_py(c) == k,
                        f"isodow({c}) - 1 = {k}")
        if kind == "contains":
            pools = [(c, n) for t in tables
                     for c, ns in CONTAINS.get(t, {}).items() for n in ns]
            if not pools:
                continue
            c, needle = rng.choice(pools)
            return Pred(lambda c=c, s=needle: F.col(c).contains(s),
                        f"{c} LIKE '%{needle}%'")


# --------------------------------------------------------------------------
# The generated query.
# --------------------------------------------------------------------------

@dataclass
class FuzzQuery:
    seed: int
    tables: tuple[str, ...]
    from_sql: str
    preds: list[Pred]
    group_keys: list[Expr] = field(default_factory=list)
    aggs: list[tuple[str, Expr | None, str, bool]] = field(
        default_factory=list)  # (fn, operand, out_name, cast_double)
    projs: list[Expr] = field(default_factory=list)
    distinct: bool = False
    having_min: int | None = None
    limit: int | None = None
    left_join: bool = False  # v2: tables is a (left, right) LEFT JOIN pair

    # -- Spark side (DataFrame API, not spark.sql) --------------------
    def df(self, spark: SparkSession, sf_dir: str) -> DataFrame:
        if self.left_join:
            out = _left_source_df(spark, sf_dir, self.tables)
        else:
            out = _source_df(spark, sf_dir, self.tables)
        for p in self.preds:
            out = out.filter(p.make())
        if self.aggs:
            aggcols = []
            for fn, operand, name, cast_double in self.aggs:
                if fn == "count":
                    c = F.count(F.lit(1))
                elif fn == "count_col":
                    c = F.count(operand.make())
                else:
                    c = getattr(F, fn)(operand.make())
                    if cast_double:
                        c = c.cast("double")
                aggcols.append(c.alias(name))
            if self.having_min is not None:
                aggcols.append(F.count(F.lit(1)).alias("__cnt"))
            if self.group_keys:
                out = out.groupBy(*[k.col() for k in self.group_keys])
            else:
                out = out.groupBy()
            out = out.agg(*aggcols)
            if self.having_min is not None:
                out = out.filter(F.col("__cnt") >= self.having_min)
                out = out.drop("__cnt")
        else:
            out = out.select(*[p.col() for p in self.projs])
            if self.distinct:
                out = out.distinct()
            if self.limit is not None:
                out = out.orderBy(*[F.col(p.name).asc() for p in self.projs])
                out = out.limit(self.limit)
        return out

    # -- DuckDB side (ANSI SQL) ----------------------------------------
    def sql(self) -> str:
        where = (" WHERE " + " AND ".join(p.sql for p in self.preds)
                 if self.preds else "")
        if self.aggs:
            sel = [f"{k.sql} AS {k.name}" for k in self.group_keys]
            for fn, operand, name, cast_double in self.aggs:
                if fn == "count":
                    expr = "count(*)"
                elif fn == "count_col":
                    expr = f"count({operand.sql})"
                else:
                    expr = f"{fn}({operand.sql})"
                if cast_double:
                    expr = f"CAST({expr} AS DOUBLE)"
                sel.append(f"{expr} AS {name}")
            sql = (f"SELECT {', '.join(sel)} FROM {self.from_sql}{where}")
            if self.group_keys:
                sql += " GROUP BY " + ", ".join(k.sql for k in
                                                self.group_keys)
            if self.having_min is not None:
                sql += f" HAVING count(*) >= {self.having_min}"
            return sql
        sel = ", ".join(f"{p.sql} AS {p.name}" for p in self.projs)
        head = "SELECT DISTINCT" if self.distinct else "SELECT"
        sql = f"{head} {sel} FROM {self.from_sql}{where}"
        if self.limit is not None:
            order = ", ".join(f"{p.name} ASC NULLS FIRST"
                              for p in self.projs)
            sql += f" ORDER BY {order} LIMIT {self.limit}"
        return sql


# --------------------------------------------------------------------------
# Grammar v2 — null-semantics territory (LEFT OUTER joins). v1's digest
# stays frozen; v2 seeds carry their own corpus digest in the test.
#
# Null portability rules (why the pools below are narrower than v1's):
#   * nullable columns are DOUBLE-only in projections and aggregates —
#     both engines surface SQL NULL as pandas NaN there and the
#     comparator's both_nan path is exact. A nullable DATE would render
#     NaT-vs-None and a nullable INT widens to float on one engine but
#     object on the other: representation noise, not semantics.
#   * count(col) vs count(*) is THE left-join discriminator (NULL rows
#     counted by * only) — both return integers, portable.
#   * group keys come from the preserved (left) side only, so keys are
#     never null-extended.
#   * right-side WHERE predicates are allowed: both engines apply WHERE
#     after the join, identically collapsing it to inner semantics.
# --------------------------------------------------------------------------

LEFT_SOURCES: list[tuple[str, tuple[str, str], str]] = [
    # (key, (left, right), SQL FROM) — left rows always preserved.
    ("c_lo", ("customer", "orders"),
     "customer LEFT JOIN orders ON c_custkey = o_custkey"),
    ("o_lli", ("orders", "lineitem"),
     "orders LEFT JOIN lineitem ON o_orderkey = l_orderkey"),
]

# Right-side nullable DOUBLE columns usable in v2 projections/aggs.
NULLABLE_DOUBLES = {
    "orders": ["o_totalprice"],
    "lineitem": ["l_extendedprice", "l_discount", "l_quantity", "l_tax"],
}
# Right-side key whose IS NULL encodes the anti-join shape.
RIGHT_KEY = {"orders": "o_orderkey", "lineitem": "l_orderkey"}


def _left_source_df(spark: SparkSession, sf_dir: str,
                    pair: tuple[str, str]) -> DataFrame:
    left, right = pair
    lf, rf = load(spark, sf_dir, left), load(spark, sf_dir, right)
    if pair == ("customer", "orders"):
        cond = F.col("c_custkey") == F.col("o_custkey")
    else:
        cond = F.col("o_orderkey") == F.col("l_orderkey")
    return lf.join(rf, cond, "left")


def _case_bucket(rng: random.Random, tables: tuple[str, ...]) -> Expr | None:
    """CASE WHEN x < a THEN 'lo' WHEN x < b THEN 'mid' ELSE 'hi' END over
    a NON-NULL numeric column (F16's portable shape)."""
    pools = [(t, c) for t in tables for c, (lo, hi, dec, _)
             in NUMERIC.get(t, {}).items() if dec == 2]
    if not pools:
        return None
    t, c = rng.choice(pools)
    lo, hi, dec, _ = NUMERIC[t][c]
    a = round(rng.uniform(lo, (lo + hi) / 2), 2)
    b = round(rng.uniform(a, hi), 2)
    sql = (f"CASE WHEN {c} < {a!r} THEN 'lo' "
           f"WHEN {c} < {b!r} THEN 'mid' ELSE 'hi' END")
    return Expr(
        lambda c=c, a=a, b=b: F.when(F.col(c) < a, "lo")
        .when(F.col(c) < b, "mid").otherwise("hi"),
        sql, f"{c}_bucket", True)


def generate_v2(seed: int) -> FuzzQuery:
    """Left-join / null-semantics corpus. Deterministic per seed; the
    seed spaces of v1 and v2 are independent (different grammar code)."""
    rng = random.Random(("v2", seed).__repr__())
    key, pair, from_sql = rng.choice(LEFT_SOURCES)
    left, right = pair
    q = FuzzQuery(seed=seed, tables=pair, from_sql=from_sql, preds=[],
                  left_join=True)

    # Predicates: left-side always safe; right-side collapses to inner
    # (identically on both engines); IS NULL keeps only unmatched rows.
    n_preds = rng.randint(0, 2)
    for _ in range(n_preds):
        roll = rng.random()
        if roll < 0.25:
            rk = RIGHT_KEY[right]
            q.preds.append(Pred(lambda rk=rk: F.col(rk).isNull(),
                                f"{rk} IS NULL"))
        elif roll < 0.55:
            q.preds.append(_gen_pred(rng, (right,)))
        else:
            q.preds.append(_gen_pred(rng, (left,)))

    nullable = [
        Expr((lambda c: (lambda: F.col(c)))(c), c, c, False)
        for c in NULLABLE_DOUBLES[right]
    ]
    coalesced = [
        Expr((lambda c: (lambda: F.coalesce(F.col(c), F.lit(0.0))))(c),
             f"COALESCE({c}, 0.0)", f"{c}_filled", False)
        for c in NULLABLE_DOUBLES[right]
    ]
    left_keys = [_raw(c, True) for c in CATEGORICAL.get(left, {})] + [
        _raw(c, True) for c, (_, _, _, is_int)
        in NUMERIC.get(left, {}).items() if is_int
    ]

    if rng.random() < 0.65:
        # Aggregate: the count(col)-vs-count(*) discriminator plus
        # null-skipping aggregates over the nullable side.
        q.group_keys = rng.sample(left_keys,
                                  k=rng.randint(0, min(2, len(left_keys))))
        q.aggs.append(("count", None, "cnt", False))
        operand = rng.choice(nullable)
        # count(col): nulls excluded — rendered via Spark F.count(col).
        q.aggs.append(("count_col", operand, f"cnt_{operand.name}", False))
        fn = rng.choice(["sum", "avg", "min", "max"])
        q.aggs.append((fn, operand, f"{fn}_{operand.name}", False))
        if q.group_keys and rng.random() < 0.3:
            q.having_min = rng.randint(2, 8)
    else:
        # Projection: left keys + nullable/coalesced doubles (+ CASE).
        picks: list[Expr] = [rng.choice(left_keys)]
        picks.append(rng.choice(nullable + coalesced))
        case = _case_bucket(rng, (left,))
        if case is not None and rng.random() < 0.5:
            picks.append(case)
        q.projs = picks
        if rng.random() < 0.3:
            q.distinct = True
    return q


def generate(seed: int) -> FuzzQuery:
    """Deterministic query for a seed — the corpus IS (this grammar,
    the seed list in tests/test_fuzz_parity.py)."""
    rng = random.Random(seed)
    key, tables, from_sql = rng.choices(SOURCES, SOURCE_WEIGHTS)[0]
    q = FuzzQuery(seed=seed, tables=tables, from_sql=from_sql,
                  preds=[_gen_pred(rng, tables)
                         for _ in range(rng.randint(0, 2))])

    numeric_exprs = [
        _raw(c, dec == 0 or is_int)
        for t in tables for c, (_, _, dec, is_int) in NUMERIC[t].items()
    ]
    cat_exprs = [_raw(c, True) for t in tables
                 for c in CATEGORICAL.get(t, {})]
    derived = _derived_pool(tables)

    if rng.random() < 0.55:
        # Aggregate query.
        key_pool = cat_exprs + [e for e in derived if e.discrete] + [
            _raw(c, True) for t in tables
            for c, (_, _, dec, is_int) in NUMERIC[t].items() if is_int
        ]
        n_keys = rng.randint(0, min(2, len(key_pool)))
        q.group_keys = rng.sample(key_pool, k=n_keys)
        agg_pool = numeric_exprs + [e for e in derived if not e.discrete]
        used = set()
        for _ in range(rng.randint(1, 3)):
            fn = rng.choice(["count", "sum", "avg", "min", "max"])
            if fn == "count":
                name = "cnt"
                operand = None
            else:
                operand = rng.choice(agg_pool)
                name = f"{fn}_{operand.name}"
            if name in used:
                continue
            used.add(name)
            is_int_operand = operand is not None and operand.discrete \
                and operand.sql == operand.name  # raw integer column
            cast_double = fn == "sum" and is_int_operand
            q.aggs.append((fn, operand, name, cast_double))
        if q.group_keys and rng.random() < 0.3:
            q.having_min = rng.randint(2, 12)
    else:
        # Projection query.
        proj_pool = numeric_exprs + cat_exprs + derived + [
            _raw(c, True) for t in tables for c in DATES.get(t, [])
        ]
        n = rng.randint(1, min(4, len(proj_pool)))
        picked, names = [], set()
        for e in rng.sample(proj_pool, k=len(proj_pool)):
            if e.name not in names:
                picked.append(e)
                names.add(e.name)
            if len(picked) == n:
                break
        q.projs = picked
        if rng.random() < 0.4:
            q.distinct = True
        if all(p.discrete for p in q.projs) and rng.random() < 0.5:
            q.limit = rng.choice([5, 20, 100])
    return q
