"""Local stand-in for the driver's correctness gate: run every
``queries()`` entry and its ``oracle_sql()`` twin side-by-side, compare
row count + column names + order-insensitive values.

Usage: ``python -m tests.oracle_check [sf_dir] [query ...]``
(default sf0.01, all queries; trailing names restrict the run).
"""

from __future__ import annotations

import math
import sys
import time

import duckdb

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def _normalize(rows, columns):
    """Sort columns by name, render values canonically, sort rows."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])

    def render(v):
        if v is None:
            return "\0NULL"
        if isinstance(v, float):
            if math.isnan(v):
                return "\0NaN"
            if v == int(v) and abs(v) < 1e15:
                return str(int(v))  # 5.0 ≡ 5 across engines
            return repr(v)
        if isinstance(v, bool):
            return str(int(v))
        return str(v)

    out = [tuple(render(row[i]) for i in order) for row in rows]
    out.sort()
    return [columns[i] for i in order], out


def compare(name, spark_df, sql, con, verbose=True):
    t0 = time.time()
    s_rows = [tuple(r) for r in spark_df.collect()]
    s_cols = list(spark_df.columns)
    t_spark = time.time() - t0

    t0 = time.time()
    rel = con.sql(sql)
    o_rows = [tuple(r) for r in rel.fetchall()]
    o_cols = list(rel.columns)
    t_oracle = time.time() - t0

    problems = []
    if len(s_rows) != len(o_rows):
        problems.append(f"rowcount spark={len(s_rows)} oracle={len(o_rows)}")
    if sorted(s_cols) != sorted(o_cols):
        problems.append(f"columns spark={sorted(s_cols)} oracle={sorted(o_cols)}")
    # type alignment: integral columns must be 64-bit on BOTH sides so a
    # typed (Arrow) value hash can't diverge on width
    type_map = {
        "BIGINT": "bigint",
        "INTEGER": "int",
        "SMALLINT": "smallint",
        "DOUBLE": "double",
        "FLOAT": "float",
        "VARCHAR": "string",
        "BOOLEAN": "boolean",
    }
    s_types = dict(spark_df.dtypes)
    o_types = dict(zip(rel.columns, [str(t) for t in rel.types]))
    for c in s_types:
        if c in o_types:
            ot = type_map.get(o_types[c].split("(")[0], o_types[c].lower())
            if s_types[c] != ot:
                problems.append(
                    f"type skew {c}: spark={s_types[c]} oracle={o_types[c]}"
                )
    if not problems:
        sc, sv = _normalize(s_rows, s_cols)
        oc, ov = _normalize(o_rows, o_cols)
        if sv != ov:
            n_bad = sum(1 for a, b in zip(sv, ov) if a != b)
            problems.append(f"values mismatch ({n_bad}/{len(sv)} rows differ)")
            for a, b in list(zip(sv, ov))[:2000]:
                if a != b:
                    problems.append(f"  spark : {dict(zip(sc, a))}")
                    problems.append(f"  oracle: {dict(zip(oc, b))}")
                    break
    status = "PASS" if not problems else "FAIL"
    if verbose:
        print(
            f"[{status}] {name:32s} rows={len(s_rows):7d} "
            f"spark={t_spark:5.1f}s oracle={t_oracle:5.2f}s"
        )
        for p in problems:
            print(f"       {p}")
    return not problems


def main(sf_dir: str, only: list[str] | None = None) -> int:
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entrymod
    from updater_spark import get_spark

    spark = get_spark("oracle_check", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    if only:
        unknown = [n for n in only if n not in qs]
        if unknown:
            print(f"unknown queries: {unknown}")
            return 1
        qs = {n: qs[n] for n in only}
    failures = []
    for name, fn in qs.items():
        if name not in oracles:
            df = fn(spark, sf_dir)
            n = df.count()
            print(f"[ROWS] {name:32s} rows={n:7d} (no oracle — rows-only check)")
            continue
        try:
            ok = compare(name, fn(spark, sf_dir), oracles[name], con)
        except Exception as e:
            print(f"[ERR ] {name}: {type(e).__name__}: {str(e)[:400]}")
            ok = False
        if not ok:
            failures.append(name)
    extra = (set(oracles) - set(qs)) if not only else set()
    if extra:
        print(f"oracle_sql keys with no query: {sorted(extra)}")
        failures.append("__extra_oracles__")
    print(f"\n{len(qs) - len(failures)}/{len(qs)} queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    args = sys.argv[1:]
    sf = args.pop(0) if args and "/" in args[0] else "/root/testdata/sf0.01"
    raise SystemExit(main(sf, only=args or None))
