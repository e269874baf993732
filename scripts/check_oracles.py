"""Local mimic of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry at a given sf dir and
compares against ``oracle_sql()`` via DuckDB: row count, column names, and
an order-insensitive value comparison (columns sorted by name, rows sorted
by all columns). Usage::

    python scripts/check_oracles.py [--exact] [sf_dir] [query ...]

``--exact`` compares floats bit-for-bit (NaN==NaN) instead of isclose at
1e-9 — the driver hashes values, so this is the mode that actually mimics
its gate for float columns.
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].astype(str)
    return pdf.sort_values(list(pdf.columns), kind="mergesort").reset_index(drop=True)


EXACT = False


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"row count: spark={len(spark_pdf)} duck={len(duck_pdf)}")
    sc, dc = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if sc != dc:
        problems.append(f"columns: spark={sc} duck={dc}")
        return problems
    if problems:
        return problems
    s, d = normalize(spark_pdf), normalize(duck_pdf)
    for c in s.columns:
        a, b = s[c].to_numpy(), d[c].to_numpy()
        if np.issubdtype(np.asarray(a).dtype, np.floating) or np.issubdtype(
            np.asarray(b).dtype, np.floating
        ):
            a = pd.to_numeric(s[c], errors="coerce").to_numpy(dtype=float)
            b = pd.to_numeric(d[c], errors="coerce").to_numpy(dtype=float)
            if EXACT:
                ok = (a == b) | (np.isnan(a) & np.isnan(b))
            else:
                ok = np.isclose(a, b, rtol=1e-9, atol=1e-9, equal_nan=True)
        else:
            ok = (s[c].fillna("∅").astype(str) == d[c].fillna("∅").astype(str)).to_numpy()
        if not ok.all():
            i = int(np.argmax(~ok))
            problems.append(
                f"col {c}: {int((~ok).sum())} mismatches; first at sorted-row {i}: "
                f"spark={s[c].iloc[i]!r} duck={d[c].iloc[i]!r}"
            )
    return problems


def main() -> int:
    global EXACT
    argv = [a for a in sys.argv[1:] if a != "--exact"]
    EXACT = "--exact" in sys.argv[1:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    import __spark_entry__ as entrymod
    from featureextraction_spark.session import get_spark

    spark = get_spark("oracle-check", parallelism=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            spark_pdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"WARN {name}: no oracle (rows-only) — rows={len(spark_pdf)}")
            continue
        try:
            duck_pdf = con.sql(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            failures += 1
            continue
        from featureextraction_spark.operators.cache import (
            release_persisted_intermediates,
        )

        release_persisted_intermediates()
        problems = compare(name, spark_pdf, duck_pdf)
        if problems:
            failures += 1
            print(f"FAIL {name}:")
            for p in problems:
                print(f"    {p}")
        else:
            print(f"OK   {name}: rows={len(spark_pdf)}")
    print(f"\n{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
