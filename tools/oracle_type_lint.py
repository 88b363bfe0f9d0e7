"""Lint every oracle for fetch-path-fragile output types.

DuckDB's ``SUM(<integer>)`` returns HUGEINT (int128) and its decimal
aggregates return DECIMAL; both survive ``fetchall()`` as exact Python
ints/Decimals (so a fetchall-based checker stays green) but degrade to
``float64`` through the pandas/Arrow export path (HUGEINT -> float64 via
``.df()``, decimal128 via ``.arrow()``). A harness that fetches oracle
results through pandas therefore canonicalizes ``123`` as ``"123.0"``
while Spark's LongType canonicalizes as ``"123"`` -> value-hash mismatch
with rows+schema still matching. That is precisely the signature of the
five r05 driver-red entries (all green under the local fetchall checker).

Rule: every oracle output column must land in a type whose pandas export
is loss-free and class-stable vs the Spark column:
  - HUGEINT        -> forbidden (CAST(... AS BIGINT))
  - DECIMAL(p,s)   -> forbidden at output (CAST(... AS DOUBLE) or BIGINT)
  - anything else  -> fine

Second rule (r08, from the r07 driver-red on simsearch_int8_quant):
top-level output columns must be SCALAR. The driver canonicalizes via
``pandas.sort_values`` over raw columns, which factorizes each column
and raises ``TypeError: unhashable type`` on list/struct/map cells.
LIST (``T[]``), ARRAY, STRUCT, MAP and UNION output types are therefore
forbidden — project them to strings (``array_to_string``/``to_json``)
on both engines. Lists are fine INSIDE a query; only the output
projection is constrained.

Usage: python tools/oracle_type_lint.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

BAD_PREFIXES = ("HUGEINT", "UHUGEINT", "DECIMAL")
NONSCALAR_PREFIXES = ("STRUCT", "MAP", "UNION", "LIST", "ARRAY")
# diag_fp_hugeint probes the fetch path with a deliberate HUGEINT.
EXEMPT = {"diag_fp_hugeint"}


def _is_nonscalar(ty: str) -> bool:
    t = ty.upper().strip()
    return t.endswith("[]") or t.startswith(NONSCALAR_PREFIXES)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    import __spark_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    flagged: list[tuple[str, list[tuple[str, str]]]] = []
    errors: list[str] = []
    for name, sql in entrymod.oracle_sql().items():
        if name in EXEMPT:
            continue
        try:
            rel = con.execute(sql)
            cols = [d[0] for d in rel.description]
            # description dtypes are lossy; use a prepared relation for types
            types = [str(t) for t in con.sql(sql).types]
        except Exception as e:  # noqa: BLE001
            errors.append(f"{name}: {e}")
            continue
        bad = [
            (c, ty)
            for c, ty in zip(cols, types)
            if ty.upper().startswith(BAD_PREFIXES)
            or _is_nonscalar(ty)
        ]
        if bad:
            flagged.append((name, bad))

    for name, bad in flagged:
        print(f"FLAG  {name}: " + ", ".join(f"{c}:{t}" for c, t in bad))
    for e in errors:
        print(f"ERR   {e}")
    print(f"\n{len(flagged)} flagged, {len(errors)} errors")
    return 1 if flagged or errors else 0


if __name__ == "__main__":
    raise SystemExit(main())
