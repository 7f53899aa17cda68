#!/usr/bin/env python
"""Local replica of the driver's t2 correctness gate.

Runs every registry query on Spark AND its DuckDB oracle on the same
parquet tables, then compares row count, column names, and
(column-name-sorted, row-sorted) values. Usage:

    python check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

import duckdb
import numpy as np
import pandas as pd

from feast_hive_spark.registry import REGISTRY
import feast_hive_spark.registry_analytics  # noqa: F401
import feast_hive_spark.registry_corpus  # noqa: F401
import feast_hive_spark.registry_ext  # noqa: F401
import feast_hive_spark.registry_rel  # noqa: F401
from feast_hive_spark.session import get_spark
from feast_hive_spark.sources.tables import TABLES, register_views


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(pdf.columns)
    out = pdf[cols].copy()
    for c in cols:
        if pd.api.types.is_datetime64_any_dtype(out[c]):
            out[c] = out[c].astype("datetime64[us]")
    return out.sort_values(by=cols, kind="mergesort").reset_index(drop=True)


def compare(name: str, got: pd.DataFrame, exp: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(got.columns) != sorted(exp.columns):
        problems.append(f"columns differ: spark={sorted(got.columns)} duckdb={sorted(exp.columns)}")
        return problems
    if len(got) != len(exp):
        problems.append(f"row count differs: spark={len(got)} duckdb={len(exp)}")
        return problems
    g, e = _canon(got), _canon(exp)
    for c in g.columns:
        gs, es = g[c], e[c]
        # The driver's hash compares exact value representations, so an
        # int64 column on one side vs float64 on the other (DuckDB
        # HUGEINT -> pandas float64) hash-mismatches even when the
        # values are numerically equal. Mirror that strictness here.
        if pd.api.types.is_float_dtype(gs) != pd.api.types.is_float_dtype(es) and (
            pd.api.types.is_numeric_dtype(gs) and pd.api.types.is_numeric_dtype(es)
        ):
            problems.append(
                f"col {c}: dtype divergence spark={gs.dtype} duckdb={es.dtype} "
                "(driver hash would mismatch)"
            )
            continue
        if pd.api.types.is_float_dtype(gs) or pd.api.types.is_float_dtype(es):
            gv = pd.to_numeric(gs, errors="coerce").to_numpy(dtype=float)
            ev = pd.to_numeric(es, errors="coerce").to_numpy(dtype=float)
            both_nan = np.isnan(gv) & np.isnan(ev)
            close = np.isclose(gv, ev, rtol=1e-9, atol=1e-12) | both_nan
            if not close.all():
                i = int(np.argmin(close))
                problems.append(f"col {c}: value mismatch at sorted row {i}: {gv[i]} vs {ev[i]}")
        else:
            if not (gs.astype(str).to_numpy() == es.astype(str).to_numpy()).all():
                diff = (gs.astype(str).to_numpy() != es.astype(str).to_numpy())
                i = int(np.argmax(diff))
                problems.append(
                    f"col {c}: value mismatch at sorted row {i}: {gs.iloc[i]!r} vs {es.iloc[i]!r}"
                )
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("check_correctness")
    register_views(spark, sf_dir)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    n_fail = 0
    results: dict[str, dict] = {}
    for name, (fn, oracle) in REGISTRY.items():
        if only and name not in only:
            continue
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {type(e).__name__}: {str(e)[:200]}")
            results[name] = {"status": "fail", "err": f"spark: {type(e).__name__}"}
            n_fail += 1
            continue
        if oracle is None:
            print(f"SKIP {name}: no oracle (rows-only: {len(got)} rows)")
            results[name] = {"status": "rows_only", "rows": len(got)}
            continue
        try:
            exp = con.execute(oracle).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {type(e).__name__}: {str(e)[:200]}")
            results[name] = {"status": "fail", "err": f"duckdb: {type(e).__name__}"}
            n_fail += 1
            continue
        problems = compare(name, got, exp)
        if problems:
            n_fail += 1
            print(f"FAIL {name} ({len(got)} rows):")
            for p in problems:
                print(f"    {p}")
            results[name] = {"status": "fail", "rows": len(got), "problems": problems}
        else:
            print(f"OK   {name} ({len(got)} rows)")
            results[name] = {"status": "ok", "rows": len(got)}
    print(f"\n{'ALL OK' if n_fail == 0 else f'{n_fail} FAILURES'}")
    # full-coverage artifact (the driver's per-round gate samples ~50
    # queries; this file is the committed evidence for the rest)
    out = os.environ.get("CHECK_JSON")
    if out:
        import json

        with open(out, "w") as f:
            json.dump(
                {
                    "sf_dir": sf_dir,
                    "n_queries": len(results),
                    "n_fail": n_fail,
                    "results": results,
                },
                f,
                indent=1,
                sort_keys=True,
            )
            f.write("\n")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
