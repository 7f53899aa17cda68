"""LocalRelation construction for build-time-folded query results
(r11 `_esr_fold` pattern, moved out of registry_analytics in r12 —
it is plan infrastructure consumed by several registry modules, and
living here keeps the module graph cycle-free)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def local_numeric_frame(spark: SparkSession, rows, schema) -> DataFrame:
    """Materialize collected scalar rows as a TRUE LocalRelation
    (VALUES + foldable casts -> ConvertToLocalRelation ->
    LocalTableScan): collect() on the result runs entirely
    driver-side, zero job launches. ``createDataFrame`` would instead
    park the rows behind a 1-task ExistingRDD scan that still pays a
    scheduler round-trip per execution. Doubles go through
    CAST('repr' AS DOUBLE) so the binary value round-trips exactly;
    strings are quote-escaped literals; timestamps are TIMESTAMP
    literals (collected as naive datetimes in the session tz — UTC,
    read_table forces it)."""
    if not rows:
        return spark.createDataFrame([], schema)

    def fmt(v, t):
        if v is None:
            return f"CAST(NULL AS {t.upper()})"
        if t == "double":
            return f"CAST('{v!r}' AS DOUBLE)"
        if t == "string":
            esc = str(v).replace("\\", "\\\\").replace("'", "\\'")
            return f"'{esc}'"
        if t == "timestamp":
            return f"TIMESTAMP '{v}'"
        if t == "date":
            return f"DATE '{v}'"
        if t in ("tinyint", "smallint", "int", "bigint", "boolean",
                 "float") or t.startswith("decimal"):
            return f"CAST({v} AS {t.upper()})"
        # anything else would render an unquoted value into SQL
        # (invalid or — worse — silently misparsed); fail loudly so a
        # new caller adds a literal branch instead (r12 advice)
        raise TypeError(
            f"local_numeric_frame: no literal branch for type {t!r}"
        )

    types = [f.dataType.simpleString() for f in schema.fields]
    vals = ",".join(
        "(" + ",".join(fmt(v, t) for v, t in zip(row, types)) + ")"
        for row in rows
    )
    names = ",".join(f.name for f in schema.fields)
    return spark.sql(f"SELECT * FROM (VALUES {vals}) AS t({names})")


def sorted_readout(df: DataFrame, *cols, max_rows: int) -> DataFrame:
    """Globally ordered REPORT-SIZED result without RangePartitioning
    (r13 optimization, guide §2.4/§1): a final ``orderBy`` plans an
    ``Exchange rangepartitioning`` whose range-boundary SAMPLING job
    re-executes every narrow stage of the child plan — for a report
    whose last stage is a pandas kernel or a join chain, that is the
    whole readout computed twice per execution (measured:
    scan_task_packing_report 0.79 s -> 0.28 s). A single-partition
    shuffle + in-partition sort yields the identical global row order
    (one partition, sorted) with no sampling pass, and the child keeps
    its full parallelism. Only for outputs that are domain-/report-
    sized at any scale — a row-heavy ordered result should keep the
    real range sort.

    ``max_rows`` (r14, r13 verdict #8) makes that contract mechanical
    instead of conventional: every call site must state the bound its
    output is domain-limited to, and with ``SPARK_GRAFT_READOUT_CHECK``
    set (tests / debug sessions) the bound is eagerly probed with a
    LIMIT(max_rows+1) count — a future fact-sized misuse fails loudly
    there instead of silently serializing the table through one
    partition at scale. The probe never runs in production paths (it
    would add a job per build)."""
    import os

    if os.environ.get("SPARK_GRAFT_READOUT_CHECK"):
        n = df.limit(max_rows + 1).count()
        if n > max_rows:
            raise ValueError(
                f"sorted_readout: result exceeds the declared "
                f"report-size bound ({n} > {max_rows} rows); a "
                f"row-heavy ordered result must keep a real range sort"
            )
    return df.repartition(1).sortWithinPartitions(*cols)
