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
