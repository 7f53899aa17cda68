"""Partition-streamed replacement for many-tiny-group applyInPandas.

``groupBy(keys).applyInPandas(kernel)`` pays a pandas-assembly +
function-call + Arrow-result round trip PER GROUP (~5 ms each): an LSH
bucket table with 200 buckets spends ~1 s on invocation overhead before
any math runs, and at scale the group count grows with the corpus while
each group stays small. ``grouped_apply_stream`` keeps the exact same
exchange (hash partitioning on the keys) but pays the Python round trip
once per PARTITION: rows are sorted within each partition so every
group's rows are contiguous, and a single ``mapInPandas`` kernel slices
groups out with numpy boundary detection, carrying the trailing
(possibly batch-spanning) group over to the next Arrow batch. Memory
stays bounded by one Arrow batch plus one group — the same bound the
grouped form has (guide §4.1, §2.4).
"""

from __future__ import annotations

from typing import Callable, Sequence

from pyspark.sql import DataFrame


def grouped_apply_stream(
    df: DataFrame,
    keys: Sequence[str],
    kernel: Callable,
    schema,
) -> DataFrame:
    """Equivalent of ``df.groupBy(*keys).applyInPandas(kernel, schema)``
    for NON-NULL key columns and a 1-arg ``kernel`` (the key-aware
    2-arg form is not supported): one Python invocation per partition
    instead of one per group. The kernel receives each group as its own
    pandas DataFrame (keys included, fresh RangeIndex), exactly like
    ``applyInPandas``; group processing order within a partition is key
    order, which no caller may rely on (``applyInPandas`` makes no
    ordering promise either)."""
    import numpy as np
    import pandas as pd

    klist = list(keys)

    def _emit(body):
        cols = [body[k].to_numpy() for k in klist]
        n = len(body)
        change = np.zeros(n, dtype=bool)
        change[0] = True
        for c in cols:
            change[1:] |= c[1:] != c[:-1]
        bounds = np.append(np.flatnonzero(change), n)
        for s, e in zip(bounds[:-1], bounds[1:]):
            out = kernel(body.iloc[s:e].reset_index(drop=True))
            if out is not None and len(out):
                yield out

    def stream(batches):
        carry = None
        for pdf in batches:
            if not len(pdf):
                continue
            if carry is not None:
                pdf = pd.concat([carry, pdf], ignore_index=True)
                carry = None
            cols = [pdf[k].to_numpy() for k in klist]
            tail = np.ones(len(pdf), dtype=bool)
            for c in cols:
                tail &= c == c[-1]
            if tail.all():
                # whole batch is one (possibly continuing) group
                carry = pdf
                continue
            # sorted input => rows keyed like the last row form the
            # trailing run; it may continue into the next batch
            run = int(np.argmin(tail[::-1]))
            cut = len(pdf) - run
            carry = pdf.iloc[cut:]
            yield from _emit(pdf.iloc[:cut])
        if carry is not None and len(carry):
            yield from _emit(carry.reset_index(drop=True))

    return (
        df.repartition(*klist)
        .sortWithinPartitions(*klist)
        .mapInPandas(stream, schema)
    )
