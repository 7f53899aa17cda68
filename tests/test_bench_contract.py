"""bench.py artifact-contract guards (the round-2 lesson: the driver
json-parses only the tail of stdout, so the printed line must stay
inside its budget no matter how many queries the suite grows to)."""

import json

import bench


def test_registry_covers_bench_list():
    from feast_hive_spark.registry import REGISTRY
    import feast_hive_spark.registry_analytics  # noqa: F401
    import feast_hive_spark.registry_corpus  # noqa: F401
    import feast_hive_spark.registry_ext  # noqa: F401
    import feast_hive_spark.registry_rel  # noqa: F401

    missing = [q for q in bench.BENCH_QUERIES if q not in REGISTRY]
    assert missing == []
    assert len(set(bench.BENCH_QUERIES)) == len(bench.BENCH_QUERIES)


def test_emit_line_fits_tail_budget(capsys, tmp_path, monkeypatch):
    monkeypatch.setattr(bench, "__file__", str(tmp_path / "bench.py"))
    times = {f"query_{i:03d}": 0.123 for i in range(len(bench.BENCH_QUERIES))}
    prepare = {k: 0.01 for k in times}
    prepare_cold = {k: 0.02 for k in times}
    bench.emit(times, prepare, prepare_cold, 0.1, {"k": "v"})
    line = capsys.readouterr().out.strip().splitlines()[-1]
    assert len(line) <= bench._LINE_BUDGET
    payload = json.loads(line)
    # the TOTAL always covers the full set even when the dict is
    # trimmed for the tail capture
    assert payload["n_queries"] == len(times)
    assert abs(payload["value"] - round(0.123 * len(times), 3)) < 1e-9
    # the full dict lands in the summary file
    full = json.loads((tmp_path / "BENCH_SUMMARY.json").read_text())
    assert len(full["queries"]) == len(times)
    assert full["prepare_total"] == round(0.01 * len(times), 3)


def test_bench_conf_does_not_touch_engine_defaults():
    """The sf<=0.1 bench-session tuning (AQE off, narrow shuffle,
    respread) must stay bench-local: bench_conf at cluster scale
    leaves AQE alone, and the engine's session factory keeps AQE ON
    (the 100 TB default the SCALING.md story depends on)."""
    import bench
    from feast_hive_spark.session import DEFAULT_CONF

    small = bench.bench_conf(0.1)
    assert small.get("spark.sql.adaptive.enabled") == "false"
    big = bench.bench_conf(100.0)
    assert "spark.sql.adaptive.enabled" not in big
    assert DEFAULT_CONF.get("spark.sql.adaptive.enabled", "true") == "true"


def test_emit_writes_environment_note(capsys, tmp_path, monkeypatch):
    """environment_note must land in BENCH_SUMMARY.json (r8 verdict:
    the same-window controls must survive any rerun, emitted by the
    harness itself) and must NOT bloat the printed line."""
    import json

    import bench

    monkeypatch.setattr(bench.os.path, "dirname", lambda _: str(tmp_path))
    note = {"duckdb_rel20": {"sweep_median_sec": 1.5}}
    bench.emit({"q": 0.1}, {"q": 0.01}, {"q": 0.02}, 0.1, {"k": "v"},
               environment_note=note)
    line = capsys.readouterr().out.strip().splitlines()[-1]
    assert "environment_note" not in line
    summary = json.loads((tmp_path / "BENCH_SUMMARY.json").read_text())
    assert summary["environment_note"] == note


def test_duckdb_rel20_control_contract(sf_dir):
    """The in-process DuckDB control runs every REL-20 oracle and
    reports a median over 9 warm sweeps."""
    import bench

    r = bench._duckdb_rel20_control(sf_dir, bench.BENCH_QUERIES[:bench.REL20_N])
    assert r["n_queries"] == 20 and r["threads"] == 32
    assert len(r["sweeps_sec"]) == 9
    assert r["sweep_median_sec"] == r["sweeps_sec"][4]
    # per-query medians back the strict per-query ratio table
    pq = r["per_query_median_sec"]
    assert len(pq) == 20 and all(v > 0 for v in pq.values())
    # the per-query medians must be consistent with the sweep total
    # (each median <= the slowest whole sweep)
    assert all(v <= r["sweeps_sec"][-1] for v in pq.values())


def test_tier100_guard_trip_classification():
    """A tier record that died on a typed scale guard is a documented
    guard trip, not a failure (r8 verdict #5)."""
    import bench_scale as bs

    assert bs._is_guard({"error_sf10": "AnnQueryGuardError: query set "
                                       "exceeds 100000 rows"})
    assert bs._is_guard({"error": "AnnQueryGuardError: ..."})
    assert not bs._is_guard({"error_sf1": "OutOfMemoryError: heap"})
    assert not bs._is_guard({"exponent": 0.5})


def test_emit_spread_and_accounting(capsys, tmp_path, monkeypatch):
    """r12 (r11 verdict #2): the summary must carry per-query exec
    dispersion, an unstable list (spread > 1.5x AND > 0.1s absolute),
    and the machine-readable accounting stamp (prepare_cold=v2)."""
    import json

    import bench

    monkeypatch.setattr(bench.os.path, "dirname", lambda _: str(tmp_path))
    spread = {
        "steady": [0.10, 0.11, 0.12],
        "noisy": [0.40, 0.80, 3.10],       # 7.8x, 2.7s — flags
        "tiny_jitter": [0.004, 0.01, 0.02],  # 5x but 16ms — no flag
    }
    times = {k: v[1] for k, v in spread.items()}
    bench.emit(times, {k: 0.01 for k in times}, {k: 0.02 for k in times},
               0.1, {"k": "v"}, exec_spread=spread)
    capsys.readouterr()
    summary = json.loads((tmp_path / "BENCH_SUMMARY.json").read_text())
    assert summary["exec_spread_sec"] == spread
    assert summary["unstable"] == ["noisy"]
    assert summary["accounting"]["prepare_cold"] == "v2"
