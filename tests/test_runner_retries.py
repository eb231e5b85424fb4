"""Retry/alerting orchestration parity (VERDICT r3 item 8): per-stage
bounded retries with delay + a one-failed notification hook, matching the
reference's Airflow ``retries``/``retry_delay``/``one_failed`` semantics
(`scheduling/orchestration.py:44-45,150-167`)."""

from __future__ import annotations

import pytest

from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.pipelines.runner import (
    StageFailure,
    run_medallion_day_retried,
    run_with_retries,
)


def test_transient_failure_retries_then_succeeds():
    attempts = {"n": 0}
    slept: list[float] = []

    def flaky():
        attempts["n"] += 1
        if attempts["n"] < 3:
            raise OSError("transient")
        return "ok"

    alerts: list[tuple[str, BaseException]] = []
    out = run_with_retries(
        [("a", lambda: 1), ("flaky", flaky), ("b", lambda: 2)],
        retries=2,
        retry_delay_sec=60.0,
        on_failure=lambda s, e: alerts.append((s, e)),
        _sleep=slept.append,
    )
    assert out == {"a": 1, "flaky": "ok", "b": 2}
    assert attempts["n"] == 3  # initial try + 2 retries
    assert slept == [60.0, 60.0]  # delay before each retry, not the first try
    assert alerts == []  # success after retry -> no notification


def test_exhausted_retries_alert_once_and_skip_downstream():
    calls: list[str] = []
    alerts: list[str] = []

    def always_fails():
        calls.append("fail")
        raise ValueError("permanent")

    with pytest.raises(StageFailure) as exc_info:
        run_with_retries(
            [
                ("ok", lambda: calls.append("ok")),
                ("doomed", always_fails),
                ("downstream", lambda: calls.append("never")),
            ],
            retries=2,
            retry_delay_sec=0.0,
            on_failure=lambda s, e: alerts.append(s),
            _sleep=lambda _: None,
        )
    assert exc_info.value.stage == "doomed"
    assert isinstance(exc_info.value.__cause__, ValueError)
    assert alerts == ["doomed"]  # exactly one notification
    assert calls == ["ok", "fail", "fail", "fail"]  # downstream never ran


def test_medallion_day_retried_end_to_end(spark, tmp_path):
    """The staged medallion day produces the same lake state as the
    monolithic runner and reports per-stage results."""
    out = run_medallion_day_retried(
        spark, str(tmp_path / "lake"), "2024-03-01", n_records=50, retry_delay_sec=0.0
    )
    assert out["bronze"] == 50
    assert out["silver"] > 0
    assert out["gold"] > 0
    assert spark.read.parquet(str(tmp_path / "lake/silver")).count() == out["silver"]
