"""End-to-end pipeline run — entry-point-1 parity (DAG chain collapse)."""

from __future__ import annotations

from finance_reporting_etl_spark.pipeline import run_pipeline


def test_run_pipeline_end_to_end(spark, sf_dir, tmp_path):
    result = run_pipeline(spark, sf_dir, warehouse_dir=str(tmp_path))
    # extract: canned FRED payload flattened + timestamped
    obs = result.raw_observations
    assert obs.count() == 4
    assert obs.filter("value IS NULL").count() == 1  # '.' -> NULL
    assert obs.filter("created_at IS NULL").count() == 0
    # transform: marts built and queryable via spark.sql (EP3 parity)
    assert spark.sql("SELECT * FROM mart_financial_summary").count() > 0
    assert spark.sql("SELECT * FROM mart_financial_kpis").count() > 0
    assert (tmp_path / "mart_financial_summary").exists()
    # staging views resolve too
    assert spark.sql("SELECT * FROM stg_financial_data LIMIT 1").count() == 1


def test_pipeline_injected_fetcher(spark, sf_dir):
    payload = {"observations": [{"date": "2024-01-01", "value": "1.5"}]}
    result = run_pipeline(spark, sf_dir, fetch_payloads=lambda: [payload])
    assert result.raw_observations.count() == 1


def test_pipeline_notification_hooks(spark, sf_dir):
    """O4 analog: completion hook fires with the result; failure hook
    observes the exception which still propagates."""
    import pytest

    from finance_reporting_etl_spark.pipeline import run_pipeline

    seen = []
    run_pipeline(spark, sf_dir, on_complete=lambda res: seen.append(res))
    assert len(seen) == 1 and "mart_financial_kpis" in seen[0].marts

    failures = []
    with pytest.raises(RuntimeError, match="boom"):
        run_pipeline(
            spark,
            sf_dir,
            fetch_payloads=lambda: (_ for _ in ()).throw(RuntimeError("boom")),
            on_failure=lambda exc: failures.append(exc),
        )
    assert len(failures) == 1 and "boom" in str(failures[0])


def test_pipeline_failure_hook_error_does_not_mask_original(spark, sf_dir):
    """A broken notifier must never replace the pipeline's own failure."""
    import pytest

    with pytest.raises(RuntimeError, match="original"):
        run_pipeline(
            spark,
            sf_dir,
            fetch_payloads=lambda: (_ for _ in ()).throw(RuntimeError("original")),
            on_failure=lambda exc: (_ for _ in ()).throw(ValueError("notifier broke")),
        )


def test_pipeline_retries_transient_failure(spark, sf_dir):
    """O1 parity with dags/etl_dag.py:9 (retries=1, retry_delay=5min):
    one transient failure then success; injectable clock, no real sleep."""
    calls = {"n": 0}
    slept: list[float] = []

    def flaky():
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("transient")
        return [{"observations": [{"date": "2024-01-01", "value": "1.5"}]}]

    result = run_pipeline(
        spark, sf_dir, fetch_payloads=flaky,
        retries=1, retry_delay_s=300.0, sleep=slept.append,
    )
    assert calls["n"] == 2
    assert slept == [300.0]
    assert result.raw_observations.count() == 1


def test_pipeline_retries_exhausted_still_raises(spark, sf_dir):
    import pytest

    failures = []
    with pytest.raises(RuntimeError, match="persistent"):
        run_pipeline(
            spark, sf_dir,
            fetch_payloads=lambda: (_ for _ in ()).throw(RuntimeError("persistent")),
            on_failure=failures.append,
            retries=2, retry_delay_s=1.0, sleep=lambda _s: None,
        )
    assert len(failures) == 1  # hook fires once, on the final attempt


def test_observe_quality_metrics_ride_the_action(spark, tmp_path):
    """Data-quality counters must come from the SAME job as the write
    (no second scan) and check_quality must both pass clean data and
    name every violated rule on dirty data."""
    import pytest

    from finance_reporting_etl_spark.pipeline import check_quality, observe_quality

    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, 250.0)], "k long, v double"
    )
    observed, obs = observe_quality(
        df, null_cols=("v",), bounds={"v": (0.0, 100.0)}
    )
    observed.write.mode("overwrite").parquet(str(tmp_path / "out"))  # the one action
    m = obs.get
    assert m["n_rows"] == 3 and m["nulls_v"] == 1 and m["max_v"] == 250.0
    with pytest.raises(ValueError) as ei:
        check_quality(obs, max_null_fraction=0.1, bounds={"v": (0.0, 100.0)})
    assert "nulls_v" in str(ei.value) and "max_v" in str(ei.value)

    clean, obs2 = observe_quality(
        df.filter("v IS NOT NULL AND v <= 100"), null_cols=("v",), bounds={"v": (0.0, 100.0)}
    )
    clean.count()
    got = check_quality(obs2, bounds={"v": (0.0, 100.0)})
    assert got["n_rows"] == 1


def test_publish_validated_swaps_on_success(spark, tmp_path):
    """WAP happy path: staged data passes the audit and replaces the
    live table atomically; metrics come from the write job itself."""
    from finance_reporting_etl_spark.pipeline import publish_validated

    path = str(tmp_path / "mart")
    v1 = spark.createDataFrame([(1, 5.0)], "k long, v double")
    v1.write.parquet(path)
    v2 = spark.createDataFrame([(1, 6.0), (2, 7.0)], "k long, v double")
    m = publish_validated(
        spark, v2, path, null_cols=("v",), bounds={"v": (0.0, 100.0)}
    )
    assert m["n_rows"] == 2 and m["nulls_v"] == 0
    assert sorted(r.v for r in spark.read.parquet(path).collect()) == [6.0, 7.0]


def test_publish_validated_failed_audit_leaves_live_untouched(spark, tmp_path):
    """WAP audit failure: the live table still serves the OLD data, the
    staged directory survives for debugging, and the error names the
    violated rule."""
    import pytest

    from finance_reporting_etl_spark.pipeline import publish_validated

    path = str(tmp_path / "mart")
    v1 = spark.createDataFrame([(1, 5.0)], "k long, v double")
    v1.write.parquet(path)
    bad = spark.createDataFrame([(2, None)], "k long, v double")
    with pytest.raises(ValueError, match="null fraction"):
        publish_validated(spark, bad, path, null_cols=("v",))
    assert [r.v for r in spark.read.parquet(path).collect()] == [5.0]
    assert spark.read.parquet(path + "_wap_staged").count() == 1  # kept for debug


# ---------------------------------------------------------------------------
# checked_swap: every Hadoop rename() boolean is checked (rename returns
# False on failure instead of throwing), and the _old backup is never
# deleted after a failed swap. Pure fakes — no JVM needed.
# ---------------------------------------------------------------------------


class _FakeFS:
    """Directory-set filesystem with injectable rename failures."""

    def __init__(self, dirs, fail_renames=()):
        self.dirs = set(dirs)
        self.fail = set(fail_renames)  # (src, dst) pairs that return False

    def exists(self, p):
        return str(p) in self.dirs

    def rename(self, src, dst):
        src, dst = str(src), str(dst)
        if (src, dst) in self.fail or src not in self.dirs:
            return False
        self.dirs.remove(src)
        self.dirs.add(dst)
        return True

    def delete(self, p, recursive=False):
        self.dirs.discard(str(p))
        return True


def _swap(fs):
    from finance_reporting_etl_spark.operators.incremental import checked_swap

    checked_swap(fs, "live", "staged", "old")


def test_checked_swap_happy_path_replaces_and_cleans_backup():
    fs = _FakeFS({"live", "staged"})
    _swap(fs)
    assert fs.dirs == {"live"}


def test_checked_swap_first_publish_no_live_yet():
    fs = _FakeFS({"staged"})
    _swap(fs)
    assert fs.dirs == {"live"}


def test_checked_swap_live_aside_failure_keeps_live():
    import pytest

    fs = _FakeFS({"live", "staged"}, fail_renames={("live", "old")})
    with pytest.raises(IOError, match="live table intact"):
        _swap(fs)
    assert "live" in fs.dirs and "staged" in fs.dirs


def test_checked_swap_staged_rename_failure_restores_backup():
    import pytest

    fs = _FakeFS({"live", "staged"}, fail_renames={("staged", "live")})
    with pytest.raises(IOError, match="previous table restored"):
        _swap(fs)
    # the old live table was rolled back; staged kept for inspection
    assert "live" in fs.dirs and "staged" in fs.dirs


def test_checked_swap_staged_failure_unrestorable_keeps_backup():
    import pytest

    fs = _FakeFS(
        {"live", "staged"},
        fail_renames={("staged", "live"), ("old", "live")},
    )
    with pytest.raises(IOError, match="preserved at old"):
        _swap(fs)
    # backup survives under old — never deleted on a failed swap
    assert "old" in fs.dirs and "staged" in fs.dirs
