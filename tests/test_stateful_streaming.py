"""Custom stateful streaming operator: EWMA state must carry across
micro-batches and reproduce the batch computation exactly."""

from __future__ import annotations

import os
import time

import pandas as pd
import pytest

from pyspark.sql import functions as F

from window_aggregation_spark.streaming.stateful import batch_ewma, streaming_ewma

SCHEMA = "event_id long, user_id long, ts timestamp, value double"


@pytest.fixture()
def staged_stream(tmp_path):
    """60 events / 4 users split into 3 time-ordered files so the file
    stream delivers 3 micro-batches in ts order (state must carry over)."""
    rows = []
    for i in range(60):
        rows.append(
            {
                "event_id": i,
                "user_id": i % 4,
                "ts": pd.Timestamp("2024-01-01") + pd.Timedelta(minutes=i),
                "value": float((i * 37) % 100) / 10.0,
            }
        )
    pdf = pd.DataFrame(rows)
    d = tmp_path / "stream"
    d.mkdir()
    for part, chunk in enumerate([pdf[:20], pdf[20:40], pdf[40:]]):
        p = d / f"part-{part}.parquet"
        chunk.to_parquet(
            p, index=False, coerce_timestamps="us", allow_truncated_timestamps=True
        )
        mtime = time.time() - 300 + part * 10
        os.utime(p, (mtime, mtime))
    return str(d), pdf


def test_streaming_ewma_state_spans_batches(spark, staged_stream):
    src_dir, pdf = staged_stream
    full = spark.createDataFrame(pdf)
    expected = {
        r["event_id"]: r["ewma"] for r in batch_ewma(full, alpha=0.3).collect()
    }

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    q = (
        streaming_ewma(stream, alpha=0.3)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("ewma_out")
        .start()
    )
    try:
        q.processAllAvailable()
        batches = q.recentProgress
    finally:
        q.stop()

    got = {
        r["event_id"]: r["ewma"] for r in spark.table("ewma_out").collect()
    }
    assert len(got) == 60
    assert got == pytest.approx(expected)
    # state really spanned multiple micro-batches
    assert len([b for b in batches if b["numInputRows"] > 0]) >= 3


def test_null_value_poisons_rest_of_key_batch_and_stream(spark, tmp_path):
    """A null/NaN value must poison every later EWMA output of its key —
    the scalar recurrence's semantics (alpha*NaN + ... = NaN forever) and
    the fold oracle's (NULL propagates). pandas' ewm would silently SKIP
    the NaN and resume finite output; the cumulative mask prevents that.
    Other keys are unaffected, and the poison must carry ACROSS
    micro-batches through the saved state."""
    import math

    rows = []
    for i in range(20):
        rows.append(
            {
                "event_id": i,
                "user_id": i % 2,
                "ts": pd.Timestamp("2024-01-01") + pd.Timedelta(minutes=i),
                # key 0's 3rd event (event_id 4, first file) is null
                "value": None if i == 4 else float(i),
            }
        )
    pdf = pd.DataFrame(rows)
    d = tmp_path / "stream"
    d.mkdir()
    for part, chunk in enumerate([pdf[:10], pdf[10:]]):
        p = d / f"part-{part}.parquet"
        chunk.to_parquet(
            p, index=False, coerce_timestamps="us",
            allow_truncated_timestamps=True,
        )
        mtime = time.time() - 120 + part * 10
        os.utime(p, (mtime, mtime))

    src = spark.createDataFrame(pdf)
    for label, out in (
        ("batch", batch_ewma(src, alpha=0.3).collect()),
        ("stream", None),
    ):
        if label == "stream":
            stream = (
                spark.readStream.schema(SCHEMA)
                .option("maxFilesPerTrigger", 1)
                .parquet(str(d))
            )
            q = (
                streaming_ewma(stream, alpha=0.3)
                .writeStream.outputMode("append")
                .format("memory")
                .queryName("ewma_poison")
                .start()
            )
            try:
                q.processAllAvailable()
            finally:
                q.stop()
            out = spark.table("ewma_poison").collect()
        got = {r["event_id"]: r["ewma"] for r in out}
        assert len(got) == 20, label
        for eid, ewma in got.items():
            if eid % 2 == 0 and eid >= 4:
                # poisoned from the null onward — including events in the
                # SECOND file (eid 10..18), which only a poisoned carried
                # state can produce
                assert ewma is None or math.isnan(ewma), (label, eid, ewma)
            else:
                assert ewma is not None and not math.isnan(ewma), (
                    label, eid, ewma,
                )


class TestStreamingZscore:
    def test_zscore_state_spans_batches(self, spark, staged_stream):
        from window_aggregation_spark.streaming.stateful import (
            batch_zscore,
            streaming_zscore,
        )

        src_dir, pdf = staged_stream
        full = spark.createDataFrame(pdf)
        expected = {
            r["event_id"]: (r["n_hist"], r["zscore"], r["is_anomaly"])
            for r in batch_zscore(full, min_obs=5).collect()
        }

        stream = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir)
        )
        q = (
            streaming_zscore(stream, min_obs=5)
            .writeStream.outputMode("append")
            .format("memory")
            .queryName("zscore_out")
            .start()
        )
        try:
            q.processAllAvailable()
            batches = q.recentProgress
        finally:
            q.stop()

        got = {
            r["event_id"]: (r["n_hist"], r["zscore"], r["is_anomaly"])
            for r in spark.table("zscore_out").collect()
        }
        assert len(got) == 60
        for eid, (n, z, a) in expected.items():
            gn, gz, ga = got[eid]
            assert gn == n and ga == a
            if z is None:
                assert gz is None
            else:
                assert gz == pytest.approx(z, abs=1e-9)
        assert len([b for b in batches if b["numInputRows"] > 0]) >= 3

    def test_matches_window_operator_exactly(self, spark, staged_stream):
        """The Arrow/pandas kernel and the WindowExec plan are two
        implementations of the same math — results must agree."""
        from window_aggregation_spark.operators.timeseries import (
            rolling_zscore,
        )
        from window_aggregation_spark.streaming.stateful import batch_zscore

        _, pdf = staged_stream
        full = spark.createDataFrame(pdf)
        via_window = {
            (r["user_id"], r["event_id"]): (r["n_hist"], r["zscore"], r["is_anomaly"])
            for r in rolling_zscore(
                full, ["user_id"], "ts", "value",
                min_obs=5, tiebreak=["event_id"],
            ).collect()
        }
        via_pandas = {
            (r["user_id"], r["event_id"]): (r["n_hist"], r["zscore"], r["is_anomaly"])
            for r in batch_zscore(full, min_obs=5).collect()
        }
        assert via_pandas == via_window

    def test_null_value_scores_null_but_does_not_poison(self, spark):
        """Unlike the EWMA recurrence, power sums SKIP nulls: the null
        row itself scores NULL, later rows keep scoring off the
        non-null history."""
        from window_aggregation_spark.streaming.stateful import batch_zscore

        import datetime as dt

        rows = [
            (i, 1, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=i),
             None if i == 6 else float(v))
            for i, v in enumerate([9, 11, 9, 11, 9, 11, 0, 9, 30])
        ]
        df = spark.createDataFrame(rows, SCHEMA)
        out = {r["event_id"]: r for r in batch_zscore(df, min_obs=5).collect()}
        assert out[6]["zscore"] is None and not out[6]["is_anomaly"]
        # rows after the null still count only the 7 non-null priors
        assert out[8]["n_hist"] == 7
        assert out[8]["zscore"] is not None and out[8]["is_anomaly"]


class TestStatefulReviewRegressions:
    def test_multi_chunk_group_sorted_globally(self, spark, tmp_path):
        """A key whose micro-batch exceeds arrow.maxRecordsPerBatch
        arrives as several UNORDERED chunks; per-chunk sorting scored
        rows against wrong history. Reproduce with a tiny chunk size and
        reverse-ordered input: stream must equal batch exactly."""
        import datetime as dt

        from window_aggregation_spark.streaming.stateful import (
            batch_zscore,
            streaming_ewma,
            batch_ewma,
            streaming_zscore,
        )

        old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "4")
        try:
            rows = [
                (i, 1, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=i),
                 float((i * 37) % 100) / 10.0)
                for i in range(12)
            ]
            rows.reverse()  # arrival order is the WRONG time order
            pdf_dir = tmp_path / "stream"
            pdf_dir.mkdir()
            pd.DataFrame(
                rows, columns=["event_id", "user_id", "ts", "value"]
            ).to_parquet(pdf_dir / "part-0.parquet", index=False,
                         coerce_timestamps="us",
                         allow_truncated_timestamps=True)
            full = spark.createDataFrame(rows, SCHEMA)

            for batch_fn, stream_fn, col in [
                (batch_zscore, streaming_zscore, "zscore"),
                (batch_ewma, streaming_ewma, "ewma"),
            ]:
                kw = {"min_obs": 3} if col == "zscore" else {}
                expected = {
                    r["event_id"]: r[col] for r in batch_fn(full, **kw).collect()
                }
                stream = spark.readStream.schema(SCHEMA).parquet(str(pdf_dir))
                q = (
                    stream_fn(stream, **kw)
                    .writeStream.outputMode("append").format("memory")
                    .queryName(f"chunk_{col}").start()
                )
                try:
                    q.processAllAvailable()
                finally:
                    q.stop()
                got = {
                    r["event_id"]: r[col]
                    for r in spark.table(f"chunk_{col}").collect()
                }
                assert got == expected, col
        finally:
            spark.conf.set(
                "spark.sql.execution.arrow.maxRecordsPerBatch", old
            )

    def test_key_col_names_and_types_follow_parameter(self, spark):
        """Output schema must follow key_col (a string key previously
        died in Arrow conversion against the hardcoded 'user_id long')."""
        import datetime as dt

        from window_aggregation_spark.streaming.stateful import (
            batch_ewma,
            batch_zscore,
        )

        rows = [
            (i, f"dev-{i % 2}", dt.datetime(2024, 1, 1) + dt.timedelta(minutes=i),
             float(i))
            for i in range(8)
        ]
        df = spark.createDataFrame(
            rows, "event_id long, device_id string, ts timestamp, value double"
        )
        out = batch_ewma(df, key_col="device_id")
        assert dict(out.dtypes)["device_id"] == "string"
        assert out.count() == 8
        out2 = batch_zscore(df, key_col="device_id", min_obs=2)
        assert dict(out2.dtypes)["device_id"] == "string"
        assert out2.count() == 8
