"""As-of join semantics: backward match, inclusive ties, NULL before first."""

from __future__ import annotations

from datetime import datetime

from pdfmef_spark.operators.asof import asof_join_backward


def test_asof_backward_semantics(spark):
    ts = lambda s: datetime.fromisoformat(s)  # noqa: E731
    left = spark.createDataFrame(
        [
            (1, "k1", ts("2024-01-01T00:30:00")),  # between r1 and r2
            (2, "k1", ts("2024-01-01T01:00:00")),  # exactly r2 -> inclusive tie
            (3, "k1", ts("2023-12-31T00:00:00")),  # before any right -> NULL
            (4, "k2", ts("2024-01-01T05:00:00")),  # other key
        ],
        "id long, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("k1", ts("2024-01-01T00:00:00"), 10),
            ("k1", ts("2024-01-01T01:00:00"), 20),
            ("k2", ts("2024-01-01T00:00:00"), 99),
        ],
        "k string, ts timestamp, level int",
    )
    out = {
        r.id: r.level
        for r in asof_join_backward(left, right, "ts", by=["k"], value_cols=["level"]).collect()
    }
    assert out == {1: 10, 2: 20, 3: None, 4: 99}
    # all left rows preserved (left-outer as-of)
    assert len(out) == 4
