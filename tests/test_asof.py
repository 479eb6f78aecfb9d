"""As-of join semantics (ADVICE r1): the carry-forward must return the MOST
RECENT marked value, not the maximum — probed with non-monotone values."""

import pyspark.sql.functions as F

from datalake_ingestion_system_spark.operators import asof


def test_window_asof_non_monotone_values(spark):
    """Prices go down: the as-of value at each event is the latest marked
    price at-or-before it, even when an earlier price was higher."""
    rows = [
        # (key, ts, kind, price)
        ("a", 1, "quote", 900.0),
        ("a", 2, "trade", None),
        ("a", 3, "quote", 500.0),   # price DROPS — max-carry would keep 900
        ("a", 4, "trade", None),
        ("a", 5, "quote", 700.0),
        ("a", 6, "trade", None),
        ("b", 1, "trade", None),    # no quote yet → NULL
        ("b", 2, "quote", 10.0),
        ("b", 3, "trade", None),
    ]
    df = spark.createDataFrame(
        rows, "key string, ts int, kind string, price double")
    out = asof.asof_join_window(
        df, "key", "ts", F.col("kind") == "quote", "price",
        out_col="asof_price")
    got = {(r.key, r.ts): r.asof_price for r in out.collect()}
    assert got[("a", 2)] == 900.0
    assert got[("a", 4)] == 500.0   # the later, LOWER quote wins
    assert got[("a", 6)] == 700.0
    assert got[("b", 1)] is None
    assert got[("b", 3)] == 10.0


def test_pandas_asof_matches_window_variant(spark):
    """The general two-table merge_asof agrees with the single-stream window
    form on equivalent input."""
    quotes = [("a", t, float(1000 - 100 * t)) for t in (1, 3, 5)]
    trades = [("a", t) for t in (2, 4, 6)]
    qdf = spark.createDataFrame(quotes, "key string, ts long, price double")
    tdf = spark.createDataFrame(trades, "key string, ts long")
    out = asof.asof_join_pandas(tdf, qdf, "key", "ts")
    got = {r.ts: r.price_right for r in out.collect()}
    assert got == {2: 900.0, 4: 700.0, 6: 500.0}
