"""Property-based tests (hypothesis) for the engine's exact
cross-engine arithmetic and key functions — the pieces every oracle
hash depends on. Pure-Python models are checked against the Spark
column implementations over generated inputs."""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from openaq_data_pipeline_spark.catalog import exact_avg_spark, exact_ratio_spark
from openaq_data_pipeline_spark.functions.keys import NULL_SENTINEL, surrogate_key

# 2-decimal non-negative fixtures, the shape of measurement values
cents = st.integers(min_value=0, max_value=10**6).map(lambda c: c / 100)

SETTINGS = settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _py_round_half_up_avg(vals: list[float], out_scale: int = 2) -> float:
    total = sum(Decimal(str(v)) for v in vals)
    avg = total / len(vals)
    q = Decimal(1).scaleb(-out_scale)
    return float(avg.quantize(q, rounding=ROUND_HALF_UP))


class TestExactAvg:
    @SETTINGS
    @given(st.lists(cents, min_size=1, max_size=30))
    def test_matches_decimal_half_up(self, spark, vals):
        df = spark.createDataFrame([(v,) for v in vals], "v double")
        got = df.agg(exact_avg_spark(F.col("v")).alias("a")).first()["a"]
        assert got == pytest.approx(_py_round_half_up_avg(vals), abs=0)

    @SETTINGS
    @given(st.lists(cents, min_size=1, max_size=20))
    def test_empty_condition_yields_null(self, spark, vals):
        df = spark.createDataFrame([(v,) for v in vals], "v double")
        got = df.agg(
            exact_avg_spark(F.col("v"), cond=F.col("v") < -1).alias("a")
        ).first()["a"]
        assert got is None


class TestExactRatio:
    @SETTINGS
    @given(
        st.integers(min_value=0, max_value=10**9),
        st.integers(min_value=1, max_value=10**9),
    )
    def test_matches_decimal_half_up(self, spark, num, den):
        df = spark.createDataFrame([(num, den)], "n long, d long")
        got = df.select(
            exact_ratio_spark(F.col("n"), F.col("d"), out_scale=4).alias("r")
        ).first()["r"]
        expected = float(
            (Decimal(num) / Decimal(den)).quantize(
                Decimal("0.0001"), rounding=ROUND_HALF_UP
            )
        )
        assert got == pytest.approx(expected, abs=0)


class TestSurrogateKey:
    def test_null_sentinel_matches_dbt_utils(self, spark):
        """F13: NULL inputs hash as the dbt_utils sentinel string —
        md5('1-_dbt_utils_surrogate_key_null_') exactly."""
        import hashlib

        df = spark.createDataFrame([("1", None)], "a string, b string")
        got = df.select(surrogate_key(F.col("a"), F.col("b")).alias("k")).first()["k"]
        expected = hashlib.md5(f"1-{NULL_SENTINEL}".encode()).hexdigest()
        assert got == expected

    @SETTINGS
    @given(st.text(min_size=0, max_size=20), st.text(min_size=0, max_size=20))
    def test_injective_on_delimited_parts(self, spark, a, b):
        """Same concatenation ⇒ same key; the '-' delimiter means
        ('x-','y') and ('x','-y') collide by design (dbt_utils
        semantics — documented, not defended)."""
        df = spark.createDataFrame([(a, b)], "a string, b string")
        k1 = df.select(surrogate_key(F.col("a"), F.col("b")).alias("k")).first()["k"]
        import hashlib

        assert k1 == hashlib.md5(f"{a}-{b}".encode()).hexdigest()
