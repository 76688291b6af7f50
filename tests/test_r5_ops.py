"""Round-5 operator additions: template mining, per-key throttling,
median/MAD outliers, centroid label-noise scoring, temperature mixture
sampling.  Oracle parity lives in queries.py; these tests pin semantics
the hash can't see (flags, edge cases, determinism, planted rows)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from logshipper_spark.functions.similarity import centroid_outliers
from logshipper_spark.functions.textstats import mixture_sample, mixture_weights
from logshipper_spark.operators.aggregate import robust_outliers, throttle_per_key
from logshipper_spark.operators.parse import mine_templates, normalize_template


class TestMineTemplates:
    def test_masking_rules(self, spark):
        rows = [
            ("conn 0x7fab3c refused port 8080",),
            ("conn 0xdeadbeef refused port 9090",),
            ("latency 12.5 ms for req 550e8400-e29b-41d4-a716-446655440000",),
        ]
        df = spark.createDataFrame(rows, "msg string")
        got = {r["template"]: r["n_msgs"] for r in mine_templates(df, "msg").collect()}
        assert got == {
            "conn <hex> refused port <n>": 2,
            "latency <f> ms for req <uuid>": 1,
        }

    def test_exemplar_is_min_and_min_count(self, spark):
        df = spark.createDataFrame(
            [("err 2",), ("err 1",), ("ok 5",)], "msg string"
        )
        out = {r["template"]: r for r in mine_templates(df, "msg", min_count=2).collect()}
        assert list(out) == ["err <n>"]
        assert out["err <n>"]["exemplar"] == "err 1"

    def test_normalize_order_int_inside_float(self, spark):
        # the float rule must win before the int rule splits "12.5" into
        # "<n>.<n>"
        df = spark.createDataFrame([("v 12.5",)], "msg string")
        (r,) = df.select(normalize_template(F.col("msg")).alias("t")).collect()
        assert r["t"] == "v <f>"


class TestThrottlePerKey:
    @pytest.fixture()
    def bursty(self, spark):
        rows = [
            # user 1: three events in one minute, one in the next
            (1, 1, "2024-01-01 00:00:01"),
            (2, 1, "2024-01-01 00:00:02"),
            (3, 1, "2024-01-01 00:00:03"),
            (4, 1, "2024-01-01 00:01:00"),
            # user 2: quiet
            (5, 2, "2024-01-01 00:00:30"),
        ]
        return spark.createDataFrame(rows, "event_id long, user_id long, ts string").withColumn(
            "ts", F.col("ts").cast("timestamp")
        )

    def test_admits_earliest_per_window(self, bursty):
        got = sorted(
            r["event_id"]
            for r in throttle_per_key(
                bursty, ["user_id"], "ts", max_per_window=2, window="minute"
            ).collect()
        )
        assert got == [1, 2, 4, 5]  # event 3 throttled

    def test_mark_only_keeps_all_rows(self, bursty):
        out = throttle_per_key(
            bursty, ["user_id"], "ts", max_per_window=1, window="minute", mark_only=True
        )
        rows = {r["event_id"]: r["admitted"] for r in out.collect()}
        assert rows == {1: True, 2: False, 3: False, 4: True, 5: True}

    def test_tiebreak_is_deterministic(self, spark):
        # equal timestamps: admission must follow the tiebreak column
        df = spark.createDataFrame(
            [(10, 1, "2024-01-01 00:00:00"), (9, 1, "2024-01-01 00:00:00")],
            "event_id long, user_id long, ts string",
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        got = [
            r["event_id"]
            for r in throttle_per_key(
                df, ["user_id"], "ts", max_per_window=1, window="minute",
                tiebreak_cols=["event_id"],
            ).collect()
        ]
        assert got == [9]


class TestRobustOutliers:
    def test_planted_outlier_flagged_constant_group_skipped(self, spark):
        rows = [("a", float(v)) for v in [10, 11, 9, 10, 12, 10, 11, 500]]
        rows += [("b", 7.0)] * 5  # MAD == 0 → no outliers by convention
        df = spark.createDataFrame(rows, "g string, v double")
        out = robust_outliers(df, "v", "g", k=3.5).collect()
        assert [(r["g"], r["v"]) for r in out] == [("a", 500.0)]
        assert out[0]["robust_z"] > 3.5

    def test_inliers_survive_threshold(self, spark):
        df = spark.createDataFrame(
            [("a", float(v)) for v in [10, 11, 9, 10, 12]], "g string, v double"
        )
        assert robust_outliers(df, "v", "g", k=3.5).count() == 0


class TestCentroidOutliers:
    def test_flipped_vector_is_outlier(self, spark):
        base = [1.0, 0.0, 0.0, 0.0]
        rows = [(i, 0, [x + 0.01 * i for x in base]) for i in range(5)]
        rows.append((99, 0, [-x for x in base]))  # anti-aligned plant
        df = spark.createDataFrame(rows, "vec_id long, label int, embedding array<float>")
        out = {r["vec_id"]: r for r in centroid_outliers(df, threshold=0.0).collect()}
        assert len(out) == 6  # scoring operator: every row returned
        assert out[99]["is_outlier"] and out[99]["cos_centroid"] < 0
        assert all(not out[i]["is_outlier"] for i in range(5))


class TestMixtureSampling:
    def test_weights_alpha_extremes(self):
        counts = {"a": 100, "b": 400}
        w1 = mixture_weights(counts, alpha=1.0, budget=500)
        assert w1["a"][0] == pytest.approx(0.2) and w1["b"][0] == pytest.approx(0.8)
        w0 = mixture_weights(counts, alpha=0.0, budget=500)
        assert w0["a"][0] == w0["b"][0] == 0.5
        # rates clamp at 1.0: uniform weights over-allocate the small source
        assert w0["a"][1] == 1.0

    def test_sample_deterministic_and_flattening(self, spark):
        rows = [(i, "big" if i % 5 else "small") for i in range(1000)]
        df = spark.createDataFrame(rows, "doc_id long, src string")
        out1 = sorted(r["doc_id"] for r in mixture_sample(df, "src", alpha=0.5, budget=400).collect())
        out2 = sorted(r["doc_id"] for r in mixture_sample(df, "src", alpha=0.5, budget=400).collect())
        assert out1 == out2 and len(out1) > 0
        kept = (
            mixture_sample(df, "src", alpha=0.5, budget=400)
            .groupBy("src").count().collect()
        )
        frac = {r["src"]: r["count"] for r in kept}
        # temperature sampling keeps a HIGHER fraction of the small source
        assert frac["small"] / 200 > frac["big"] / 800
