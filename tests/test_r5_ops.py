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


class TestFunnel:
    @pytest.fixture()
    def steps_df(self, spark):
        rows = [
            # user 1: full ordered funnel
            (1, "view", "2024-01-01 00:00:01"),
            (1, "click", "2024-01-01 00:00:02"),
            (1, "purchase", "2024-01-01 00:00:03"),
            # user 2: click BEFORE view — depth stops at 1 (view only)
            (2, "click", "2024-01-01 00:00:01"),
            (2, "view", "2024-01-01 00:00:02"),
            # user 3: repeats step 1, never advances
            (3, "view", "2024-01-01 00:00:01"),
            (3, "view", "2024-01-01 00:00:05"),
            # user 4: non-funnel events only — no output row
            (4, "error", "2024-01-01 00:00:01"),
            # user 5: click at the SAME ts as view — strictly-after fails
            (5, "view", "2024-01-01 00:00:01"),
            (5, "click", "2024-01-01 00:00:01"),
        ]
        return spark.createDataFrame(
            rows, "user_id long, event_type string, ts string"
        ).withColumn("ts", F.col("ts").cast("timestamp"))

    def test_depths(self, steps_df):
        from logshipper_spark.operators.aggregate import funnel

        got = {
            r["user_id"]: r["depth"]
            for r in funnel(steps_df, ["view", "click", "purchase"]).collect()
        }
        assert got == {1: 3, 2: 1, 3: 1, 5: 1}

    def test_late_first_step_recovers(self, spark):
        # view, click, view, click: the SECOND view re-arms nothing (depth
        # already past step 0) — greedy keeps the earliest chain
        from logshipper_spark.operators.aggregate import funnel

        rows = [
            (1, "click", "2024-01-01 00:00:01"),
            (1, "view", "2024-01-01 00:00:02"),
            (1, "click", "2024-01-01 00:00:03"),
        ]
        df = spark.createDataFrame(
            rows, "user_id long, event_type string, ts string"
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        (r,) = funnel(df, ["view", "click"]).collect()
        assert r["depth"] == 2


class TestCohortRetention:
    def test_matrix(self, spark):
        from logshipper_spark.operators.aggregate import cohort_retention

        rows = [
            # user 1 first seen d0, active d0 + d2 (twice — counted once)
            (1, "2024-01-01 10:00:00"),
            (1, "2024-01-03 11:00:00"),
            (1, "2024-01-03 23:00:00"),
            # user 2 same cohort, only d0
            (2, "2024-01-01 01:00:00"),
            # user 3 cohort d1, active d1
            (3, "2024-01-02 05:00:00"),
        ]
        df = spark.createDataFrame(rows, "user_id long, ts string").withColumn(
            "ts", F.col("ts").cast("timestamp")
        )
        got = {
            (r["cohort_day"], r["day_offset"]): r["n_active"]
            for r in cohort_retention(df).collect()
        }
        assert got == {
            ("2024-01-01", 0): 2,
            ("2024-01-01", 2): 1,
            ("2024-01-02", 0): 1,
        }


class TestEwmaSmooth:
    def test_exact_weights_renormalized(self, spark):
        from logshipper_spark.operators.aggregate import ewma_smooth

        rows = [
            (1, "2024-01-01 00:00:01", 10.0),
            (1, "2024-01-01 00:00:02", 20.0),
            (1, "2024-01-01 00:00:03", 30.0),
        ]
        df = spark.createDataFrame(rows, "k long, ts string, v double").withColumn(
            "ts", F.col("ts").cast("timestamp")
        )
        out = {
            r["v"]: r["ewma"]
            for r in ewma_smooth(df, ["k"], "ts", "v", alpha=0.5, k=8).collect()
        }
        # row 1: only itself; row 2: (20 + .5*10)/1.5; row 3: (30+.5*20+.25*10)/1.75
        assert out[10.0] == pytest.approx(10.0)
        assert out[20.0] == pytest.approx(25.0 / 1.5, abs=1e-6)
        assert out[30.0] == pytest.approx(42.5 / 1.75, abs=1e-6)

    def test_truncation_window_k2(self, spark):
        from logshipper_spark.operators.aggregate import ewma_smooth

        rows = [(1, f"2024-01-01 00:00:0{i}", float(i)) for i in range(1, 5)]
        df = spark.createDataFrame(rows, "k long, ts string, v double").withColumn(
            "ts", F.col("ts").cast("timestamp")
        )
        out = {
            r["v"]: r["ewma"]
            for r in ewma_smooth(df, ["k"], "ts", "v", alpha=0.5, k=2).collect()
        }
        # k=2 sees only (v, lag1): row 4 = (4 + .5*3)/1.5
        assert out[4.0] == pytest.approx(5.5 / 1.5, abs=1e-6)


class TestCharEntropy:
    def test_known_values(self, spark):
        from logshipper_spark.functions.textstats import char_entropy_pandas

        df = spark.createDataFrame(
            [("aaaa",), ("ab",), ("abcd",), ("",)], "t string"
        )
        ent = char_entropy_pandas()
        got = [r["e"] for r in df.select(ent(F.col("t")).alias("e")).collect()]
        assert got[0] == 0.0
        assert got[1] == pytest.approx(1.0)
        assert got[2] == pytest.approx(2.0)
        assert got[3] == 0.0

    def test_no_negative_zero(self, spark):
        from logshipper_spark.functions.textstats import char_entropy_pandas

        df = spark.createDataFrame([("x",)], "t string")
        ent = char_entropy_pandas()
        (r,) = df.select(ent(F.col("t")).alias("e")).collect()
        assert str(r["e"]) == "0.0"


class TestWeightedSample:
    def test_size_determinism_and_bias(self, spark):
        from logshipper_spark.functions.textstats import weighted_sample

        # 200 light docs (w=1) vs 200 heavy (w=50): heavies must dominate
        rows = [(i, 1 if i < 200 else 50) for i in range(400)]
        df = spark.createDataFrame(rows, "doc_id long, n_chars long")
        a = {r["doc_id"] for r in weighted_sample(df, "n_chars", k=40).collect()}
        b = {r["doc_id"] for r in weighted_sample(df, "n_chars", k=40).collect()}
        assert a == b and len(a) == 40  # deterministic, exact k
        n_heavy = sum(1 for i in a if i >= 200)
        assert n_heavy >= 30  # P(heavy) ≈ 50/51 per slot

    def test_without_replacement(self, spark):
        from logshipper_spark.functions.textstats import weighted_sample

        df = spark.createDataFrame(
            [(i, 10) for i in range(5)], "doc_id long, n_chars long"
        )
        out = weighted_sample(df, "n_chars", k=10).collect()
        assert len(out) == 5  # never more than the population
        assert len({r["doc_id"] for r in out}) == 5


class TestChunkText:
    def test_overlap_and_tail(self, spark):
        from logshipper_spark.functions.textstats import chunk_text

        text = " ".join(f"t{i}" for i in range(25))  # 25 tokens
        df = spark.createDataFrame([(1, text), (2, "  "), (3, "")],
                                   "doc_id long, text string")
        got = {r["chunk_idx"]: r for r in chunk_text(df, size=10, stride=5).collect()}
        # starts 0,5,10,15,20 → 5 chunks, all for doc 1
        assert set(got) == {0, 1, 2, 3, 4}
        assert got[0]["chunk"].split() == [f"t{i}" for i in range(10)]
        assert got[1]["chunk"].split() == [f"t{i}" for i in range(5, 15)]
        assert got[4]["chunk"].split() == [f"t{i}" for i in range(20, 25)]
        assert got[4]["n_toks"] == 5  # short tail window
        assert all(r["doc_id"] == 1 for r in got.values())  # empty docs absent

    def test_whitespace_normalization(self, spark):
        from logshipper_spark.functions.textstats import chunk_text

        df = spark.createDataFrame([(1, "  a   b  c ")], "doc_id long, text string")
        out = chunk_text(df, size=2, stride=2).collect()
        assert sorted(r["chunk"] for r in out) == ["a b", "c"]


class TestTrailingRate:
    def test_window_membership(self, spark):
        from logshipper_spark.operators.aggregate import trailing_rate

        rows = [
            (1, 1, 1.0, "2024-01-01 00:00:00"),
            (2, 1, 2.0, "2024-01-01 00:05:00"),
            (3, 1, 4.0, "2024-01-01 00:10:00"),   # 600s: rows 1-3 in frame
            (4, 1, 8.0, "2024-01-01 00:20:01"),   # >600s after row 3 → alone
            (5, 2, 1.0, "2024-01-01 00:10:00"),   # other key, isolated
        ]
        df = spark.createDataFrame(
            rows, "event_id long, user_id long, value double, ts string"
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        got = {r["event_id"]: r for r in
               trailing_rate(df, "user_id", "ts", "value", horizon_s=600.0).collect()}
        assert (got[3]["trail_n"], got[3]["trail_sum"]) == (3, 7.0)
        assert (got[4]["trail_n"], got[4]["trail_sum"]) == (1, 8.0)
        assert got[5]["trail_n"] == 1

    def test_boundary_inclusive(self, spark):
        from logshipper_spark.operators.aggregate import trailing_rate

        # second row exactly horizon later → first row STILL in frame
        rows = [(1, 1, 1.0, "2024-01-01 00:00:00"), (2, 1, 1.0, "2024-01-01 00:10:00")]
        df = spark.createDataFrame(
            rows, "event_id long, user_id long, value double, ts string"
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        got = {r["event_id"]: r["trail_n"] for r in
               trailing_rate(df, "user_id", "ts", "value", horizon_s=600.0).collect()}
        assert got[2] == 2


class TestCanonicalPick:
    def test_argmax_and_ties(self, spark):
        from logshipper_spark.functions.dedup import canonical_pick

        comps = spark.createDataFrame(
            [(1, 1), (2, 1), (3, 1), (4, 4), (5, 4)], "id long, component long"
        )
        docs = spark.createDataFrame(
            [(1, 10), (2, 30), (3, 30), (4, 7), (5, 7)], "doc_id long, n_chars long"
        )
        got = {r["component"]: r for r in canonical_pick(comps, docs).collect()}
        # component 1: max score 30 tied between ids 2,3 → lowest id wins
        assert got[1]["canonical_id"] == 2 and got[1]["n_members"] == 3
        assert got[1]["canonical_score"] == 30
        assert got[4]["canonical_id"] == 4 and got[4]["n_members"] == 2


class TestChatExport:
    def test_payload_shape_and_order(self, spark):
        from logshipper_spark.operators.dialog import chat_export

        rows = [
            (2, 1, "assistant", "hi there", "2024-01-01 00:00:02"),
            (1, 1, "user", "hello", "2024-01-01 00:00:01"),
            (3, 2, "user", 'say "x"', "2024-01-01 00:00:01"),
        ]
        df = spark.createDataFrame(
            rows, "event_id long, user_id long, role string, text string, ts string"
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        got = {r["user_id"]: r for r in chat_export(
            df, "user_id", "ts", "role", "text", tiebreak_cols=["event_id"]
        ).collect()}
        assert got[1]["n_turns"] == 2
        assert got[1]["payload"] == (
            '[{"role":"user","content":"hello"},'
            '{"role":"assistant","content":"hi there"}]'
        )
        # JSON escaping of quotes survives
        assert got[2]["payload"] == '[{"role":"user","content":"say \\"x\\""}]'

    def test_tiebreak_within_same_ts(self, spark):
        from logshipper_spark.operators.dialog import chat_export

        rows = [
            (2, 1, "b", "second", "2024-01-01 00:00:01"),
            (1, 1, "a", "first", "2024-01-01 00:00:01"),
        ]
        df = spark.createDataFrame(
            rows, "event_id long, user_id long, role string, text string, ts string"
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        out = chat_export(df, "user_id", "ts", "role", "text",
                          tiebreak_cols=["event_id"]).collect()[0]
        assert out["payload"].index('"first"') < out["payload"].index('"second"')


class TestKeySkewProfile:
    def test_uniform_vs_hub(self, spark):
        from logshipper_spark.functions.sketches import key_skew_profile

        uniform = spark.createDataFrame(
            [(i % 10,) for i in range(100)], "k long"
        )
        u = key_skew_profile(uniform, "k").collect()[0]
        assert u["n_keys"] == 10 and u["total"] == 100 and u["max_n"] == 10
        assert u["gini"] == pytest.approx(0.0, abs=1e-6)
        # hub: key 0 owns 91 of 100 rows
        hub = spark.createDataFrame(
            [(0,)] * 91 + [(i,) for i in range(1, 10)], "k long"
        )
        h = key_skew_profile(hub, "k").collect()[0]
        assert h["top_key"] == 0 and h["max_share"] == pytest.approx(0.91, abs=1e-6)
        assert h["gini"] > 0.7


class TestExtractEntities:
    def test_counts_and_negatives(self, spark):
        from logshipper_spark.functions.textstats import extract_entities

        df = spark.createDataFrame(
            [
                (1, "mail a@b.co and c@d.org from 10.1.2.3"),
                (2, "upgrade 1.2.3.4 to 99.300.1.2"),  # version strings, NOT ips
                (3, "call +1 555-123-4567 card 4111 1111 1111 1111"),
                (4, "nothing here"),
            ],
            "doc_id long, text string",
        )
        got = {r["doc_id"]: r for r in extract_entities(df).collect()}
        assert (got[1]["n_email"], got[1]["n_ipv4"]) == (2, 1)
        # 1.2.3.4 IS a valid dotted quad (all octets <= 255); 99.300.1.2 is not
        assert got[2]["n_ipv4"] == 1
        assert got[3]["n_phone"] == 1 and got[3]["n_cc"] == 1
        assert all(got[4][c] == 0 for c in got[4].asDict() if c.startswith("n_"))


class TestSessionStats:
    def test_rollup(self, spark):
        from logshipper_spark.operators.aggregate import session_stats

        rows = [
            (1, 1, 1.0, "2024-01-01 00:00:00"),
            (2, 1, 2.0, "2024-01-01 00:10:00"),
            (3, 1, 4.0, "2024-01-01 02:00:00"),  # >30min gap → new session
            (4, 2, 8.0, "2024-01-01 00:00:00"),
        ]
        df = spark.createDataFrame(
            rows, "event_id long, user_id long, value double, ts string"
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        out = {(r["user_id"], r["session_id"]): r for r in session_stats(
            df, "user_id", "ts", gap_s=1800.0, value_col="value",
            tiebreak_cols=["event_id"],
        ).collect()}
        assert out[(1, 1)]["n_events"] == 2
        assert out[(1, 1)]["duration_s"] == pytest.approx(600.0)
        assert out[(1, 1)]["total_value"] == pytest.approx(3.0)
        assert out[(1, 2)]["n_events"] == 1 and out[(1, 2)]["duration_s"] == 0.0
        assert out[(2, 1)]["total_value"] == pytest.approx(8.0)


class TestWinsorize:
    def test_clamps_tails(self, spark):
        from logshipper_spark.functions.textstats import winsorize

        df = spark.createDataFrame(
            [(i, float(i)) for i in range(1, 101)], "event_id long, value double"
        )
        got = {r["event_id"]: r["value_w"] for r in
               winsorize(df, "value", 0.05, 0.95).collect()}
        # quantile_disc rank max(1, ceil(p*n)): p05 → 5th value = 5.0, p95 → 95.0
        assert got[1] == 5.0 and got[3] == 5.0
        assert got[100] == 95.0 and got[97] == 95.0
        assert got[50] == 50.0  # middle untouched


class TestSkewSaltedJoin:
    def test_flag_equality_with_hot_key(self, spark):
        from logshipper_spark.operators.enrich import skew_salted_join

        # hub key 0 owns 500 of 520 big rows
        big = spark.createDataFrame(
            [(0, i) for i in range(500)] + [(k, 1000 + k) for k in range(1, 21)],
            "k long, payload long",
        )
        med = spark.createDataFrame(
            [(k, f"dim{k}") for k in range(0, 15)], "k long, attr string"
        )
        plain = {tuple(r) for r in big.join(med, "k").collect()}
        salted = {tuple(r) for r in skew_salted_join(big, med, "k", 8).collect()}
        assert salted == plain and len(plain) == 500 + 14

    def test_left_join_misses_survive(self, spark):
        from logshipper_spark.operators.enrich import skew_salted_join

        big = spark.createDataFrame([(1, 1), (9, 2)], "k long, payload long")
        med = spark.createDataFrame([(1, "x")], "k long, attr string")
        out = {r["k"]: r["attr"] for r in
               skew_salted_join(big, med, "k", 4, how="left").collect()}
        assert out == {1: "x", 9: None}


class TestTableDiff:
    def test_statuses(self, spark):
        from logshipper_spark.sources.tableio import table_diff

        old = spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, None)], "id long, v string"
        )
        new = spark.createDataFrame(
            [(2, "B"), (3, "now-set"), (4, "d")], "id long, v string"
        )
        got = {r["id"]: r["status"] for r in
               table_diff(old, new, ["id"], ["v"]).collect()}
        # 1 removed, 2 changed, 3 NULL→value = changed, 4 added; unchanged absent
        assert got == {1: "removed", 2: "changed", 3: "changed", 4: "added"}

    def test_unchanged_rows_absent(self, spark):
        from logshipper_spark.sources.tableio import table_diff

        df = spark.createDataFrame([(1, "same"), (2, "same2")], "id long, v string")
        assert table_diff(df, df, ["id"], ["v"]).count() == 0


class TestRRFFusion:
    def test_fusion_and_missing_ids(self, spark):
        from logshipper_spark.functions.ranking import rrf_fusion

        a = spark.createDataFrame([(1, 1), (2, 2), (3, 3)], "doc_id long, rank int")
        b = spark.createDataFrame([(3, 1), (2, 2), (9, 3)], "doc_id long, rank int")
        got = {r["doc_id"]: r for r in rrf_fusion(a, b, "doc_id", k=60).collect()}
        # doc 2 in both at rank 2: 2/(62); doc 3: 1/63 + 1/61
        assert got[2]["rrf_score"] == pytest.approx(2 / 62, abs=1e-9)
        assert got[3]["rrf_score"] == pytest.approx(1 / 63 + 1 / 61, abs=1e-9)
        # one-list-only ids survive with the single contribution
        assert got[1]["rrf_score"] == pytest.approx(1 / 61, abs=1e-9)
        assert got[9]["rrf_score"] == pytest.approx(1 / 63, abs=1e-9)
        assert got[9]["rank_a"] is None
        # doc 3 (rank 1 in one list) outranks doc 1 and doc 9
        assert got[3]["rrf_score"] > got[1]["rrf_score"] > got[9]["rrf_score"]


class TestNtileBuckets:
    def test_decile_fill_rule(self, spark):
        from logshipper_spark.functions.ranking import ntile_buckets

        # 23 rows in one group: ntile(10) → buckets 1-3 get 3 rows, 4-10 get 2
        df = spark.createDataFrame(
            [(i, "g", float(i)) for i in range(23)], "id long, g string, v double"
        )
        got = {r["bucket"]: r for r in ntile_buckets(
            df, "v", n_buckets=10, group_col="g", tiebreak_col="id"
        ).collect()}
        assert [got[b]["n"] for b in range(1, 11)] == [3, 3, 3, 2, 2, 2, 2, 2, 2, 2]
        assert got[1]["min_value"] == 0.0 and got[10]["max_value"] == 22.0

    def test_groups_bucket_independently(self, spark):
        from logshipper_spark.functions.ranking import ntile_buckets

        rows = [(i, "a", float(i)) for i in range(4)] + [
            (10 + i, "b", float(100 + i)) for i in range(4)
        ]
        df = spark.createDataFrame(rows, "id long, g string, v double")
        got = ntile_buckets(df, "v", n_buckets=2, group_col="g",
                            tiebreak_col="id").collect()
        assert len(got) == 4  # 2 groups × 2 buckets
        assert all(r["n"] == 2 for r in got)


class TestNgramDiversity:
    def test_templated_vs_diverse(self, spark):
        from logshipper_spark.functions.vocab import ngram_diversity

        df = spark.createDataFrame(
            [
                (1, "rep", "a b a b a b"),   # bigrams: ab ba ab ba ab → 2 distinct / 5
                (2, "div", "p q r s t u"),   # 5 distinct / 5
            ],
            "doc_id long, lang string, text string",
        )
        got = {r["grp"]: r for r in ngram_diversity(df, "text", group_col="lang").collect()}
        assert got["rep"]["total_grams"] == 5 and got["rep"]["distinct_grams"] == 2
        assert got["rep"]["ttr"] == pytest.approx(0.4, abs=1e-6)
        assert got["div"]["ttr"] == pytest.approx(1.0, abs=1e-6)

    def test_no_cross_document_grams(self, spark):
        from logshipper_spark.functions.vocab import ngram_diversity

        df = spark.createDataFrame(
            [(1, "x", "a"), (2, "x", "b")], "doc_id long, lang string, text string"
        )
        assert ngram_diversity(df, "text", group_col="lang").count() == 0


class TestSplitAssign:
    def test_proportions_determinism_growth_stability(self, spark):
        from logshipper_spark.functions.textstats import split_assign

        df = spark.createDataFrame([(i,) for i in range(2000)], "doc_id long")
        got = {r["doc_id"]: r["split"] for r in split_assign(df).collect()}
        from collections import Counter

        c = Counter(got.values())
        assert 0.85 < c["train"] / 2000 < 0.95
        assert 0.02 < c["val"] / 2000 < 0.08
        assert 0.02 < c["test"] / 2000 < 0.08
        # growth stability: the same ids keep their split in a bigger corpus
        big = spark.createDataFrame([(i,) for i in range(4000)], "doc_id long")
        got2 = {r["doc_id"]: r["split"] for r in split_assign(big).collect()}
        assert all(got2[i] == got[i] for i in range(2000))

    def test_custom_weights_two_way(self, spark):
        from logshipper_spark.functions.textstats import split_assign

        df = spark.createDataFrame([(i,) for i in range(500)], "doc_id long")
        got = [r["split"] for r in split_assign(
            df, weights=[("a", 0.5), ("b", 0.5)]
        ).collect()]
        from collections import Counter

        c = Counter(got)
        assert set(c) == {"a", "b"} and 150 < c["a"] < 350


class TestComponentSplit:
    def test_cluster_members_share_split(self, spark):
        from logshipper_spark.functions.textstats import component_split

        comps = spark.createDataFrame(
            [(i, i // 5) for i in range(100)], "id long, component long"
        )
        got = component_split(comps).collect()
        by_comp = {}
        for r in got:
            by_comp.setdefault(r["component"], set()).add(r["split"])
        # every component maps to exactly ONE split
        assert all(len(s) == 1 for s in by_comp.values())
        assert len({next(iter(s)) for s in by_comp.values()}) >= 2  # not all same


class TestDecayedCount:
    def test_decay_math(self, spark):
        from logshipper_spark.operators.aggregate import decayed_count

        rows = [
            (1, 1, "2024-01-01 01:00:00"),  # T itself → weight 1
            (2, 1, "2024-01-01 00:00:00"),  # one half-life → 0.5
            (3, 2, "2023-12-31 15:00:00"),  # ten half-lives → ~0.000977
        ]
        df = spark.createDataFrame(
            rows, "event_id long, user_id long, ts string"
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        got = {r["user_id"]: r for r in
               decayed_count(df, "user_id", "ts", half_life_s=3600.0).collect()}
        assert got[1]["decayed"] == pytest.approx(1.5, abs=1e-6)
        assert got[2]["decayed"] == pytest.approx(2 ** -10, abs=1e-6)
        assert got[1]["n"] == 2


class TestGroupCoherence:
    def test_tight_vs_scattered(self, spark):
        from logshipper_spark.functions.similarity import group_coherence

        rows = []
        # label 0: 10 identical unit vectors → coherence 1
        for i in range(10):
            rows.append((i, 0, [1.0, 0.0, 0.0, 0.0]))
        # label 1: orthogonal pairs → mean = (.5,.5,0,0), norm ≈ 0.7071
        for i in range(5):
            rows.append((100 + 2 * i, 1, [1.0, 0.0, 0.0, 0.0]))
            rows.append((101 + 2 * i, 1, [0.0, 1.0, 0.0, 0.0]))
        df = spark.createDataFrame(rows, "vec_id long, label int, embedding array<float>")
        got = {r["label"]: r for r in group_coherence(df, "label").collect()}
        assert got[0]["coherence"] == pytest.approx(1.0, abs=1e-6)
        assert got[0]["n"] == 10
        assert got[1]["coherence"] == pytest.approx(0.707107, abs=1e-6)


class TestFreshnessReport:
    def test_lags(self, spark):
        from logshipper_spark.operators.aggregate import freshness_report

        rows = [
            (1, "live", "2024-01-01 10:00:00"),
            (2, "live", "2024-01-01 09:00:00"),
            (3, "stuck", "2024-01-01 08:00:00"),
        ]
        df = spark.createDataFrame(
            rows, "event_id long, event_type string, ts string"
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        got = {r["event_type"]: r for r in
               freshness_report(df, "event_type", "ts").collect()}
        assert got["live"]["lag_s"] == 0.0 and got["live"]["n"] == 2
        assert got["stuck"]["lag_s"] == pytest.approx(7200.0)
        assert got["live"]["max_ts"].startswith("2024-01-01 10:00:00")


class TestRandomizedContracts:
    """Seeded randomized differentials for the two flag-equality contracts
    added late in r5 — cheap analogues of the asof/property suites."""

    def test_table_diff_recovers_planted_mutations(self, spark):
        import random

        from logshipper_spark.sources.tableio import table_diff

        rng = random.Random(7)
        base = {i: f"v{rng.randrange(1000)}" for i in range(400)}
        removed = set(rng.sample(sorted(base), 40))
        added = {1000 + i: f"n{i}" for i in range(25)}
        changed = set(rng.sample([k for k in base if k not in removed], 30))
        old_rows = [(k, v) for k, v in base.items()]
        new_rows = [
            (k, v + "_mut" if k in changed else v)
            for k, v in base.items()
            if k not in removed
        ] + list(added.items())
        old = spark.createDataFrame(old_rows, "id long, v string")
        new = spark.createDataFrame(new_rows, "id long, v string")
        got = {r["id"]: r["status"] for r in table_diff(old, new, ["id"], ["v"]).collect()}
        assert {k for k, s in got.items() if s == "removed"} == removed
        assert {k for k, s in got.items() if s == "added"} == set(added)
        assert {k for k, s in got.items() if s == "changed"} == changed

    def test_salted_join_equals_plain_across_bucket_counts(self, spark):
        import random

        from logshipper_spark.operators.enrich import skew_salted_join

        rng = random.Random(11)
        big = spark.createDataFrame(
            [(rng.randrange(30), i) for i in range(600)], "k long, payload long"
        )
        med = spark.createDataFrame(
            [(k, f"d{k}") for k in range(0, 40, 2)], "k long, attr string"
        )
        plain = {tuple(r) for r in big.join(med, "k").collect()}
        for buckets in (1, 3, 16):
            salted = {tuple(r) for r in
                      skew_salted_join(big, med, "k", buckets).collect()}
            assert salted == plain, f"buckets={buckets}"


class TestR5ReviewFixes:
    """Pins for the r5 code-review findings — each was a latent bug the
    null-free/collision-free testdata could not catch."""

    def test_salted_join_rejects_outer_joins(self, spark):
        from logshipper_spark.operators.enrich import skew_salted_join

        big = spark.createDataFrame([(1, 1)], "k long, payload long")
        med = spark.createDataFrame([(1, "x"), (2, "y")], "k long, attr string")
        for how in ("right", "full", "full_outer", "outer"):
            with pytest.raises(ValueError):
                skew_salted_join(big, med, "k", 4, how=how)
        # anti stays allowed and exact: big keys with no medium match
        anti = skew_salted_join(
            spark.createDataFrame([(1, 1), (9, 2)], "k long, payload long"),
            med, "k", 4, how="left_anti",
        ).collect()
        assert [r["k"] for r in anti] == [9]

    def test_weighted_sample_large_weights_not_id_biased(self, spark):
        from logshipper_spark.functions.textstats import weighted_sample

        # all weights equal at 1e6: a 6-place-rounded key would collapse to
        # ~15 values and the id tiebreak would hand the sample to the
        # lowest ids; 12-place keys keep it hash-ordered
        df = spark.createDataFrame(
            [(i, 1_000_000) for i in range(1000)], "doc_id long, n_chars long"
        )
        got = {r["doc_id"] for r in weighted_sample(df, "n_chars", k=50).collect()}
        assert got != set(range(50))  # NOT the k lowest ids
        assert len(got) == 50

    def test_winsorize_keeps_nulls_null(self, spark):
        from logshipper_spark.functions.textstats import winsorize

        df = spark.createDataFrame(
            [(i, float(i)) for i in range(1, 100)] + [(999, None)],
            "event_id long, value double",
        )
        got = {r["event_id"]: r["value_w"] for r in
               winsorize(df, "value", 0.05, 0.95).collect()}
        assert got[999] is None  # NOT rewritten to the low cutoff

    def test_chat_export_preserves_null_content(self, spark):
        from logshipper_spark.operators.dialog import chat_export

        df = spark.createDataFrame(
            [(1, 1, "user", None, "2024-01-01 00:00:01")],
            "event_id long, user_id long, role string, text string, ts string",
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        out = chat_export(df, "user_id", "ts", "role", "text",
                          tiebreak_cols=["event_id"]).collect()[0]
        assert '"content":null' in out["payload"]  # field present, not dropped

    def test_table_diff_separator_realignment(self, spark):
        from logshipper_spark.sources.tableio import table_diff

        # ('a\x1fb','c') vs ('a','b\x1fc') concatenate identically under a
        # separator-joined digest — must still be reported as changed
        old = spark.createDataFrame([(1, "a\x1fb", "c")], "id long, c1 string, c2 string")
        new = spark.createDataFrame([(1, "a", "b\x1fc")], "id long, c1 string, c2 string")
        got = table_diff(old, new, ["id"], ["c1", "c2"]).collect()
        assert len(got) == 1 and got[0]["status"] == "changed"
        # and a literal sentinel-looking value is not confused with NULL
        old2 = spark.createDataFrame([(1, "<null>")], "id long, c1 string")
        new2 = spark.createDataFrame([(1, None)], "id long, c1 string")
        got2 = table_diff(old2, new2, ["id"], ["c1"]).collect()
        assert len(got2) == 1 and got2[0]["status"] == "changed"
