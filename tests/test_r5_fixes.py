"""Round-5 review fixes (VERDICT/ADVICE r4).

* edge gate: a gated NULL trigger is a state value — null-safe compare,
  value→NULL→value fires twice (ADVICE r4 #2);
* read_sink_incremental: duplicate committed paths read once (ADVICE r4 #1);
* pyexpr constant path: driver-side eval is bounded (ADVICE r4 #4);
* histogram_cutoff(resolution=...): explicit row bound, cutoff within one
  bucket BELOW exact (VERDICT r4 next #4).
"""

import pyspark.sql.functions as F
import pytest

from logshipper_spark.functions.curation import IncrementalCurator, histogram_cutoff
from logshipper_spark.operators.pyexpr import compile_python_rewrite
from logshipper_spark.plans import spec as spec_mod
from logshipper_spark.plans.runner import CheckpointedRunner
from logshipper_spark.plans.spec import compile_pipeline


class TestEdgeNullTrigger:
    def test_gated_null_trigger_is_state(self, spark, monkeypatch):
        """Templates coalesce missing fields to "" so the public spec API
        never renders a NULL trigger; bypass the template layer to pin the
        defense-in-depth gate semantics: value→NULL fires, NULL→NULL does
        not, NULL→value fires (the old `trig != prev` evaluated to NULL on
        either side being NULL, so those transitions were dropped)."""
        monkeypatch.setattr(
            spec_mod, "_compile_template",
            lambda tmpl, cols, m: cols[tmpl.strip("{}")]
            if tmpl.strip("{}") in cols else F.lit(tmpl),
        )
        rows = [
            ("c1", 0, "user", "A", None, None),
            ("c1", 1, "user", None, None, None),
            ("c1", 2, "user", None, None, None),
            ("c1", 3, "user", "A", None, None),
        ]
        df = spark.createDataFrame(
            rows,
            "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
        )
        pipe = compile_pipeline(
            [{"edge": {"trigger": "{text}", "key": "conv_id"}, "forward": ["chg"]}]
        )
        routed = sorted(r["turn_idx"] for r in pipe.routed(df).collect())
        assert routed == [0, 1, 3]

    def test_empty_string_trigger_through_public_api(self, spark):
        """NULL text renders "" through the template layer; ""⇄value
        transitions fire like any other change."""
        rows = [("c1", 0, "A"), ("c1", 1, None), ("c1", 2, "A"), ("c1", 3, "A")]
        rows = [(c, i, "user", t, None, None) for c, i, t in rows]
        df = spark.createDataFrame(
            rows,
            "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
        )
        pipe = compile_pipeline(
            [{"edge": {"trigger": "{text}", "key": "conv_id"}, "forward": ["chg"]}]
        )
        routed = sorted(r["turn_idx"] for r in pipe.routed(df).collect())
        assert routed == [0, 1, 2]


class TestReadSinkIncrementalDedup:
    def test_duplicate_committed_paths_read_once(self, spark, transcripts, tmp_path):
        """Plain run() commits (sink_subdir='') record the same
        'out/sink=<s>' path under EVERY snapshot; the reader must not
        double-count rows by passing the path twice (ADVICE r4 #1)."""
        pipe = compile_pipeline([{"forward": ["archive"]}])
        out = str(tmp_path / "out")
        r = CheckpointedRunner(spark, str(tmp_path / "ckpt"))
        n = transcripts.count()
        r.run(transcripts, pipe, ["archive"], out, snapshot_id="snapA")
        # second snapshot overwrites the same sink dir, records the same path
        r.run(transcripts, pipe, ["archive"], out, snapshot_id="snapB")
        got = r.read_sink_incremental(out, "archive")
        assert got.count() == n


class TestPyexprConstantBounds:
    def _cols(self, spark):
        df = spark.range(1).withColumn("value", F.col("id").cast("double"))
        return df, {"value": df["value"]}

    def test_pow_rejected_in_constant_expr(self, spark):
        _, cols = self._cols(spark)
        with pytest.raises(ValueError, match="column-free"):
            compile_python_rewrite({"expr": "9 ** 9 ** 9", "type": "long"}, cols)

    def test_pow_still_allowed_with_columns(self, spark):
        df, cols = self._cols(spark)
        col = compile_python_rewrite({"expr": "value ** 2 + 1", "type": "double"}, cols)
        assert df.select(col.alias("v")).first()["v"] == 1.0

    def test_oversized_constant_string_rejected(self, spark):
        _, cols = self._cols(spark)
        with pytest.raises(ValueError, match="too large"):
            compile_python_rewrite({"expr": "'abc' * 30000"}, cols)

    def test_small_constant_still_folds(self, spark):
        df, cols = self._cols(spark)
        col = compile_python_rewrite({"expr": "1 + 2 * 3", "type": "int"}, cols)
        assert df.select(col.alias("v")).first()["v"] == 7


class TestBoundedHistogram:
    def _hist(self, spark, values):
        return spark.createDataFrame(
            [(float(v), 1) for v in values], "q_score double, cnt long"
        )

    def test_bucketized_cutoff_within_one_bucket_below_exact(self, spark):
        import random

        rng = random.Random(5)
        values = [round(rng.random(), 6) for _ in range(2000)]
        for keep in (0.9, 0.5, 0.1):
            exact = histogram_cutoff(self._hist(spark, values), keep)
            res = 1e-3
            bucketized = histogram_cutoff(
                self._hist(spark, values), keep, resolution=res
            )
            assert bucketized <= exact + 1e-12
            assert bucketized >= exact - res - 1e-12

    def test_curator_resolution_bounds_state_rows(self, spark, tmp_path):
        docs = spark.range(500).select(
            F.col("id").alias("doc_id"),
            F.lit("en").alias("lang"),
            F.concat(F.lit("the quick brown fox document number "),
                     F.col("id").cast("string")).alias("text"),
        )
        bench = docs.where(F.col("doc_id") % 50 == 0)
        with IncrementalCurator(
            spark, str(tmp_path / "work"), bench, keep_fraction=0.5, resolution=1e-2
        ) as cur:
            cur.observe(docs)
            hist = spark.read.parquet(str(tmp_path / "work" / "_score_hist"))
            # explicit bound: a [0,1] score at resolution 1e-2 → ≤101 buckets
            assert hist.select("q_score").distinct().count() <= 101
            # superset guarantee: bucketized cutoff never ABOVE exact, so
            # `score >= cutoff` keeps at least the exact-keep set
            with IncrementalCurator(
                spark, str(tmp_path / "exact"), bench, keep_fraction=0.5
            ) as cur_exact:
                cur_exact.observe(docs)
                assert cur.cutoff() <= cur_exact.cutoff() + 1e-12
