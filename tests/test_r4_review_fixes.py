"""Regression tests for the r4 legacy-core review findings — each test
reproduces the exact failure scenario the review verified."""

import pyspark.sql.functions as F
import pytest

from logshipper_spark.plans.spec import compile_pipeline


def make_df(spark, rows):
    return spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")


class TestRegistrySharing:
    def test_first_loaded_pipeline_resolves_later_call_targets(self, spark):
        """`pipelines or {}` swapped the still-empty shared registry for a
        private dict, so the FIRST loaded pipeline could never resolve call
        targets registered after it."""
        from logshipper_spark.plans.manager import PipelineManager

        mgr = PipelineManager()
        # 'aaa' sorts/loads first and calls 'zzz', which loads later
        mgr.load_specs({
            "aaa": [{"call": "zzz"}, {"forward": ["archive"]}],
            "zzz": [{"set": {"x": "sub-ran"}}],
        })
        df = make_df(spark, [("c1", 0, "hello")])
        out = mgr.get("aaa").apply(df).collect()
        assert out[0]["x"] == "sub-ran"


class TestEdgeGatedLag:
    def test_non_matching_rows_do_not_reset_edge_state(self, spark):
        """Reference SKIP_STEP semantics: the edge handler only sees rows
        that passed the step's match — an interleaved non-matching row must
        not reset the change detector."""
        df = make_df(spark, [
            ("c1", 0, "ERROR a"),
            ("c1", 1, "INFO b"),     # does not match; must not reset edge
            ("c1", 2, "ERROR a"),    # same as last MATCHED row -> suppressed
            ("c1", 3, "ERROR c"),    # changed -> passes
        ])
        pipe = compile_pipeline([
            {"match": "^ERROR", "edge": {"trigger": "{text}", "key": "conv_id"},
             "forward": ["alerts"]},
        ])
        routed = pipe.routed(df).where(F.col("sink") == "alerts")
        got = sorted(r["turn_idx"] for r in routed.collect())
        assert got == [0, 3], f"edge passed turns {got}"


class TestCallContinuationContext:
    def test_replace_after_call_keeps_match_context(self, spark):
        df = make_df(spark, [("c1", 0, "hello world")])
        pipe = compile_pipeline(
            [
                {"match": {"text": r"^(?P<w>\w+)"}, "call": "noop",
                 "replace": "{w}!"},
            ],
            pipelines=None,
        )
        pipe.pipelines["noop"] = compile_pipeline([{"set": {"seen": "yes"}}])
        out = pipe.apply(df).collect()[0]
        assert out["text"] == "hello! world"
        assert out["seen"] == "yes"

    def test_numeric_backref_after_call(self, spark):
        df = make_df(spark, [("c1", 0, "abc123")])
        pipe = compile_pipeline([
            {"match": {"text": r"^[a-z]+(?P<num>\d+)$"}, "call": "noop",
             "set": {"tail": "{num}"}},
        ])
        pipe.pipelines["noop"] = compile_pipeline([{"set": {"seen": "yes"}}])
        out = pipe.apply(df).collect()[0]
        assert out["tail"] == "123"


class TestForwardMultiplicity:
    def test_double_forward_delivers_twice_in_all_strategies(self, spark, tmp_path):
        from logshipper_spark.operators.route import write_fanout_per_sink
        from logshipper_spark.plans.runner import CheckpointedRunner

        df = make_df(spark, [("c1", 0, "x"), ("c2", 0, "y")])
        pipe = compile_pipeline([
            {"forward": ["archive"]},
            {"forward": ["archive"]},
        ])
        # explode strategy (Pipeline.routed): 2 rows per input
        routed = pipe.routed(df)
        assert routed.where(F.col("sink") == "archive").count() == 4

        # per-sink writer strategy
        write_fanout_per_sink(pipe.apply(df), ["archive"], str(tmp_path / "ps"),
                              n_buckets=4)
        assert spark.read.parquet(str(tmp_path / "ps" / "sink=archive")).count() == 4

        # checkpointed runner strategy
        r = CheckpointedRunner(spark, str(tmp_path / "ckpt"), n_buckets=4)
        rep = r.run(df, pipe, ["archive"], str(tmp_path / "out"), snapshot_id="s1")
        assert rep.written["archive"] == 4


class TestGrokOptionalIntGroup:
    def test_matched_row_with_empty_optional_int_group(self, spark):
        """ANSI CAST('' AS INT) must not fire; both strategies agree on null."""
        from logshipper_spark.operators.parse import GrokPattern, grok_native, grok_pandas

        pats = [GrokPattern("evt", r"^evt(?: took (?P<ms>\d+)ms)?$", {"ms": "int"})]
        df = spark.createDataFrame(
            [("c1", 0, "evt took 15ms"), ("c1", 1, "evt"), ("c1", 2, "unmatched")],
            "conv_id string, turn_idx int, text string",
        )
        for fn in (grok_native, grok_pandas):
            rows = {r["turn_idx"]: r for r in fn(df, patterns=pats).collect()}
            assert rows[0]["ms"] == 15
            assert rows[1]["pattern_name"] == "evt" and rows[1]["ms"] is None
            assert rows[2]["pattern_name"] is None and rows[2]["ms"] is None


class TestPyexprEscapesAndConstants:
    @pytest.mark.parametrize("expr", [
        "text.to_string(buf='/tmp/pwn')",
        "text.values.dump('/tmp/pwn')",
        "text.to_numpy().tofile('/tmp/pwn')",
    ])
    def test_file_write_escapes_rejected(self, spark, expr):
        df = make_df(spark, [("c1", 0, "hello")])
        with pytest.raises(ValueError, match="python rewrite"):
            pipe = compile_pipeline([{"python": {"field": "text", "expr": expr}}])
            pipe.surviving(df).collect()

    def test_column_free_constant_expr(self, spark):
        df = make_df(spark, [("c1", 0, "a"), ("c1", 1, "b")])
        pipe = compile_pipeline([{"python": {"field": "flag", "expr": "'on'"}}])
        out = pipe.surviving(df).collect()
        assert all(r["flag"] == "on" for r in out)


class TestPipelineSinks:
    def test_sinks_derived_including_call_targets(self, spark):
        from logshipper_spark.plans.manager import PipelineManager
        from logshipper_spark.plans.spec import pipeline_sinks

        mgr = PipelineManager()
        mgr.load_specs({
            "main": [{"match": "^A", "forward": ["alerts"]},
                     {"call": "side"}, {"forward": ["archive"]}],
            "side": [{"forward": ["audit", "alerts"]}],
        })
        assert pipeline_sinks(mgr.get("main")) == ["alerts", "audit", "archive"]


class TestReadSinkIncrementalCommittedOnly:
    def test_uncommitted_partial_dir_not_exposed(self, spark, transcripts, tmp_path):
        import pytest as _pytest

        from logshipper_spark.plans.runner import CheckpointedRunner

        table = str(tmp_path / "table")
        out = str(tmp_path / "out")
        transcripts.limit(40).write.parquet(f"{table}/part=1")
        r = CheckpointedRunner(spark, str(tmp_path / "ckpt"))
        pipe = compile_pipeline([{"forward": ["archive"]}, {"forward": ["errors"]}])
        # kill after the first sink commits: the second sink's ingest dir
        # may exist partially but has no marker
        with _pytest.raises(RuntimeError, match="injected failure"):
            r.run_incremental(table, pipe, ["errors", "archive"], out, fail_after=1)
        assert r.read_sink_incremental(out, "errors").count() > 0   # committed
        with _pytest.raises(FileNotFoundError, match="no committed"):
            r.read_sink_incremental(out, "archive")                  # uncommitted
        # retry commits the rest; now readable
        r.run_incremental(table, pipe, ["errors", "archive"], out)
        assert r.read_sink_incremental(out, "archive").count() > 0
