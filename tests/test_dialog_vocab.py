"""Dialog/sequence analytics (context windows, transition matrix, lint)
and vocabulary statistics (Zipf table, bigram LM, k-per-group sampling).
Oracle parity lives in queries.py; these pin frame semantics, boundary
behavior, and the smoothing arithmetic on planted rows."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from logshipper_spark.functions.textstats import group_sample_k
from logshipper_spark.functions.vocab import bigram_lm, vocab_zipf
from logshipper_spark.operators.dialog import (
    context_windows,
    sequence_lint,
    transition_matrix,
)


@pytest.fixture()
def seq_df(spark):
    rows = [
        # user 1: a b a b — clean alternation, 1s apart
        (1, 1, "a", "2024-01-01 00:00:01"),
        (2, 1, "b", "2024-01-01 00:00:02"),
        (3, 1, "a", "2024-01-01 00:00:03"),
        (4, 1, "b", "2024-01-01 00:00:04"),
        # user 2: a a a — repeats, with one 2h gap
        (5, 2, "a", "2024-01-01 00:00:01"),
        (6, 2, "a", "2024-01-01 00:00:02"),
        (7, 2, "a", "2024-01-01 02:00:03"),
    ]
    return spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))


class TestContextWindows:
    def test_bounded_frame_and_empty_context(self, seq_df):
        out = {
            r["event_id"]: r["context"]
            for r in context_windows(
                seq_df, "user_id", "ts", "event_type", k=2,
                tiebreak_cols=["event_id"],
            ).collect()
        }
        assert out[1] == ""            # first row: empty frame → ''
        assert out[2] == "a"
        assert out[3] == "a b"
        assert out[4] == "b a"         # frame is the LAST k, ordered
        assert out[5] == ""

    def test_target_filter(self, seq_df):
        got = context_windows(
            seq_df, "user_id", "ts", "event_type", k=2,
            target="b", tiebreak_cols=["event_id"],
        ).collect()
        assert sorted(r["event_id"] for r in got) == [2, 4]
        assert all(r["target_label"] == "b" for r in got)


class TestTransitionMatrix:
    def test_counts_and_probs(self, seq_df):
        got = {
            (r["prev_state"], r["state"]): (r["n"], r["p"])
            for r in transition_matrix(
                seq_df, "user_id", "ts", "event_type", tiebreak_cols=["event_id"]
            ).collect()
        }
        # user1: a→b, b→a, a→b; user2: a→a, a→a — prev=a has 4 transitions
        assert got[("a", "b")] == (2, pytest.approx(0.5, abs=1e-6))
        assert got[("a", "a")] == (2, pytest.approx(0.5, abs=1e-6))
        assert got[("b", "a")] == (1, 1.0)
        # first rows excluded: no (None, _) keys
        assert all(k[0] is not None for k in got)


class TestSequenceLint:
    def test_flags(self, seq_df):
        got = {
            r["user_id"]: (r["n_repeats"], r["n_large_gaps"], r["bad_start"])
            for r in sequence_lint(
                seq_df, "user_id", "ts", "event_type",
                expected_start="a", max_gap_s=3600.0, tiebreak_cols=["event_id"],
            ).collect()
        }
        assert got[1] == (0, 0, 0)
        assert got[2] == (2, 1, 0)

    def test_bad_start(self, seq_df):
        got = {
            r["user_id"]: r["bad_start"]
            for r in sequence_lint(
                seq_df, "user_id", "ts", "event_type",
                expected_start="b", tiebreak_cols=["event_id"],
            ).collect()
        }
        assert got == {1: 1, 2: 1}


class TestVocabZipf:
    def test_rank_and_freq(self, spark):
        df = spark.createDataFrame(
            [("b a b",), ("c b a",)], "text string"
        )
        got = {r["token"]: r for r in vocab_zipf(df, "text").collect()}
        assert got["b"]["n"] == 3 and got["b"]["rank"] == 1
        # tie a(2) vs nothing; a rank 2, c rank 3 (count desc, token asc)
        assert got["a"]["rank"] == 2 and got["c"]["rank"] == 3
        assert got["b"]["freq"] == pytest.approx(0.5, abs=1e-6)

    def test_top_n_and_empty_tokens(self, spark):
        df = spark.createDataFrame([("x  y",)], "text string")  # double space
        got = vocab_zipf(df, "text", top_n=1).collect()
        assert len(got) == 1 and got[0]["token"] in ("x", "y")


class TestBigramLM:
    def test_smoothed_probability(self, spark):
        # corpus: "a b a b" and "b c": bigrams ab,ba,ab,bc
        df = spark.createDataFrame(
            [(1, "a b a b"), (2, "b c")], "doc_id long, text string"
        )
        got = {(r["w1"], r["w2"]): r for r in bigram_lm(df, "text").collect()}
        # V = distinct w2 = {b, a, c} = 3
        # P(b|a) = (2+1)/(2+3) = 0.6 ; P(a|b) = (1+1)/(2+3) = 0.4
        assert got[("a", "b")]["n"] == 2
        assert got[("a", "b")]["p"] == pytest.approx(0.6, abs=1e-6)
        assert got[("b", "a")]["p"] == pytest.approx(0.4, abs=1e-6)

    def test_no_cross_document_bigrams(self, spark):
        df = spark.createDataFrame(
            [(1, "a"), (2, "b")], "doc_id long, text string"
        )
        assert bigram_lm(df, "text").count() == 0


class TestGroupSampleK:
    def test_size_and_determinism(self, spark):
        rows = [(i, "g1" if i % 2 else "g2") for i in range(100)]
        df = spark.createDataFrame(rows, "doc_id long, lang string")
        a = sorted(r["doc_id"] for r in group_sample_k(df, "lang", 5).collect())
        b = sorted(r["doc_id"] for r in group_sample_k(df, "lang", 5).collect())
        assert a == b and len(a) == 10

    def test_small_group_kept_whole(self, spark):
        df = spark.createDataFrame([(1, "g")], "doc_id long, lang string")
        assert group_sample_k(df, "lang", 5).count() == 1


class TestTfidfTopk:
    def test_rare_term_outranks_common(self, spark):
        from logshipper_spark.functions.vocab import tfidf_topk

        df = spark.createDataFrame(
            [(1, "apple apple banana"), (2, "banana cherry")],
            "doc_id long, text string",
        )
        got = {
            (r["doc_id"], r["rk"]): (r["token"], r["tf"], r["score"])
            for r in tfidf_topk(df, k=2).collect()
        }
        import math

        idf_rare = math.log(3 / 2) + 1  # df=1 of N=2
        assert got[(1, 1)][0] == "apple"
        assert got[(1, 1)][2] == pytest.approx(round(2 * idf_rare, 6))
        # banana appears in every doc: idf = ln(1)+1 = 1.0
        assert got[(1, 2)] == ("banana", 1, 1.0)
        assert got[(2, 1)][0] == "cherry"

    def test_k_bound_and_tie_order(self, spark):
        from logshipper_spark.functions.vocab import tfidf_topk

        df = spark.createDataFrame([(1, "b a")], "doc_id long, text string")
        got = tfidf_topk(df, k=1).collect()
        # equal scores: token asc breaks the tie deterministically
        assert len(got) == 1 and got[0]["token"] == "a"


class TestDocNovelty:
    def test_planted_duplicate_text(self, spark):
        from logshipper_spark.functions.textstats import doc_novelty

        shared = "alpha beta gamma delta epsilon zeta"
        rows = [
            (1, shared),                       # fully shared with doc 2
            (2, shared + " extra tail words here now"),
            (3, "completely different unrelated tokens only here"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r["doc_id"]: r for r in doc_novelty(df, n=5).collect()}
        # doc 1: both of its 5-grams appear inside doc 2 → novelty 0
        assert got[1]["novelty"] == 0.0
        # doc 3 shares nothing → novelty 1
        assert got[3]["novelty"] == 1.0
        assert 0.0 < got[2]["novelty"] < 1.0


class TestTokenPMI:
    def test_collocated_pair_positive(self, spark):
        from logshipper_spark.functions.vocab import token_pmi

        rows = [
            (1, "salt pepper"),
            (2, "salt pepper"),
            (3, "salt vinegar"),
            (4, "oil vinegar"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            (r["w1"], r["w2"]): r["pmi"] for r in token_pmi(df, min_count=2).collect()
        }
        import math

        # pepper+salt co-occur 2 of 4 docs; n(pepper)=2, n(salt)=3
        assert got[("pepper", "salt")] == pytest.approx(
            round(math.log(2 * 4 / (2 * 3)), 6), abs=1e-6
        )
        # min_count=2 drops the single-doc pairs
        assert ("oil", "vinegar") not in got

    def test_duplicate_tokens_counted_once_per_doc(self, spark):
        from logshipper_spark.functions.vocab import token_pmi

        df = spark.createDataFrame(
            [(1, "a b a b"), (2, "a b")], "doc_id long, text string"
        )
        got = {(r["w1"], r["w2"]): r["n12"] for r in token_pmi(df, min_count=2).collect()}
        assert got[("a", "b")] == 2   # doc-level co-occurrence, not token-level


class TestPercentileByGroup:
    def test_percentiles_within_group(self, spark):
        from logshipper_spark.functions.textstats import percentile_by_group

        rows = [(1, "g", 10), (2, "g", 20), (3, "g", 30), (4, "h", 5)]
        df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
        got = {
            r["doc_id"]: r["pct"]
            for r in percentile_by_group(df, "source", "n_chars").collect()
        }
        assert got[1] == 0.0 and got[2] == 0.5 and got[3] == 1.0
        assert got[4] == 0.0   # singleton group: percent_rank 0


class TestBigramPerplexity:
    def test_hand_computed(self, spark):
        import math

        # corpus: "a b a b" + "b c" → bigram counts ab=2, ba=1, bc=1; V=3
        # P(b|a)=(2+1)/(2+3)=0.6  P(a|b)=(1+1)/(2+3)=0.4  P(c|b)=(1+1)/(2+3)=0.4
        df = spark.createDataFrame(
            [(1, "a b a b"), (2, "b c")], "doc_id long, text string"
        )
        from logshipper_spark.functions.vocab import bigram_perplexity

        got = {r["doc_id"]: r for r in bigram_perplexity(df, "text").collect()}
        # doc 1 bigrams: ab, ba, ab → nll = -(ln .6 + ln .4 + ln .6)/3
        want1 = -(math.log(0.6) * 2 + math.log(0.4)) / 3
        assert got[1]["n_bigrams"] == 3
        assert got[1]["avg_nll"] == pytest.approx(want1, abs=1e-5)
        assert got[1]["ppl"] == pytest.approx(math.exp(want1), abs=1e-4)
        # doc 2: single bigram bc
        assert got[2]["n_bigrams"] == 1
        assert got[2]["avg_nll"] == pytest.approx(-math.log(0.4), abs=1e-5)

    def test_short_docs_absent(self, spark):
        from logshipper_spark.functions.vocab import bigram_perplexity

        df = spark.createDataFrame(
            [(1, "solo"), (2, ""), (3, "a b")], "doc_id long, text string"
        )
        ids = {r["doc_id"] for r in bigram_perplexity(df, "text").collect()}
        assert ids == {3}


class TestBudgetTruncate:
    def test_prefix_semantics(self, spark):
        from logshipper_spark.operators.dialog import budget_truncate

        rows = [
            # user 1 costs 3,4,2,5 → cumsum 3,7,9,14: budget 9 keeps first 3
            (1, 1, 3.0, "2024-01-01 00:00:01"),
            (2, 1, 4.0, "2024-01-01 00:00:02"),
            (3, 1, 2.0, "2024-01-01 00:00:03"),
            (4, 1, 5.0, "2024-01-01 00:00:04"),
            # user 2: first row alone busts the budget → zero rows kept
            (5, 2, 100.0, "2024-01-01 00:00:01"),
        ]
        df = spark.createDataFrame(
            rows, "event_id long, user_id long, value double, ts string"
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        out = budget_truncate(
            df, "user_id", "ts", "value", budget=9.0, tiebreak_cols=["event_id"]
        )
        got = sorted((r["user_id"], r["event_id"], r["cum_cost"]) for r in out.collect())
        assert got == [(1, 1, 3.0), (1, 2, 7.0), (1, 3, 9.0)]

    def test_kept_rows_form_a_prefix(self, spark):
        from logshipper_spark.operators.dialog import budget_truncate

        rows = [(i, i % 7, float((i * 37) % 11) + 0.5, f"2024-01-01 00:{i % 60:02d}:{(i * 13) % 60:02d}")
                for i in range(300)]
        df = spark.createDataFrame(
            rows, "event_id long, user_id long, value double, ts string"
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        kept = budget_truncate(
            df, "user_id", "ts", "value", budget=30.0, tiebreak_cols=["event_id"]
        )
        kept_ids = {r["event_id"] for r in kept.collect()}
        # replay each user's ordered sequence: kept ids must be exactly the
        # maximal prefix whose running total stays <= 30
        import collections

        by_user = collections.defaultdict(list)
        for eid, uid, v, ts in rows:
            by_user[uid].append((ts, eid, v))
        for uid, seq in by_user.items():
            seq.sort()
            run, want = 0.0, set()
            for ts, eid, v in seq:
                run += v
                if run > 30.0:
                    break
                want.add(eid)
            assert want == {e for e in kept_ids if e % 7 == uid} or want == {
                e for (t, e, v) in seq if e in kept_ids
            }


class TestClusterMixture:
    def test_planted_clusters(self, spark):
        from logshipper_spark.functions.similarity import cluster_assign, cluster_mixture

        # two orthogonal centroids; vectors are noisy copies of one or the other
        cents = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]]
        rows = []
        for i in range(40):
            c = i % 2
            v = [0.0] * 4
            v[c] = 1.0
            v[2] = 0.01 * (i % 5)  # small off-axis noise, never flips the argmax
            rows.append((i, v))
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        a = {r["vec_id"]: r["cluster_id"] for r in cluster_assign(df, cents).collect()}
        assert all(a[i] == i % 2 for i in range(40))
        mix = {r["cluster_id"]: r["n"] for r in cluster_mixture(df, cents).collect()}
        assert mix == {0: 20, 1: 20}

    def test_tie_breaks_to_lowest_index(self, spark):
        from logshipper_spark.functions.similarity import cluster_assign

        # identical centroids → every sim ties → cluster 0 wins
        cents = [[1.0, 0.0], [1.0, 0.0]]
        df = spark.createDataFrame(
            [(1, [0.5, 0.5]), (2, [1.0, 0.0])], "vec_id long, embedding array<float>"
        )
        out = cluster_assign(df, cents).collect()
        assert {r["cluster_id"] for r in out} == {0}
