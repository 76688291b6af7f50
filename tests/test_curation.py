"""Incremental-curation parity: micro-batched ingest must reproduce the
one-shot batch pipeline (VERDICT r3 #5 — the 100 TB continuous-ingest
shape of curation_e2e)."""

import pyspark.sql.functions as F
import pytest

from logshipper_spark.functions import dedup, textstats
from logshipper_spark.functions.curation import IncrementalCurator, histogram_cutoff

FRACTIONS = {"en": 0.8, "de": 0.6, "fr": 0.6}


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.01/documents.parquet").cache()


def batch_curate(train, bench):
    """The exact curation_e2e stage composition (queries.py) on one frame."""
    kept = textstats.quality_filter_by_cutoff(
        train, textstats.english_score(F.col("text")), keep_fraction=0.5
    )
    deduped = dedup.dedup_exact(kept)
    hits = textstats.contamination_check(deduped, bench, n=5).select("doc_id")
    clean = deduped.join(hits, "doc_id", "left_anti")
    return textstats.stratified_sample(clean, "lang", FRACTIONS)


def key_set(df):
    return sorted(
        (r["doc_id"], r["lang"], r["q_score"])
        for r in df.select("doc_id", "lang", "q_score").collect()
    )


class TestHistogramCutoff:
    def test_matches_approx_quantile_exact(self, spark):
        # differential: the histogram rank rule must reproduce
        # approxQuantile(relativeError=0) on awkward multisets
        import random

        rng = random.Random(7)
        for trial in range(10):
            n = rng.randrange(1, 60)
            vals = [round(rng.random(), 2) for _ in range(n)]  # heavy ties
            # 0.9/0.1 produce float-dust quantiles (1-0.9 != 0.1 exactly)
            # that separate the ceil rule from floor-based ones
            frac = rng.choice([0.1, 0.25, 0.5, 0.75, 0.9, 1.0])
            df = spark.createDataFrame([(v,) for v in vals], "q_score double")
            want = df.approxQuantile("q_score", [1.0 - frac], 0.0)[0]
            hist = df.groupBy("q_score").agg(F.count("*").alias("cnt"))
            got = histogram_cutoff(hist, keep_fraction=frac)
            assert got == want, f"trial {trial}: n={n} frac={frac} {got} != {want}"

    def test_empty_histogram(self, spark):
        hist = spark.createDataFrame([], "q_score double, cnt long")
        assert histogram_cutoff(hist, keep_fraction=0.5) is None


class TestIncrementalParity:
    def test_two_deltas_equal_batch_union(self, spark, docs, tmp_path):
        """Frozen-cutoff protocol: observe both deltas, then admit each in
        canonical (doc_id) order — the union of admissions must equal the
        batch pipeline on the union, row for row."""
        bench = docs.where(F.pmod("doc_id", F.lit(10)) == 0)
        train = docs.where(F.pmod("doc_id", F.lit(10)) != 0)
        b1 = train.where(F.col("doc_id") < 250)
        b2 = train.where(F.col("doc_id") >= 250)

        cur = IncrementalCurator(
            spark, str(tmp_path / "cur"), bench, keep_fraction=0.5, fractions=FRACTIONS
        )
        cur.observe(b1)
        cur.observe(b2)
        frozen = cur.cutoff()
        # frozen cutoff == the batch path's approxQuantile cutoff
        want_cutoff = textstats.quality_score_cutoff(
            train, textstats.english_score(F.col("text")), keep_fraction=0.5
        )
        assert frozen == want_cutoff
        cur.admit(b1, cutoff=frozen)
        cur.admit(b2, cutoff=frozen)

        assert key_set(cur.curated()) == key_set(batch_curate(train, bench))

    def test_cross_batch_dedup_and_decontam_state(self, spark, docs, tmp_path):
        """A doc duplicated across deltas is admitted once (fingerprint
        table), and the cached bench grams decontaminate every delta."""
        bench = docs.where(F.pmod("doc_id", F.lit(10)) == 0)
        base = docs.where(F.pmod("doc_id", F.lit(10)) != 0).where(F.col("doc_id") < 100)
        # delta 2 re-sends delta 1's docs under new ids plus one bench copy
        dup = base.withColumn("doc_id", F.col("doc_id") + 10000)
        leak = bench.limit(1).withColumn("doc_id", F.lit(99999))
        d2 = dup.unionByName(leak)

        cur = IncrementalCurator(
            spark, str(tmp_path / "cur2"), bench, keep_fraction=1.0, fractions=None
        )
        cur.observe(base)
        cur.observe(d2)
        c = cur.cutoff()
        a1 = cur.admit(base, cutoff=c)
        n1 = a1.count()
        a2 = cur.admit(d2, cutoff=c)
        assert n1 > 0
        # every dup suppressed by the persisted fingerprints; the bench
        # leak is caught by the reused gram set
        assert a2.count() == 0
        assert cur.curated().count() == n1

    def test_ingest_epoch_idempotent(self, spark, docs, tmp_path):
        bench = docs.where(F.pmod("doc_id", F.lit(10)) == 0)
        b1 = docs.where(F.pmod("doc_id", F.lit(10)) != 0).where(F.col("doc_id") < 100)
        cur = IncrementalCurator(
            spark, str(tmp_path / "cur3"), bench, keep_fraction=0.25, fractions=None
        )
        out = cur.ingest(b1, epoch_id=0)
        n = cur.curated().count()
        assert out is not None and n > 0
        assert cur.ingest(b1, epoch_id=0) is None  # retry of committed epoch
        assert cur.curated().count() == n


class TestCrashRetry:
    def test_replayed_epoch_is_idempotent_after_lost_commit_marker(
        self, spark, docs, tmp_path
    ):
        """Worst crash window: every state write landed (histogram,
        fingerprints, output) but the commit marker didn't — foreachBatch
        replays the epoch.  Epoch-keyed overwrite + own-epoch anti-join
        exclusion must make the replay byte-identical: no double-counted
        histogram, no lost output, no duplicates."""
        bench = docs.where(F.pmod("doc_id", F.lit(10)) == 0)
        b0 = docs.where(F.pmod("doc_id", F.lit(10)) != 0).where(F.col("doc_id") < 150)
        b1 = docs.where(F.pmod("doc_id", F.lit(10)) != 0).where(
            (F.col("doc_id") >= 150) & (F.col("doc_id") < 300)
        )
        cur = IncrementalCurator(
            spark, str(tmp_path / "cr"), bench, keep_fraction=0.5, fractions=None
        )
        cur.ingest(b0, epoch_id=0)
        cur.ingest(b1, epoch_id=1)
        n = cur.curated().count()
        cut = cur.cutoff()
        fps = sorted(r["fp"] for r in cur._seen_fingerprints().collect())
        assert n > 0

        # crash simulation: epoch 1's marker is lost, the batch replays
        state = cur._load_state()
        state["committed_epochs"].remove(1)
        cur._save_state(state)
        replay = cur.ingest(b1, epoch_id=1)
        assert replay is not None  # it really re-ran, not short-circuited

        assert cur.curated().count() == n
        assert cur.cutoff() == cut  # histogram not double-counted
        assert sorted(r["fp"] for r in cur._seen_fingerprints().collect()) == fps
        # committed-epoch retry remains a no-op
        assert cur.ingest(b1, epoch_id=1) is None


class TestStreamingAttach:
    def test_foreachbatch_stream(self, spark, docs, tmp_path):
        """Real foreachBatch plumbing: a file-source stream over two delta
        files lands both through ingest() exactly once."""
        bench = docs.where(F.pmod("doc_id", F.lit(10)) == 0)
        train = docs.where(F.pmod("doc_id", F.lit(10)) != 0)
        b1 = train.where(F.col("doc_id") < 250)
        b2 = train.where(F.col("doc_id") >= 250)
        src = str(tmp_path / "src")
        b1.write.parquet(src + "/d1")

        cur = IncrementalCurator(
            spark, str(tmp_path / "cur4"), bench, keep_fraction=0.5, fractions=FRACTIONS
        )
        stream = (
            spark.readStream.schema(train.schema)
            .option("maxFilesPerTrigger", "64")
            .parquet(src + "/*")
        )
        q = cur.attach(stream, checkpoint=str(tmp_path / "ckpt"))
        try:
            q.processAllAvailable()
            n1 = cur.curated().count()
            assert n1 > 0
            b2.write.parquet(src + "/d2")
            q.processAllAvailable()
            n2 = cur.curated().count()
            assert n2 > n1
        finally:
            q.stop()
