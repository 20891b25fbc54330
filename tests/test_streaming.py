"""Structured Streaming surface tests (streaming/incremental.py).

Streams are driven with ``availableNow`` triggers over parquet
directories — deterministic, no wall-clock dependence.  Stream results
are compared against the equivalent batch plan (exactness, not
smoke-only).
"""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from searchengine_spark.sources.corpus import generate_corpus
from searchengine_spark.streaming.incremental import (
    sessionize_events,
    stage_corpus_stream,
    stream_corpus,
    windowed_event_counts,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF_DIR}/events.parquet")


def _await(query, timeout=120):
    query.awaitTermination(timeout)
    if query.isActive:
        query.stop()
        raise AssertionError("streaming query did not finish in time")


class TestCorpusIngest:
    def test_stage_then_batch_build_sees_all_docs(self, spark, tmp_path):
        src = str(tmp_path / "src")
        staging = str(tmp_path / "staging")
        ckpt = str(tmp_path / "ckpt")
        docs = generate_corpus(spark, n_repos=2, files_per_repo=10)
        docs.write.mode("overwrite").parquet(src)

        q = stage_corpus_stream(stream_corpus(spark, src), staging, ckpt)
        _await(q)
        staged = spark.read.parquet(staging)
        assert staged.count() == docs.count()
        assert sorted(staged.columns) == sorted(docs.columns)

        # second batch of files: restart picks up only the new ones,
        # dedup drops re-sent docs (frontier semantics)
        more = generate_corpus(spark, n_repos=3, files_per_repo=10)
        more.write.mode("append").parquet(src)
        q = stage_corpus_stream(stream_corpus(spark, src), staging, ckpt)
        _await(q)
        staged2 = spark.read.parquet(staging)
        expect = docs.unionByName(more).dropDuplicates(["repo", "path", "commit"])
        assert staged2.dropDuplicates(["repo", "path", "commit"]).count() == expect.count()

    def test_staged_updates_apply_via_single_doc_reindex(self, spark, tmp_path):
        """Stream -> staging -> S9 per-doc apply: the live index ends
        byte-equal (postings/term_stats) to a fresh build over the
        updated corpus (streaming + maintenance integration)."""
        from searchengine_spark import IndexConfig
        from searchengine_spark.index.builder import build_index
        from searchengine_spark.streaming.incremental import apply_staged_updates

        cfg = IndexConfig(n_buckets=4, n_salts=2, block_size=32)
        docs = generate_corpus(spark, n_repos=2, files_per_repo=8)
        live = str(tmp_path / "live")
        build_index(spark, docs, live, cfg, source="stream-live", store_content=True)

        # stage two updates: one edit of an existing doc, one new doc
        base = docs.limit(1).collect()[0]
        updates = spark.createDataFrame(
            [
                (base["repo"], base["path"], base["commit"], base["lang"],
                 base["content"] + " streamed edit marker"),
                ("repo-new", "x/streamed.py", "c1", "py",
                 "def streamedfn(): return streamedmarker"),
            ],
            ["repo", "path", "commit", "lang", "content"],
        )
        src = str(tmp_path / "delta_src")
        staging = str(tmp_path / "delta_staging")
        ckpt = str(tmp_path / "delta_ckpt")
        updates.write.parquet(src)
        q = stage_corpus_stream(stream_corpus(spark, src), staging, ckpt)
        _await(q)

        out = apply_staged_updates(spark, live, staging)
        assert out["applied"] == 2

        import os

        from pyspark.sql import functions as F

        ts = {
            r["term"]: (r["df"], r["cf"])
            for r in spark.read.parquet(os.path.join(live, "term_stats")).collect()
        }
        # fresh build over the updated corpus, compared by (repo, path)
        merged = docs.where(
            ~((F.col("repo") == base["repo"]) & (F.col("path") == base["path"]))
        ).unionByName(updates)
        fresh = str(tmp_path / "fresh")
        build_index(spark, merged, fresh, cfg, source="stream-fresh", store_content=True)
        ts_fresh = {
            r["term"]: (r["df"], r["cf"])
            for r in spark.read.parquet(os.path.join(fresh, "term_stats")).collect()
        }
        assert ts == ts_fresh

        # bulk loads must refuse the per-doc path
        import pytest

        with pytest.raises(ValueError):
            apply_staged_updates(spark, live, staging, full_rebuild_threshold=1)

    def test_exactly_once_on_rerun(self, spark, tmp_path):
        src = str(tmp_path / "src")
        staging = str(tmp_path / "staging")
        ckpt = str(tmp_path / "ckpt")
        generate_corpus(spark, 2, 5).write.mode("overwrite").parquet(src)
        for _ in range(2):  # second run must be a no-op (checkpoint)
            q = stage_corpus_stream(stream_corpus(spark, src), staging, ckpt)
            _await(q)
        assert spark.read.parquet(staging).count() == \
            spark.read.parquet(src).count()


class TestWindowedCounts:
    def test_stream_equals_batch(self, spark, events, tmp_path):
        src = str(tmp_path / "ev")
        events.write.mode("overwrite").parquet(src)
        stream = (
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", 2)
            .parquet(src)
        )
        out = str(tmp_path / "out")
        ckpt = str(tmp_path / "ckpt")
        q = (
            windowed_event_counts(stream, window="1 hour", watermark="2 hours")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        _await(q)
        got = spark.read.parquet(out)
        expect = windowed_event_counts(events, window="1 hour")
        # append mode emits only watermark-closed windows; every emitted
        # row must match the batch aggregate exactly
        assert got.count() > 0
        joined = got.alias("g").join(
            expect.alias("e"),
            ["window_start", "window_end", "event_type"],
            "inner",
        )
        assert joined.count() == got.count()
        mism = joined.where(
            (F.col("g.n_events") != F.col("e.n_events"))
            | (F.abs(F.col("g.total_value") - F.col("e.total_value")) > 1e-6)
        )
        assert mism.count() == 0

    def test_sliding_windows_batch(self, spark, events):
        slid = windowed_event_counts(events, window="2 hours", slide="1 hour")
        tumb = windowed_event_counts(events, window="1 hour")
        # every event lands in exactly 2 sliding windows vs 1 tumbling
        assert (
            slid.agg(F.sum("n_events")).collect()[0][0]
            == 2 * tumb.agg(F.sum("n_events")).collect()[0][0]
        )


class TestSessionize:
    def test_stateful_sessions(self, spark, events, tmp_path):
        src = str(tmp_path / "ev")
        # single file => single micro-batch => deterministic output
        events.coalesce(1).write.mode("overwrite").parquet(src)
        stream = (
            spark.readStream.schema(events.schema).parquet(src)
        )
        out = str(tmp_path / "out")
        ckpt = str(tmp_path / "ckpt")
        q = (
            sessionize_events(stream)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        _await(q)
        got = spark.read.parquet(out)
        # one open-session snapshot (closed=False) per user at minimum;
        # closed sessions respect the 30-minute gap rule
        users = {r["user_id"] for r in events.select("user_id").distinct().collect()}
        assert {r["user_id"] for r in got.select("user_id").distinct().collect()} == users
        bad = got.where(F.col("session_end") < F.col("session_start"))
        assert bad.count() == 0
        # total events across a user's sessions == user's event count
        per_user = got.groupBy("user_id").agg(F.sum("n_events").alias("n"))
        expect = events.groupBy("user_id").agg(F.count("*").alias("n"))
        diff = per_user.join(expect, "user_id").where(
            per_user["n"] != expect["n"]
        )
        assert diff.count() == 0
