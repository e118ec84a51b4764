"""Multimodal binary-column plumbing + structured streaming tests."""

import pytest
from pyspark.sql import functions as F

from table_annotation_spark.operators import multimodal as mm
from table_annotation_spark.streaming import events_stream as es


@pytest.fixture(scope="module")
def media_df(spark):
    rows = [
        (1, "image", "image/png", bytearray(b"\x89PNG fake bytes 1"), 64, 64, None),
        (2, "image", "image/jpeg", bytearray(b"\xff\xd8 fake bytes 2"), 32, 32, None),
        (3, "audio", "audio/wav", bytearray(b"RIFF fake"), None, None, 2_000),
        (4, "video", "video/mp4", bytearray(b"ftyp fake"), 640, 360, 100),
        (5, "image", "image/png", bytearray(b""), 0, 0, None),  # corrupt
    ]
    return spark.createDataFrame(rows, schema=mm.MEDIA_SCHEMA)


class TestMultimodal:
    def test_feature_extraction(self, spark, media_df):
        feats = mm.extract_features(media_df).collect()
        by_id = {r["media_id"]: r for r in feats}
        assert set(by_id) == {1, 2, 3, 4}  # corrupt row 5 skipped
        assert all(len(r["feature"]) == mm.FEATURE_DIM for r in feats)
        assert all(0.0 <= x <= 1.0 for r in feats for x in r["feature"])

    def test_feature_determinism(self, spark, media_df):
        a = {r["media_id"]: r["feature"] for r in mm.extract_features(media_df).collect()}
        b = {r["media_id"]: r["feature"] for r in mm.extract_features(media_df).collect()}
        assert a == b

    def test_corrupt_raises_when_asked(self, spark, media_df):
        with pytest.raises(Exception, match="empty media payload"):
            mm.extract_features(media_df, on_error="raise").collect()

    def test_frame_sampling(self, spark, media_df):
        frames = mm.frame_sample_stub(media_df, every_ms=30).collect()
        assert [r["frame_ts_ms"] for r in frames] == [0, 30, 60, 90]

    def test_resize_stub(self, spark, media_df):
        out = mm.resize_stub(media_df, 128, 128)
        assert out.where("width = 128 and height = 128").count() == media_df.count()


class TestStreaming:
    def test_windowed_counts_match_batch(self, spark, tmp_path):
        sf_dir = "/root/testdata/sf0.001"
        # file-source streams need a directory, not a single parquet file
        stream_dir = str(tmp_path / "events_stream")
        spark.read.parquet(f"{sf_dir}/events.parquet").write.parquet(stream_dir)
        stream = es.read_events_stream(spark, stream_dir)
        assert stream.isStreaming
        agg = es.windowed_event_counts(stream)
        q = es.run_to_memory(agg, "win_counts", output_mode="complete")
        q.awaitTermination(120)
        got = {
            (r["window_start"], r["event_type"]): (r["n_events"], r["value_milli"])
            for r in spark.sql("select * from win_counts").collect()
        }
        batch = (
            spark.read.parquet(f"{sf_dir}/events.parquet")
            .groupBy(F.date_trunc("hour", "ts").alias("ws"), "event_type")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.floor(F.col("value") * 1000).cast("bigint")).alias("vm"),
            )
        )
        want = {
            (r["ws"], r["event_type"]): (r["n"], r["vm"]) for r in batch.collect()
        }
        assert got == want
