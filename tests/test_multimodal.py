import pytest
from pyspark.sql import Row

from java_mapreduce_framework_spark.operators import multimodal


def _docs(spark):
    rows = [Row(doc_id=0, text="hello world", lang="en", source="t", n_chars=11)]
    return spark.createDataFrame(rows)


def test_attach_payload_binary_schema(spark):
    mm = multimodal.attach_payload(_docs(spark))
    assert dict(mm.dtypes)["payload"] == "binary"


def test_decode_metadata_deterministic_fake(spark):
    out = multimodal.decode_metadata(multimodal.attach_payload(_docs(spark))).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_bytes"] == 11
    assert r["fake_width"] == 11 % 640
    assert r["fake_height"] == (11 * 7) % 480
    assert r["content_type"] == "image/fake"
    # content-derived byte stats: "hello world" = 104+101+108+108+111+32+...
    payload = b"hello world"
    assert r["byte_sum"] == sum(payload)
    assert r["byte_min"] == min(payload)
    assert r["byte_max"] == max(payload)
    assert r["n_distinct_bytes"] == len(set(payload))


def test_frame_sample_slices(spark):
    out = multimodal.frame_sample(
        multimodal.attach_payload(_docs(spark)), max_frames=4, frame_bytes=4
    ).collect()
    # 11 bytes // 4 => 2 frames
    assert [r["frame_idx"] for r in out] == [0, 1]
    assert all(isinstance(r["frame_bytes"], (bytes, bytearray)) for r in out)


def test_real_decode_is_marked_stub():
    with pytest.raises(NotImplementedError):
        multimodal.real_decode(b"\x00")


def test_audio_features_deterministic_stats(spark):
    from java_mapreduce_framework_spark.operators.multimodal import (
        attach_payload,
        audio_features,
    )

    docs = spark.createDataFrame([(1, "abcd"), (2, "")], ["doc_id", "text"])
    out = {r["doc_id"]: r for r in audio_features(attach_payload(docs)).collect()}
    assert out[1]["n_samples"] == 4
    # 'abcd' bytes 97..100, centered at -128: all positive magnitudes
    assert out[1]["peak_fake"] > 0
    assert out[2]["n_samples"] == 0 and out[2]["rms_fake"] == 0.0


def test_resize_downsamples_deterministically(spark):
    mm = multimodal.attach_payload(_docs(spark))
    out = multimodal.resize(mm, target_width=4).collect()
    assert len(out) == mm.count()
    by_id = {r["doc_id"]: r for r in out}
    again = {r["doc_id"]: r for r in multimodal.resize(mm, target_width=4).collect()}
    for doc_id, r in by_id.items():
        assert r["out_width"] >= 1 and r["out_height"] >= 1
        assert len(r["resized"]) >= 1
        assert bytes(r["resized"]) == bytes(again[doc_id]["resized"])
