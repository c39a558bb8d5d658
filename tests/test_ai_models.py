"""Per-model AI behaviors mirroring the reference's aiproxy_test.rs
matrix: the 12-model catalog, PreprocessAction truth table per input
kind, and OneToMany face-model semantics (one image -> one row per
detected face; reference models.rs:37-77, 159-191)."""

import struct

import pytest

from ahnlich_spark import errors
from ahnlich_spark.ai import AiEngine
from ahnlich_spark.ai.models import MODELS, get_model
from ahnlich_spark.operators.multimodal import (
    detect_faces_stub,
    probe_image_dims,
    probe_wav_sample_rate,
    resample_audio_stub,
    resize_image_stub,
)
from ahnlich_spark.types import AHNLICH_RESERVED_INPUT_KEY, StoreInput

SI = StoreInput


def png(w, h):
    return b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\rIHDR" + struct.pack(">II", w, h)


def wav(sr):
    fmt = b"fmt " + struct.pack("<I", 16) + struct.pack("<HHIIHH", 1, 1, sr, sr * 2, 2, 16)
    return b"RIFF" + struct.pack("<I", 36) + b"WAVE" + fmt


@pytest.fixture
def ai(engine):
    return AiEngine(engine)


def test_model_catalog_is_complete():
    """12 models incl. both face models, matching the reference table."""
    assert len(MODELS) == 12
    assert get_model("buffalo_l").one_to_many
    assert get_model("buffalo_l").embedding_size == 512
    assert get_model("buffalo_l").requires_preprocessing
    assert get_model("sface-yunet").one_to_many
    assert get_model("sface-yunet").embedding_size == 128
    assert get_model("clap-audio").sample_rate == 48000


# ------------------------------------------------ probes (real parsing) --

def test_probe_png_gif_jpeg_dims():
    assert probe_image_dims(png(640, 480)) == (640, 480)
    assert probe_image_dims(b"GIF89a" + struct.pack("<HH", 320, 200)) == (320, 200)
    jpeg = b"\xff\xd8\xff\xc0" + struct.pack(">H", 9) + b"\x08" + struct.pack(">HH", 100, 220)
    assert probe_image_dims(jpeg) == (220, 100)
    assert probe_image_dims(b"not an image") is None


def test_probe_wav_sample_rate():
    assert probe_wav_sample_rate(wav(48000)) == 48000
    assert probe_wav_sample_rate(b"junk") is None
    # the stub transforms round-trip through the probes
    assert probe_image_dims(resize_image_stub(b"x", 224, 224)) == (224, 224)
    assert probe_wav_sample_rate(resample_audio_stub(b"x", 48000)) == 48000


# ------------------------------------------- preprocess truth table --

def test_image_nopreprocessing_dims_mismatch_errors(ai):
    ai.create_store("imgs", query_model="clip-vit-b32-image",
                    index_model="clip-vit-b32-image")
    with pytest.raises(errors.ImageDimensionsMismatch):
        ai.set("imgs", [(SI.image(png(100, 100)), {})])


def test_image_nopreprocessing_matching_dims_ok(ai):
    ai.create_store("imgs2", query_model="clip-vit-b32-image",
                    index_model="clip-vit-b32-image")
    r = ai.set("imgs2", [(SI.image(png(224, 224)), {})])
    assert r.inserted == 1


def test_image_modelpreprocessing_resizes(ai):
    ai.create_store("imgs3", query_model="clip-vit-b32-image",
                    index_model="clip-vit-b32-image")
    r = ai.set("imgs3", [(SI.image(png(100, 100)), {})],
               preprocess_action="modelpreprocessing")
    assert r.inserted == 1


def test_face_model_rejects_nopreprocessing(ai):
    ai.create_store("faces", query_model="buffalo_l", index_model="buffalo_l")
    with pytest.raises(errors.PreprocessingRequired):
        ai.set("faces", [(SI.image(png(640, 640)), {})])


def test_clap_audio_rejects_nopreprocessing(ai):
    ai.create_store("aud", query_model="clap-audio", index_model="clap-audio")
    with pytest.raises(errors.PreprocessingRequired):
        ai.set("aud", [(SI.audio(wav(48000)), {})])
    r = ai.set("aud", [(SI.audio(wav(16000)), {})],
               preprocess_action="modelpreprocessing")
    assert r.inserted == 1


# ----------------------------------------------------- OneToMany Set --

def test_one_to_many_set_rows_per_face(ai):
    ai.create_store("faces2", query_model="sface-yunet", index_model="sface-yunet")
    img = b"some image content!"  # len 19 -> 1 + 19 % 3 = 2 faces
    assert len(detect_faces_stub(img)) == 2
    r = ai.set("faces2", [(SI.image(img), {"who": "ada"})])
    assert r.inserted == 2
    rows = ai.get_key("faces2", [SI.image(img)]).collect()
    assert len(rows) == 2
    idxs = sorted(r["meta"]["face_index"]["s"] for r in rows)
    assert idxs == ["0", "1"]
    for row in rows:
        assert row["meta"]["who"]["s"] == "ada"  # user meta on every face
        assert "bbox" in row["meta"]
        assert bytes(row["input"]["bin"]) == img  # converted AI read


def test_one_to_many_reset_replaces_all_faces(ai):
    ai.create_store("faces3", query_model="sface-yunet", index_model="sface-yunet")
    img = b"ab"  # 1 + 2 % 3 = 3 faces
    ai.set("faces3", [(SI.image(img), {"v": "1"})])
    assert ai.engine.get_store("faces3").len == 3
    ai.set("faces3", [(SI.image(img), {"v": "2"})])
    assert ai.engine.get_store("faces3").len == 3  # replaced, not grown
    rows = ai.get_key("faces3", [SI.image(img)]).collect()
    assert {r["meta"]["v"]["s"] for r in rows} == {"2"}
    assert ai.del_key("faces3", [SI.image(img)]).deleted_count == 3


def test_one_to_many_get_sim_n_finds_faces(ai):
    ai.create_store("faces4", query_model="sface-yunet", index_model="sface-yunet")
    # len % 3 == 0 -> exactly ONE detected face (valid query image)
    single = b"abcdef"
    imgs = [b"first image bytes", b"second image data x", single]
    ai.set("faces4", [(SI.image(b), {"n": str(i)}) for i, b in enumerate(imgs)])
    # querying with an ingested single-face image: its face embedding is
    # in the store, so the top hit is exact
    top = ai.get_sim_n("faces4", SI.image(single), closest_n=1).collect()
    assert len(top) == 1 and abs(top[0]["similarity"] - 1.0) < 1e-6


def test_one_to_many_multi_face_query_rejected(ai):
    """Reference parity (buffalo_l_test
    get_sim_n_multi_face_query_errors): a face-model QUERY with several
    detected faces is ambiguous and must error, not silently pick one."""
    from ahnlich_spark import errors

    ai.create_store("faces5", query_model="sface-yunet", index_model="sface-yunet")
    ai.set("faces5", [(SI.image(b"abcdef"), {})])
    multi = b"first image bytes"  # 17 % 3 = 2 -> 3 detected faces
    with pytest.raises(errors.AmbiguousFaceQuery, match="exactly one face"):
        ai.get_sim_n("faces5", SI.image(multi), closest_n=1)


def test_one_to_many_bulk_matches_list_path(ai, spark):
    ai.create_store("fbulk", query_model="sface-yunet", index_model="sface-yunet")
    ai.create_store("flist", query_model="sface-yunet", index_model="sface-yunet")
    imgs = [b"image one", b"image two bytes", b"img3!"]
    ai.set("flist", [(SI.image(b), {"i": str(n)}) for n, b in enumerate(imgs)])
    df = spark.createDataFrame(
        [(b, {"i": str(n)}) for n, b in enumerate(imgs)],
        "input binary, m map<string,string>",
    )
    r = ai.set("fbulk", df, meta_col="m")
    assert r.inserted == ai.engine.get_store("flist").len
    ka = sorted(tuple(x["key"]) for x in ai.engine.store_df("flist").collect())
    kb = sorted(tuple(x["key"]) for x in ai.engine.store_df("fbulk").collect())
    assert ka == kb


# ----------------------------------------- ExecutionProvider plumbing --

def test_ort_providers_truth_table():
    """Reference enum (execution_provider.rs:5-10) -> onnxruntime
    provider lists, requested accelerator first with CPU fallback
    (providers/ort/mod.rs:67-80); both enum and proto wire names."""
    from ahnlich_spark.ai.embedder import ort_providers

    assert ort_providers(None) == ["CPUExecutionProvider"]
    assert ort_providers("CPU") == ["CPUExecutionProvider"]
    for name in ("TensorRT", "TENSOR_RT", "tensorrt"):
        assert ort_providers(name) == [
            "TensorrtExecutionProvider", "CPUExecutionProvider"]
    for name in ("Cuda", "CUDA"):
        assert ort_providers(name) == [
            "CUDAExecutionProvider", "CPUExecutionProvider"]
    for name in ("DirectML", "DIRECT_ML"):
        assert ort_providers(name) == [
            "DmlExecutionProvider", "CPUExecutionProvider"]
    for name in ("CoreML", "CORE_ML"):
        assert ort_providers(name) == [
            "CoreMLExecutionProvider", "CPUExecutionProvider"]
    with pytest.raises(ValueError):
        ort_providers("vulkan")


def test_ort_session_receives_provider_list(monkeypatch, tmp_path):
    """_ort_session must forward the mapped provider list into the
    InferenceSession constructor and cache per (model, provider)."""
    import sys
    import types as pytypes

    from ahnlich_spark.ai import embedder

    calls = []

    class FakeSession:
        def __init__(self, path, providers=None):
            calls.append((path, tuple(providers)))

    fake = pytypes.ModuleType("onnxruntime")
    fake.InferenceSession = FakeSession
    monkeypatch.setitem(sys.modules, "onnxruntime", fake)
    monkeypatch.setenv("AHNLICH_ONNX_DIR", str(tmp_path))
    monkeypatch.setattr(embedder, "_ORT_SESSIONS", {})

    s1 = embedder._ort_session("all-minilm-l6-v2", "CUDA")
    s2 = embedder._ort_session("all-minilm-l6-v2", "CUDA")   # cached
    s3 = embedder._ort_session("all-minilm-l6-v2", None)     # new entry
    assert s1 is s2 and s1 is not s3
    assert [c[1] for c in calls] == [
        ("CUDAExecutionProvider", "CPUExecutionProvider"),
        ("CPUExecutionProvider",),
    ]


def test_ai_surface_rejects_unknown_provider(spark, warehouse):
    from ahnlich_spark.ai.proxy import AiEngine
    from ahnlich_spark.plans.engine import Engine
    from ahnlich_spark.types import StoreInput

    ai = AiEngine(Engine(spark, warehouse))
    ai.create_store("epv", query_model="all-minilm-l6-v2",
                    index_model="all-minilm-l6-v2")
    with pytest.raises(ValueError, match="execution provider"):
        ai.get_sim_n("epv", StoreInput.raw_string("hi"), execution_provider="npu")


def test_clap_audio_duration_limit(ai):
    """Reference parity (clap_test too_long_rejected /
    short_audio_accepted): CLAP rejects clips over 10000ms; shorter
    clips pass through to preprocessing."""
    import struct

    from ahnlich_spark import errors

    def wav(seconds, rate=48000):
        data = b"\x00" * int(rate * 2 * seconds)
        fmt = b"fmt " + struct.pack("<I", 16) + struct.pack(
            "<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
        return (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE" + fmt
                + b"data" + struct.pack("<I", len(data)) + data)

    ai.create_store("clapstore", query_model="clap-audio",
                    index_model="clap-audio")
    with pytest.raises(errors.AudioTooLong, match="too long"):
        ai.set("clapstore", [(SI.audio(wav(12)), {})],
               preprocess_action="modelpreprocessing")
    r = ai.set("clapstore", [(SI.audio(wav(2)), {})],
               preprocess_action="modelpreprocessing")
    assert r.inserted == 1


# --------------------------------------------------- model_params --

def test_model_params_confidence_threshold_filters_faces(ai):
    """Reference parity (buffalo_l_test optimized_face_params): the
    request's confidence_threshold drops low-confidence detections
    before ingest; the set counts reflect the surviving faces only."""
    ai.create_store("fparam", query_model="sface-yunet",
                    index_model="sface-yunet")
    img = b"some image content!"  # 2 faces, stub confidences .708/.906
    faces_all = detect_faces_stub(img)
    faces_hi = detect_faces_stub(img, confidence_threshold=0.8)
    assert len(faces_all) == 2 and len(faces_hi) == 1
    r = ai.set("fparam", [(SI.image(img), {})],
               model_params={"confidence_threshold": "0.8"})
    assert r.inserted == 1
    rows = ai.get_key("fparam", [SI.image(img)]).collect()
    assert [r["meta"]["face_index"]["s"] for r in rows] == ["1"]
    assert float(rows[0]["meta"]["confidence"]["s"]) >= 0.8


def test_model_params_genderage_attributes(ai, spark):
    """attributes=genderage runs the (stub) second-stage model and
    attaches gender/age per face, on BOTH the list and bulk paths."""
    ai.create_store("fga", query_model="sface-yunet", index_model="sface-yunet")
    img = b"abcdef"  # single face
    ai.set("fga", [(SI.image(img), {})],
           model_params={"attributes": "genderage"})
    rows = ai.get_key("fga", [SI.image(img)]).collect()
    assert {"gender", "age"} <= set(dict(rows[0]["meta"]))

    ai.create_store("fga2", query_model="sface-yunet", index_model="sface-yunet")
    df = spark.createDataFrame([(img,)], "input binary")
    ai.set("fga2", df, model_params={"attributes": "genderage"})
    rows2 = ai.get_key("fga2", [SI.image(img)]).collect()
    assert dict(rows2[0]["meta"])["gender"] == dict(rows[0]["meta"])["gender"]
    assert dict(rows2[0]["meta"])["age"] == dict(rows[0]["meta"])["age"]
