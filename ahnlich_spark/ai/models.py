"""Model registry mirroring the reference's catalog
(ahnlich/types/src/ai/models.rs:16-29 and the spec table at
ahnlich/ai/src/engine/ai/models.rs:80-230): per-model input type,
embedding size, and input limits. Inference itself is pluggable — the
default is the deterministic stub featurizer (the reference's own tests
mock embeddings from JSON fixtures, SURVEY.md §5)."""

from __future__ import annotations

from dataclasses import dataclass

from ahnlich_spark.types import KIND_AUDIO, KIND_IMAGE, KIND_RAW_STRING


@dataclass(frozen=True)
class ModelSpec:
    name: str
    input_kind: str           # raw_string | image | audio
    embedding_size: int
    max_tokens: int = 0       # text models: token budget
    image_size: int = 0       # image models: expected side length
    sample_rate: int = 0      # audio models: expected sample rate (Hz)
    max_audio_ms: int = 0     # audio models: longest accepted clip
                               # (CLAP rejects > 10s, reference
                               # clap_test test_clap_audio_too_long_rejected)
    one_to_many: bool = False  # one input -> SEVERAL embeddings
                               # (face models; reference models.rs:37-77)
    requires_preprocessing: bool = False  # NoPreprocessing is rejected:
                               # the model's pipeline (face detect ->
                               # align -> embed, or bytes -> mel) cannot
                               # be bypassed (manager/mod.rs:160-175,
                               # 284-297)


MODELS = {
    m.name: m
    for m in [
        ModelSpec("all-minilm-l6-v2", KIND_RAW_STRING, 384, max_tokens=256),
        ModelSpec("all-minilm-l12-v2", KIND_RAW_STRING, 384, max_tokens=256),
        ModelSpec("bge-base-en-v1.5", KIND_RAW_STRING, 768, max_tokens=512),
        ModelSpec("bge-large-en-v1.5", KIND_RAW_STRING, 1024, max_tokens=512),
        ModelSpec("resnet-50", KIND_IMAGE, 2048, image_size=224),
        ModelSpec("clip-vit-b32-image", KIND_IMAGE, 512, image_size=224),
        ModelSpec("clip-vit-b32-text", KIND_RAW_STRING, 512, max_tokens=77),
        ModelSpec("clap-audio", KIND_AUDIO, 512, sample_rate=48000,
                  requires_preprocessing=True, max_audio_ms=10_000),
        ModelSpec("clap-text", KIND_RAW_STRING, 512, max_tokens=77),
        ModelSpec("jina-embeddings-v2-base-code", KIND_RAW_STRING, 768, max_tokens=8192),
        # Face models: one image -> one embedding PER DETECTED FACE
        # (reference models.rs:159-191: SfaceYunet 128-dim, BuffaloL
        # 512-dim, both 640x640 and OneToMany; BuffaloL's baked-in
        # detect->align->embed pipeline rejects NoPreprocessing)
        ModelSpec("buffalo_l", KIND_IMAGE, 512, image_size=640,
                  one_to_many=True, requires_preprocessing=True),
        ModelSpec("sface-yunet", KIND_IMAGE, 128, image_size=640,
                  one_to_many=True),
    ]
}


def get_model(name: str) -> ModelSpec:
    try:
        return MODELS[name]
    except KeyError:
        raise ValueError(f"unknown model {name!r}; one of {sorted(MODELS)}") from None
