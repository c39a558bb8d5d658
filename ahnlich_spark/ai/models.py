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
        ModelSpec("clap-audio", KIND_AUDIO, 512),
        ModelSpec("clap-text", KIND_RAW_STRING, 512, max_tokens=77),
        ModelSpec("jina-embeddings-v2-base-code", KIND_RAW_STRING, 768, max_tokens=8192),
    ]
}


def get_model(name: str) -> ModelSpec:
    try:
        return MODELS[name]
    except KeyError:
        raise ValueError(f"unknown model {name!r}; one of {sorted(MODELS)}") from None
