from ahnlich_spark.ai.models import MODELS, ModelSpec
from ahnlich_spark.ai.embedder import (
    embed_text_expr,
    embed_binary_expr,
    embed_pandas_udf,
    stub_embed,
)
from ahnlich_spark.ai.proxy import AiEngine

__all__ = [
    "MODELS",
    "ModelSpec",
    "embed_text_expr",
    "embed_binary_expr",
    "embed_pandas_udf",
    "stub_embed",
    "AiEngine",
]
