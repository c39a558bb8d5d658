"""The AI-proxy operation surface (reference: ahnlich/ai/ — 21 ops,
ahnlich/types/src/ai/pipeline.rs:13-60): stores keyed by RAW inputs
(text/image/audio) instead of vectors. The proxy embeds inputs through
the store's models and delegates to the DB engine, preserving:

- per-store query_model / index_model / store_original
  (ahnlich/types/src/ai/query.rs:3-37);
- the reserved metadata key ``_ahnlich_input_key`` holding the original
  input when store_original=true, with user collisions rejected
  (ahnlich/ai/src/engine/store.rs:305-347);
- Set = [DelPred(In(_ahnlich_input_key, inputs)), Set] so re-setting the
  same original replaces the old entry
  (ahnlich/ai/src/engine/operations.rs:229-268);
- input-kind vs model validation.
"""

from __future__ import annotations

from typing import Iterable, List, Optional, Sequence, Tuple

from pyspark.sql import DataFrame

from ahnlich_spark import errors
from ahnlich_spark.ai.embedder import stub_embed
from ahnlich_spark.ai.models import get_model
from ahnlich_spark.catalog import PUBLIC_SCHEMA, AiBinding
from ahnlich_spark.operators.predicates import In, Predicate
from ahnlich_spark.plans.engine import DelResult, Engine, StoreUpsert
from ahnlich_spark.types import (
    AHNLICH_RESERVED_INPUT_KEY,
    KIND_AUDIO,
    KIND_IMAGE,
    KIND_RAW_STRING,
    MetadataValue,
    StoreInput,
)

AiEntry = Tuple[StoreInput, dict]

NO_PREPROCESSING = "nopreprocessing"
MODEL_PREPROCESSING = "modelpreprocessing"


def _norm_action(action: str) -> str:
    """Normalize a PreprocessAction: the reference enum casing
    ('ModelPreprocessing') and any mixed case map onto the canonical
    lowercase values; anything else refuses LOUDLY — a silently
    unmatched spelling would behave as NoPreprocessing, the exact
    opposite of what the caller asked for."""
    a = str(action).lower()
    if a not in (NO_PREPROCESSING, MODEL_PREPROCESSING):
        raise ValueError(
            f"unknown preprocess_action {action!r}: expected "
            f"NoPreprocessing or ModelPreprocessing"
        )
    return a


class AiEngine:
    """AI ops over a DB Engine. One instance serves all AI stores."""

    def __init__(self, engine: Engine):
        self.engine = engine
        self.catalog = engine.catalog

    # ------------------------------------------------------------- DDL --
    def create_store(
        self,
        name: str,
        query_model: str,
        index_model: str,
        predicates: Iterable[str] = (),
        non_linear_indices: Iterable[str] = (),
        error_if_exists: bool = True,
        store_original: bool = True,
        schema: str = PUBLIC_SCHEMA,
    ) -> None:
        qspec, ispec = get_model(query_model), get_model(index_model)
        if qspec.embedding_size != ispec.embedding_size:
            raise ValueError(
                "query and index models must share an embedding size "
                f"({qspec.embedding_size} != {ispec.embedding_size})"
            )
        if self.catalog.has_store(name, schema):
            if error_if_exists:
                raise errors.StoreAlreadyExists(
                    f"store {schema}.{name} already exists"
                )
            # the engine no-ops here too — returning WITHOUT touching
            # the binding is the only sound choice: rebinding would
            # silently point existing vectors at a different model
            # (wrong dims or wrong embedding space), and attaching a
            # binding to a pre-existing plain store never checked its
            # dimension against the model
            return
        self.engine.create_store(
            name,
            dimension=ispec.embedding_size,
            predicates=predicates,
            non_linear_indices=non_linear_indices,
            error_if_exists=error_if_exists,
            schema=schema,
        )
        meta = self.catalog.get_store(name, schema)
        meta.ai = AiBinding(
            query_model=query_model, index_model=index_model, store_original=store_original
        )
        self.catalog.put_store(meta)

    def drop_store(self, name: str, error_if_not_exists: bool = True,
                   schema: str = PUBLIC_SCHEMA) -> int:
        return self.engine.drop_store(name, error_if_not_exists, schema)

    def list_stores(self, schema: str = PUBLIC_SCHEMA) -> list:
        """AI store listing with model bindings (reference AIStoreInfo:
        name + query/index model + embedding size)."""
        out = []
        for meta in self.catalog.list_stores(schema):
            if meta.ai is None:
                continue
            info = self.engine.get_store(meta.name, schema)
            out.append(
                {
                    "name": meta.name,
                    "schema": meta.schema,
                    "len": info.len,
                    "query_model": meta.ai.query_model,
                    "index_model": meta.ai.index_model,
                    "store_original": meta.ai.store_original,
                    "embedding_size": info.dimension,
                }
            )
        return out

    def purge_stores(self, schema: str = PUBLIC_SCHEMA) -> int:
        """Drop ALL AI stores in the schema (ai/query.rs:256). Routed
        through ``Engine.drop_store(cascade_views=True)`` — purge means
        EVERYTHING about the store goes, so managed materialized views
        folding from it are dropped too rather than left dangling (the
        catalog invariant the engine-level guard enforces)."""
        dropped = 0
        for meta in self.catalog.list_stores(schema):
            if meta.ai is not None:
                self.engine.drop_store(meta.name, schema=schema,
                                       cascade_views=True)
                dropped += 1
        return dropped

    # --------------------------------------------------------- helpers --
    def _binding(self, store: str, schema: str) -> AiBinding:
        meta = self.catalog.get_store(store, schema)
        if meta.ai is None:
            raise errors.StoreNotFound(f"{schema}.{store} is not an AI store")
        return meta.ai

    def _validate_kind(self, inp: StoreInput, model: str) -> None:
        spec = get_model(model)
        if inp.kind != spec.input_kind:
            raise errors.InputTypeMismatch(
                f"model {model!r} expects {spec.input_kind}, got {inp.kind}"
            )

    def _preprocess_input(self, inp: StoreInput, model: str, action: str) -> StoreInput:
        """PreprocessAction truth table (reference ai/manager/mod.rs:98-316):

        | kind  | ModelPreprocessing          | NoPreprocessing               |
        |-------|-----------------------------|-------------------------------|
        | text  | truncate to token budget    | error if over budget          |
        | image | resize to expected dims     | error if dims mismatch; face  |
        |       |                             | models reject outright        |
        | audio | resample to expected rate   | CLAP rejects outright (bytes  |
        |       |                             | -> mel cannot be bypassed)    |

        Container probes (PNG/GIF/JPEG dims, WAV sample rate) are real
        pure-Python parsing; the resize/resample TRANSFORMS are
        deterministic stubs behind operators/multimodal.py (no codec
        libs here). Unprobeable content passes through — the real
        decoder would reject it at decode time."""
        from ahnlich_spark.operators import multimodal as MM

        spec = get_model(model)
        if inp.kind == KIND_RAW_STRING and spec.max_tokens:
            toks = (inp.text or "").split()
            if len(toks) > spec.max_tokens:
                if action == MODEL_PREPROCESSING:
                    return StoreInput.raw_string(" ".join(toks[: spec.max_tokens]))
                raise errors.TokenExceeded(
                    f"input has {len(toks)} tokens; model {model!r} allows "
                    f"{spec.max_tokens} (use ModelPreprocessing to truncate)"
                )
            return inp
        if inp.kind == KIND_IMAGE and spec.image_size:
            if action == MODEL_PREPROCESSING:
                return StoreInput.image(
                    MM.resize_image_stub(inp.bin or b"", spec.image_size, spec.image_size)
                )
            if spec.requires_preprocessing:
                raise errors.PreprocessingRequired(
                    f"model {model!r} runs a detect->align->embed pipeline; "
                    "NoPreprocessing cannot be honored (reference "
                    "FaceModelNoPreprocessingError)"
                )
            dims = MM.probe_image_dims(inp.bin or b"")
            want = (spec.image_size, spec.image_size)
            if dims is not None and dims != want:
                raise errors.ImageDimensionsMismatch(
                    f"image is {dims[0]}x{dims[1]}; model {model!r} expects "
                    f"{want[0]}x{want[1]} (use ModelPreprocessing to resize)"
                )
            return inp
        if inp.kind == KIND_AUDIO and spec.sample_rate:
            if spec.requires_preprocessing and action != MODEL_PREPROCESSING:
                raise errors.PreprocessingRequired(
                    f"model {model!r} converts bytes -> mel spectrogram; "
                    "NoPreprocessing cannot be honored (reference "
                    "AudioNoPreprocessingError)"
                )
            if spec.max_audio_ms:
                dur = MM.probe_wav_duration_ms(inp.bin or b"")
                if dur is not None and dur > spec.max_audio_ms:
                    raise errors.AudioTooLong(
                        f"Audio input is too long ({dur}ms); model {model!r} "
                        f"accepts at most {spec.max_audio_ms}ms"
                    )
            sr = MM.probe_wav_sample_rate(inp.bin or b"")
            if sr != spec.sample_rate:
                return StoreInput.audio(
                    MM.resample_audio_stub(inp.bin or b"", spec.sample_rate)
                )
            return inp
        return inp

    def _embed_input(
        self, inp: StoreInput, model: str, preprocess: str = NO_PREPROCESSING,
        model_params: Optional[dict] = None,
    ) -> List[float]:
        self._validate_kind(inp, model)
        inp = self._preprocess_input(inp, model, preprocess)
        spec = get_model(model)
        data = (inp.text or "") if inp.kind == KIND_RAW_STRING else (inp.bin or b"")
        if spec.one_to_many:
            # a face-model QUERY must contain exactly one face AFTER the
            # request's confidence filter: several detections make the
            # query embedding ambiguous and the reference rejects the
            # request instead of picking one
            # (buffalo_l_test.rs get_sim_n_multi_face_query_errors)
            from ahnlich_spark.operators.multimodal import detect_faces_stub

            thr, attrs = self._face_params(model_params)
            faces = detect_faces_stub(data, thr, attrs)
            if len(faces) != 1:
                raise errors.AmbiguousFaceQuery(
                    f"query image must contain exactly one face, detected "
                    f"{len(faces)}"
                )
            crop, _meta = faces[0]
            return stub_embed(crop, spec.embedding_size)
        return stub_embed(data, spec.embedding_size)

    def _expand_one_to_many(self, inp: StoreInput, model: str, preprocess: str,
                            model_params: Optional[dict] = None):
        """(vector, face_metadata) per DETECTED face — the reference's
        ModelResponse::OneToMany (models.rs:51-57): one image yields
        several embeddings, each carrying its detection metadata.
        ``model_params`` tunes the detector (confidence_threshold) and
        enables the second-stage attribute model (attributes=genderage)."""
        from ahnlich_spark.operators.multimodal import detect_faces_stub

        self._validate_kind(inp, model)
        prep = self._preprocess_input(inp, model, preprocess)
        spec = get_model(model)
        thr, attrs = self._face_params(model_params)
        out = []
        for crop, fmeta in detect_faces_stub(prep.bin or b"", thr, attrs):
            out.append((stub_embed(crop, spec.embedding_size), fmeta))
        return out

    @staticmethod
    def _face_params(model_params):
        """Reference model_params -> (confidence_threshold, attributes)
        for the face pipeline (buffalo_l_test.rs optimized_face_params /
        genderage_params); unknown keys pass through untouched like the
        reference's HashMap."""
        mp = model_params or {}
        return float(mp.get("confidence_threshold", 0.0)), mp.get("attributes", "")

    @staticmethod
    def _input_mv(inp: StoreInput) -> MetadataValue:
        return inp.to_metadata_value()

    # ------------------------------------------------------------ ops --
    def set(
        self,
        store: str,
        inputs,
        schema: str = PUBLIC_SCHEMA,
        preprocess_action: str = NO_PREPROCESSING,
        input_col: str = "input",
        meta_col: Optional[str] = None,
        execution_provider: Optional[str] = None,
        model_params: Optional[dict] = None,
    ) -> StoreUpsert:
        """AI Set. ``inputs`` is either a small list of (StoreInput,
        meta) pairs — embedded driver-side, DSL-sized — or a DataFrame
        of raw inputs for BULK ingest, embedded executor-side through
        the Arrow-batched UDF (no driver loop, no collect). Both paths
        fold the reference's DelPred-before-Set (re-setting the same
        original replaces the old entry, operations.rs:229-268) into
        ONE store rewrite."""
        from ahnlich_spark.ai.embedder import ort_providers

        ort_providers(execution_provider)  # validate eagerly (ref enum decode)
        preprocess_action = _norm_action(preprocess_action)
        if isinstance(inputs, DataFrame):
            return self._set_bulk(
                store, inputs, schema, preprocess_action, input_col, meta_col,
                execution_provider, model_params,
            )
        binding = self._binding(store, schema)
        one_to_many = get_model(binding.index_model).one_to_many
        entries = []
        originals = []
        for inp, meta in inputs:
            if meta and AHNLICH_RESERVED_INPUT_KEY in meta:
                raise errors.ReservedKeyError(
                    f"metadata key {AHNLICH_RESERVED_INPUT_KEY!r} is reserved"
                )
            if one_to_many:
                # one input -> one row PER DETECTED FACE, user metadata
                # merged with per-face detection metadata. The original
                # registers for the replace-purge ONCE PER INPUT and
                # UNCONDITIONALLY on the face count: a re-set whose
                # stricter confidence filter detects ZERO faces must
                # still purge the input's prior rows (the reference
                # pipelines DelPred(In(reserved, inputs)) over the
                # request's inputs, operations.rs:229-268) — and a
                # 3-face image must not repeat its full image bytes 3x
                # in the predicate
                if binding.store_original:
                    originals.append(self._input_mv(inp))
                per_face = self._expand_one_to_many(
                    inp, binding.index_model, preprocess_action, model_params
                )
                for vec, fmeta in per_face:
                    m = dict(meta or {})
                    m.update(fmeta)
                    if binding.store_original:
                        m[AHNLICH_RESERVED_INPUT_KEY] = self._input_mv(inp)
                    entries.append((vec, m))
                continue
            vec = self._embed_input(inp, binding.index_model, preprocess_action)
            m = dict(meta or {})
            if binding.store_original:
                m[AHNLICH_RESERVED_INPUT_KEY] = self._input_mv(inp)
                originals.append(self._input_mv(inp))
            entries.append((vec, m))
        # re-SET of the same original deletes the prior entry INSIDE the
        # same rewrite (reference pipelines [DelPred, Set])
        cond = (
            In(AHNLICH_RESERVED_INPUT_KEY, tuple(originals)) if originals else None
        )
        return self.engine.set(store, entries, schema, remove_condition=cond)

    def _set_bulk(
        self,
        store: str,
        df: DataFrame,
        schema: str,
        preprocess_action: str,
        input_col: str,
        meta_col: Optional[str],
        execution_provider: Optional[str] = None,
        model_params: Optional[dict] = None,
    ) -> StoreUpsert:
        """Bulk AI Set: embed a DataFrame of raw inputs executor-side.

        Plan shape (scale path): one Arrow-batched embedding projection
        over the batch, metadata wrapped JVM-side, prior entries for the
        same originals removed via a distributed anti-join on the
        reserved key — all inside the engine's single count+rewrite.
        ``meta_col`` names an optional MAP<STRING, STRING> column of user
        metadata; the reserved key is rejected there."""
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        from ahnlich_spark.ai.embedder import embed_pandas_udf
        from ahnlich_spark.types import META_MAP_TYPE, META_VALUE_TYPE

        binding = self._binding(store, schema)
        spec = get_model(binding.index_model)
        if spec.one_to_many:
            return self._set_bulk_one_to_many(
                store, df, schema, preprocess_action, input_col, meta_col,
                binding, spec, model_params,
            )
        kind = "text" if spec.input_kind == KIND_RAW_STRING else "binary"
        raw = F.col(input_col).cast("string" if kind == "text" else "binary")
        # the ORIGINAL is always the pre-preprocessing input (the list
        # path stores the untouched StoreInput): a truncated/resized
        # original would make the same text unreachable by get_key and
        # stop re-sets from replacing the row
        orig_raw = raw

        if kind == "binary":
            # plan-time half of the preprocessing truth table — same
            # refusals as the list path's _preprocess_input; the
            # row-level half (dims probe, duration cap, resize/resample)
            # runs inside the embed UDF (embedder._prep_binary)
            if spec.requires_preprocessing                     and preprocess_action != MODEL_PREPROCESSING:
                raise errors.PreprocessingRequired(
                    f"model {binding.index_model!r} cannot honor "
                    "NoPreprocessing (reference "
                    "*NoPreprocessingError); pass ModelPreprocessing"
                )

        if kind == "text" and spec.max_tokens:
            toks = F.split(F.trim(raw), r"\s+")
            if preprocess_action == MODEL_PREPROCESSING:
                raw = F.when(
                    F.size(toks) > spec.max_tokens,
                    F.concat_ws(" ", F.slice(toks, 1, spec.max_tokens)),
                ).otherwise(raw)
            else:
                over = df.filter(F.size(toks) > spec.max_tokens).limit(1).count()
                if over:
                    raise errors.TokenExceeded(
                        f"batch contains inputs over model "
                        f"{binding.index_model!r}'s {spec.max_tokens}-token "
                        "budget (use ModelPreprocessing to truncate)"
                    )

        if meta_col is not None:
            if df.filter(
                F.map_contains_key(F.col(meta_col), AHNLICH_RESERVED_INPUT_KEY)
            ).limit(1).count():
                raise errors.ReservedKeyError(
                    f"metadata key {AHNLICH_RESERVED_INPUT_KEY!r} is reserved"
                )
            user_meta = F.transform_values(
                F.col(meta_col),
                lambda _k, v: F.struct(
                    F.lit(KIND_RAW_STRING).alias("kind"),
                    v.cast("string").alias("s"),
                    F.lit(None).cast("binary").alias("bin"),
                ),
            )
        else:
            user_meta = F.create_map().cast(META_MAP_TYPE)

        # the original input as a MetadataValue struct (matches
        # StoreInput.to_metadata_value for each kind)
        if kind == "text":
            orig_mv = F.struct(
                F.lit(KIND_RAW_STRING).alias("kind"),
                orig_raw.alias("s"),
                F.lit(None).cast("binary").alias("bin"),
            )
        else:
            orig_mv = F.struct(
                F.lit(spec.input_kind).alias("kind"),
                F.lit(None).cast("string").alias("s"),
                orig_raw.alias("bin"),
            )

        meta_expr = user_meta
        remove = None
        if binding.store_original:
            meta_expr = F.map_concat(
                user_meta,
                F.create_map(F.lit(AHNLICH_RESERVED_INPUT_KEY), orig_mv),
            )
            remove = (
                AHNLICH_RESERVED_INPUT_KEY,
                df.select(orig_mv.cast(META_VALUE_TYPE).alias("mv")),
            )

        udf = embed_pandas_udf(
            binding.index_model, kind=kind,
            execution_provider=execution_provider,
            preprocess_action=preprocess_action if kind == "binary" else None,
        )
        batch = df.select(
            udf(raw).alias("key"), meta_expr.cast(META_MAP_TYPE).alias("meta")
        )
        return self.engine.set(store, batch, schema, remove_meta_matches=remove)

    def _set_bulk_one_to_many(
        self, store, df, schema, preprocess_action, input_col, meta_col,
        binding, spec, model_params=None
    ) -> StoreUpsert:
        """Bulk OneToMany ingest: one mapInPandas pass expands each image
        into its per-face rows (preprocess -> detect -> embed, all
        executor-side; row explosion stays inside the partition), then
        the standard JVM-side metadata wrap + single count+rewrite."""
        from typing import Iterator

        import pandas as pd
        from pyspark.sql import functions as F

        from ahnlich_spark.types import META_MAP_TYPE, META_VALUE_TYPE

        if spec.requires_preprocessing and preprocess_action != MODEL_PREPROCESSING:
            raise errors.PreprocessingRequired(
                f"model {binding.index_model!r} runs a detect->align->embed "
                "pipeline; NoPreprocessing cannot be honored"
            )
        has_meta = meta_col is not None
        if has_meta:
            if df.filter(
                F.map_contains_key(F.col(meta_col), AHNLICH_RESERVED_INPUT_KEY)
            ).limit(1).count():
                raise errors.ReservedKeyError(
                    f"metadata key {AHNLICH_RESERVED_INPUT_KEY!r} is reserved"
                )
        cols = [F.col(input_col).cast("binary").alias("_in")]
        if has_meta:
            cols.append(F.col(meta_col).alias("_m"))
        src = df.select(*cols)

        dim = spec.embedding_size
        size = spec.image_size
        action = preprocess_action
        thr, attrs = self._face_params(model_params)

        def expand(batches):
            import numpy as np

            from ahnlich_spark.ai.embedder import _codes_np, _stub_embed_np
            from ahnlich_spark.operators.multimodal import (
                detect_faces_stub,
                probe_image_dims,
                resize_image_stub,
            )

            for pdf in batches:
                origs, metas, keys = [], [], []
                for ix in range(len(pdf)):
                    b = bytes(pdf["_in"].iloc[ix] or b"")
                    um = dict(pdf["_m"].iloc[ix] or {}) if has_meta else {}
                    if action == MODEL_PREPROCESSING:
                        content = resize_image_stub(b, size, size)
                    else:
                        # same dims refusal as the list path's
                        # _preprocess_input; inside an Arrow batch the
                        # typed channel is gone but the job fails
                        # BEFORE the engine writes anything
                        dims = probe_image_dims(b)
                        if dims is not None and dims != (size, size):
                            raise RuntimeError(
                                f"ImageDimensionsMismatch: image is "
                                f"{dims[0]}x{dims[1]}; model expects "
                                f"{size}x{size} (use ModelPreprocessing "
                                f"to resize)"
                            )
                        content = b
                    for crop, fmeta in detect_faces_stub(content, thr, attrs):
                        m = dict(um)
                        m.update(fmeta)
                        origs.append(b)
                        metas.append(m)
                        keys.append(
                            [float(x) for x in _stub_embed_np(_codes_np(crop), dim)]
                        )
                yield pd.DataFrame({"orig": origs, "m": metas, "key": keys})

        expand.__annotations__ = {
            "batches": Iterator[pd.DataFrame], "return": Iterator[pd.DataFrame],
        }
        faces = src.mapInPandas(
            expand, "orig binary, m map<string,string>, key array<float>"
        )
        user_meta = F.transform_values(
            F.col("m"),
            lambda _k, v: F.struct(
                F.lit(KIND_RAW_STRING).alias("kind"),
                v.cast("string").alias("s"),
                F.lit(None).cast("binary").alias("bin"),
            ),
        )
        orig_mv = F.struct(
            F.lit(spec.input_kind).alias("kind"),
            F.lit(None).cast("string").alias("s"),
            F.col("orig").alias("bin"),
        )
        meta_expr = user_meta
        remove = None
        if binding.store_original:
            meta_expr = F.map_concat(
                user_meta, F.create_map(F.lit(AHNLICH_RESERVED_INPUT_KEY), orig_mv)
            )
            # the purge set comes from the INPUT frame, not the
            # post-explosion faces: an input whose faces are ALL
            # filtered out must still purge its prior rows (reference
            # DelPred(In(reserved, inputs)) runs over the REQUEST's
            # inputs, operations.rs:229-268), and a 3-face image must
            # not repeat its bytes 3x in the predicate
            src_orig_mv = F.struct(
                F.lit(spec.input_kind).alias("kind"),
                F.lit(None).cast("string").alias("s"),
                F.col("_in").alias("bin"),
            )
            remove = (
                AHNLICH_RESERVED_INPUT_KEY,
                src.select(src_orig_mv.cast(META_VALUE_TYPE).alias("mv")),
            )
        batch = faces.select(
            F.col("key"), meta_expr.cast(META_MAP_TYPE).alias("meta")
        )
        return self.engine.set(store, batch, schema, remove_meta_matches=remove)

    def _to_store_input_frame(self, df: DataFrame, binding: AiBinding) -> DataFrame:
        """Convert DB-entry rows back to AI-surface rows (reference
        handler.rs:339-425 + ai/src/engine/store.rs:526-546): the
        reserved original becomes the leading ``input`` column and is
        POPPED from the returned metadata. Without store_original there
        is no original to recover — rows pass through unchanged."""
        if not binding.store_original:
            return df
        from pyspark.sql import functions as F

        keep = [c for c in df.columns if c not in ("id", "key", "meta")]
        return df.select(
            F.col("meta")[AHNLICH_RESERVED_INPUT_KEY].alias("input"),
            F.map_filter(
                F.col("meta"), lambda k, _v: k != F.lit(AHNLICH_RESERVED_INPUT_KEY)
            ).alias("meta"),
            *keep,
        )

    def get_sim_n(
        self,
        store: str,
        search_input: StoreInput,
        closest_n: int = 1,
        algorithm: str = "cosine_similarity",
        condition: Optional[Predicate] = None,
        schema: str = PUBLIC_SCHEMA,
        preprocess_action: str = NO_PREPROCESSING,
        precision: str = "float",
        execution_provider: Optional[str] = None,
        model_params: Optional[dict] = None,
    ) -> DataFrame:
        from ahnlich_spark.ai.embedder import ort_providers

        ort_providers(execution_provider)  # validate eagerly (ref enum decode)
        preprocess_action = _norm_action(preprocess_action)
        binding = self._binding(store, schema)
        vec = self._embed_input(search_input, binding.query_model,
                                preprocess_action, model_params)
        out = self.engine.get_sim_n(
            store, vec, closest_n, algorithm, condition, schema, precision=precision
        )
        return self._to_store_input_frame(out, binding)

    def get_sim_n_batch(
        self,
        store: str,
        search_inputs: Sequence[StoreInput],
        closest_n: int = 1,
        algorithm: str = "cosine_similarity",
        schema: str = PUBLIC_SCHEMA,
        preprocess_action: str = NO_PREPROCESSING,
        precision: str = "float",
        execution_provider: Optional[str] = None,
    ) -> DataFrame:
        """Batch AI retrieval (engine extension — the reference answers
        one GetSimN per request; eval/retrieval pipelines ask thousands):
        every input embeds through the query model, the WHOLE batch is
        answered by one engine plan (linear scoring, or the pruned
        hnsw/ivf/pq batch paths when those indexes exist), and results
        convert back to original-input rows. Output rows carry ``qid``
        (the input's position in ``search_inputs``) + ``rank_n``."""
        from ahnlich_spark.ai.embedder import ort_providers

        ort_providers(execution_provider)  # validate eagerly (ref enum decode)
        preprocess_action = _norm_action(preprocess_action)
        binding = self._binding(store, schema)
        probes = [
            (i, self._embed_input(inp, binding.query_model, preprocess_action))
            for i, inp in enumerate(search_inputs)
        ]
        out = self.engine.get_sim_n_batch(
            store, probes, closest_n, algorithm, None, schema, precision=precision
        )
        return self._to_store_input_frame(out, binding)

    def get_pred(
        self, store: str, condition: Predicate, schema: str = PUBLIC_SCHEMA
    ) -> DataFrame:
        """Predicate lookup with results converted back to ORIGINAL
        inputs (reference AI GetPred returns GetEntry{StoreInput, value},
        aiproxy_test test_ai_proxy_get_pred_succeeds)."""
        binding = self._binding(store, schema)
        return self._to_store_input_frame(
            self.engine.get_pred(store, condition, schema), binding
        )

    def get_key(
        self, store: str, inputs: Sequence[StoreInput],
        schema: str = PUBLIC_SCHEMA,
        preprocess_action: str = NO_PREPROCESSING,
        model_params: Optional[dict] = None,
    ) -> DataFrame:
        """Lookup by ORIGINAL input via the reserved predicate
        (grammar: ai_get_key, syntax.pest:64-65). Results convert back
        to AI-surface rows like get_pred (input column leading, the
        reserved key popped from meta — store.rs:526-546 applies to
        every AI read). Without store_original the lookup re-embeds the
        inputs, so ``preprocess_action``/``model_params`` must match
        the ingest's (a row ingested with ModelPreprocessing truncation
        is only reachable by the same action)."""
        preprocess_action = _norm_action(preprocess_action)
        binding = self._binding(store, schema)
        if binding.store_original:
            cond = In(AHNLICH_RESERVED_INPUT_KEY, tuple(self._input_mv(i) for i in inputs))
            return self._to_store_input_frame(
                self.engine.get_pred(store, cond, schema), binding
            )
        keys = [
            self._embed_input(i, binding.index_model, preprocess_action,
                              model_params)
            for i in inputs
        ]
        return self.engine.get_key(store, keys, schema)

    def del_key(
        self, store: str, inputs: Sequence[StoreInput],
        schema: str = PUBLIC_SCHEMA,
        preprocess_action: str = NO_PREPROCESSING,
        model_params: Optional[dict] = None,
    ) -> DelResult:
        preprocess_action = _norm_action(preprocess_action)
        binding = self._binding(store, schema)
        if binding.store_original:
            cond = In(AHNLICH_RESERVED_INPUT_KEY, tuple(self._input_mv(i) for i in inputs))
            return self.engine.del_pred(store, cond, schema)
        keys = [
            self._embed_input(i, binding.index_model, preprocess_action,
                              model_params)
            for i in inputs
        ]
        return self.engine.del_key(store, keys, schema)

    def upsert(
        self,
        store: str,
        condition: Predicate,
        new_input: Optional[StoreInput] = None,
        new_value: Optional[dict] = None,
        merge_metadata: bool = True,
        schema: str = PUBLIC_SCHEMA,
        preprocess_action: str = NO_PREPROCESSING,
        execution_provider: Optional[str] = None,
        model_params: Optional[dict] = None,
    ) -> StoreUpsert:
        """Single-row conditional update with re-embedding
        (ahnlich/ai/src/engine/store.rs:433-498). The AI proxy always
        MERGES metadata (reference ai/src/engine/operations.rs:345-351) —
        an input-only upsert must not wipe the row's user metadata — so
        merge is the default and the reserved original-input key is
        folded into the merge delta."""
        from ahnlich_spark.ai.embedder import ort_providers

        ort_providers(execution_provider)  # validate eagerly (ref enum decode)
        preprocess_action = _norm_action(preprocess_action)
        if new_value and AHNLICH_RESERVED_INPUT_KEY in new_value:
            # same guard as Set (reference store.rs:305-347): a
            # user-supplied reserved key would overwrite the stored
            # original WITHOUT re-embedding — get_key by the real
            # original then misses the row and re-sets stop replacing it
            raise errors.ReservedKeyError(
                f"metadata key {AHNLICH_RESERVED_INPUT_KEY!r} is reserved"
            )
        binding = self._binding(store, schema)
        new_key = None
        if new_input is not None:
            new_key = self._embed_input(new_input, binding.index_model,
                                        preprocess_action, model_params)
            if binding.store_original:
                new_value = dict(new_value or {})
                new_value[AHNLICH_RESERVED_INPUT_KEY] = self._input_mv(new_input)
        return self.engine.upsert(store, condition, new_key, new_value, merge_metadata, schema)

    def convert_store_input_to_embeddings(
        self, df: DataFrame, model: str, input_col: str = "text",
        kind: str = "text", execution_provider: Optional[str] = None,
        model_params: Optional[dict] = None,
    ) -> DataFrame:
        # model_params accepted for wire parity (ai/query.rs:344); the
        # text/image embedding stub has no tunables to honor
        """Pure embedding call, no store (ai/query.rs:326-346): adds an
        ``embedding ARRAY<FLOAT>`` column via the Arrow-batched UDF."""
        from pyspark.sql import functions as F

        from ahnlich_spark.ai.embedder import embed_pandas_udf

        udf = embed_pandas_udf(model, kind=kind,
                               execution_provider=execution_provider)
        return df.withColumn("embedding", udf(F.col(input_col)))
