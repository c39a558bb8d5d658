"""AI-proxy surface tests (reference: ahnlich/ai/src/tests/aiproxy_test.rs
behaviors): store_original + reserved key, re-set replacement, lookup by
original input, preprocess-action token budget, model validation."""

import pytest

from ahnlich_spark import errors
from ahnlich_spark.ai import AiEngine, stub_embed
from ahnlich_spark.types import AHNLICH_RESERVED_INPUT_KEY, StoreInput

SI = StoreInput.raw_string
MODEL = "all-minilm-l6-v2"  # 384 dims, 256-token budget


@pytest.fixture
def ai(engine):
    return AiEngine(engine)


def _mk(ai, name="texts", store_original=True, **kw):
    ai.create_store(name, query_model=MODEL, index_model=MODEL,
                    store_original=store_original, **kw)


def test_set_and_get_sim_n_roundtrip(ai):
    _mk(ai)
    r = ai.set("texts", [(SI("alpha beta"), {"n": "1"}), (SI("gamma"), {"n": "2"})])
    assert (r.inserted, r.updated) == (2, 0)
    top = ai.get_sim_n("texts", SI("alpha beta"), closest_n=1).collect()
    assert len(top) == 1 and abs(top[0]["similarity"] - 1.0) < 1e-6


def test_reserved_key_collision_rejected(ai):
    _mk(ai)
    with pytest.raises(errors.ReservedKeyError):
        ai.set("texts", [(SI("x"), {AHNLICH_RESERVED_INPUT_KEY: "boom"})])


def test_re_set_same_original_replaces(ai):
    """Reference operations.rs:229-243: AI Set pipelines
    [DelPred(In(reserved, inputs)), Set] — the old entry for the same
    original is deleted first, so the store never grows."""
    _mk(ai)
    ai.set("texts", [(SI("doc one"), {"v": "1"})])
    ai.set("texts", [(SI("doc one"), {"v": "2"})])
    rows = ai.get_key("texts", [SI("doc one")]).collect()
    assert len(rows) == 1
    assert rows[0]["meta"]["v"]["s"] == "2"
    assert ai.engine.get_store("texts").len == 1


def test_get_key_and_del_key_by_original(ai):
    _mk(ai)
    ai.set("texts", [(SI("aaa"), {}), (SI("bbb"), {})])
    assert ai.get_key("texts", [SI("aaa")]).count() == 1
    assert ai.del_key("texts", [SI("aaa")]).deleted_count == 1
    assert ai.engine.get_store("texts").len == 1


def test_without_store_original_lookup_by_vector(ai):
    _mk(ai, name="novecs", store_original=False)
    ai.set("novecs", [(SI("hello"), {"k": "v"})])
    rows = ai.get_key("novecs", [SI("hello")]).collect()
    assert len(rows) == 1
    assert AHNLICH_RESERVED_INPUT_KEY not in rows[0]["meta"]


def test_token_budget_no_preprocessing_errors(ai):
    _mk(ai)
    long_text = " ".join(f"w{i}" for i in range(300))  # > 256-token budget
    with pytest.raises(errors.TokenExceeded):
        ai.set("texts", [(SI(long_text), {})])


def test_token_budget_model_preprocessing_truncates(ai):
    _mk(ai)
    toks = [f"w{i}" for i in range(300)]
    ai.set("texts", [(SI(" ".join(toks)), {})],
           preprocess_action="modelpreprocessing")
    # embedding equals the explicit 256-token truncation
    truncated = " ".join(toks[:256])
    top = ai.get_sim_n("texts", SI(truncated), closest_n=1,
                       preprocess_action="nopreprocessing").collect()
    assert abs(top[0]["similarity"] - 1.0) < 1e-6


def test_input_kind_mismatch(ai):
    _mk(ai)
    with pytest.raises(errors.InputTypeMismatch):
        ai.set("texts", [(StoreInput.image(b"\x01\x02"), {})])


def test_query_index_model_dimension_guard(ai):
    with pytest.raises(ValueError):
        ai.create_store("bad", query_model=MODEL, index_model="bge-large-en-v1.5")


def test_list_and_purge_stores(ai):
    _mk(ai, name="a1")
    _mk(ai, name="a2")
    ai.engine.create_store("plain_db", dimension=4)  # not an AI store
    infos = {i["name"]: i for i in ai.list_stores()}
    assert set(infos) == {"a1", "a2"}
    assert infos["a1"]["index_model"] == MODEL
    assert infos["a1"]["embedding_size"] == 384
    assert ai.purge_stores() == 2
    assert ai.list_stores() == []
    assert ai.engine.get_store("plain_db").dimension == 4  # survives purge


def test_convert_store_input_to_embeddings(ai, spark):
    df = spark.createDataFrame([("hello",), ("world",)], "text string")
    out = ai.convert_store_input_to_embeddings(df, MODEL).collect()
    by_text = {r["text"]: r["embedding"] for r in out}
    for text, emb in by_text.items():
        assert len(emb) == 384
        want = stub_embed(text, 384)
        assert [round(float(x), 6) for x in emb[:5]] == [round(w, 6) for w in want[:5]]


def test_input_only_upsert_preserves_user_metadata(ai):
    """Reference ai/src/engine/operations.rs:345-351: AI upsert always
    MERGES — changing only the input must not wipe user metadata."""
    from ahnlich_spark.operators.predicates import Equals

    _mk(ai)
    ai.set("texts", [(SI("original text"), {"author": "ada", "v": "1"})])
    ai.upsert("texts", Equals("author", "ada"), new_input=SI("revised text"))
    rows = ai.get_key("texts", [SI("revised text")]).collect()
    assert len(rows) == 1
    m = rows[0]["meta"]
    assert m["author"]["s"] == "ada" and m["v"]["s"] == "1"
    # get_key converts like every AI read: the original rides the
    # leading input column and the reserved key is POPPED from meta
    assert rows[0]["input"]["s"] == "revised text"
    assert AHNLICH_RESERVED_INPUT_KEY not in m


def test_upsert_merge_updates_only_named_keys(ai):
    from ahnlich_spark.operators.predicates import Equals

    _mk(ai)
    ai.set("texts", [(SI("doc"), {"author": "ada", "v": "1"})])
    ai.upsert("texts", Equals("author", "ada"), new_value={"v": "2"})
    rows = ai.get_key("texts", [SI("doc")]).collect()
    m = rows[0]["meta"]
    assert m["author"]["s"] == "ada" and m["v"]["s"] == "2"


def test_bulk_set_dataframe_counts_and_replace(ai, spark):
    """DataFrame bulk ingest: executor-side embedding, metadata wrap,
    reserved-original replace folded into one rewrite."""
    _mk(ai, "bulk")
    df = spark.createDataFrame(
        [(f"text number {i}", {"n": str(i)}) for i in range(50)],
        "input string, m map<string,string>",
    )
    r1 = ai.set("bulk", df, meta_col="m")
    assert (r1.inserted, r1.updated) == (50, 0)
    # re-set a subset: prior entries for the same originals are removed
    # inside the same write (reference DelPred-before-Set), so the store
    # never grows and the rows count as fresh inserts
    sub = df.limit(10)
    r2 = ai.set("bulk", sub, meta_col="m")
    assert ai.engine.get_store("bulk").len == 50
    rows = ai.get_key("bulk", [SI("text number 3")]).collect()
    assert len(rows) == 1
    assert rows[0]["meta"]["n"]["s"] == "3"
    # get_key converts like every AI read: input column leading,
    # reserved key popped
    assert rows[0]["input"]["s"] == "text number 3"
    assert AHNLICH_RESERVED_INPUT_KEY not in rows[0]["meta"]


def test_bulk_set_reserved_key_rejected(ai, spark):
    _mk(ai, "bulkr")
    df = spark.createDataFrame(
        [("x", {AHNLICH_RESERVED_INPUT_KEY: "boom"})], "input string, m map<string,string>"
    )
    with pytest.raises(errors.ReservedKeyError):
        ai.set("bulkr", df, meta_col="m")


def test_bulk_set_token_budget(ai, spark):
    _mk(ai, "bulkt")
    long_text = " ".join(["tok"] * 300)  # over the 256-token budget
    df = spark.createDataFrame([(long_text,)], "input string")
    with pytest.raises(errors.TokenExceeded):
        ai.set("bulkt", df)
    # ModelPreprocessing truncates what is EMBEDDED; the stored
    # original is the full pre-preprocessing input, exactly like the
    # list path — so the same text stays reachable by get_key and a
    # re-set keeps replacing the row
    r = ai.set("bulkt", df, preprocess_action="modelpreprocessing")
    assert r.inserted == 1
    assert ai.get_key(
        "bulkt", [SI(long_text)],
        preprocess_action="modelpreprocessing").count() == 1
    r2 = ai.set("bulkt", df, preprocess_action="modelpreprocessing")
    assert ai.engine.get_store("bulkt").len == 1   # replaced, not grown


def test_bulk_set_matches_list_path_vectors(ai, spark):
    """The bulk path must embed to the SAME vectors as the driver-side
    list path (same stub math, Arrow-batched)."""
    _mk(ai, "bulka")
    _mk(ai, "bulkb")
    texts = ["alpha beta", "gamma delta", "épsilon"]
    ai.set("bulka", [(SI(t), {}) for t in texts])
    ai.set("bulkb", spark.createDataFrame([(t,) for t in texts], "input string"))
    ka = {tuple(r["key"]) for r in ai.engine.store_df("bulka").collect()}
    kb = {tuple(r["key"]) for r in ai.engine.store_df("bulkb").collect()}
    assert ka == kb


def test_get_sim_n_returns_original_inputs(ai):
    """Reference handler.rs:339-425: AI GetSimN results surface the
    ORIGINAL input as the entry key, with the reserved key popped from
    the returned metadata."""
    _mk(ai, "conv")
    ai.set("conv", [(SI("hello world"), {"n": "1"}), (SI("other text"), {"n": "2"})])
    top = ai.get_sim_n("conv", SI("hello world"), closest_n=1).collect()
    assert len(top) == 1
    row = top[0]
    assert row["input"]["s"] == "hello world"
    assert row["input"]["kind"] == "raw_string"
    assert AHNLICH_RESERVED_INPUT_KEY not in row["meta"]
    assert row["meta"]["n"]["s"] == "1"
    assert abs(row["similarity"] - 1.0) < 1e-6


def test_get_sim_n_without_store_original_passthrough(ai):
    _mk(ai, "conv2", store_original=False)
    ai.set("conv2", [(SI("abc"), {})])
    top = ai.get_sim_n("conv2", SI("abc"), closest_n=1).collect()
    assert "key" in top[0].asDict()  # vector rows pass through unchanged


def test_ai_get_sim_n_batch_matches_single(spark, warehouse):
    """Batch AI retrieval: per-input results equal the single-input
    get_sim_n results, with qid identifying the input."""
    from ahnlich_spark.ai.proxy import AiEngine
    from ahnlich_spark.plans.engine import Engine
    from ahnlich_spark.types import StoreInput

    ai = AiEngine(Engine(spark, warehouse))
    ai.create_store("batch", query_model="all-minilm-l6-v2",
                    index_model="all-minilm-l6-v2")
    docs = [f"document number {i} about topic {i % 3}" for i in range(30)]
    ai.set("batch", [(StoreInput.raw_string(t), {"i": str(i)})
                     for i, t in enumerate(docs)])
    queries = [StoreInput.raw_string("document number 4 about topic 1"),
               StoreInput.raw_string("totally different query text")]
    batch = ai.get_sim_n_batch("batch", queries, closest_n=3)
    by_q = {}
    for r in batch.collect():
        by_q.setdefault(r["qid"], []).append((r["rank_n"], r["input"]["s"]))
    assert set(by_q) == {0, 1}
    for qi, q in enumerate(queries):
        single = [r["input"]["s"] for r in
                  ai.get_sim_n("batch", q, closest_n=3).collect()]
        assert [s for _rn, s in sorted(by_q[qi])] == single


def test_ai_get_pred_returns_original_inputs(ai):
    """Reference parity (aiproxy_test test_ai_proxy_get_pred_succeeds):
    AI GetPred entries carry the ORIGINAL input, reserved key popped."""
    from ahnlich_spark.operators.predicates import Equals

    ai.create_store("predconv", query_model="all-minilm-l6-v2",
                    index_model="all-minilm-l6-v2")
    ai.set("predconv", [(SI("Jordan 3"), {"brand": "Nike"}),
                        (SI("Air Force 1"), {"brand": "Nike"}),
                        (SI("Samba"), {"brand": "Adidas"})])
    rows = ai.get_pred("predconv", Equals("brand", "Nike")).collect()
    assert {r["input"]["s"] for r in rows} == {"Jordan 3", "Air Force 1"}
    assert all("_ahnlich_input_key" not in dict(r["meta"]) for r in rows)


def test_dsl_ai_getpred_converts_originals(ai, spark):
    from ahnlich_spark.dsl.executor import DslExecutor

    ai.create_store("dslpred", query_model="all-minilm-l6-v2",
                    index_model="all-minilm-l6-v2")
    ai.set("dslpred", [(SI("hello"), {"t": "x"})])
    ex = DslExecutor(ai.engine, ai)
    (res,) = ex.execute_ai("GETPRED ((t = x)) IN dslpred")
    assert res.ok, res.error
    rows = res.result.collect()
    assert rows and rows[0]["input"]["s"] == "hello"


def test_create_store_no_silent_rebinding(ai):
    """create_store with error_if_exists=False must NOT rebind an
    existing store's models: a rebind would point existing vectors at a
    different embedding space (or wrong dims) with no error."""
    _mk(ai, "rb")
    ai.set("rb", [(SI("hello"), {})])
    ai.create_store("rb", query_model="bge-base-en-v1.5",
                    index_model="bge-base-en-v1.5", error_if_exists=False)
    info = {i["name"]: i for i in ai.list_stores()}["rb"]
    assert info["index_model"] == MODEL          # binding untouched
    assert ai.get_key("rb", [SI("hello")]).count() == 1   # still works
    with pytest.raises(errors.StoreAlreadyExists):
        ai.create_store("rb", query_model=MODEL, index_model=MODEL)


def test_upsert_rejects_reserved_key_value(ai):
    """A value-only upsert must not smuggle the reserved key past the
    guard Set enforces — it would overwrite the stored original without
    re-embedding."""
    from ahnlich_spark.operators.predicates import Equals

    _mk(ai, "ur")
    ai.set("ur", [(SI("real input"), {"author": "ada"})])
    with pytest.raises(errors.ReservedKeyError):
        ai.upsert("ur", Equals("author", "ada"),
                  new_value={AHNLICH_RESERVED_INPUT_KEY: "fake"})


def test_preprocess_action_casing_normalized(ai):
    """The reference enum casing ('ModelPreprocessing') works, and an
    unknown spelling refuses loudly instead of silently behaving as
    NoPreprocessing."""
    _mk(ai, "pc")
    long_text = " ".join(["tok"] * 300)
    r = ai.set("pc", [(SI(long_text), {})],
               preprocess_action="ModelPreprocessing")   # ref casing
    assert r.inserted == 1
    with pytest.raises(ValueError, match="preprocess_action"):
        ai.set("pc", [(SI("x"), {})], preprocess_action="truncate")


def test_bulk_binary_preprocessing_parity(ai, spark):
    """Bulk binary ingest applies the SAME preprocessing truth table as
    the list path: requires_preprocessing models refuse NoPreprocessing
    at plan time, a mismatched-dims image fails the job under
    NoPreprocessing, and ModelPreprocessing resize makes bulk rows
    score 1.0 against a driver-side query of the same image."""
    import struct

    ai.create_store("bimg", query_model="clip-vit-b32-image",
                    index_model="clip-vit-b32-image")
    png = (b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\rIHDR"
           + struct.pack(">II", 100, 100))        # wrong dims (want 224)
    df = spark.createDataFrame([(png,)], "input binary")
    with pytest.raises(Exception, match="ImageDimensionsMismatch"):
        ai.set("bimg", df)   # executor-raised; fails before any write
    assert ai.engine.get_store("bimg").len == 0
    # ModelPreprocessing resizes bulk-side exactly like the list path
    r = ai.set("bimg", df, preprocess_action="modelpreprocessing")
    assert r.inserted == 1
    top = ai.get_sim_n("bimg", StoreInput.image(png), closest_n=1,
                       preprocess_action="modelpreprocessing").collect()
    assert abs(top[0]["similarity"] - 1.0) < 1e-6
    # requires_preprocessing audio refuses NoPreprocessing at PLAN time
    ai.create_store("baud", query_model="clap-audio",
                    index_model="clap-audio")
    adf = spark.createDataFrame([(b"RIFFxxxxWAVE",)], "input binary")
    with pytest.raises(errors.PreprocessingRequired):
        ai.set("baud", adf)


def test_one_to_many_zero_face_reset_purges(ai):
    """A re-set whose stricter confidence filter detects ZERO faces
    still purges the input's prior rows — the purge predicate is built
    from the request's INPUTS, not the post-detection faces."""
    ai.create_store("fz", query_model="sface-yunet",
                    index_model="sface-yunet")
    img = b"some image content!"                  # 2 faces at default thr
    r = ai.set("fz", [(StoreInput.image(img), {"v": "1"})])
    assert r.inserted == 2
    r2 = ai.set("fz", [(StoreInput.image(img), {"v": "2"})],
                model_params={"confidence_threshold": 1.0})
    assert ai.engine.get_store("fz").len == 0     # purged, nothing added
