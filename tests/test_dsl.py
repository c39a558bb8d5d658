"""DSL parser + executor tests, mirroring the reference's golden corpus
(ahnlich/dsl/src/tests/db.rs, tests/ai.rs): statement string -> expected
op structs, plus end-to-end execution against a real Engine."""

import pytest

from ahnlich_spark.dsl import ops, parse_ai_query, parse_db_query
from ahnlich_spark.dsl.executor import DslExecutor
from ahnlich_spark.errors import DslSyntaxError
from ahnlich_spark.operators.predicates import And, Equals, In, NotEquals, NotIn, Or
from ahnlich_spark.types import MetadataValue, StoreInput

MV = MetadataValue.raw_string


# ------------------------------------------------------------- parsing --

def test_single_and_multi_statement():
    assert parse_db_query("LISTCLIENTS") == [ops.ListClients()]
    assert parse_db_query("listclients") == [ops.ListClients()]
    assert parse_db_query("  Ping  ") == [ops.Ping()]
    assert parse_db_query(" INFOSERVER ; listSTORES;") == [
        ops.InfoServer(),
        ops.ListStores(),
    ]


def test_invalid_statement_errors():
    with pytest.raises(DslSyntaxError):
        parse_db_query(" random ; listSTORES;")
    with pytest.raises(DslSyntaxError):
        parse_db_query("set 2134 in store")
    with pytest.raises(DslSyntaxError):
        parse_db_query("getkey ([a, b, c], [3.0, 4.0]) in 1234")


def test_schema_clauses():
    assert parse_db_query("LISTSTORES SCHEMA tenant_1") == [
        ops.ListStores(schema="tenant_1")
    ]
    assert parse_db_query("GETSTORE school SCHEMA academics") == [
        ops.GetStore(store="school", schema="academics")
    ]
    assert parse_db_query("DROPSTORE school IF EXISTS SCHEMA academics") == [
        ops.DropStore(store="school", error_if_not_exists=False, schema="academics")
    ]
    assert parse_db_query("DROPSCHEMA academics") == [ops.DropSchema(schema="academics")]


def test_create_store_variants():
    assert parse_db_query("CREATEstore storename DIMENSION 23") == [
        ops.CreateStore(store="storename", dimension=23)
    ]
    assert parse_db_query("CREATEstore IF NOT EXISTS testing DIMENSION 43") == [
        ops.CreateStore(store="testing", dimension=43, error_if_exists=False)
    ]
    assert parse_db_query(
        "CREATEstore IF NOT EXISTS school DIMENSION 39 PREDICATES (department, faculty)"
    ) == [
        ops.CreateStore(
            store="school", dimension=39, predicates=("department", "faculty"),
            error_if_exists=False,
        )
    ]
    assert parse_db_query(
        "CREATEstore school DIMENSION 77 PREDICATES(name, surname) "
        "NONLINEARALGORITHMINDEX (kdtree)"
    ) == [
        ops.CreateStore(
            store="school", dimension=77, predicates=("name", "surname"),
            non_linear_algorithms=("kdtree",),
        )
    ]


def test_drop_store_variants():
    assert parse_db_query("DROPSTORE random") == [ops.DropStore(store="random")]
    assert parse_db_query("dropstore yeezy_store IF exists") == [
        ops.DropStore(store="yeezy_store", error_if_not_exists=False)
    ]
    # "IF NOT exists" is not valid on DROPSTORE (reference db.rs test)
    with pytest.raises(DslSyntaxError):
        parse_db_query("dropstore yeezy IF NOT exists")


def test_index_ddl():
    assert parse_db_query("CREATEPREDINDEX (one, two, 3) in tapHstore1") == [
        ops.CreatePredIndex(store="tapHstore1", keys=("one", "two", "3"))
    ]
    assert parse_db_query("DROPPREDINDEX (here, th2) in store2") == [
        ops.DropPredIndex(store="store2", keys=("here", "th2"))
    ]
    assert parse_db_query("DROPPREDINDEX IF EXISTS (off) in storememe") == [
        ops.DropPredIndex(store="storememe", keys=("off",), error_if_not_exists=False)
    ]
    with pytest.raises(DslSyntaxError):
        parse_db_query("createnonlinearalgorithmindex (fake) in store2")
    assert parse_db_query("createnonlinearalgorithmindex (kdtree) in store2") == [
        ops.CreateNonLinearAlgorithmIndex(store="store2", algorithms=("kdtree",))
    ]
    assert parse_db_query("createnonlinearalgorithmindex (hnsw) in store2") == [
        ops.CreateNonLinearAlgorithmIndex(store="store2", algorithms=("hnsw",))
    ]
    assert parse_db_query("createnonlinearalgorithmindex (pq) in store2") == [
        ops.CreateNonLinearAlgorithmIndex(store="store2", algorithms=("pq",))
    ]
    assert parse_db_query("DROPNONLINEARALGORITHMINDEX IF EXISTS (kdtree) in s1") == [
        ops.DropNonLinearAlgorithmIndex(
            store="s1", algorithms=("kdtree",), error_if_not_exists=False
        )
    ]


def test_get_del_key():
    assert parse_db_query("getkey ([1, 2, 3], [3.0, 4.0]) in 1234") == [
        ops.GetKey(store="1234", keys=((1.0, 2.0, 3.0), (3.0, 4.0)))
    ]
    assert parse_db_query("DELKEY ([1, 2, 3], [3.0, 4.0]) in 1234") == [
        ops.DelKey(store="1234", keys=((1.0, 2.0, 3.0), (3.0, 4.0)))
    ]


def test_get_sim_n():
    # n must be non-zero (reference db.rs test at :376)
    with pytest.raises(DslSyntaxError):
        parse_db_query("GETSIMN 0 with [0.1, 0.2] using kdtree in store1")
    assert parse_db_query("GETSIMN 5 with [34.1, 72.2] using cosinesimilarity in random") == [
        ops.GetSimN(store="random", closest_n=5, search_input=(34.1, 72.2),
                    algorithm="cosine_similarity")
    ]
    got = parse_db_query(
        "GETSIMN 8 with [3.7, 9.6] using euclideandistance in other "
        "where ((year != 2012) AND (month not in (december, october)))"
    )
    assert got == [
        ops.GetSimN(
            store="other", closest_n=8, search_input=(3.7, 9.6),
            algorithm="euclidean_distance",
            condition=And(NotEquals("year", MV("2012")),
                          NotIn("month", (MV("december"), MV("october")))),
        )
    ]


def test_get_pred_and_left_associative_combinators():
    assert parse_db_query(
        "GETPRED ((firstname = king) OR (surname != charles)) in store2"
    ) == [
        ops.GetPred(
            store="store2",
            condition=Or(Equals("firstname", MV("king")),
                         NotEquals("surname", MV("charles"))),
        )
    ]
    # (A) AND (B) OR (C) groups as A AND (B OR C): pest's greedy PEG
    # lets a parenthesized right operand absorb the rest of the chain
    # (reference golden expectation, dsl/src/tests/db.rs:638-690)
    got = parse_db_query(
        "GETPRED ((pages in (0, 1, 2)) AND (author != dickens) "
        "OR (author NOT in (jk-rowlins, rick-riodan)) ) in bookshelf"
    )[0]
    assert got.condition == And(
        In("pages", (MV("0"), MV("1"), MV("2"))),
        Or(NotEquals("author", MV("dickens")),
           NotIn("author", (MV("jk-rowlins"), MV("rick-riodan")))),
    )
    # ...but a SIMPLE right operand does not absorb the tail, so the
    # left-assoc accumulation applies: (A AND b-in) OR (C)
    got = parse_db_query(
        "GETPRED ((pages = 3) AND author in (a, b) OR (pages = 9)) in s"
    )[0]
    assert got.condition == Or(
        And(Equals("pages", MV("3")), In("author", (MV("a"), MV("b")))),
        Equals("pages", MV("9")),
    )


def test_set_in_store():
    got = parse_db_query(
        "SET (([1,2,3], {state: Munich, country: Germany}), "
        "([3.2, 4.5, 9.4], {country: USA})) in geo"
    )
    assert got == [
        ops.Set(
            store="geo",
            entries=(
                ((1.0, 2.0, 3.0), (("state", MV("Munich")), ("country", MV("Germany")))),
                ((3.2, 4.5, 9.4), (("country", MV("USA")),)),
            ),
        )
    ]


def test_upsert_variants():
    assert parse_db_query(
        "UPSERT ([1.0, 2.0], {tag: fresh}) WHERE (tag = stale) IN st MERGE"
    ) == [
        ops.Upsert(store="st", condition=Equals("tag", MV("stale")),
                   new_key=(1.0, 2.0), new_value=(("tag", MV("fresh")),),
                   merge_metadata=True)
    ]
    assert parse_db_query("UPSERT (none, {tag: fresh}) WHERE (tag = stale) IN st") == [
        ops.Upsert(store="st", condition=Equals("tag", MV("stale")),
                   new_value=(("tag", MV("fresh")),))
    ]
    assert parse_db_query("UPSERT ([1.0, 2.0], none) WHERE (tag = stale) IN st") == [
        ops.Upsert(store="st", condition=Equals("tag", MV("stale")),
                   new_key=(1.0, 2.0))
    ]


def test_image_audio_hex_values():
    got = parse_db_query("GETPRED (icon = /x4142) in s")[0]
    assert got.condition == Equals("icon", MetadataValue.image(b"AB"))
    got = parse_db_query("GETPRED (clip = /a4142) in s")[0]
    assert got.condition == Equals("clip", MetadataValue.audio(b"AB"))
    with pytest.raises(DslSyntaxError):
        parse_db_query("GETPRED (icon = /x414) in s")  # odd-length hex


def test_raw_string_verbatim():
    # values keep inner AND trailing spaces (pest as_str(), no trim)
    got = parse_db_query("GETPRED (author = jane austen) in s")[0]
    assert got.condition == Equals("author", MV("jane austen"))
    got = parse_db_query("GETPRED (author = hi ) in s")[0]
    assert got.condition == Equals("author", MV("hi "))


def test_ai_statements():
    assert parse_ai_query("PURGESTORES") == [ops.PurgeStores()]
    assert parse_ai_query(
        "CREATESTORE IF NOT EXISTS books QUERYMODEL all-minilm-l6-v2 "
        "INDEXMODEL all-minilm-l6-v2 PREDICATES (author) STOREORIGINAL"
    ) == [
        ops.AiCreateStore(store="books", query_model="all-minilm-l6-v2",
                          index_model="all-minilm-l6-v2", predicates=("author",),
                          error_if_exists=False, store_original=True)
    ]
    assert parse_ai_query(
        "SET (([hello world], {source: web})) IN texts "
        "PREPROCESSACTION nopreprocessing"
    ) == [
        ops.AiSet(store="texts",
                  entries=((StoreInput.raw_string("hello world"),
                            (("source", MV("web")),)),),
                  preprocess_action="nopreprocessing")
    ]
    assert parse_ai_query(
        "GETSIMN 3 WITH [query text] USING cosinesimilarity IN texts "
        "WHERE (source = web)"
    ) == [
        ops.AiGetSimN(store="texts", closest_n=3,
                      search_input=StoreInput.raw_string("query text"),
                      algorithm="cosine_similarity",
                      condition=Equals("source", MV("web")))
    ]
    assert parse_ai_query("GETKEY ([hello world]) IN texts") == [
        ops.AiGetKey(store="texts", inputs=(StoreInput.raw_string("hello world"),))
    ]
    # AI UPSERT requires PREPROCESSACTION and has no MERGE (syntax.pest:79)
    assert parse_ai_query(
        "UPSERT ([new text], none) WHERE (source = web) IN texts "
        "PREPROCESSACTION modelpreprocessing"
    ) == [
        ops.AiUpsert(store="texts", condition=Equals("source", MV("web")),
                     new_input=StoreInput.raw_string("new text"),
                     preprocess_action="modelpreprocessing")
    ]


# ------------------------------------------------------------ executor --

@pytest.fixture(scope="module")
def executor(spark, tmp_path_factory):
    from ahnlich_spark import Engine
    from ahnlich_spark.ai import AiEngine

    eng = Engine(spark, str(tmp_path_factory.mktemp("dsl_wh")))
    return DslExecutor(eng, AiEngine(eng))


def test_executor_end_to_end(executor):
    results = executor.execute_db(
        "CREATESTORE vecs DIMENSION 3 PREDICATES (tag);"
        "SET (([1,0,0], {tag: a}), ([0,1,0], {tag: b}), ([0,0,1], {tag: a})) IN vecs;"
        "GETSIMN 2 WITH [1,0,0] USING cosinesimilarity IN vecs;"
        "GETPRED (tag = a) IN vecs;"
        "DELKEY ([0,1,0]) IN vecs;"
        "GETSTORE vecs"
    )
    assert all(r.ok for r in results), [r.error for r in results]
    upsert = results[1].result
    assert (upsert.inserted, upsert.updated) == (3, 0)
    top = results[2].result.collect()
    assert [round(r["similarity"]) for r in top] == [1, 0]
    assert results[3].result.count() == 2
    assert results[4].result.deleted_count == 1
    assert results[5].result.len == 2


def test_executor_error_inline(executor):
    results = executor.execute_db("DROPSTORE nope_missing; PING")
    assert not results[0].ok and "StoreNotFound" in results[0].error
    assert results[1].ok and results[1].result == "pong"


def test_executor_ai_end_to_end(executor):
    results = executor.execute_ai(
        "CREATESTORE texts QUERYMODEL all-minilm-l6-v2 INDEXMODEL all-minilm-l6-v2 "
        "PREDICATES (source) STOREORIGINAL;"
        "SET (([alpha beta], {source: web}), ([gamma delta], {source: book})) "
        "IN texts PREPROCESSACTION nopreprocessing;"
        "GETSIMN 1 WITH [alpha beta] USING cosinesimilarity IN texts;"
        "GETKEY ([gamma delta]) IN texts"
    )
    assert all(r.ok for r in results), [r.error for r in results]
    top = results[2].result.collect()
    assert len(top) == 1 and round(top[0]["similarity"], 3) == 1.0
    assert results[3].result.count() == 1


def test_execution_provider_reaches_proxy(spark, warehouse, monkeypatch):
    """The DSL's EXECUTIONPROVIDER clause must flow through the executor
    into the AI proxy call (it parsed but was dropped before r03)."""
    from ahnlich_spark.ai.proxy import AiEngine
    from ahnlich_spark.dsl import parse_ai_query
    from ahnlich_spark.dsl.executor import DslExecutor
    from ahnlich_spark.plans.engine import Engine

    ai = AiEngine(Engine(spark, warehouse))
    ai.create_store("dslp", query_model="all-minilm-l6-v2",
                    index_model="all-minilm-l6-v2")
    seen = {}
    orig = AiEngine.get_sim_n

    def spy(self, *a, **kw):
        seen["execution_provider"] = kw.get("execution_provider")
        return orig(self, *a, **kw)

    monkeypatch.setattr(AiEngine, "get_sim_n", spy)
    (op,) = parse_ai_query(
        "GETSIMN 2 WITH [hello] USING cosinesimilarity "
        "EXECUTIONPROVIDER cuda IN dslp")
    assert op.execution_provider == "cuda"
    DslExecutor(ai.engine, ai)._run([op])
    assert seen["execution_provider"] == "cuda"
