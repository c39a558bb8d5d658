"""Statement-by-statement golden parity with the reference DSL parser
test corpus (ahnlich/dsl/src/tests/db.rs [693 LoC] and tests/ai.rs
[784 LoC]): every input string those tests feed pest is fed to
dsl/parser.py here, asserting the full parsed op struct — or, for the
error cases, the exact ``DslError::UnexpectedSpan`` byte span.

Documented mapping deviations (see parser.py module docstring):
- algorithm enums lower to metric-name strings
  (cosinesimilarity -> "cosine_similarity", ...);
- AI GetSimN with no PREPROCESSACTION keeps ``preprocess_action=None``
  in the struct (the executor applies the reference's NoPreprocessing
  default at call time);
- non-linear index enums lower to name strings ("kdtree", "hnsw").
"""

import pytest

from ahnlich_spark.dsl import ops, parse_ai_query, parse_db_query
from ahnlich_spark.errors import DslSyntaxError
from ahnlich_spark.operators.predicates import And, Equals, In, NotEquals, NotIn, Or
from ahnlich_spark.types import MetadataValue, StoreInput

MV = MetadataValue.raw_string
SI = StoreInput.raw_string

# the reference's nested GETPRED chain appears verbatim in db.rs:586-690
# and ai.rs:512-603 — one shared expectation
BOOKSHELF_COND = And(
    In("pages", (MV("0"), MV("1"), MV("2"))),
    Or(NotEquals("author", MV("dickens")),
       NotIn("author", (MV("jk-rowlins"), MV("rick-riodan")))),
)
YEAR_MONTH_COND = And(
    NotEquals("year", MV("2012")),
    NotIn("month", (MV("december"), MV("october"))),
)

# (reference test fn, input, expected ops list) — db.rs corpus
DB_GOLDEN = [
    # test_single_query_parse
    ("single", "LISTCLIENTS", [ops.ListClients()]),
    ("single", "listclients", [ops.ListClients()]),
    ("single", "  Ping  ", [ops.Ping()]),
    # test_multi_query_parse
    ("multi", " INFOSERVER ; listSTORES;", [ops.InfoServer(), ops.ListStores()]),
    # test_schema_query_parse
    ("schema", "LISTSTORES SCHEMA tenant_1", [ops.ListStores(schema="tenant_1")]),
    ("schema",
     "CREATESTORE IF NOT EXISTS school DIMENSION 39 PREDICATES "
     "(department, faculty) SCHEMA academics",
     [ops.CreateStore(store="school", dimension=39,
                      predicates=("department", "faculty"),
                      error_if_exists=False, schema="academics")]),
    ("schema", "GETSTORE school SCHEMA academics",
     [ops.GetStore(store="school", schema="academics")]),
    ("schema", "DROPSTORE school IF EXISTS SCHEMA academics",
     [ops.DropStore(store="school", error_if_not_exists=False,
                    schema="academics")]),
    ("schema", "DROPSCHEMA academics", [ops.DropSchema(schema="academics")]),
    # test_schema_clause_on_db_store_commands_parse
    ("schema_clause", "SET (([1, 2], {department: math})) in school SCHEMA academics",
     [ops.Set(store="school",
              entries=(((1.0, 2.0), (("department", MV("math")),)),),
              schema="academics")]),
    ("schema_clause",
     "GETSIMN 1 with [1, 2] using cosinesimilarity in school SCHEMA academics "
     "where (department = math)",
     [ops.GetSimN(store="school", closest_n=1, search_input=(1.0, 2.0),
                  algorithm="cosine_similarity",
                  condition=Equals("department", MV("math")),
                  schema="academics")]),
    ("schema_clause", "GETKEY ([1, 2]) in school SCHEMA academics",
     [ops.GetKey(store="school", keys=((1.0, 2.0),), schema="academics")]),
    ("schema_clause", "GETPRED (department = math) in school SCHEMA academics",
     [ops.GetPred(store="school", condition=Equals("department", MV("math")),
                  schema="academics")]),
    ("schema_clause", "DELKEY ([1, 2]) in school SCHEMA academics",
     [ops.DelKey(store="school", keys=((1.0, 2.0),), schema="academics")]),
    ("schema_clause", "CREATEPREDINDEX (department) in school SCHEMA academics",
     [ops.CreatePredIndex(store="school", keys=("department",),
                          schema="academics")]),
    ("schema_clause", "DROPPREDINDEX (department) in school SCHEMA academics",
     [ops.DropPredIndex(store="school", keys=("department",),
                        schema="academics")]),
    ("schema_clause",
     "CREATENONLINEARALGORITHMINDEX (kdtree) in school SCHEMA academics",
     [ops.CreateNonLinearAlgorithmIndex(store="school", algorithms=("kdtree",),
                                        schema="academics")]),
    ("schema_clause",
     "DROPNONLINEARALGORITHMINDEX (kdtree) in school SCHEMA academics",
     [ops.DropNonLinearAlgorithmIndex(store="school", algorithms=("kdtree",),
                                      schema="academics")]),
    # test_create_store_parse
    ("create_store", "CREATEstore storename DIMENSION 23",
     [ops.CreateStore(store="storename", dimension=23)]),
    ("create_store", "CREATEstore IF NOT EXISTS testing DIMENSION 43",
     [ops.CreateStore(store="testing", dimension=43, error_if_exists=False)]),
    ("create_store",
     "CREATEstore IF NOT EXISTS school DIMENSION 39 PREDICATES (department, faculty)",
     [ops.CreateStore(store="school", dimension=39,
                      predicates=("department", "faculty"),
                      error_if_exists=False)]),
    ("create_store",
     "CREATEstore school DIMENSION 39 NONLINEARALGORITHMINDEX (kdtree)",
     [ops.CreateStore(store="school", dimension=39,
                      non_linear_algorithms=("kdtree",))]),
    ("create_store",
     "CREATEstore school DIMENSION 77 PREDICATES(name, surname) "
     "NONLINEARALGORITHMINDEX (kdtree)",
     [ops.CreateStore(store="school", dimension=77,
                      predicates=("name", "surname"),
                      non_linear_algorithms=("kdtree",))]),
    # test_drop_store_parse
    ("drop_store", "DROPSTORE random", [ops.DropStore(store="random")]),
    ("drop_store", "dropstore yeezy_store IF exists",
     [ops.DropStore(store="yeezy_store", error_if_not_exists=False)]),
    # test_create_predicate_index_parse
    ("create_pred_index", "CREATEPREDINDEX (one, two, 3) in tapHstore1",
     [ops.CreatePredIndex(store="tapHstore1", keys=("one", "two", "3"))]),
    # test_drop_pred_index_parse
    ("drop_pred_index", "DROPPREDINDEX (here, th2) in store2",
     [ops.DropPredIndex(store="store2", keys=("here", "th2"))]),
    ("drop_pred_index", "DROPPREDINDEX IF EXISTS (off) in storememe",
     [ops.DropPredIndex(store="storememe", keys=("off",),
                        error_if_not_exists=False)]),
    # test_create_non_linear_algorithm_parse
    ("create_nonlinear", "createnonlinearalgorithmindex (kdtree) in store2",
     [ops.CreateNonLinearAlgorithmIndex(store="store2", algorithms=("kdtree",))]),
    ("create_nonlinear", "createnonlinearalgorithmindex (hnsw) in store2",
     [ops.CreateNonLinearAlgorithmIndex(store="store2", algorithms=("hnsw",))]),
    # test_get_sim_n_parse
    ("get_sim_n", "GETSIMN 5 with [34.1, 72.2] using cosinesimilarity in random",
     [ops.GetSimN(store="random", closest_n=5, search_input=(34.1, 72.2),
                  algorithm="cosine_similarity")]),
    ("get_sim_n",
     "GETSIMN 8 with [3.7, 9.6] using euclideandistance in other "
     "where ((year != 2012) AND (month not in (december, october)))",
     [ops.GetSimN(store="other", closest_n=8, search_input=(3.7, 9.6),
                  algorithm="euclidean_distance", condition=YEAR_MONTH_COND)]),
    # test_drop_non_linear_algorithm_parse
    ("drop_nonlinear", "DROPNONLINEARALGORITHMINDEX (kdtree) in 1234",
     [ops.DropNonLinearAlgorithmIndex(store="1234", algorithms=("kdtree",))]),
    ("drop_nonlinear", "DROPNONLINEARALGORITHMINDEX (hnsw) in 1234",
     [ops.DropNonLinearAlgorithmIndex(store="1234", algorithms=("hnsw",))]),
    ("drop_nonlinear", "DROPNONLINEARALGORITHMINDEX IF EXISTS (kdtree) in 12345",
     [ops.DropNonLinearAlgorithmIndex(store="12345", algorithms=("kdtree",),
                                      error_if_not_exists=False)]),
    # test_get_key_parse
    ("get_key", "getkey ([1, 2, 3], [3.0, 4.0]) in 1234",
     [ops.GetKey(store="1234", keys=((1.0, 2.0, 3.0), (3.0, 4.0)))]),
    # test_set_in_store_parse
    ("set",
     "SET (([1,2,3], {state: Munich, country: Germany}), "
     "([3.2, 4.5, 9.4], {country: USA})) in geo",
     [ops.Set(store="geo", entries=(
         ((1.0, 2.0, 3.0),
          (("state", MV("Munich")), ("country", MV("Germany")))),
         ((3.2, 4.5, 9.4), (("country", MV("USA")),)),
     ))]),
    # test_del_key_parse
    ("del_key", "DELKEY ([1, 2, 3], [3.0, 4.0]) in 1234",
     [ops.DelKey(store="1234", keys=((1.0, 2.0, 3.0), (3.0, 4.0)))]),
    # test_get_pred_parse
    ("get_pred", "GETPRED ((firstname = king) OR (surname != charles)) in store2",
     [ops.GetPred(store="store2",
                  condition=Or(Equals("firstname", MV("king")),
                               NotEquals("surname", MV("charles"))))]),
    ("get_pred", "getstore my_store", [ops.GetStore(store="my_store")]),
    ("get_pred", "GETSTORE TestStore123", [ops.GetStore(store="TestStore123")]),
    ("get_pred",
     "GETPRED ((pages in (0, 1, 2)) AND (author != dickens) "
     "OR (author NOT in (jk-rowlins, rick-riodan)) ) in bookshelf",
     [ops.GetPred(store="bookshelf", condition=BOOKSHELF_COND)]),
]

# (reference test fn, input, expected UnexpectedSpan) — db.rs error corpus
DB_ERRORS = [
    ("no_valid_input", " random ; listSTORES;", (0, 8)),
    ("no_valid_input", " INfoSERVER ; random; ping", (13, 20)),
    ("drop_store", "dropstore yeezy IF NOT exists", (15, 29)),
    ("create_nonlinear", "createnonlinearalgorithmindex (fake) in store2", (0, 46)),
    ("get_sim_n",
     "GETSIMN 0 with [0.1, 0.2] using kdtree in store1 where ( author = hi )",
     (0, 70)),
    ("drop_nonlinear", "DROPNONLINEARALGORITHMINDEX (fake) in 1234", (0, 42)),
    ("get_key", "getkey ([a, b, c], [3.0, 4.0]) in 1234", (0, 38)),
    ("set", "set 2134 in store", (0, 17)),
    ("del_key", "DELKEY ([a, b, c], [3.0, 4.0]) in 1234", (0, 38)),
    ("get_pred", "GETPRED ([a, b, c], [3.0, 4.0]) in 1234", (0, 39)),
]

_HAKS_DEVEN_ENTRIES = (
    (SI("This is the life of Haks paragraphed"),
     (("name", MV("Haks")), ("category", MV("dev")))),
    (SI("This is the life of Deven paragraphed"),
     (("name", MV("Deven")), ("category", MV("dev")))),
)

# (reference test fn, input, expected ops list) — ai.rs corpus
AI_GOLDEN = [
    ("single", "purgestores", [ops.PurgeStores()]),
    ("single", "infoserver", [ops.InfoServer()]),
    ("single", "  Ping  ", [ops.Ping()]),
    ("multi", " INFOSERVER ; listSTORES;", [ops.InfoServer(), ops.ListStores()]),
    ("schema", "LISTSTORES SCHEMA tenant_1", [ops.ListStores(schema="tenant_1")]),
    ("schema",
     "CREATESTORE IF NOT EXISTS school QUERYMODEL all-minilm-l6-v2 "
     "INDEXMODEL resnet-50 PREDICATES (department, faculty) STOREORIGINAL "
     "SCHEMA academics",
     [ops.AiCreateStore(store="school", query_model="all-minilm-l6-v2",
                        index_model="resnet-50",
                        predicates=("department", "faculty"),
                        error_if_exists=False, store_original=True,
                        schema="academics")]),
    ("schema", "GETSTORE school SCHEMA academics",
     [ops.GetStore(store="school", schema="academics")]),
    ("schema", "DROPSTORE school IF EXISTS SCHEMA academics",
     [ops.DropStore(store="school", error_if_not_exists=False,
                    schema="academics")]),
    ("schema", "DROPSCHEMA academics", [ops.DropSchema(schema="academics")]),
    # test_schema_clause_on_ai_store_commands_parse
    ("schema_clause",
     "SET (([hello], {department: math})) in school SCHEMA academics "
     "preprocessaction nopreprocessing",
     [ops.AiSet(store="school",
                entries=((SI("hello"), (("department", MV("math")),)),),
                preprocess_action="nopreprocessing", schema="academics")]),
    ("schema_clause",
     "GETSIMN 1 with [hello] using cosinesimilarity in school SCHEMA academics "
     "where (department = math)",
     [ops.AiGetSimN(store="school", closest_n=1, search_input=SI("hello"),
                    algorithm="cosine_similarity",
                    condition=Equals("department", MV("math")),
                    schema="academics")]),
    ("schema_clause", "GETPRED (department = math) in school SCHEMA academics",
     [ops.GetPred(store="school", condition=Equals("department", MV("math")),
                  schema="academics")]),
    ("schema_clause", "GETKEY ([hello]) in school SCHEMA academics",
     [ops.AiGetKey(store="school", inputs=(SI("hello"),), schema="academics")]),
    ("schema_clause", "DELKEY ([hello]) in school SCHEMA academics",
     [ops.AiDelKey(store="school", inputs=(SI("hello"),), schema="academics")]),
    ("schema_clause", "CREATEPREDINDEX (department) in school SCHEMA academics",
     [ops.CreatePredIndex(store="school", keys=("department",),
                          schema="academics")]),
    ("schema_clause", "DROPPREDINDEX (department) in school SCHEMA academics",
     [ops.DropPredIndex(store="school", keys=("department",),
                        schema="academics")]),
    ("schema_clause",
     "CREATENONLINEARALGORITHMINDEX (kdtree) in school SCHEMA academics",
     [ops.CreateNonLinearAlgorithmIndex(store="school", algorithms=("kdtree",),
                                        schema="academics")]),
    ("schema_clause",
     "DROPNONLINEARALGORITHMINDEX (kdtree) in school SCHEMA academics",
     [ops.DropNonLinearAlgorithmIndex(store="school", algorithms=("kdtree",),
                                      schema="academics")]),
    # test_get_store_parse
    ("get_store", "GETSTORE my_store", [ops.GetStore(store="my_store")]),
    ("get_store", "getstore test-store-1", [ops.GetStore(store="test-store-1")]),
    # test_drop_store_parse
    ("drop_store", "DROPSTORE random", [ops.DropStore(store="random")]),
    ("drop_store", "dropstore yeezy_store IF exists",
     [ops.DropStore(store="yeezy_store", error_if_not_exists=False)]),
    # test_create_predicate_index_parse / test_drop_pred_index_parse
    ("create_pred_index", "CREATEPREDINDEX (one, two, 3) in tapHstore1",
     [ops.CreatePredIndex(store="tapHstore1", keys=("one", "two", "3"))]),
    ("drop_pred_index", "DROPPREDINDEX (here, th2) in store2",
     [ops.DropPredIndex(store="store2", keys=("here", "th2"))]),
    ("drop_pred_index", "DROPPREDINDEX IF EXISTS (off) in storememe",
     [ops.DropPredIndex(store="storememe", keys=("off",),
                        error_if_not_exists=False)]),
    # test_create_store_parse
    ("create_store",
     "CREATEstore storename QUERYMODEL resnet-50 INDEXMODEL all-minilm-l6-v2 ",
     [ops.AiCreateStore(store="storename", query_model="resnet-50",
                        index_model="all-minilm-l6-v2")]),
    ("create_store",
     "CREATEstore IF NOT EXISTS storename QUERYMODEL resnet-50 INDEXMODEL "
     "all-minilm-l6-v2 PREDICATES (department, faculty) STOREORIGINAL",
     [ops.AiCreateStore(store="storename", query_model="resnet-50",
                        index_model="all-minilm-l6-v2",
                        predicates=("department", "faculty"),
                        error_if_exists=False, store_original=True)]),
    ("create_store",
     "CREATESTORE code_repo QUERYMODEL jina-embeddings-v2-base-code "
     "INDEXMODEL jina-embeddings-v2-base-code",
     [ops.AiCreateStore(store="code_repo",
                        query_model="jina-embeddings-v2-base-code",
                        index_model="jina-embeddings-v2-base-code")]),
    ("create_store",
     "createstore school QUERYMODEL all-minilm-l6-v2 INDEXMODEL resnet-50 "
     "NONLINEARALGORITHMINDEX (kdtree) STOREORIGINAL",
     [ops.AiCreateStore(store="school", query_model="all-minilm-l6-v2",
                        index_model="resnet-50",
                        non_linear_algorithms=("kdtree",),
                        store_original=True)]),
    # test_create_non_linear_algorithm_parse
    ("create_nonlinear", "createnonlinearalgorithmindex (kdtree) in store2",
     [ops.CreateNonLinearAlgorithmIndex(store="store2", algorithms=("kdtree",))]),
    ("create_nonlinear", "createnonlinearalgorithmindex (hnsw) in store2",
     [ops.CreateNonLinearAlgorithmIndex(store="store2", algorithms=("hnsw",))]),
    # test_get_sim_n_parse
    ("get_sim_n",
     "GETSIMN 5 with [hi my name is carter] using cosinesimilarity "
     "preprocessaction MODELPREPROCESSING in random",
     [ops.AiGetSimN(store="random", closest_n=5,
                    search_input=SI("hi my name is carter"),
                    algorithm="cosine_similarity",
                    preprocess_action="modelpreprocessing")]),
    ("get_sim_n",
     "GETSIMN 8 with [testing the limits of life] using euclideandistance "
     "executionprovider tensorrt in other "
     "where ((year != 2012) AND (month not in (december, october)))",
     [ops.AiGetSimN(store="other", closest_n=8,
                    search_input=SI("testing the limits of life"),
                    algorithm="euclidean_distance",
                    execution_provider="tensorrt",
                    condition=YEAR_MONTH_COND)]),
    # test_drop_non_linear_algorithm_parse
    ("drop_nonlinear", "DROPNONLINEARALGORITHMINDEX (kdtree) in 1234",
     [ops.DropNonLinearAlgorithmIndex(store="1234", algorithms=("kdtree",))]),
    ("drop_nonlinear", "DROPNONLINEARALGORITHMINDEX (hnsw) in 1234",
     [ops.DropNonLinearAlgorithmIndex(store="1234", algorithms=("hnsw",))]),
    ("drop_nonlinear", "DROPNONLINEARALGORITHMINDEX IF EXISTS (kdtree) in 1234",
     [ops.DropNonLinearAlgorithmIndex(store="1234", algorithms=("kdtree",),
                                      error_if_not_exists=False)]),
    # test_get_pred_parse
    ("get_pred", "GETPRED ((firstname = king) OR (surname != charles)) in store2",
     [ops.GetPred(store="store2",
                  condition=Or(Equals("firstname", MV("king")),
                               NotEquals("surname", MV("charles"))))]),
    ("get_pred",
     "GETPRED ((pages in (0, 1, 2)) AND (author != dickens) "
     "OR (author NOT in (jk-rowlins, rick-riodan)) ) in bookshelf",
     [ops.GetPred(store="bookshelf", condition=BOOKSHELF_COND)]),
    # test_get_key_parse / test_del_key_parse
    ("get_key",
     "GETKEY ([hi this is store input], [this should now get parsed too]) in 1234",
     [ops.AiGetKey(store="1234",
                   inputs=(SI("hi this is store input"),
                           SI("this should now get parsed too")))]),
    ("del_key",
     "DELKEY ([hi this is store input], [this should now get parsed too]) in 1234",
     [ops.AiDelKey(store="1234",
                   inputs=(SI("hi this is store input"),
                           SI("this should now get parsed too")))]),
    # test_set_in_store_parse
    ("set",
     "SET (([This is the life of Haks paragraphed], {name: Haks, category: dev}), "
     "([This is the life of Deven paragraphed], {name: Deven, category: dev})) "
     "in geo preprocessaction nopreprocessing",
     [ops.AiSet(store="geo", entries=_HAKS_DEVEN_ENTRIES,
                preprocess_action="nopreprocessing")]),
    ("set",
     "SET (([This is the life of Haks paragraphed], {name: Haks, category: dev}), "
     "([This is the life of Deven paragraphed], {name: Deven, category: dev})) "
     "in geo preprocessaction nopreprocessing executionprovider cuda",
     [ops.AiSet(store="geo", entries=_HAKS_DEVEN_ENTRIES,
                preprocess_action="nopreprocessing",
                execution_provider="cuda")]),
]

# pest's raw_string (syntax.pest:147) excludes only ,[()]} — a ';'
# inside a bracketed value is literal content, not a statement
# separator; and invalid_statement ((!";" ~ ANY)+, syntax.pest:182)
# stops at ANY ';' regardless of bracket depth, which is where the
# error-span clamp in parser._parse comes from.
DB_GOLDEN += [
    ("raw_string_semicolon", "GETPRED (note = a;b) in s",
     [ops.GetPred(store="s", condition=Equals("note", MV("a;b")))]),
    ("raw_string_semicolon",
     "GETPRED (note = a;b) in s; PING",
     [ops.GetPred(store="s", condition=Equals("note", MV("a;b"))),
      ops.Ping()]),
    # '{' is legal raw-string content (absent from the ,[()]} exclusion
    # set) and must NOT open a bracket context: an unmatched '{' inside
    # a predicate value cannot swallow the next ';' — pest still splits
    # two statements here.
    ("raw_string_open_brace",
     "GETPRED (note = a{b) in s; PING",
     [ops.GetPred(store="s", condition=Equals("note", MV("a{b"))),
      ops.Ping()]),
]
DB_ERRORS += [
    # f32 fails at 'a'; invalid_statement eats up to the bracketed ';'
    ("invalid_stops_at_bracketed_semi", "GETKEY ([a;b]) in s", (0, 10)),
    # trailing junk after a valid drop_store: span runs from the last
    # matched token to the first ';' even though it is inside '('
    ("trailing_junk_bracketed_semi", "dropstore s (a;b)", (11, 14)),
]

AI_ERRORS = [
    ("no_valid_input", " random ; listSTORES;", (0, 8)),
    ("no_valid_input", " INfoSERVER ; random; ping", (13, 20)),
    ("drop_store", "dropstore yeezy IF NOT exists", (15, 29)),
    ("create_nonlinear", "createnonlinearalgorithmindex (fake) in store2", (0, 46)),
    ("get_sim_n",
     "GETSIMN 0 with [random] using kdtree in store1 where ( author = hi )",
     (0, 68)),
    ("drop_nonlinear", "DROPNONLINEARALGORITHMINDEX (fake) in 1234", (0, 42)),
    ("get_pred", "GETPRED ([a, b, c], [3.0, 4.0]) in 1234", (0, 39)),
    ("del_key", "DELKEY ([a, b, c], [3.0, 4.0]) 1234", (0, 35)),
    ("set", "set [help me here] in store", (0, 27)),
    ("set", "SET (([asdf], {upkeep: task})) in geo preprocessaction fakeaead",
     (0, 63)),
]


@pytest.mark.parametrize("tag,text,want",
                         DB_GOLDEN, ids=[f"{t}-{i}" for i, (t, _, _) in
                                         enumerate(DB_GOLDEN)])
def test_db_golden(tag, text, want):
    assert parse_db_query(text) == want


@pytest.mark.parametrize("tag,text,span",
                         DB_ERRORS, ids=[f"{t}-{i}" for i, (t, _, _) in
                                         enumerate(DB_ERRORS)])
def test_db_golden_error_spans(tag, text, span):
    with pytest.raises(DslSyntaxError) as exc:
        parse_db_query(text)
    assert exc.value.span == span


@pytest.mark.parametrize("tag,text,want",
                         AI_GOLDEN, ids=[f"{t}-{i}" for i, (t, _, _) in
                                         enumerate(AI_GOLDEN)])
def test_ai_golden(tag, text, want):
    assert parse_ai_query(text) == want


@pytest.mark.parametrize("tag,text,span",
                         AI_ERRORS, ids=[f"{t}-{i}" for i, (t, _, _) in
                                         enumerate(AI_ERRORS)])
def test_ai_golden_error_spans(tag, text, span):
    with pytest.raises(DslSyntaxError) as exc:
        parse_ai_query(text)
    assert exc.value.span == span
