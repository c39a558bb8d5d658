"""Recursive-descent parser for the ahnlich textual query language.

A from-scratch Python front-end accepting the same statement language as
the reference's pest grammar (ahnlich/dsl/src/syntax/syntax.pest:1-183):
``;``-separated statements, case-insensitive keywords, and the same
statement shapes, e.g.::

    GETSIMN 4 WITH [0.65, 2.78] USING cosinesimilarity IN my_store
        WHERE (author = dickens)
    CREATESTORE IF NOT EXISTS books DIMENSION 384 PREDICATES (author)
    SET (([1, 2], {author: dickens}), ([3, 4], {author: austen})) IN books

Faithful quirks (pinned by tests):

- raw-string values run to the next delimiter (one of ``, [ ( ) ] }``)
  and are NOT trimmed — trailing spaces are part of the value
  (syntax.pest:147, lowering keeps ``as_str()`` verbatim,
  ahnlich/dsl/src/metadata.rs:27-30);
- ``/x<hex>`` is image bytes, ``/a<hex>`` audio bytes; invalid/odd hex
  is a syntax error (syntax.pest:150-152, metadata.rs:31-50);
- And/Or chains have no precedence; a PARENTHESIZED right operand
  greedily absorbs the rest of the chain (pest PEG), while a simple
  right operand leaves the tail to accumulate left-associatively:
  ``(A) AND (B) OR (C)`` is ``A AND (B OR C)`` but
  ``(A) AND b in (x) OR (C)`` is ``(A AND b-in) OR C``
  (syntax.pest:171-173, predicate.rs:31-58, golden expectation
  dsl/src/tests/db.rs:638-690);
- ``GETSIMN``'s algorithm set is kdtree / euclideandistance /
  cosinesimilarity / dotproductsimilarity (syntax.pest:105-110);
  ``hnsw`` additionally accepted here (our engine exposes it; the
  reference reaches HNSW only via the wire API, not the DSL);
- DB ``UPSERT`` takes an optional ``MERGE``; AI ``UPSERT`` does not
  (syntax.pest:77-79).

Extensions (documented deviations): signed floats and scientific
notation in vectors (the reference grammar allows digits only,
syntax.pest:138 — useless for real embeddings, which serialize with
signs and exponents), and a ``DELPRED`` statement mirroring the
wire-only delete-by-predicate op.
"""

from __future__ import annotations

import re
from typing import List, Optional, Tuple

from ahnlich_spark.dsl import ops
from ahnlich_spark.errors import DslSyntaxError
from ahnlich_spark.operators.predicates import And, Equals, In, NotEquals, NotIn, Or, Predicate
from ahnlich_spark.types import MetadataValue, StoreInput

_IDENT = re.compile(r"[A-Za-z0-9_\-]+")
_MODEL = re.compile(r"[A-Za-z0-9._\-]+")
_F32 = re.compile(r"-?[0-9]+(?:\.[0-9]+)?(?:[eE][+-]?[0-9]+)?")
_NON_ZERO = re.compile(r"[1-9][0-9]*")
_RAW = re.compile(r"[^,\[\(\)\]\}]+")
_HEXVAL = re.compile(r"/(?P<tag>[xa])(?P<hex>[0-9A-Fa-f]+)")
_WORD = re.compile(r"[A-Za-z0-9_\-]+")

ALGORITHMS = {
    "kdtree": "kdtree",
    "hnsw": "hnsw",  # extension (see module docstring)
    "ivf": "ivf",  # extension: space-partitioned approximate search
    "pq": "pq",  # extension: product-quantization ADC search
    "euclideandistance": "euclidean_distance",
    "cosinesimilarity": "cosine_similarity",
    "dotproductsimilarity": "dot_product",
}
NON_LINEAR = {"kdtree": "kdtree", "hnsw": "hnsw", "ivf": "ivf", "pq": "pq"}
PREPROCESS = ("nopreprocessing", "modelpreprocessing")
PROVIDERS = ("coreml", "tensorrt", "directml", "cuda")


class _Cursor:
    def __init__(self, text: str):
        self.text = text
        self.i = 0
        # position right after the last successfully MATCHED token —
        # whitespace skipped by a failed try_* does not move it. The
        # trailing-junk error span starts here (pest invalid_statement
        # starts at whitespace* after the last matched rule).
        self.mark = 0

    # -------------------------------------------------------- primitives --
    def ws(self) -> None:
        while self.i < len(self.text) and self.text[self.i] in " \t\r\n":
            self.i += 1

    def eof(self) -> bool:
        self.ws()
        return self.i >= len(self.text)

    def peek(self) -> str:
        self.ws()
        return self.text[self.i] if self.i < len(self.text) else ""

    def error(self, want: str) -> DslSyntaxError:
        got = self.text[self.i : self.i + 24]
        return DslSyntaxError(f"expected {want} at position {self.i}: {got!r}")

    def lit(self, ch: str) -> None:
        self.ws()
        if not self.text.startswith(ch, self.i):
            raise self.error(repr(ch))
        self.i += len(ch)
        self.mark = self.i

    def try_lit(self, ch: str) -> bool:
        self.ws()
        if self.text.startswith(ch, self.i):
            self.i += len(ch)
            self.mark = self.i
            return True
        return False

    def try_kw(self, *words: str) -> bool:
        """Match keywords case-insensitively with a trailing word
        boundary; multi-word keywords allow optional whitespace between
        words (pest: ``^"if" ~ whitespace* ~ ^"exists"``)."""
        self.ws()
        pos = self.i
        for idx, w in enumerate(words):
            if idx:
                while pos < len(self.text) and self.text[pos] in " \t":
                    pos += 1
            end = pos + len(w)
            if self.text[pos:end].lower() != w:
                return False
            pos = end
        if pos < len(self.text) and (self.text[pos].isalnum() or self.text[pos] == "_"):
            return False
        self.i = pos
        self.mark = pos
        return True

    def kw(self, *words: str) -> None:
        if not self.try_kw(*words):
            raise self.error(" ".join(words).upper())

    def regex(self, pattern: re.Pattern, what: str) -> str:
        self.ws()
        m = pattern.match(self.text, self.i)
        if not m:
            raise self.error(what)
        self.i = m.end()
        self.mark = self.i
        return m.group(0)

    def try_regex(self, pattern: re.Pattern) -> Optional[str]:
        self.ws()
        m = pattern.match(self.text, self.i)
        if not m:
            return None
        self.i = m.end()
        self.mark = self.i
        return m.group(0)

    # ------------------------------------------------------ grammar bits --
    def ident(self) -> str:
        return self.regex(_IDENT, "identifier")

    def non_zero(self) -> int:
        return int(self.regex(_NON_ZERO, "positive integer"))

    def f32(self) -> float:
        return float(self.regex(_F32, "number"))

    def f32_array(self) -> Tuple[float, ...]:
        self.lit("[")
        vals = [self.f32()]
        while self.try_lit(","):
            vals.append(self.f32())
        self.lit("]")
        return tuple(vals)

    def f32_arrays(self) -> Tuple[Tuple[float, ...], ...]:
        arrays = [self.f32_array()]
        while self.try_lit(","):
            arrays.append(self.f32_array())
        return tuple(arrays)

    def metadata_value(self) -> MetadataValue:
        """image | audio | raw_string — raw strings are verbatim
        (leading whitespace consumed, trailing whitespace KEPT)."""
        self.ws()
        m = _HEXVAL.match(self.text, self.i)
        if m:
            try:
                data = bytes.fromhex(m.group("hex"))
            except ValueError:
                raise DslSyntaxError(f"invalid hex literal {m.group(0)!r}") from None
            self.i = m.end()
            self.mark = self.i
            return MetadataValue.image(data) if m.group("tag") == "x" else MetadataValue.audio(data)
        raw = self.regex(_RAW, "metadata value")
        return MetadataValue.raw_string(raw)

    def store_input(self) -> StoreInput:
        v = self.metadata_value()
        if v.kind == "image":
            return StoreInput.image(v.bin)
        if v.kind == "audio":
            return StoreInput.audio(v.bin)
        return StoreInput.raw_string(v.s)

    def metadata_values(self) -> Tuple[MetadataValue, ...]:
        self.lit("(")
        vals = [self.metadata_value()]
        while self.try_lit(","):
            vals.append(self.metadata_value())
        self.lit(")")
        return tuple(vals)

    def metadata_keys(self) -> Tuple[str, ...]:
        keys = [self.ident()]
        while self.try_lit(","):
            keys.append(self.ident())
        return tuple(keys)

    def store_value(self) -> Tuple[Tuple[str, MetadataValue], ...]:
        """{key: value, key: value} — insertion order preserved."""
        self.lit("{")
        pairs = []
        while True:
            key = self.ident()
            self.lit(":")
            pairs.append((key, self.metadata_value()))
            if not self.try_lit(","):
                break
        self.lit("}")
        return tuple(pairs)

    def schema_clause(self) -> Optional[str]:
        if self.try_kw("schema"):
            return self.ident()
        return None

    # -------------------------------------------------------- predicates --
    def predicate_condition(self) -> Predicate:
        self.lit("(")
        p = self.predicate_expression()
        self.lit(")")
        return p

    def predicate_expression(self) -> Predicate:
        if self.peek() == "(":
            # compound: "(" expr ")" then left-assoc (and|or expr)* chain
            self.lit("(")
            left = self.predicate_expression()
            self.lit(")")
            while True:
                if self.try_kw("and"):
                    left = And(left, self.predicate_expression())
                elif self.try_kw("or"):
                    left = Or(left, self.predicate_expression())
                else:
                    return left
        return self.simple_expression()

    def simple_expression(self) -> Predicate:
        key = self.ident()
        if self.try_kw("not", "in"):
            return NotIn(key, self.metadata_values())
        if self.try_kw("in"):
            return In(key, self.metadata_values())
        if self.try_lit("!="):
            return NotEquals(key, self.metadata_value())
        if self.try_lit("="):
            return Equals(key, self.metadata_value())
        raise self.error("predicate operator (=, !=, IN, NOT IN)")


def _algorithm(cur: _Cursor) -> str:
    word = cur.regex(_WORD, "algorithm").lower()
    if word not in ALGORITHMS:
        raise DslSyntaxError(f"unknown algorithm {word!r}; one of {sorted(ALGORITHMS)}")
    return ALGORITHMS[word]


def _non_linear_algorithms(cur: _Cursor) -> Tuple[str, ...]:
    cur.lit("(")
    algos = []
    while True:
        word = cur.regex(_WORD, "non-linear algorithm").lower()
        if word not in NON_LINEAR:
            raise DslSyntaxError(f"unknown non-linear algorithm {word!r}")
        algos.append(NON_LINEAR[word])
        if not cur.try_lit(","):
            break
    cur.lit(")")
    return tuple(algos)


def _preprocess(cur: _Cursor) -> str:
    word = cur.regex(_WORD, "preprocess action").lower()
    if word not in PREPROCESS:
        raise DslSyntaxError(f"unknown preprocess action {word!r}")
    return word


def _provider(cur: _Cursor) -> str:
    word = cur.regex(_WORD, "execution provider").lower()
    if word not in PROVIDERS:
        raise DslSyntaxError(f"unknown execution provider {word!r}")
    return word


def _model(cur: _Cursor) -> str:
    from ahnlich_spark.ai.models import MODELS

    name = cur.regex(_MODEL, "model name").lower()
    if name not in MODELS:
        raise DslSyntaxError(f"unknown model {name!r}; one of {sorted(MODELS)}")
    return name


# ------------------------------------------------------------ statements --

def _parse_db_statement(cur: _Cursor) -> ops.DslOp:
    if cur.try_kw("ping"):
        return ops.Ping()
    if cur.try_kw("infoserver"):
        return ops.InfoServer()
    if cur.try_kw("liststores"):
        return ops.ListStores(schema=cur.schema_clause())
    if cur.try_kw("listclients"):
        return ops.ListClients()
    if cur.try_kw("dropschema"):
        return ops.DropSchema(schema=cur.ident())
    if cur.try_kw("getstore"):
        return ops.GetStore(store=cur.ident(), schema=cur.schema_clause())
    if cur.try_kw("dropstore"):
        store = cur.ident()
        error_if_not_exists = not cur.try_kw("if", "exists")
        return ops.DropStore(store=store, error_if_not_exists=error_if_not_exists,
                             schema=cur.schema_clause())
    if cur.try_kw("createpredindex"):
        cur.lit("(")
        keys = cur.metadata_keys()
        cur.lit(")")
        cur.kw("in")
        return ops.CreatePredIndex(store=cur.ident(), keys=keys, schema=cur.schema_clause())
    if cur.try_kw("droppredindex"):
        error_if_not_exists = not cur.try_kw("if", "exists")
        cur.lit("(")
        keys = cur.metadata_keys()
        cur.lit(")")
        cur.kw("in")
        return ops.DropPredIndex(store=cur.ident(), keys=keys,
                                 error_if_not_exists=error_if_not_exists,
                                 schema=cur.schema_clause())
    if cur.try_kw("createnonlinearalgorithmindex"):
        algos = _non_linear_algorithms(cur)
        cur.kw("in")
        return ops.CreateNonLinearAlgorithmIndex(store=cur.ident(), algorithms=algos,
                                                 schema=cur.schema_clause())
    if cur.try_kw("dropnonlinearalgorithmindex"):
        error_if_not_exists = not cur.try_kw("if", "exists")
        algos = _non_linear_algorithms(cur)
        cur.kw("in")
        return ops.DropNonLinearAlgorithmIndex(store=cur.ident(), algorithms=algos,
                                               error_if_not_exists=error_if_not_exists,
                                               schema=cur.schema_clause())
    if cur.try_kw("getkey"):
        cur.lit("(")
        keys = cur.f32_arrays()
        cur.lit(")")
        cur.kw("in")
        return ops.GetKey(store=cur.ident(), keys=keys, schema=cur.schema_clause())
    if cur.try_kw("delkey"):
        cur.lit("(")
        keys = cur.f32_arrays()
        cur.lit(")")
        cur.kw("in")
        return ops.DelKey(store=cur.ident(), keys=keys, schema=cur.schema_clause())
    if cur.try_kw("getpred"):
        cond = cur.predicate_condition()
        cur.kw("in")
        return ops.GetPred(store=cur.ident(), condition=cond, schema=cur.schema_clause())
    if cur.try_kw("delpred"):  # extension (wire-only op in the reference)
        cond = cur.predicate_condition()
        cur.kw("in")
        return ops.DelPred(store=cur.ident(), condition=cond, schema=cur.schema_clause())
    if cur.try_kw("getsimn"):
        n = cur.non_zero()
        cur.kw("with")
        vec = cur.f32_array()
        cur.kw("using")
        algo = _algorithm(cur)
        cur.kw("in")
        store = cur.ident()
        schema = cur.schema_clause()
        cond = cur.predicate_condition() if cur.try_kw("where") else None
        return ops.GetSimN(store=store, closest_n=n, search_input=vec,
                           algorithm=algo, condition=cond, schema=schema)
    if cur.try_kw("createstore"):
        error_if_exists = not cur.try_kw("if", "not", "exists")
        store = cur.ident()
        cur.kw("dimension")
        dim = cur.non_zero()
        predicates: Tuple[str, ...] = ()
        if cur.try_kw("predicates"):
            cur.lit("(")
            predicates = cur.metadata_keys()
            cur.lit(")")
        non_linear: Tuple[str, ...] = ()
        if cur.try_kw("nonlinearalgorithmindex"):
            non_linear = _non_linear_algorithms(cur)
        return ops.CreateStore(store=store, dimension=dim, predicates=predicates,
                               non_linear_algorithms=non_linear,
                               error_if_exists=error_if_exists,
                               schema=cur.schema_clause())
    if cur.try_kw("set"):
        cur.lit("(")
        entries = []
        while True:
            cur.lit("(")
            vec = cur.f32_array()
            cur.lit(",")
            value = cur.store_value()
            cur.lit(")")
            entries.append((vec, value))
            if not cur.try_lit(","):
                break
        cur.lit(")")
        cur.kw("in")
        return ops.Set(store=cur.ident(), entries=tuple(entries), schema=cur.schema_clause())
    if cur.try_kw("upsert"):
        cur.lit("(")
        new_key = None
        new_value = None
        if cur.try_kw("none"):
            cur.lit(",")
            new_value = cur.store_value()
        else:
            new_key = cur.f32_array()
            cur.lit(",")
            if not cur.try_kw("none"):
                new_value = cur.store_value()
        cur.lit(")")
        cur.kw("where")
        cond = cur.predicate_condition()
        cur.kw("in")
        store = cur.ident()
        merge = cur.try_kw("merge")
        return ops.Upsert(store=store, condition=cond, new_key=new_key,
                          new_value=new_value, merge_metadata=merge,
                          schema=cur.schema_clause())
    raise cur.error("a DB statement keyword")


def _parse_ai_statement(cur: _Cursor) -> ops.DslOp:
    if cur.try_kw("purgestores"):
        return ops.PurgeStores()
    if cur.try_kw("getkey"):
        inputs = _ai_inputs(cur)
        cur.kw("in")
        return ops.AiGetKey(store=cur.ident(), inputs=inputs, schema=cur.schema_clause())
    if cur.try_kw("delkey"):
        inputs = _ai_inputs(cur)
        cur.kw("in")
        return ops.AiDelKey(store=cur.ident(), inputs=inputs, schema=cur.schema_clause())
    if cur.try_kw("getsimn"):
        n = cur.non_zero()
        cur.kw("with")
        cur.lit("[")
        inp = cur.store_input()
        cur.lit("]")
        cur.kw("using")
        algo = _algorithm(cur)
        preprocess = _preprocess(cur) if cur.try_kw("preprocessaction") else None
        provider = _provider(cur) if cur.try_kw("executionprovider") else None
        cur.kw("in")
        store = cur.ident()
        schema = cur.schema_clause()
        cond = cur.predicate_condition() if cur.try_kw("where") else None
        return ops.AiGetSimN(store=store, closest_n=n, search_input=inp, algorithm=algo,
                             preprocess_action=preprocess, execution_provider=provider,
                             condition=cond, schema=schema)
    if cur.try_kw("createstore"):
        error_if_exists = not cur.try_kw("if", "not", "exists")
        store = cur.ident()
        cur.kw("querymodel")
        qm = _model(cur)
        cur.kw("indexmodel")
        im = _model(cur)
        predicates: Tuple[str, ...] = ()
        if cur.try_kw("predicates"):
            cur.lit("(")
            predicates = cur.metadata_keys()
            cur.lit(")")
        non_linear: Tuple[str, ...] = ()
        if cur.try_kw("nonlinearalgorithmindex"):
            non_linear = _non_linear_algorithms(cur)
        store_original = cur.try_kw("storeoriginal")
        return ops.AiCreateStore(store=store, query_model=qm, index_model=im,
                                 predicates=predicates, non_linear_algorithms=non_linear,
                                 error_if_exists=error_if_exists,
                                 store_original=store_original,
                                 schema=cur.schema_clause())
    if cur.try_kw("set"):
        cur.lit("(")
        entries = []
        while True:
            cur.lit("(")
            cur.lit("[")
            inp = cur.store_input()
            cur.lit("]")
            cur.lit(",")
            value = cur.store_value()
            cur.lit(")")
            entries.append((inp, value))
            if not cur.try_lit(","):
                break
        cur.lit(")")
        cur.kw("in")
        store = cur.ident()
        schema = cur.schema_clause()
        cur.kw("preprocessaction")
        preprocess = _preprocess(cur)
        provider = _provider(cur) if cur.try_kw("executionprovider") else None
        return ops.AiSet(store=store, entries=tuple(entries), preprocess_action=preprocess,
                         execution_provider=provider, schema=schema)
    if cur.try_kw("upsert"):
        cur.lit("(")
        new_input = None
        new_value = None
        if cur.try_kw("none"):
            cur.lit(",")
            new_value = cur.store_value()
        else:
            cur.lit("[")
            new_input = cur.store_input()
            cur.lit("]")
            cur.lit(",")
            if not cur.try_kw("none"):
                new_value = cur.store_value()
        cur.lit(")")
        cur.kw("where")
        cond = cur.predicate_condition()
        cur.kw("in")
        store = cur.ident()
        cur.kw("preprocessaction")
        preprocess = _preprocess(cur)
        provider = _provider(cur) if cur.try_kw("executionprovider") else None
        return ops.AiUpsert(store=store, condition=cond, new_input=new_input,
                            new_value=new_value, preprocess_action=preprocess,
                            execution_provider=provider, schema=cur.schema_clause())
    # shared statements (same shape as DB): ping/infoserver/liststores/
    # dropschema/getstore/dropstore/indexes/getpred
    return _parse_db_statement(cur)


def _ai_inputs(cur: _Cursor) -> Tuple[StoreInput, ...]:
    cur.lit("(")
    inputs = []
    while True:
        cur.lit("[")
        inputs.append(cur.store_input())
        cur.lit("]")
        if not cur.try_lit(","):
            break
    cur.lit(")")
    return tuple(inputs)


def _stmt_end(text: str, start: int) -> int:
    """Index of the ``;`` that terminates the statement beginning at
    ``start``, or -1. A ``;`` inside an open ``(``/``[`` context does
    NOT terminate: the reference grammar's raw_string
    (syntax.pest:147) excludes only ``,[()]}``, so every position where
    a raw string may appear (metadata values, predicate values) is
    bracketed and a ``;`` there is literal content, consumed by pest's
    greedy statement match. Only ``(`` and ``[`` open depth: they are
    the two openers whose closers are excluded from raw_string along
    with themselves. ``{`` is LEGAL raw-string content (it is absent
    from the exclusion set), so counting it as an opener would make an
    unmatched ``{`` inside a bracketed value swallow the following
    ``;`` — the reference would still split there. ``}`` closes
    nothing here for the same reason (it only ever pairs with a ``{``
    we never counted). Depth never goes negative — a stray closer at
    depth 0 stays at depth 0, so a following ``;`` still splits."""
    depth = 0
    for j in range(start, len(text)):
        c = text[j]
        if c in "([":
            depth += 1
        elif c in ")]":
            if depth > 0:
                depth -= 1
        elif c == ";" and depth == 0:
            return j
    return -1


def _parse(text: str, stmt_parser) -> List[ops.DslOp]:
    """Statements are parsed per ``;``-segment so syntax errors carry
    the reference's span semantics (DslError::UnexpectedSpan, pinned by
    tests/test_dsl_golden.py against dsl/src/tests/{db,ai}.rs).
    Segment boundaries are bracket-depth-aware (``_stmt_end``) so raw
    strings containing ``;`` parse as the reference grammar does. Error
    spans clamp to the first raw ``;`` in the segment — pest's
    invalid_statement catch-all (``(!";" ~ ANY)+``, syntax.pest:182)
    stops at ANY ``;`` regardless of bracket depth, both for whole
    invalid statements and for trailing junk after a valid one (the
    trailing ``(invalid_statement)?`` in rules like drop_store,
    syntax.pest:56)."""
    out: List[ops.DslOp] = []
    n = len(text)
    seg_start = 0
    while seg_start <= n:
        semi = _stmt_end(text, seg_start)
        seg_end = semi if semi != -1 else n
        seg = text[seg_start:seg_end]
        if seg.strip():
            cur = _Cursor(seg)
            try:
                op = stmt_parser(cur)
            except DslSyntaxError as e:
                raw_semi = text.find(";", seg_start, seg_end)
                err_end = seg_end if raw_semi == -1 else raw_semi
                raise DslSyntaxError(
                    str(e), span=(seg_start, err_end)
                ) from None
            if not cur.eof():
                raw_semi = text.find(";", seg_start + cur.mark, seg_end)
                err_end = seg_end if raw_semi == -1 else raw_semi
                raise DslSyntaxError(
                    f"trailing input in statement: {seg[cur.mark:]!r}",
                    span=(seg_start + cur.mark, err_end),
                )
            out.append(op)
        if semi == -1:
            break
        seg_start = semi + 1
    return out


def parse_db_query(text: str) -> List[ops.DslOp]:
    """Parse a ``;``-separated DB-service query string into op structs
    (reference entry point: ahnlich/dsl/src/db.rs:49-51)."""
    return _parse(text, _parse_db_statement)


def parse_ai_query(text: str) -> List[ops.DslOp]:
    """Parse a ``;``-separated AI-service query string
    (reference: ahnlich/dsl/src/ai.rs)."""
    return _parse(text, _parse_ai_statement)
