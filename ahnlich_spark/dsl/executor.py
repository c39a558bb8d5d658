"""DSL executor: parsed op structs -> Engine/AiEngine method calls.

Mirrors the reference's pipeline execution: each statement runs in
order, results collect per-statement, and an error in one statement is
recorded inline without aborting the rest (reference
DbRequestPipeline, ahnlich/db/src/server/handler.rs:526-927; CLI loop
ahnlich/cli/src/connect.rs:92-118).

DataFrame-returning ops (GetKey/GetPred/GetSimN) return their DataFrame
lazily in the result — callers decide whether to collect, stream, or
compose further (the Spark-native advantage over the reference's
always-materialize wire protocol).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, List, Optional, Sequence

from ahnlich_spark.dsl import ops
from ahnlich_spark.dsl.parser import parse_ai_query, parse_db_query
from ahnlich_spark.catalog import PUBLIC_SCHEMA


@dataclass
class StatementResult:
    op: ops.DslOp
    ok: bool
    result: Any = None
    error: Optional[str] = None


def _schema(op_schema: Optional[str]) -> str:
    return op_schema if op_schema is not None else PUBLIC_SCHEMA


def _meta_dict(pairs) -> dict:
    return {k: v for k, v in pairs} if pairs is not None else None


class DslExecutor:
    """Executes DB-service DSL against an Engine, and AI-service DSL
    against an AiEngine (when provided)."""

    def __init__(self, engine, ai_engine=None):
        self.engine = engine
        self.ai = ai_engine

    # ------------------------------------------------------------ entry --
    def execute_db(self, text: str) -> List[StatementResult]:
        return self._run(parse_db_query(text))

    def execute_ai(self, text: str) -> List[StatementResult]:
        return self._run(parse_ai_query(text), ai_context=True)

    def _run(self, parsed: Sequence[ops.DslOp],
             ai_context: bool = False) -> List[StatementResult]:
        out: List[StatementResult] = []
        for op in parsed:
            try:
                out.append(StatementResult(
                    op=op, ok=True, result=self._dispatch(op, ai_context)))
            except Exception as e:  # record inline, keep going
                out.append(StatementResult(op=op, ok=False,
                                           error=f"{type(e).__name__}: {e}"))
        return out

    # --------------------------------------------------------- dispatch --
    def _dispatch(self, op: ops.DslOp, ai_context: bool = False) -> Any:
        eng = self.engine
        if isinstance(op, ops.Ping):
            return eng.ping()
        if isinstance(op, ops.InfoServer):
            return eng.info_server()
        if isinstance(op, ops.ListClients):
            return eng.list_clients()
        if isinstance(op, ops.ListStores):
            return eng.list_stores(schema=_schema(op.schema))
        if isinstance(op, ops.GetStore):
            return eng.get_store(op.store, schema=_schema(op.schema))
        if isinstance(op, ops.DropSchema):
            return eng.drop_schema(op.schema)
        if isinstance(op, ops.DropStore):
            return eng.drop_store(op.store, error_if_not_exists=op.error_if_not_exists,
                                  schema=_schema(op.schema))
        if isinstance(op, ops.CreateStore):
            return eng.create_store(
                op.store, dimension=op.dimension, predicates=op.predicates,
                non_linear_indices=op.non_linear_algorithms,
                error_if_exists=op.error_if_exists, schema=_schema(op.schema))
        if isinstance(op, ops.CreatePredIndex):
            return eng.create_pred_index(op.store, op.keys, schema=_schema(op.schema))
        if isinstance(op, ops.DropPredIndex):
            return eng.drop_pred_index(op.store, op.keys,
                                       error_if_not_exists=op.error_if_not_exists,
                                       schema=_schema(op.schema))
        if isinstance(op, ops.CreateNonLinearAlgorithmIndex):
            return eng.create_non_linear_algorithm_index(op.store, op.algorithms,
                                                         schema=_schema(op.schema))
        if isinstance(op, ops.DropNonLinearAlgorithmIndex):
            return eng.drop_non_linear_algorithm_index(
                op.store, op.algorithms, error_if_not_exists=op.error_if_not_exists,
                schema=_schema(op.schema))
        if isinstance(op, ops.GetKey):
            return eng.get_key(op.store, [list(k) for k in op.keys], schema=_schema(op.schema))
        if isinstance(op, ops.DelKey):
            return eng.del_key(op.store, [list(k) for k in op.keys], schema=_schema(op.schema))
        if isinstance(op, ops.GetPred):
            # AI-service GetPred converts results back to original inputs
            # (reference aiproxy_test test_ai_proxy_get_pred_succeeds)
            if ai_context and self.ai is not None:
                return self.ai.get_pred(op.store, op.condition,
                                        schema=_schema(op.schema))
            return eng.get_pred(op.store, op.condition, schema=_schema(op.schema))
        if isinstance(op, ops.DelPred):
            return eng.del_pred(op.store, op.condition, schema=_schema(op.schema))
        if isinstance(op, ops.GetSimN):
            return eng.get_sim_n(op.store, list(op.search_input), closest_n=op.closest_n,
                                 algorithm=op.algorithm, condition=op.condition,
                                 schema=_schema(op.schema))
        if isinstance(op, ops.Set):
            entries = [(list(vec), _meta_dict(value)) for vec, value in op.entries]
            return eng.set(op.store, entries, schema=_schema(op.schema))
        if isinstance(op, ops.Upsert):
            return eng.upsert(op.store, op.condition,
                              new_key=list(op.new_key) if op.new_key else None,
                              new_value=_meta_dict(op.new_value),
                              merge_metadata=op.merge_metadata,
                              schema=_schema(op.schema))
        return self._dispatch_ai(op)

    def _dispatch_ai(self, op: ops.DslOp) -> Any:
        if self.ai is None:
            raise ValueError(f"AI op {type(op).__name__} requires an AiEngine")
        ai = self.ai
        if isinstance(op, ops.PurgeStores):
            return ai.purge_stores()
        if isinstance(op, ops.AiCreateStore):
            return ai.create_store(
                op.store, query_model=op.query_model, index_model=op.index_model,
                predicates=op.predicates, non_linear_indices=op.non_linear_algorithms,
                error_if_exists=op.error_if_exists, store_original=op.store_original,
                schema=_schema(op.schema))
        if isinstance(op, ops.AiSet):
            entries = [(inp, _meta_dict(value)) for inp, value in op.entries]
            return ai.set(op.store, entries, schema=_schema(op.schema),
                          preprocess_action=op.preprocess_action,
                          execution_provider=op.execution_provider)
        if isinstance(op, ops.AiGetKey):
            return ai.get_key(op.store, list(op.inputs), schema=_schema(op.schema))
        if isinstance(op, ops.AiDelKey):
            return ai.del_key(op.store, list(op.inputs), schema=_schema(op.schema))
        if isinstance(op, ops.AiGetSimN):
            kw = {}
            if op.preprocess_action is not None:
                kw["preprocess_action"] = op.preprocess_action
            return ai.get_sim_n(op.store, op.search_input, closest_n=op.closest_n,
                                algorithm=op.algorithm, condition=op.condition,
                                schema=_schema(op.schema),
                                execution_provider=op.execution_provider, **kw)
        if isinstance(op, ops.AiUpsert):
            return ai.upsert(op.store, op.condition, new_input=op.new_input,
                             new_value=_meta_dict(op.new_value),
                             schema=_schema(op.schema),
                             preprocess_action=op.preprocess_action,
                             execution_provider=op.execution_provider)
        raise ValueError(f"unhandled op {type(op).__name__}")
