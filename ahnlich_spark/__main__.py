"""``python -m ahnlich_spark`` — the DSL front-end as a runnable CLI.

Mirrors the reference's ``ahnlich_cli`` surface
(``ahnlich/cli/src/main.rs``: ``--agent db|ai``, ``--no-interactive``;
``term.rs:309`` REPL loop / ``execute_non_interactive``;
``connect.rs:92-118`` parse-then-pipeline), re-expressed for an
embedded engine: instead of a gRPC client the CLI owns a local
SparkSession + warehouse-backed :class:`Engine` (and
:class:`AiEngine` for ``--agent ai``), so the same DSL scripts a
reference user pipes at ``ahnlich_cli`` run against parquet stores.

Reference parity choices:

- ``--no-interactive`` reads stdin to EOF BEFORE building the session
  (main.rs checks input before connecting); empty input is an error to
  stderr with exit 1.
- A parse error (``DslSyntaxError``) in non-interactive mode goes to
  stderr with exit 1 (``execute_non_interactive``); in the REPL it
  prints and the loop continues.
- Statement EXECUTION errors are inline per-statement results in both
  modes and never abort the pipeline (the reference pipeline handler's
  errors-inline contract, handler.rs:922-926).

Spark-native departure: DataFrame-returning statements (GETKEY /
GETPRED / GETSIMN) render as Spark tables capped at ``--max-rows``
instead of the reference's always-materialized wire blobs. And a
``\\sql <query>`` escape (REPL per-line; non-interactive when the
whole input starts with it) opens the engine's SQL door — stores and
managed materialized views are (re-)registered as
``ahnlich_<store>`` / ``ahnlich_mv_<view>`` temp views and the rest
of the line runs as Spark SQL, the composition surface the
reference's gRPC-only protocol cannot offer.
"""

from __future__ import annotations

import argparse
import sys


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="python -m ahnlich_spark",
        description="Run ahnlich DSL statements against a local "
                    "Spark-backed warehouse.",
    )
    p.add_argument("--agent", required=True, choices=("db", "ai"),
                   help="which DSL surface to speak (reference "
                        "--agent db|ai)")
    p.add_argument("--warehouse", default="./ahnlich_warehouse",
                   help="warehouse directory for store parquet + "
                        "catalog (created if missing)")
    p.add_argument("--master", default="local[*]",
                   help="Spark master (default local[*])")
    p.add_argument("--no-interactive", action="store_true",
                   help="read statements from stdin to EOF, print "
                        "results, exit (reference --no-interactive)")
    p.add_argument("--max-rows", type=_non_negative_int, default=20,
                   help="row cap when rendering DataFrame results")
    return p


def _non_negative_int(v: str) -> int:
    n = int(v)
    if n < 0:
        raise argparse.ArgumentTypeError("--max-rows must be >= 0")
    return n


def _render(result, max_rows: int) -> str:
    from pyspark.sql import DataFrame

    if result is None:
        return "OK"
    if isinstance(result, DataFrame):
        # showString is what DataFrame.show prints; returning the text
        # keeps stdout writes in one place (and testable)
        return result._jdf.showString(max_rows, 40, False)
    if isinstance(result, (list, tuple)):
        return "\n".join(str(r) for r in result) if result else "[]"
    return str(result)


def _execute(executor, agent: str, text: str):
    return (executor.execute_ai(text) if agent == "ai"
            else executor.execute_db(text))


def _sql_query(text: str):
    """The ``\\sql`` escape, tolerantly: leading whitespace and any
    case accepted, returns the query string ('' for a bare ``\\sql``
    so the caller can give usage guidance instead of feeding the line
    to the DSL parser as a misleading syntax error). None = not the
    escape."""
    s = text.strip()
    if s.lower() == "\\sql":
        return ""
    if s[:5].lower() == "\\sql" + " " or s[:5].lower() == "\\sql\t":
        return s[5:].strip()
    return None


def _run_sql(spark, engine, query: str, max_rows: int) -> str:
    # re-register so the SQL sees the CURRENT snapshot (views pin the
    # version they were built from). Every schema is published: public
    # keeps the bare ahnlich_/ahnlich_mv_ names, any other schema gets
    # ahnlich_<schema>_<store> so DSL SCHEMA-clause stores are
    # reachable too
    if not query:
        raise ValueError("\\sql requires a query, e.g. "
                         "\\sql SELECT * FROM ahnlich_<store>")
    from ahnlich_spark.catalog import PUBLIC_SCHEMA

    for schema in engine.catalog.schema_names() or [PUBLIC_SCHEMA]:
        tag = "" if schema == PUBLIC_SCHEMA else f"{schema}_"
        engine.register_views(schema=schema, prefix=f"ahnlich_{tag}")
        engine.register_materialized_views(
            schema=schema, prefix=f"ahnlich_mv_{tag}")
    return _render(spark.sql(query), max_rows)


def _print_results(results, max_rows: int) -> None:
    for r in results:
        if not r.ok:
            print(f"Error: {r.error}")
            continue
        try:
            print(_render(r.result, max_rows))
        except Exception as e:  # DataFrame results are LAZY — the job
            # runs at render time, so a runtime failure lands here and
            # must stay inline like every other execution error
            print(f"Error: {type(e).__name__}: {e}")
    sys.stdout.flush()


def main(argv=None) -> int:
    args = _build_parser().parse_args(argv)

    from ahnlich_spark.dsl.parser import (
        DslSyntaxError,
        parse_ai_query,
        parse_db_query,
    )

    text = None
    if args.no_interactive:
        # read and PARSE before building the session: an empty pipe or
        # a syntax error should fail fast without paying JVM startup
        # (main.rs likewise checks input before connecting)
        text = sys.stdin.read().strip()
        if not text:
            print("Error: No input provided", file=sys.stderr)
            return 1
        if _sql_query(text) is None:
            try:
                (parse_ai_query if args.agent == "ai"
                 else parse_db_query)(text)
            except DslSyntaxError as e:
                print(f"Error: {e}", file=sys.stderr)
                return 1

    from pyspark.sql import SparkSession

    from ahnlich_spark import Engine
    from ahnlich_spark.dsl.executor import DslExecutor

    spark = (
        SparkSession.builder.master(args.master)
        .appName("ahnlich_spark_cli")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    engine = Engine(spark, args.warehouse)
    ai = None
    if args.agent == "ai":
        from ahnlich_spark import AiEngine

        ai = AiEngine(engine)
    executor = DslExecutor(engine, ai)

    if args.no_interactive:
        sql = _sql_query(text)
        if sql is not None:
            try:
                print(_run_sql(spark, engine, sql, args.max_rows))
            except Exception as e:
                print(f"Error: {e}", file=sys.stderr)
                return 1
            return 0
        # text already parsed clean above; execution errors stay inline
        _print_results(_execute(executor, args.agent, text), args.max_rows)
        return 0

    # ------------------------------------------------------------ REPL --
    readline = None
    try:
        import readline  # line editing + persistent history when a tty
    except ImportError:
        pass
    hist_path = None
    if readline is not None:
        # cross-session command history, the reference CLI's
        # ~/.ahnlich_cli_history behavior (cli/src/history.rs) — capped
        # like rustyline's, not unbounded
        import os

        hist_path = os.path.join(
            os.path.expanduser("~"), ".ahnlich_spark_history")
        readline.set_history_length(1000)
        try:
            readline.read_history_file(hist_path)
        except (OSError, ValueError):
            pass  # missing or unreadable history never blocks the REPL
    print(f"ahnlich_spark {args.agent} agent — warehouse "
          f"{args.warehouse} (exit/quit or Ctrl-D to leave)")
    try:
        while True:
            try:
                line = input("ahnlich> ")
            except EOFError:
                print()
                break
            except KeyboardInterrupt:
                # Ctrl-C clears the current line (the reference's
                # rustyline behavior); Ctrl-D leaves
                print("^C")
                continue
            if line.strip().lower() in ("exit", "quit"):
                break
            if not line.strip():
                continue
            try:
                sql = _sql_query(line)
                if sql is not None:
                    try:
                        print(_run_sql(spark, engine, sql, args.max_rows))
                    except Exception as e:
                        print(f"Error: {e}")
                    continue
                try:
                    results = _execute(executor, args.agent, line)
                except DslSyntaxError as e:
                    print(f"Error: {e}")
                    continue
                _print_results(results, args.max_rows)
            except KeyboardInterrupt:
                # Ctrl-C mid-statement cancels that statement only
                print("\nInterrupted")
                continue
    finally:
        if hist_path is not None:
            try:
                readline.write_history_file(hist_path)
            except OSError:
                pass
    return 0


if __name__ == "__main__":
    sys.exit(main())
