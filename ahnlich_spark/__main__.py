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
    p.add_argument("--max-rows", type=int, default=20,
                   help="row cap when rendering DataFrame results")
    return p


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


_SQL_ESCAPE = "\\sql "


def _run_sql(spark, engine, query: str, max_rows: int) -> str:
    # re-register so the SQL sees the CURRENT snapshot (views pin the
    # version they were built from)
    engine.register_views()
    engine.register_materialized_views()
    return _render(spark.sql(query), max_rows)


def _print_results(results, max_rows: int) -> None:
    for r in results:
        if r.ok:
            print(_render(r.result, max_rows))
        else:
            print(f"Error: {r.error}")
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
        if not text.startswith(_SQL_ESCAPE):
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
        if text.startswith(_SQL_ESCAPE):
            try:
                print(_run_sql(spark, engine, text[len(_SQL_ESCAPE):],
                               args.max_rows))
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
        # ~/.ahnlich_cli_history behavior (cli/src/history.rs)
        import os

        hist_path = os.path.join(
            os.path.expanduser("~"), ".ahnlich_spark_history")
        try:
            readline.read_history_file(hist_path)
        except OSError:
            pass
    print(f"ahnlich_spark {args.agent} agent — warehouse "
          f"{args.warehouse} (exit/quit or Ctrl-D to leave)")
    while True:
        try:
            line = input("ahnlich> ")
        except (EOFError, KeyboardInterrupt):
            print()
            break
        if line.strip().lower() in ("exit", "quit"):
            break
        if not line.strip():
            continue
        if line.startswith(_SQL_ESCAPE):
            try:
                print(_run_sql(spark, engine, line[len(_SQL_ESCAPE):],
                               args.max_rows))
            except Exception as e:
                print(f"Error: {e}")
            continue
        try:
            results = _execute(executor, args.agent, line)
        except DslSyntaxError as e:
            print(f"Error: {e}")
            continue
        _print_results(results, args.max_rows)
    if hist_path is not None:
        try:
            readline.write_history_file(hist_path)
        except OSError:
            pass
    return 0


if __name__ == "__main__":
    sys.exit(main())
