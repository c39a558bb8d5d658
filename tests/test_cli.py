"""``python -m ahnlich_spark`` CLI front-end.

Mirrors the reference CLI's contract (ahnlich/cli/src/main.rs,
term.rs execute_non_interactive): stdin-to-EOF non-interactive mode
with clean stdout, parse errors to stderr with exit 1, empty input
refused BEFORE any session spins up, execution errors inline without
aborting the pipeline, and a REPL loop that survives bad statements.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_cli(stdin_text, *argv, timeout=420):
    # 420 s: each CLI test boots a full JVM+Spark subprocess; under the
    # sharded full-suite run (8 concurrent worker sessions saturating
    # the box) a cold AI-agent boot measured ~3x its idle-box time, and
    # a timeout kill here reports as a test failure, not slowness
    import tempfile

    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # isolate HOME: the REPL reads/writes ~/.ahnlich_spark_history and
    # tests must not touch (or depend on) the real user history
    env["HOME"] = tempfile.mkdtemp(prefix="ahnlich_cli_home_")
    return subprocess.run(
        [sys.executable, "-m", "ahnlich_spark", *argv],
        input=stdin_text, capture_output=True, text=True,
        timeout=timeout, env=env, cwd=REPO,
    )


def test_cli_empty_input_fails_fast():
    # no JVM should spin up: well under Spark-startup time
    r = _run_cli("   \n", "--agent", "db", "--no-interactive")
    assert r.returncode == 1
    assert "No input provided" in r.stderr


def test_cli_parse_error_exits_1_before_session():
    r = _run_cli("CREATESTORE ;", "--agent", "db", "--no-interactive")
    assert r.returncode == 1
    assert "Error:" in r.stderr
    # parse validation precedes the session: no Spark banner on stderr
    assert "SparkContext" not in r.stderr


def test_cli_db_pipeline_end_to_end(tmp_path):
    script = (
        "CREATESTORE vecs DIMENSION 3 PREDICATES (tag);"
        "SET (([1,0,0], {tag: a}), ([0,1,0], {tag: b})) IN vecs;"
        "GETSIMN 1 WITH [1,0,0] USING cosinesimilarity IN vecs;"
        "DROPSTORE nope IF EXISTS;"
        "DROPSTORE also_nope;"          # execution error: stays inline
        "PING"
    )
    r = _run_cli(
        script, "--agent", "db", "--no-interactive",
        "--warehouse", str(tmp_path / "wh"), "--master", "local[4]",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    out = r.stdout
    assert "StoreUpsert(inserted=2, updated=0)" in out
    assert "similarity" in out and "1.0" in out   # rendered DataFrame
    assert "Error:" in out                        # inline, not fatal
    assert out.rstrip().endswith("pong")          # pipeline continued


def test_cli_sql_escape(tmp_path):
    # seed stores through the DSL, then query them through the SQL
    # door in the SAME warehouse from a second invocation (REPL mode
    # mixes both per line; non-interactive takes a whole-input \sql)
    wh = str(tmp_path / "wh")
    seed = (
        "CREATESTORE vecs DIMENSION 3 PREDICATES (tag);"
        "SET (([1,0,0], {tag: a}), ([0,1,0], {tag: b}), "
        "([0,0,1], {tag: a})) IN vecs"
    )
    r = _run_cli(seed, "--agent", "db", "--no-interactive",
                 "--warehouse", wh, "--master", "local[4]")
    assert r.returncode == 0, r.stderr[-2000:]
    r = _run_cli(
        "\\sql SELECT meta['tag'].s AS tag, count(*) AS n "
        "FROM ahnlich_vecs GROUP BY 1 ORDER BY 1",
        "--agent", "db", "--no-interactive",
        "--warehouse", wh, "--master", "local[4]")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "|  a|  2|" in r.stdout and "|  b|  1|" in r.stdout
    # a bad SQL query exits 1 with the error on stderr
    r = _run_cli("\\sql SELECT * FROM no_such_view",
                 "--agent", "db", "--no-interactive",
                 "--warehouse", wh, "--master", "local[4]")
    assert r.returncode == 1 and "Error:" in r.stderr
    # tolerant detection: leading whitespace + any case still routes to
    # the SQL door (not a misleading DSL syntax error), and a bare \sql
    # gives usage guidance
    r = _run_cli("   \\SQL SELECT count(*) AS n FROM ahnlich_vecs",
                 "--agent", "db", "--no-interactive",
                 "--warehouse", wh, "--master", "local[4]")
    assert r.returncode == 0 and "|  3|" in r.stdout
    r = _run_cli("\\sql", "--agent", "db", "--no-interactive",
                 "--warehouse", wh, "--master", "local[4]")
    assert r.returncode == 1 and "requires a query" in r.stderr


def test_cli_sql_escape_non_public_schema(tmp_path):
    # stores behind a DSL SCHEMA clause are reachable through the SQL
    # door as ahnlich_<schema>_<store>
    wh = str(tmp_path / "wh")
    r = _run_cli(
        "CREATESTORE v DIMENSION 2 SCHEMA s1;"
        "SET (([1,0], {k: x}), ([0,1], {k: y})) IN v SCHEMA s1",
        "--agent", "db", "--no-interactive",
        "--warehouse", wh, "--master", "local[4]")
    assert r.returncode == 0, r.stderr[-2000:]
    r = _run_cli("\\sql SELECT count(*) AS n FROM ahnlich_s1_v",
                 "--agent", "db", "--no-interactive",
                 "--warehouse", wh, "--master", "local[4]")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "|  2|" in r.stdout


def test_cli_ai_agent_pipeline(tmp_path):
    script = (
        "CREATESTORE texts QUERYMODEL all-minilm-l6-v2 "
        "INDEXMODEL all-minilm-l6-v2 PREDICATES (source) STOREORIGINAL;"
        "SET (([alpha beta], {source: web})) IN texts "
        "PREPROCESSACTION nopreprocessing;"
        "GETSIMN 1 WITH [alpha beta] USING cosinesimilarity IN texts"
    )
    r = _run_cli(
        script, "--agent", "ai", "--no-interactive",
        "--warehouse", str(tmp_path / "wh"), "--master", "local[4]",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "StoreUpsert(inserted=1, updated=0)" in r.stdout
    assert "alpha beta" in r.stdout    # original input round-trips


def test_cli_repl_survives_bad_statement(tmp_path):
    # REPL mode over a pipe: a syntax error prints and the loop
    # continues to the next line; 'exit' leaves cleanly
    lines = "NOT_A_STATEMENT\nPING\nexit\n"
    r = _run_cli(
        lines, "--agent", "db",
        "--warehouse", str(tmp_path / "wh"), "--master", "local[4]",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "Error:" in r.stdout
    assert "pong" in r.stdout
