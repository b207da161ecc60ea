"""Painless expression-subset transpiler (modules/lang-painless
analogue: compile-to-Catalyst instead of compile-to-bytecode)."""

import duckdb
import pytest

from elasticsearch_spark.scripts import compile_painless, maybe_painless
from elasticsearch_spark.scripts.painless import PainlessError


def test_doc_access_and_arithmetic():
    assert compile_painless("doc['n_chars'].value * 2") == "(n_chars * 2)"
    assert compile_painless("doc['a'].value + doc['b'].value") == "(a + b)"
    assert compile_painless("doc['f'].empty") == "(f IS NULL)"
    assert compile_painless("doc['v'].size()") == "size(v)"
    assert compile_painless("doc['v'].size()", dialect="duckdb") == "len(v)"


def test_params_inline_as_literals():
    assert compile_painless("params.w * doc['x'].value",
                            {"w": 2.5}) == "(2.5 * x)"
    assert compile_painless("params['name']", {"name": "a'b"}) == "'a''b'"
    assert compile_painless("params.flag ? 1 : 0", {"flag": True}) == \
        "CASE WHEN TRUE THEN 1 ELSE 0 END"
    with pytest.raises(PainlessError):
        compile_painless("params.missing", {})


def test_math_and_score():
    assert compile_painless("Math.log(1 + doc['x'].value)") == "ln((1 + x))"
    assert compile_painless("Math.max(_score, 1.0)") == "greatest(score, 1.0)"
    assert compile_painless("Math.pow(doc['x'].value, 2)") == "power(x, 2)"
    assert compile_painless("_score", score_col="s2") == "s2"
    with pytest.raises(PainlessError):
        compile_painless("Math.random()")


def test_operators_precedence_ternary():
    got = compile_painless(
        "doc['a'].value > 3 && doc['b'].value != 'x' ? 1 : -2")
    assert got == ("CASE WHEN ((a > 3) AND (b <> 'x')) "
                   "THEN 1 ELSE (- 2) END")
    assert compile_painless("1 + 2 * 3") == "(1 + (2 * 3))"
    assert compile_painless("(1 + 2) * 3") == "(((1 + 2)) * 3)"
    assert compile_painless("!(doc['a'].value == null)") == \
        "(NOT ((a = NULL)))"


def test_maybe_painless_routing():
    # painless markers route through the transpiler
    assert maybe_painless("doc['x'].value + 1") == "(x + 1)"
    # raw SQL (the engine's native dialect) passes through untouched
    assert maybe_painless("x + 1") == "x + 1"
    assert maybe_painless("ln(1 + n_chars)") == "ln(1 + n_chars)"


def test_subset_boundary_errors():
    for bad in ["doc[x].value", "for (int i = 0;;) {}", "doc['x'].values",
                "new int[3]", "doc['x'].value +"]:
        with pytest.raises(PainlessError):
            compile_painless(bad)


def test_spark_duckdb_parity(spark):
    """The SAME compiled text runs in both engines with equal results —
    the property the correctness oracle relies on."""
    rows = [(1, 10.0, "abc"), (2, 3.5, "zz"), (3, 0.0, "q'q")]
    df = spark.createDataFrame(rows, "id long, x double, s string")
    src = ("Math.log(1 + doc['x'].value) * params.w"
           " + (doc['s'].value == 'zz' ? 100 : 0)")
    expr = compile_painless(src, {"w": 3})
    got = sorted(
        (r["id"], round(r["v"], 9))
        for r in df.selectExpr("id", f"{expr} AS v").collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE t(id BIGINT, x DOUBLE, s VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    want = sorted(
        (i, round(v, 9))
        for i, v in con.execute(f"SELECT id, {expr} FROM t").fetchall())
    assert got == want


def test_painless_execute_api(spark):
    """_scripts/painless/_execute: script + optional one-doc context."""
    from elasticsearch_spark.scripts import painless_execute

    assert painless_execute(spark, "1 + 2 * 3") == 7
    assert painless_execute(
        spark, "params.a > 2 ? 'big' : 'small'", {"a": 5}) == "big"
    got = painless_execute(
        spark, "Math.log(doc['x'].value) + params.b", {"b": 1.0},
        context_row={"x": 2.718281828459045})
    assert abs(got - 2.0) < 1e-9


def test_stored_scripts(tmp_path, spark):
    """_scripts/<id>: put/get/delete + {"id"} resolution feeding the
    same compilers as inline sources."""
    from elasticsearch_spark.scripts import painless_execute
    from elasticsearch_spark.scripts.painless import (
        delete_stored_script, get_stored_script, put_stored_script,
        resolve_script,
    )

    reg = str(tmp_path / "scripts")
    put_stored_script(reg, "boost", "doc['x'].value * params.w")
    s = resolve_script({"id": "boost", "params": {"w": 3}}, reg)
    assert s["source"].startswith("doc['x']")
    assert painless_execute(spark, s["source"], s["params"],
                            context_row={"x": 2.0}) == 6.0
    assert get_stored_script(reg, "boost")["lang"] == "painless"
    # invalid painless refused at PUT time (compile-on-store, as the
    # reference validates on PutStoredScript)
    with pytest.raises(Exception):
        put_stored_script(reg, "bad", "for (;;) {}")
    delete_stored_script(reg, "boost")
    with pytest.raises(ValueError):
        get_stored_script(reg, "boost")
    with pytest.raises(ValueError):
        resolve_script({"id": "boost"}, reg)
    assert resolve_script({"source": "1 + 1"})["source"] == "1 + 1"


# -- statement subset (modules/lang-painless statement grammar;
#    symbolic execution -> SQL, scripts/painless.py _SymExec) ---------

def test_stmt_locals_and_return():
    from elasticsearch_spark.scripts import compile_painless_program

    sql = compile_painless_program(
        "def a = 2; def b = a * 3; return b + 1;")
    assert duckdb.sql(f"SELECT {sql} AS v").fetchone()[0] == 7


def test_stmt_if_else_return_merge():
    from elasticsearch_spark.scripts import compile_painless_program

    sql = compile_painless_program(
        "def x = doc['p'].value;"
        " if (x > params.cut) { return x * 2.0; }"
        " return x / 2.0;", {"cut": 10})
    rows = duckdb.sql(
        f"SELECT {sql} AS v FROM (VALUES (4.0), (40.0)) t(p) ORDER BY p"
    ).fetchall()
    assert [r[0] for r in rows] == [2.0, 80.0]


def test_stmt_for_unroll_and_compound_assign():
    from elasticsearch_spark.scripts import compile_painless_program

    sql = compile_painless_program(
        "def t = 0; for (def s : params.xs) { t += s; } t *= 2; return t;",
        {"xs": [1, 2, 3]})
    assert duckdb.sql(f"SELECT {sql} AS v").fetchone()[0] == 12


def test_stmt_update_sequential_read_after_write():
    """ctx._source reads AFTER an assignment see the new value
    (UpdateHelper ctx-map semantics), folded into original-column SQL."""
    from elasticsearch_spark.scripts import compile_painless_update

    plan = compile_painless_update(
        "ctx._source.a = ctx._source.a + 1;"
        " ctx._source.b = ctx._source.a * 2;")
    got = duckdb.sql(
        f"SELECT {plan['set']['a']} AS a, {plan['set']['b']} AS b"
        " FROM (VALUES (10, 0)) t(a, b)").fetchone()
    assert got == (11, 22)
    assert plan["op"] is None


def test_stmt_update_noop_delete(spark):
    """Full update-by-query path: elif chain -> ctx.op noop/delete."""
    from elasticsearch_spark.ops.scan import apply_update_script

    df = spark.createDataFrame(
        [(1, 50.0, 100.0), (2, 10.0, 100.0), (3, 1.0, 100.0)],
        "id long, qty double, price double")
    out = apply_update_script(df, {
        "source": (
            "if (ctx._source.qty >= params.hi)"
            " { ctx._source.price = ctx._source.price * 2.0; }"
            " else if (ctx._source.qty <= params.lo)"
            " { ctx.op = 'delete'; }"
            " else { ctx.op = 'noop'; }"),
        "params": {"hi": 45, "lo": 2},
    })
    got = {r["id"]: r["price"] for r in out.collect()}
    assert got == {1: 200.0, 2: 100.0}  # 3 deleted, 2 noop-kept


def test_stmt_errors():
    from elasticsearch_spark.scripts import (
        compile_painless_program, compile_painless_update)

    with pytest.raises(PainlessError):  # return inside a loop
        compile_painless_update(
            "for (def x : params.xs) { return 1; }", {"xs": [1]})
    with pytest.raises(PainlessError):  # missing semicolon
        compile_painless_program("return 1")
    with pytest.raises(PainlessError):  # ctx outside update context
        compile_painless_program("ctx._source.a = 1;")
    with pytest.raises(PainlessError):  # statement script, no return
        compile_painless_program("def a = 1;")
    with pytest.raises(PainlessError):  # for over non-list
        compile_painless_program(
            "def t = 0; for (def s : params.n) { t += s; } return t;",
            {"n": 3})


def test_stmt_classic_for_and_while():
    """Counter loops unroll at compile time; const locals re-fold to
    literals so the emitted SQL stays compact."""
    from elasticsearch_spark.scripts import compile_painless_update

    import duckdb

    def val(expr):
        return duckdb.execute("SELECT " + expr).fetchone()[0]

    plan = compile_painless_update(
        "long s = 0; for (int i = 1; i <= 100; i++) { s += i; }"
        " ctx._source.v = s;")
    # const-folding keeps the unrolled expression compact AND constant
    assert len(plan["set"]["v"]) < 40 and val(plan["set"]["v"]) == 5050
    plan = compile_painless_update(
        "int i = 0; long p = 1; while (i < 10) { p *= 2; ++i; }"
        " ctx._source.v = p;")
    assert val(plan["set"]["v"]) == 1024
    # do-while runs the body once before the first test
    plan = compile_painless_update(
        "int i = 5; long n = 0; do { n += 1; i++; } while (i < 3);"
        " ctx._source.v = n;")
    assert val(plan["set"]["v"]) == 1


def test_stmt_loop_row_dependent_body():
    """A loop body may read document fields — the unroll inlines them
    once per iteration."""
    from elasticsearch_spark.scripts import compile_painless_update

    plan = compile_painless_update(
        "def t = 0.0; for (int i = 0; i < 3; i++)"
        " { t += ctx._source.qty; } ctx._source.v = t;")
    assert plan["set"]["v"].count("qty") == 3


def test_stmt_map_subset():
    from elasticsearch_spark.scripts import compile_painless_update

    plan = compile_painless_update(
        "Map m = new HashMap(); m.a = 2; m['b'] = 3;"
        " ctx._source.v = m.a * m['b'] + m.size()"
        "   + m.getOrDefault('c', 100) + (m.containsKey('a') ? 1 : 0);")
    # 2*3 + 2 + 100 + 1, left to the engine to fold
    assert "100" in plan["set"]["v"] and "(2)" in plan["set"]["v"]
    # branch-divergent puts merge per key; missing key reads NULL
    plan = compile_painless_update(
        "Map m = [:];"
        " if (ctx._source.q > 5) { m.tag = 'big'; } else { m.x = 1; }"
        " ctx._source.t = m.get('tag');")
    assert plan["set"]["t"] == \
        "CASE WHEN (q > 5) THEN (('big')) ELSE (NULL) END"


def test_stmt_loop_errors():
    from elasticsearch_spark.scripts import compile_painless_update

    with pytest.raises(PainlessError):  # row-dependent condition
        compile_painless_update(
            "int i = 0; while (ctx._source.q > i) { i++; }"
            " ctx._source.v = i;")
    with pytest.raises(PainlessError):  # unroll cap
        compile_painless_update(
            "int i = 0; while (i < 100000) { i++; } ctx._source.v = i;")
    with pytest.raises(PainlessError):  # map/scalar merge in a loop body
        compile_painless_update(
            "Map z = new HashMap(); int i = 0;"
            " while (i < 1) {"
            "   if (ctx._source.q > 2) { z.a = 1; } else { z = 1; } i++; }"
            " ctx._source.v = 1;")
    with pytest.raises(PainlessError):  # non-literal map key
        compile_painless_update(
            "Map m = new HashMap(); def k = 'a'; m[k] = 1;"
            " ctx._source.v = 1;")


def test_stmt_loop_end_to_end(spark):
    """Loop + map script through apply_update_script matches the
    hand-computed values."""
    from elasticsearch_spark.ops.scan import apply_update_script

    df = spark.createDataFrame(
        [(1, 100.0), (2, 200.0)], "id long, price double")
    out = apply_update_script(df, {
        "source": (
            "Map disc = new HashMap(); disc['rate'] = 0.25;"
            " double f = 0.0;"
            " for (int i = 1; i <= 4; i++)"
            " { f += disc.getOrDefault('rate', 0.0) * i; }"
            " int w = 0; long p2 = 1; while (w < 3) { p2 *= 2; w += 1; }"
            " ctx._source.adj = ctx._source.price * (1.0 + f)"
            "   + p2 - disc.size();"),
    })
    got = {r["id"]: r["adj"] for r in out.collect()}
    assert got == {1: 100.0 * 3.5 + 7, 2: 200.0 * 3.5 + 7}


def test_stmt_user_functions():
    """User-defined functions inline at call sites (modules/lang-painless
    function grammar; static semantics — parameters only)."""
    from elasticsearch_spark.scripts import compile_painless_program

    sql = compile_painless_program(
        "double boost(double s, double w) {"
        "  if (s > 10) { return s * w * 2; }"
        "  return s * w;"
        "}"
        " return boost(doc['p'].value, params.w) + 1;", {"w": 0.5})
    rows = duckdb.sql(
        f"SELECT {sql} AS v FROM (VALUES (4.0), (40.0)) t(p) ORDER BY p"
    ).fetchall()
    assert [r[0] for r in rows] == [3.0, 41.0]

    # zero-arg + nested calls + call from an update context
    from elasticsearch_spark.scripts import compile_painless_update

    plan = compile_painless_update(
        "int cap() { return 100; }"
        "int clamp(int x) { if (x > cap()) { return cap(); } return x; }"
        " ctx._source.qty = clamp(ctx._source.qty + 5);")
    got = duckdb.sql(
        f"SELECT {plan['set']['qty']} AS v FROM (VALUES (3), (200)) t(qty)"
        " ORDER BY qty").fetchall()
    assert [r[0] for r in got] == [8, 100]


def test_stmt_user_function_errors():
    from elasticsearch_spark.scripts import compile_painless_program
    from elasticsearch_spark.scripts.painless import PainlessError

    with pytest.raises(PainlessError, match="recursive"):
        compile_painless_program(
            "int f(int x) { return f(x); } return f(1);")
    with pytest.raises(PainlessError, match="takes 1 args"):
        compile_painless_program(
            "int f(int x) { return x; } return f(1, 2);")
    with pytest.raises(PainlessError, match="only use its parameters"):
        compile_painless_program(
            "int f(int x) { return x + doc['y'].value; } return f(1);")
    with pytest.raises(PainlessError, match="must return"):
        compile_painless_program(
            "int f(int x) { int y = x; } return f(1);")
    with pytest.raises(PainlessError, match="duplicate function"):
        compile_painless_program(
            "int f(int x) { return x; } int f(int y) { return y; }"
            " return f(1);")
    with pytest.raises(PainlessError, match="top level"):
        compile_painless_program(
            "if (params.a > 0) { int f(int x) { return x; } } return 1;",
            {"a": 1})


def test_stmt_user_function_loops_inside():
    """A loop inside a function body unrolls per call site."""
    from elasticsearch_spark.scripts import compile_painless_program

    sql = compile_painless_program(
        "double poly(double x) {"
        "  double acc = 0; for (int i = 1; i < 4; ++i) { acc = acc * x + i; }"
        "  return acc;"
        "}"
        " return poly(doc['p'].value);")
    rows = duckdb.sql(
        f"SELECT {sql} AS v FROM (VALUES (2.0)) t(p)").fetchall()
    # ((0*2+1)*2+2)*2+3 = 11
    assert rows[0][0] == 11.0


def test_string_methods():
    """Painless String methods -> shared SQL postfix calls
    (java.lang.String surface painless whitelists)."""
    got = compile_painless("doc['lang'].value.toLowerCase() == 'java'")
    assert got == "(lower(lang) = 'java')"
    assert compile_painless("doc['p'].value.contains('src')") == \
        "(instr(p, 'src') > 0)"
    assert compile_painless("doc['p'].value.indexOf('/')") == \
        "(instr(p, '/') - 1)"
    assert compile_painless(
        "doc['p'].value.substring(1, 3)") == "substring(p, (1) + 1, (3) - (1))"
    # dialect split: startsWith/endsWith
    assert compile_painless("doc['p'].value.startsWith('a')") == \
        "startswith(p, 'a')"
    assert compile_painless("doc['p'].value.startsWith('a')",
                            dialect="duckdb") == "starts_with(p, 'a')"
    # chaining + use inside a larger expression
    got = compile_painless(
        "doc['p'].value.trim().toUpperCase().endsWith('.JAVA') ? 2 : 1",
        dialect="duckdb")
    row = duckdb.sql(
        f"SELECT {got} AS v FROM (VALUES (' x.java ')) t(p)").fetchone()
    assert row[0] == 2
    # java 0-indexed substring/indexOf semantics against duckdb
    got = compile_painless("doc['p'].value.substring(2)", dialect="duckdb")
    assert duckdb.sql(
        f"SELECT {got} FROM (VALUES ('abcdef')) t(p)").fetchone()[0] == "cdef"
    got = compile_painless("doc['p'].value.substring(1, 4)",
                           dialect="duckdb")
    assert duckdb.sql(
        f"SELECT {got} FROM (VALUES ('abcdef')) t(p)").fetchone()[0] == "bcd"
    with pytest.raises(PainlessError, match="takes 1 args"):
        compile_painless("doc['p'].value.contains('a', 'b')")


def test_string_methods_in_statements(spark):
    """String methods + user functions + update context end-to-end on
    BOTH engines."""
    from elasticsearch_spark.scripts import compile_painless_update
    from elasticsearch_spark.scripts.painless import compile_painless

    plan = compile_painless_update(
        "String norm(String s) { return s.trim().toLowerCase(); }"
        " ctx._source.tag = norm(ctx._source.tag);"
        " if (ctx._source.tag.startsWith('x')) { ctx.op = 'delete'; }")
    rows = duckdb.sql(
        "SELECT "
        + compile_painless_update(
            "String norm(String s) { return s.trim().toLowerCase(); }"
            " ctx._source.tag = norm(ctx._source.tag);",
            dialect="duckdb")["set"]["tag"]
        + " AS v FROM (VALUES (' Py '), ('XL')) t(tag) ORDER BY tag"
    ).fetchall()
    assert [r[0] for r in rows] == ["py", "xl"]
    import pyspark.sql.functions as F
    sdf = spark.createDataFrame([(" Py ",), ("XL",)], ["tag"])
    got = sorted(r["v"] for r in sdf.select(
        F.expr(plan["set"]["tag"]).alias("v")).collect())
    assert got == ["py", "xl"]
    assert "startswith(" in plan["op"]  # spark dialect default


def test_string_concat_plus():
    """Java '+' concatenation for syntactically-evident strings."""
    assert compile_painless("'v' + doc['x'].value") == \
        "concat('v', CAST(x AS STRING))"
    assert compile_painless(
        "doc['a'].value.substring(0, 2) + '-' + doc['b'].value"
        ".toLowerCase()") == \
        "concat(concat(substring(a, (0) + 1, (2) - (0)), '-'), lower(b))"
    # all-numeric '+' stays arithmetic
    assert compile_painless("doc['x'].value + 1") == "(x + 1)"
    row = duckdb.sql(
        "SELECT " + compile_painless("'id:' + doc['k'].value",
                                     dialect="duckdb")
        + " AS v FROM (VALUES (7)) t(k)").fetchone()
    assert row[0] == "id:7"
    # inside a statement script with a user function
    from elasticsearch_spark.scripts import compile_painless_program
    sql = compile_painless_program(
        "String label(String p) { return p + ':' + 'tail'; }"
        " return label(doc['s'].value.trim());", dialect="duckdb")
    assert duckdb.sql(
        f"SELECT {sql} FROM (VALUES (' a ')) t(s)").fetchone()[0] == "a:tail"
