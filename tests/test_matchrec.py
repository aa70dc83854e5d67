"""MATCH_RECOGNIZE operator tests, including the port of the reference's
BeamSQLTransformTest.testMatchRecognize (its assertions are commented out
upstream; expectations here are hand-derived from SQL:2016 semantics)."""

import pytest

from pipeline_spark.operators.matchrec import (
    _partition_matches,
    compile_expr,
    match_recognize,
    parse_clause,
    parse_pattern,
    split_match_recognize,
)


def _rows(*vals):
    return [{"v": v, "i": i} for i, v in enumerate(vals)]


def _run(rows, pattern, define, skip_to_next=False, subset=None):
    ast, variables = parse_pattern(pattern)
    var_set = set(variables) | set(define)
    defines = {k: compile_expr(v, var_set) for k, v in define.items()}
    return _partition_matches(rows, ast, defines, subset or {}, skip_to_next)


class TestPatternEngine:
    def test_simple_seq(self):
        ms = _run(_rows(1, 2, 3), "A B", {"A": "v = 1", "B": "v = 2"})
        assert len(ms) == 1
        assert ms[0][1] == {0: "A", 1: "B"}

    def test_alternation_prefers_left(self):
        # both alternatives match row 1; D is listed first
        ms = _run(_rows(1, 2), "A (D|C)", {"A": "v = 1", "D": "v = 2", "C": "v = 2"})
        assert ms[0][1][1] == "D"

    def test_star_greedy(self):
        ms = _run(_rows(2, 2, 2, 9), "A* B", {"A": "v = 2", "B": "v = 9"})
        assert ms[0][1] == {0: "A", 1: "A", 2: "A", 3: "B"}

    def test_plus_requires_one(self):
        assert _run(_rows(9), "A+ B", {"A": "v = 2", "B": "v = 9"}) == []

    def test_bounded_quantifier(self):
        ms = _run(_rows(2, 2, 2, 2, 9), "A{2,3} B", {"A": "v = 2", "B": "v = 9"})
        # greedy takes 3 As then backtracking is unneeded: rows 1-3 A, row 4 B
        assert sorted(ms[0][1]) == [1, 2, 3, 4]

    def test_backtracking(self):
        # greedy A* would eat the 9, then must give it back for B
        ms = _run(_rows(2, 9), "A* B", {"A": "v > 0", "B": "v = 9"})
        assert ms[0][1] == {0: "A", 1: "B"}

    def test_skip_past_last_row_non_overlapping(self):
        ms = _run(_rows(1, 2, 1, 2), "A B", {"A": "v = 1", "B": "v = 2"})
        assert [m[1] for m in ms] == [{0: "A", 1: "B"}, {2: "A", 3: "B"}]

    def test_skip_to_next_row_overlapping(self):
        ms = _run(_rows(1, 2, 2), "A B", {"B": "v = 2", "A": "TRUE"}, skip_to_next=True)
        assert len(ms) == 2
        # same input without skip-to-next: the second A-row is consumed
        assert len(_run(_rows(1, 2, 2), "A B", {"B": "v = 2", "A": "TRUE"})) == 1

    def test_prev_offset(self):
        ms = _run(_rows(5, 7, 9), "A B", {"A": "TRUE", "B": "v > PREV(v, 1)"})
        assert ms[0][1] == {0: "A", 1: "B"}

    def test_prev_before_partition_is_null(self):
        # PREV at row 0 → NULL → comparison false
        assert _run(_rows(5, 4), "A B", {"A": "v > PREV(v, 1)", "B": "TRUE"}) == []

    def test_cross_variable_reference(self):
        # B sees the last row mapped to A
        ms = _run(_rows(10, 3), "A B", {"A": "v = 10", "B": "v < A.v"})
        assert len(ms) == 1

    def test_subset(self):
        ms = _run(
            _rows(1, 2, 3),
            "A B C",
            {"A": "v = 1", "B": "v = 2", "C": "v = 3"},
        )
        assert len(ms) == 1


class TestExpr:
    def test_null_comparison_false(self):
        rows = [{"v": None}]
        fn = compile_expr("v > 1", set())
        ms = _run(rows, "A", {"A": "v > 1"})
        assert ms == []
        del fn

    def test_arith_and_bool(self):
        ms = _run(_rows(4), "A", {"A": "v * 2 + 1 = 9 AND NOT v < 0"})
        assert len(ms) == 1

    def test_in_and_is_null(self):
        ms = _run(
            [{"v": 2, "w": None}],
            "A",
            {"A": "v IN (1, 2) AND w IS NULL"},
        )
        assert len(ms) == 1


class TestClauseParser:
    CLAUSE = """
      PARTITION BY user_id
      ORDER BY `timestamp`
      MEASURES
        A.`timestamp` AS `timestamp`,
        A.category AS category_a,
        FIRST(D.category) AS category_d,
        COUNT(*) AS n
      PATTERN (A B (D|C))
      SUBSET E = (A, B, C, D)
      DEFINE
        B AS category = 'B',
        D AS amount > PREV(D.amount, 1),
        C AS category = 'C'
    """

    def test_parse_clause(self):
        kw = parse_clause(self.CLAUSE)
        assert kw["partition_by"] == ["user_id"]
        assert kw["order_by"] == ["timestamp"]
        assert [m[1] for m in kw["measures"]] == ["timestamp", "category_a", "category_d", "n"]
        assert kw["pattern"] == "A B (D|C)"
        assert kw["subset"] == {"E": ["A", "B", "C", "D"]}
        assert set(kw["define"]) == {"B", "D", "C"}

    def test_split_statement(self):
        sql = "SELECT x FROM t MATCH_RECOGNIZE( PARTITION BY k PATTERN (A) DEFINE A AS x > 0 ) AS M"
        prefix, table, body, alias, suffix = split_match_recognize(sql)
        assert table == "t" and alias == "M"
        assert "PATTERN" in body
        assert prefix.strip() == "SELECT x"

    def test_no_match_recognize(self):
        assert split_match_recognize("SELECT 1") is None

    def test_no_alias_before_keyword(self):
        # A trailing keyword must not be swallowed as the table alias.
        for kw in ("WHERE x > 1", "GROUP BY x", "ORDER BY x", "LIMIT 5"):
            sql = f"SELECT x FROM t MATCH_RECOGNIZE( PATTERN (A) DEFINE A AS x > 0 ) {kw}"
            prefix, table, body, alias, suffix = split_match_recognize(sql)
            assert alias is None
            assert suffix.strip() == kw

    def test_explicit_alias_then_keyword(self):
        sql = "SELECT x FROM t MATCH_RECOGNIZE( PATTERN (A) DEFINE A AS x > 0 ) AS m WHERE x > 1"
        _, _, _, alias, suffix = split_match_recognize(sql)
        assert alias == "m" and suffix.strip() == "WHERE x > 1"

    def test_section_words_inside_identifiers(self):
        # Aliases containing section keywords ("undefined", "pattern_ts")
        # must not create spurious section marks.
        kw = parse_clause(
            """
            ORDER BY ts
            MEASURES LAST(A.x) AS undefined, FIRST(A.ts) AS pattern_ts
            PATTERN (A+)
            DEFINE A AS x > 0
            """
        )
        assert [m[1] for m in kw["measures"]] == ["undefined", "pattern_ts"]
        assert kw["pattern"] == "A+"


@pytest.fixture(scope="module")
def mr_input(spark):
    rows = []
    for uid in ("a", "b"):
        for i, cat in enumerate("ABCDEFGHIJ"):
            rows.append((uid, (i + 1) * 100, cat, f"2025-01-01 00:00:{i+1:02d}"))
    df = spark.createDataFrame(rows, "user_id string, amount long, category string, ts string")
    return df.withColumn("ts", df.ts.cast("timestamp"))


class TestSparkIntegration:
    def test_reference_match_recognize(self, mr_input, spark):
        """Port of BeamSQLTransformTest.testMatchRecognize: PATTERN
        (A B (D|C)), B: category='B', D: amount rising, C: category='C'.
        Rows A(100) B(200) C(300): D's define holds at row3 (300 > 200) and
        D is the left alternative, so the C slot binds variable D even
        though the row's category is 'C'.  One match per user.
        Reference: module/transform/BeamSQLTransformTest.java:166-279."""
        out = match_recognize(
            mr_input,
            partition_by=["user_id"],
            order_by=["ts"],
            measures=[
                ("A.ts", "ts"),
                ("A.category", "category_a"),
                ("B.category", "category_b"),
                ("C.category", "category_c"),
                ("FIRST(D.category)", "category_d"),
                ("A.amount", "amount_a"),
                ("B.amount", "amount_b"),
                ("C.amount", "amount_c"),
                ("D.amount", "amount_d"),
            ],
            pattern="A B (D|C)",
            subset={"E": ["A", "B", "C", "D"]},
            define={
                "B": "category = 'B'",
                "D": "amount > PREV(D.amount, 1)",
                "C": "category = 'C'",
            },
        )
        rows = {r["user_id"]: r for r in out.collect()}
        assert set(rows) == {"a", "b"}
        for r in rows.values():
            assert r["category_a"] == "A"
            assert r["category_b"] == "B"
            assert r["category_c"] is None  # D alternative won
            assert r["category_d"] == "C"  # row 3's category, bound as D
            assert (r["amount_a"], r["amount_b"], r["amount_d"]) == (100, 200, 300)
            assert r["amount_c"] is None
            assert r["ts"].second == 1

    def test_beamsql_clause_rewrite(self, mr_input, spark):
        from pipeline_spark.config import parse_config
        from pipeline_spark.executor import run_pipeline

        mr_input.createOrReplaceTempView("__mr_src")
        cfg = parse_config("""
sources:
  - name: evsrc
    module: create
    parameters: {type: int64, elements: [0]}
transforms:
  - name: beamsql1
    module: beamsql
    inputs: [evsrc]
    parameters:
      sql: >
        SELECT user_id, category_a, n_rising FROM __mr_src
        MATCH_RECOGNIZE(
          PARTITION BY user_id
          ORDER BY ts
          MEASURES A.category AS category_a, COUNT(R.amount) AS n_rising
          PATTERN (A R+)
          DEFINE R AS amount > PREV(amount, 1)
        ) AS M
""")
        outs = run_pipeline(spark, cfg)
        rows = {r["user_id"]: r for r in outs["beamsql1"].collect()}
        # all 10 rows rise monotonically: A=row1, R=rows2-10
        assert rows["a"]["n_rising"] == 9 and rows["b"]["n_rising"] == 9
        assert rows["a"]["category_a"] == "A"

    def test_all_rows_per_match(self, mr_input):
        out = match_recognize(
            mr_input,
            partition_by=["user_id"],
            order_by=["ts"],
            measures=[("MATCH_NUMBER()", "mn")],
            pattern="A B",
            define={"A": "category = 'C'", "B": "category = 'D'"},
            all_rows=True,
        )
        rows = out.filter("user_id = 'a'").orderBy("ts").collect()
        assert [r["__classifier__"] for r in rows] == ["A", "B"]
        assert [r["category"] for r in rows] == ["C", "D"]
        assert all(r["mn"] == 1 for r in rows)

    def test_global_requires_opt_in(self, mr_input):
        with pytest.raises(ValueError, match="allowGlobal"):
            match_recognize(
                mr_input,
                partition_by=[],
                order_by=["ts"],
                measures=[("COUNT(*)", "n")],
                pattern="A",
                define={"A": "TRUE"},
            )


class TestQuantifierEdges:
    def test_reluctant_star(self):
        # A*? B: reluctant takes as few A rows as possible
        ms = _run(_rows(9, 2, 9), "A*? B", {"A": "v = 2", "B": "v = 9"})
        assert ms[0][1] == {0: "B"}

    def test_unbounded_min(self):
        ms = _run(_rows(2, 2, 2, 2, 9), "A{3,} B", {"A": "v = 2", "B": "v = 9"})
        assert sorted(ms[0][1]) == [0, 1, 2, 3, 4]
        assert _run(_rows(2, 2, 9), "A{3,} B", {"A": "v = 2", "B": "v = 9"}) == []

    def test_exact_repetition(self):
        ms = _run(_rows(2, 2, 2), "A{2}", {"A": "v = 2"})
        # skip past last row: rows 0-1 then row 2 alone can't complete {2}
        assert [sorted(m[1]) for m in ms] == [[0, 1]]

    def test_nested_group_quantifier(self):
        # (A B){2}: alternating pairs
        ms = _run(_rows(1, 2, 1, 2), "(A B){2}", {"A": "v = 1", "B": "v = 2"})
        assert sorted(ms[0][1].items()) == [(0, "A"), (1, "B"), (2, "A"), (3, "B")]

    def test_empty_match_never_emitted(self):
        # A* alone could match zero rows everywhere; engine must not loop
        ms = _run(_rows(9, 9), "A*", {"A": "v = 2"})
        assert ms == []


class TestScaleGuards:
    """Hot-key and pathological-pattern guards (VERDICT r2 item 2)."""

    def test_row_window_equals_list_path(self):
        import pandas as pd
        from pipeline_spark.operators.matchrec import _RowWindow

        vals = [1, 2, 3] * 50
        rows = _rows(*vals)
        pdf = pd.DataFrame(rows)
        win = _RowWindow(pdf, block=7, max_blocks=3)
        ast, variables = parse_pattern("A B")
        var_set = set(variables)
        defines = {k: compile_expr(v, var_set) for k, v in
                   {"A": "v = 1", "B": "v = 2"}.items()}
        got_list = _partition_matches(rows, ast, defines, {}, False)
        got_win = _partition_matches(win, ast, defines, {}, False)
        assert got_win == got_list
        assert len(got_win) == 50

    def test_row_window_random_access(self):
        import pandas as pd
        from pipeline_spark.operators.matchrec import _RowWindow

        pdf = pd.DataFrame({"v": range(100), "s": [None if i % 3 else "x" for i in range(100)]})
        win = _RowWindow(pdf, block=8, max_blocks=2)
        # forward, backward (PREV beyond a block), and repeated access agree
        assert win[99]["v"] == 99
        assert win[0]["v"] == 0
        assert win[50]["s"] is None
        assert win[51]["s"] is None or win[51]["s"] == "x"
        assert len(win) == 100
        with pytest.raises(IndexError):
            win[100]

    def test_step_budget_pathological(self):
        # (A+|B+)+ C with no C anywhere: exponential backtracking per anchor
        rows = _rows(*([2] * 24))
        ast, variables = parse_pattern("(A+|B+)+ C")
        var_set = set(variables)
        defines = {k: compile_expr(v, var_set) for k, v in
                   {"A": "v = 2", "B": "v = 2", "C": "v = 9"}.items()}
        with pytest.raises(RuntimeError, match="maxSteps"):
            _partition_matches(rows, ast, defines, {}, False, max_steps=10_000)

    def test_max_rows_per_key_guard(self, spark):
        df = spark.range(500).selectExpr(
            "'hot' AS user_id", "id AS amount", "CAST(id AS timestamp) AS ts"
        )
        out = match_recognize(
            df,
            partition_by=["user_id"],
            order_by=["ts"],
            measures=[("COUNT(A.amount)", "n")],
            pattern="A+",
            define={"A": "amount >= 0"},
            max_rows_per_key=100,
        )
        with pytest.raises(Exception, match="maxRowsPerKey"):
            out.collect()

    def test_hot_key_row_window_path(self, spark):
        # 40k rows on one key exceeds the 32768 eager-records threshold,
        # so this exercises the lazy _RowWindow path end-to-end; alternating
        # v=0/v=1 under "A B" (skip past last row) yields one match per pair
        big = spark.range(40_000).selectExpr(
            "'hot' AS user_id",
            "CAST(id % 2 AS long) AS v",
            "CAST(id AS timestamp) AS ts",
        )
        out = match_recognize(
            big,
            partition_by=["user_id"],
            order_by=["ts"],
            measures=[("COUNT(A.v)", "n_a")],
            pattern="A B",
            define={"A": "v = 0", "B": "v = 1"},
        )
        assert out.count() == 20_000


class TestGuardConfig:
    """Guard knobs: None disables, 0/negative rejected in the API but act
    as the disable sentinel on the YAML surface (ADVICE r3)."""

    def test_zero_max_steps_rejected(self, spark):
        df = spark.range(3).selectExpr("'k' AS k", "id AS v", "CAST(id AS timestamp) AS ts")
        with pytest.raises(ValueError, match="max_steps"):
            match_recognize(
                df, partition_by=["k"], order_by=["ts"],
                measures=[("COUNT(A.v)", "n")], pattern="A+",
                define={"A": "v >= 0"}, max_steps=0,
            )

    def test_zero_max_rows_per_key_rejected(self, spark):
        df = spark.range(3).selectExpr("'k' AS k", "id AS v", "CAST(id AS timestamp) AS ts")
        with pytest.raises(ValueError, match="max_rows_per_key"):
            match_recognize(
                df, partition_by=["k"], order_by=["ts"],
                measures=[("COUNT(A.v)", "n")], pattern="A+",
                define={"A": "v >= 0"}, max_rows_per_key=-1,
            )

    def test_none_disables_guards(self, spark):
        df = spark.range(6).selectExpr("'k' AS k", "CAST(id % 2 AS long) AS v",
                                       "CAST(id AS timestamp) AS ts")
        out = match_recognize(
            df, partition_by=["k"], order_by=["ts"],
            measures=[("COUNT(A.v)", "n_a")], pattern="A B",
            define={"A": "v = 0", "B": "v = 1"},
            max_steps=None, max_rows_per_key=None,
        )
        assert out.count() == 3

    def test_yaml_guard_sentinels(self):
        from pipeline_spark.operators.matchrec import _guard_limit

        assert _guard_limit({}, "maxRowsPerKey", 20) == 20
        assert _guard_limit({"maxRowsPerKey": None}, "maxRowsPerKey", 20) is None
        assert _guard_limit({"maxRowsPerKey": 0}, "maxRowsPerKey", 20) is None
        assert _guard_limit({"maxRowsPerKey": -1}, "maxRowsPerKey", 20) is None
        assert _guard_limit({"maxRowsPerKey": 7}, "maxRowsPerKey", 20) == 7

    def test_row_window_lru_refresh(self):
        import pandas as pd
        from pipeline_spark.operators.matchrec import _RowWindow

        pdf = pd.DataFrame({"v": range(40)})
        win = _RowWindow(pdf, block=10, max_blocks=2)
        win[0]; win[10]          # cache = {0, 1}
        win[0]                   # hit refreshes block 0's recency
        win[20]                  # evicts block 1 (LRU), not block 0
        assert set(win._cache) == {0, 2}
        assert win[5]["v"] == 5  # block 0 still cached (no reload needed)


class TestChunkedHotKey:
    """hotKeyMode=chunked: a hot key is processed in bounded chunks with a
    carry-over window; results must equal the single-task path exactly."""

    def _hot_df(self, spark, n=20_000):
        return spark.range(n).selectExpr(
            "'hot' AS user_id",
            "CAST(id % 2 AS long) AS v",
            "CAST(id AS timestamp) AS ts",
        )

    def test_chunked_equals_single_task(self, spark):
        df = self._hot_df(spark)
        kwargs = dict(
            partition_by=["user_id"], order_by=["ts"],
            measures=[("SUM(A.v) + SUM(B.v)", "s"), ("COUNT(B.v)", "nb")],
            pattern="A B", define={"A": "v = 0", "B": "v = 1"},
            after_match="skip to next row",
        )
        single = match_recognize(df, **kwargs).collect()
        chunked = match_recognize(
            df, **kwargs, hot_key_mode="chunked", hot_key_chunk_size=4096,
            max_rows_per_key=10_000,  # chunked path ignores the cap
        ).collect()
        assert len(chunked) == len(single) == 10_000
        assert sorted(map(tuple, chunked)) == sorted(map(tuple, single))

    def test_boundary_spanning_match(self, spark):
        # with chunk size 100, a "A B B" match anchored at seq 100 spans
        # rows 100-102 across the chunk edge; carry-over must cover it
        rows = [(i, 0 if i % 3 == 1 else 1) for i in range(1, 301)]
        df = spark.createDataFrame(
            [("k", v, float(i)) for i, v in rows], "k string, v long, o double"
        )
        kwargs = dict(
            partition_by=["k"], order_by=["o"],
            measures=[("FIRST(A.o)", "start_o"), ("LAST(B.o)", "end_o")],
            pattern="A B B", define={"A": "v = 0", "B": "v = 1"},
            after_match="skip to next row",
        )
        single = match_recognize(df, **kwargs).collect()
        chunked = match_recognize(
            df, **kwargs, hot_key_mode="chunked", hot_key_chunk_size=100
        ).collect()
        assert sorted(map(tuple, chunked)) == sorted(map(tuple, single))
        assert any(r["start_o"] == 100.0 for r in chunked)  # spans 100|101

    def test_all_rows_renumbered(self, spark):
        df = self._hot_df(spark, 400)
        kwargs = dict(
            partition_by=["user_id"], order_by=["ts"],
            measures=[], pattern="A B",
            define={"A": "v = 0", "B": "v = 1"},
            after_match="skip to next row", all_rows=True,
        )
        single = match_recognize(df, **kwargs).collect()
        chunked = match_recognize(
            df, **kwargs, hot_key_mode="chunked", hot_key_chunk_size=64
        ).collect()
        key = lambda r: (r["ts"], r["__match_number__"], r["__classifier__"])
        assert sorted(map(key, chunked)) == sorted(map(key, single))

    def test_chunked_validation_errors(self, spark):
        df = self._hot_df(spark, 10)
        base = dict(partition_by=["user_id"], order_by=["ts"],
                    measures=[("COUNT(A.v)", "n")], define={"A": "v >= 0"})
        with pytest.raises(ValueError, match="bounded pattern"):
            match_recognize(df, pattern="A+", after_match="skip to next row",
                            hot_key_mode="chunked", **base)
        with pytest.raises(ValueError, match="skip to next row"):
            match_recognize(df, pattern="A A", hot_key_mode="chunked", **base)
        with pytest.raises(ValueError, match="MATCH_NUMBER"):
            match_recognize(
                df, pattern="A A", after_match="skip to next row",
                hot_key_mode="chunked", partition_by=["user_id"],
                order_by=["ts"], define={"A": "v >= 0"},
                measures=[("MATCH_NUMBER()", "mn")],
            )


def test_chunked_deterministic_under_order_ties(spark):
    """Both union branches re-evaluate the sequence window; with orderBy
    ties the carry-over rows must still agree with the core rows — the
    whole-row hash tiebreak pins the order.  All rows share ONE orderBy
    value so every boundary is a tie; chunked must equal single-task."""
    rows = [("k", 1.0, float(i % 2), float(i)) for i in range(400)]
    df = spark.createDataFrame(rows, "k string, o double, v double, uid double")
    kwargs = dict(
        partition_by=["k"], order_by=["o"],  # constant → every row ties
        measures=[("FIRST(A.uid)", "a_uid"), ("LAST(B.uid)", "b_uid")],
        pattern="A B", define={"A": "v = 0", "B": "v = 1"},
        after_match="skip to next row",
    )
    chunked = match_recognize(
        df, **kwargs, hot_key_mode="chunked", hot_key_chunk_size=32
    ).collect()
    # determinism across runs (branch agreement): same result twice
    again = match_recognize(
        df, **kwargs, hot_key_mode="chunked", hot_key_chunk_size=32
    ).collect()
    assert sorted(map(tuple, chunked)) == sorted(map(tuple, again))
    # no duplicated or dropped boundary matches: each uid pairs at most once
    a_uids = [r["a_uid"] for r in chunked]
    assert len(a_uids) == len(set(a_uids))
