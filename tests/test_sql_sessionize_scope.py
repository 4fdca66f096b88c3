"""sessionize … OVER rewrite scope (sql_surface._rewrite_sessionize):
aliased sources, inline subqueries, WHERE pushdown semantics, and the
explicit JOIN/GROUP BY rejection."""

import pytest
from pyspark.sql import functions as F

from duckdb_behavioral_spark.sql_surface import behavioral_sql

S = "sessionize(ts, INTERVAL '30 minutes') OVER (PARTITION BY user_id ORDER BY ts)"
SE = (
    "sessionize(e.ts, INTERVAL '30 minutes') "
    "OVER (PARTITION BY e.user_id ORDER BY e.ts)"
)


@pytest.fixture()
def ev(spark):
    df = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00"),
            (1, "2024-01-01 00:10:00"),
            (1, "2024-01-01 00:20:00"),
            (1, "2024-01-01 02:00:00"),
            (2, "2024-01-01 00:00:00"),
        ],
        "user_id long, ts_s string",
    ).selectExpr("user_id", "CAST(ts_s AS TIMESTAMP) AS ts")
    df.createOrReplaceTempView("sess_scope_ev")
    return df


@pytest.mark.parametrize(
    "sql",
    [
        f"SELECT user_id, ts, {S} AS sid FROM sess_scope_ev",
        f"SELECT e.user_id, e.ts, {SE} AS sid FROM sess_scope_ev e",
        f"SELECT e.user_id, e.ts, {SE} AS sid FROM sess_scope_ev AS e",
        f"SELECT user_id, ts, {S} AS sid FROM (SELECT * FROM sess_scope_ev) t",
        "SELECT t.user_id, t.ts, sessionize(t.ts, INTERVAL '30 minutes') "
        "OVER (PARTITION BY t.user_id ORDER BY t.ts) AS sid "
        "FROM (SELECT * FROM sess_scope_ev) t",
        f"WITH f AS (SELECT * FROM sess_scope_ev) "
        f"SELECT user_id, ts, {S} AS sid FROM f",
    ],
    ids=["identifier", "alias", "alias_as", "subquery", "subquery_qualified", "cte"],
)
def test_source_shapes_match_operator(spark, ev, sql):
    import duckdb_behavioral_spark as B

    got = {
        (r["user_id"], r["ts"], r["sid"])
        for r in behavioral_sql(spark, sql).collect()
    }
    want = {
        (r["user_id"], r["ts"], r["session_id"])
        for r in B.sessionize(ev, "ts", "30 minutes", ["user_id"]).collect()
    }
    assert got == want


def test_where_filters_before_window(spark, ev):
    # dropping the 00:10 event must RE-derive gaps on the filtered
    # stream (00:00 -> 00:20 is 20m: same session) — i.e. the WHERE
    # moves inside the lag derived table
    import duckdb_behavioral_spark as B

    sql = (
        f"SELECT user_id, ts, {S} AS sid FROM sess_scope_ev "
        "WHERE ts <> TIMESTAMP '2024-01-01 00:10:00'"
    )
    got = {
        (r["user_id"], r["ts"], r["sid"])
        for r in behavioral_sql(spark, sql).collect()
    }
    filtered = ev.where(F.col("ts") != F.lit("2024-01-01 00:10:00").cast("timestamp"))
    want = {
        (r["user_id"], r["ts"], r["session_id"])
        for r in B.sessionize(filtered, "ts", "30 minutes", ["user_id"]).collect()
    }
    assert got == want
    sids = sorted(sid for u, _, sid in got if u == 1)
    assert sids == [1, 1, 2]


def test_where_with_nested_subquery_passes(spark, ev):
    # the JOIN detector must not fire on a JOIN inside a nested
    # subquery of the WHERE condition
    sql = (
        f"SELECT user_id, ts, {S} AS sid FROM sess_scope_ev WHERE user_id IN "
        "(SELECT a.user_id FROM sess_scope_ev a JOIN sess_scope_ev b "
        "ON a.user_id = b.user_id)"
    )
    assert len(behavioral_sql(spark, sql).collect()) == 5


def test_group_by_rejected_with_cte_hint(spark, ev):
    sql = f"SELECT user_id, {S} AS sid FROM sess_scope_ev GROUP BY user_id, ts"
    with pytest.raises(ValueError, match="CTE"):
        behavioral_sql(spark, sql)


@pytest.fixture()
def dims(spark):
    spark.createDataFrame(
        [(1, "gold"), (2, "basic")], "user_id long, tier string"
    ).createOrReplaceTempView("sess_scope_dim")


def test_unqualified_join_matches_cte_workaround(spark, ev, dims):
    # round 5: sessionize … OVER beside a USING join rewrites by
    # wrapping the WHOLE FROM…JOIN…WHERE segment in the lag derived
    # table — the window sees the joined+filtered rows, exactly what
    # the documented CTE workaround produces
    join_form = (
        f"SELECT user_id, ts, tier, {S} AS sid "
        "FROM sess_scope_ev JOIN sess_scope_dim USING (user_id) "
        "WHERE tier = 'gold'"
    )
    cte_form = (
        "WITH j AS (SELECT user_id, ts, tier "
        "FROM sess_scope_ev JOIN sess_scope_dim USING (user_id) "
        "WHERE tier = 'gold') "
        f"SELECT user_id, ts, tier, {S} AS sid FROM j"
    )
    got = {tuple(r) for r in behavioral_sql(spark, join_form).collect()}
    want = {tuple(r) for r in behavioral_sql(spark, cte_form).collect()}
    assert got == want and len(got) == 4


def test_qualified_join_matches_cte_workaround(spark, ev, dims):
    # round 9: qualified outer references HOIST through the derived
    # table (a.b projected as `a.b AS __q_a_b` inside, renamed outside)
    # — the ON-join form must equal the documented CTE workaround
    join_form = (
        f"SELECT e.user_id, e.ts, d.tier, {SE} AS sid "
        "FROM sess_scope_ev e JOIN sess_scope_dim d ON e.user_id = d.user_id "
        "WHERE d.tier = 'gold'"
    )
    cte_form = (
        "WITH j AS (SELECT e.user_id, e.ts, d.tier "
        "FROM sess_scope_ev e JOIN sess_scope_dim d ON e.user_id = d.user_id "
        "WHERE d.tier = 'gold') "
        f"SELECT user_id, ts, tier, {S} AS sid FROM j"
    )
    got = {tuple(r) for r in behavioral_sql(spark, join_form).collect()}
    want = {tuple(r) for r in behavioral_sql(spark, cte_form).collect()}
    assert got == want and len(got) == 4


def test_qualified_self_join_ambiguous_names_hoist(spark, ev):
    # self-join: BOTH sides expose user_id/ts, so unqualified outer
    # refs would be ambiguous — the hoist keeps them qualified inside
    sql = (
        f"SELECT e.user_id, e.ts, {SE} AS sid FROM sess_scope_ev e "
        "JOIN sess_scope_ev x ON e.user_id = x.user_id AND e.ts = x.ts"
    )
    import duckdb_behavioral_spark as B

    got = {tuple(r) for r in behavioral_sql(spark, sql).collect()}
    want = {
        (r["user_id"], r["ts"], r["session_id"])
        for r in B.sessionize(ev, "ts", "30 minutes", ["user_id"]).collect()
    }
    assert got == want


def test_qualified_select_item_after_call_hoists(spark, ev, dims):
    # round 6 kept this as a pointed error; round 9: the qualified item
    # AFTER the call hoists like any other outer reference
    sql = (
        f"SELECT {S} AS sid, d.tier "
        "FROM sess_scope_ev a JOIN sess_scope_dim d USING (user_id)"
    )
    rows = behavioral_sql(spark, sql).collect()
    assert len(rows) == 5
    assert {r["tier"] for r in rows} == {"gold", "basic"}


def test_qualified_join_order_by_hoists(spark, ev, dims):
    sql = (
        f"SELECT e.user_id, e.ts, {SE} AS sid "
        "FROM sess_scope_ev e JOIN sess_scope_dim d ON e.user_id = d.user_id "
        "ORDER BY e.user_id, e.ts"
    )
    rows = behavioral_sql(spark, sql).collect()
    assert len(rows) == 5
    assert rows == sorted(rows, key=lambda r: (r["user_id"], r["ts"]))


def test_qualified_function_call_passes_through(spark, ev, dims):
    # round 10: a qualified FUNCTION reference resolves from the
    # catalog, not the FROM scope — it passes through the rewrite
    # untouched while its qualified ARGUMENT chains hoist normally
    spark.sql(
        "CREATE OR REPLACE FUNCTION sess_scope_plus1(x BIGINT) "
        "RETURNS BIGINT RETURN x + 1"
    )
    try:
        sql = (
            f"SELECT default.sess_scope_plus1(e.user_id) AS uplus, {SE} AS sid "
            "FROM sess_scope_ev e JOIN sess_scope_dim d ON e.user_id = d.user_id"
        )
        rows = behavioral_sql(spark, sql).collect()
        assert len(rows) == 5
        assert {r["uplus"] for r in rows} == {2, 3}
    finally:
        spark.sql("DROP FUNCTION IF EXISTS sess_scope_plus1")


def test_tbl_star_hoists_as_struct(spark, ev, dims):
    # round 10: `e.*` hoists as struct(e.*) inside the derived table
    # and expands back via __q_e__star.* — equal to the CTE workaround,
    # with e's column names preserved
    star_form = (
        f"SELECT e.*, d.tier, {SE} AS sid "
        "FROM sess_scope_ev e JOIN sess_scope_dim d ON e.user_id = d.user_id "
        "WHERE d.tier = 'gold'"
    )
    cte_form = (
        "WITH j AS (SELECT e.user_id, e.ts, d.tier "
        "FROM sess_scope_ev e JOIN sess_scope_dim d ON e.user_id = d.user_id "
        "WHERE d.tier = 'gold') "
        f"SELECT user_id, ts, tier, {S} AS sid FROM j"
    )
    got_df = behavioral_sql(spark, star_form)
    assert got_df.columns == ["user_id", "ts", "tier", "sid"]
    got = {tuple(r) for r in got_df.collect()}
    want = {tuple(r) for r in behavioral_sql(spark, cte_form).collect()}
    assert got == want and len(got) == 4


def test_multi_level_star_still_directed_to_cte(spark, ev, dims):
    spark.createDataFrame(
        [(u, (f"c{u % 2}",)) for u in range(3)],
        "user_id long, props struct<country:string>",
    ).createOrReplaceTempView("sess_scope_props2")
    sql = (
        "SELECT e.user_id, p.props.*, "
        "sessionize(e.ts, INTERVAL '30 minutes') "
        "OVER (PARTITION BY e.user_id ORDER BY e.ts) AS sid "
        "FROM sess_scope_ev e JOIN sess_scope_props2 p "
        "ON e.user_id = p.user_id"
    )
    with pytest.raises(ValueError, match="CTE"):
        behavioral_sql(spark, sql)


def test_uncorrelated_outer_subquery_passes_through(spark, ev, dims):
    # round 11: an UNCORRELATED scalar subquery among the select items
    # passes through verbatim (it resolves from its own FROM scope) —
    # equal to the CTE workaround
    sql = (
        f"SELECT (SELECT max(tier) FROM sess_scope_dim) AS mt, {SE} AS sid "
        "FROM sess_scope_ev e JOIN sess_scope_dim d ON e.user_id = d.user_id"
    )
    cte = (
        "WITH j AS (SELECT e.user_id AS uid, e.ts AS ets "
        "FROM sess_scope_ev e JOIN sess_scope_dim d ON e.user_id = d.user_id) "
        "SELECT (SELECT max(tier) FROM sess_scope_dim) AS mt, "
        "sessionize(ets, INTERVAL '30 minutes') "
        "OVER (PARTITION BY uid ORDER BY ets) AS sid FROM j"
    )
    got = sorted(map(tuple, behavioral_sql(spark, sql).collect()))
    want = sorted(map(tuple, behavioral_sql(spark, cte).collect()))
    assert got == want and len(got) == 5


def test_uncorrelated_subquery_with_inner_alias_chain(spark, ev, dims):
    # inner-alias qualified chains (x.tier, where x is bound inside the
    # subquery) must NOT be hoisted — they reference the subquery scope
    sql = (
        f"SELECT (SELECT max(x.tier) FROM sess_scope_dim x) AS mt, {SE} AS sid "
        "FROM sess_scope_ev e JOIN sess_scope_dim d ON e.user_id = d.user_id"
    )
    rows = behavioral_sql(spark, sql).collect()
    assert len(rows) == 5 and {r["mt"] for r in rows} == {"gold"}


def test_bare_name_correlated_subquery_flows_through_star(spark, ev, dims):
    # bare-name correlation survives: user_id flows through the derived
    # table's SELECT * and still resolves in the subquery (the lookup
    # table deliberately has no user_id column, so the bare name binds
    # to the OUTER scope in both the original and rewritten forms)
    spark.createDataFrame(
        [(1, "g1"), (2, "b2")], "uid long, lt string"
    ).createOrReplaceTempView("sess_scope_lk")
    sql = (
        "SELECT user_id, (SELECT max(x.lt) FROM sess_scope_lk x "
        f"WHERE x.uid = user_id) AS mt, {S} AS sid "
        "FROM sess_scope_ev JOIN sess_scope_dim USING (user_id)"
    )
    rows = behavioral_sql(spark, sql).collect()
    assert len(rows) == 5
    assert {(r["user_id"], r["mt"]) for r in rows} == {(1, "g1"), (2, "b2")}


def test_outer_alias_correlated_subquery_runs_verbatim(spark, ev, dims):
    # round 12: e.user_id inside the subquery is an outer-table-alias
    # correlation. behavioral_sql runs schema-aware: the catalog
    # proves sess_scope_dim has no column 'e' (no inner shadow), so
    # the chain hoists into the derived table like any outer chain
    # and the reference-style correlated report runs verbatim,
    # matching the documented CTE workaround exactly
    sql = (
        "SELECT (SELECT max(x.tier) FROM sess_scope_dim x "
        f"WHERE x.user_id = e.user_id) AS mt, {SE} AS sid "
        "FROM sess_scope_ev e JOIN sess_scope_dim d ON e.user_id = d.user_id"
    )
    cte_form = (
        "WITH s AS (SELECT e.user_id AS uid, e.ts, "
        "sessionize(e.ts, INTERVAL '30 minutes') OVER "
        "(PARTITION BY e.user_id ORDER BY e.ts) AS sid "
        "FROM sess_scope_ev e JOIN sess_scope_dim d "
        "ON e.user_id = d.user_id) "
        "SELECT (SELECT max(x.tier) FROM sess_scope_dim x "
        "WHERE x.user_id = s.uid) AS mt, sid FROM s"
    )
    got = sorted(map(tuple, behavioral_sql(spark, sql).collect()))
    want = sorted(map(tuple, behavioral_sql(spark, cte_form).collect()))
    assert got == want and len(got) == 5


def test_correlated_subquery_without_resolver_keeps_pointed_error(ev, dims):
    # the pure-string rewrite API has no catalog — the lexical check
    # cannot prove the chain safe, so the pointed CTE error stays
    from duckdb_behavioral_spark.sql_surface import rewrite_behavioral_sql

    sql = (
        "SELECT (SELECT max(x.tier) FROM sess_scope_dim x "
        f"WHERE x.user_id = e.user_id) AS mt, {SE} AS sid "
        "FROM sess_scope_ev e JOIN sess_scope_dim d ON e.user_id = d.user_id"
    )
    with pytest.raises(ValueError, match="CTE"):
        rewrite_behavioral_sql(sql)


def test_correlated_subquery_shadowed_qualifier_keeps_pointed_error(spark, ev, dims):
    # the subquery's own table carries a column named like the outer
    # alias — SQL would resolve the qualifier inner-first, so the
    # hoist cannot prove the outer reading; pointed error
    spark.createDataFrame(
        [(1, 7)], "user_id long, e long"
    ).createOrReplaceTempView("sess_scope_shadow")
    sql = (
        "SELECT (SELECT max(x.e) FROM sess_scope_shadow x "
        f"WHERE x.user_id = e.user_id) AS mt, {SE} AS sid "
        "FROM sess_scope_ev e JOIN sess_scope_dim d ON e.user_id = d.user_id"
    )
    with pytest.raises(ValueError, match="CTE"):
        behavioral_sql(spark, sql)


def test_correlated_subquery_over_derived_source_keeps_pointed_error(spark, ev, dims):
    # a derived table inside the subquery hides its column namespace —
    # shadowing is unprovable, so the chain keeps the pointed error
    sql = (
        "SELECT (SELECT max(x.tier) FROM "
        "(SELECT * FROM sess_scope_dim) x "
        f"WHERE x.user_id = e.user_id) AS mt, {SE} AS sid "
        "FROM sess_scope_ev e JOIN sess_scope_dim d ON e.user_id = d.user_id"
    )
    with pytest.raises(ValueError, match="CTE"):
        behavioral_sql(spark, sql)


def test_correlated_subquery_unknown_qualifier_keeps_pointed_error(spark, ev, dims):
    # a qualifier bound NEITHER in the subquery NOR in the wrapped
    # segment cannot be anything but a mistake — pointed error
    sql = (
        "SELECT (SELECT max(x.tier) FROM sess_scope_dim x "
        f"WHERE x.user_id = zz.user_id) AS mt, {SE} AS sid "
        "FROM sess_scope_ev e JOIN sess_scope_dim d ON e.user_id = d.user_id"
    )
    with pytest.raises(ValueError, match="CTE"):
        behavioral_sql(spark, sql)


def test_correlated_subquery_two_outer_chains_hoist(spark, ev, dims):
    # a subquery correlating with BOTH join sides: each chain hoists
    # independently; the subquery's inner chains (x.*) stay untouched.
    # (Spark supports correlated scalar subqueries only in
    # filters/aggregations/projections, so projection position is the
    # whole addressable surface — an ORDER BY correlation fails in
    # Spark's analyzer for the CTE form too.)
    sql = (
        "SELECT e.user_id, "
        "(SELECT max(x.tier) FROM sess_scope_dim x "
        "WHERE x.user_id = e.user_id AND x.tier = d.tier) AS mt, "
        f"{SE} AS sid "
        "FROM sess_scope_ev e JOIN sess_scope_dim d ON e.user_id = d.user_id"
    )
    cte_form = (
        "WITH s AS (SELECT e.user_id AS uid, d.tier AS dt, e.ts, "
        "sessionize(e.ts, INTERVAL '30 minutes') OVER "
        "(PARTITION BY e.user_id ORDER BY e.ts) AS sid "
        "FROM sess_scope_ev e JOIN sess_scope_dim d "
        "ON e.user_id = d.user_id) "
        "SELECT uid AS user_id, "
        "(SELECT max(x.tier) FROM sess_scope_dim x "
        "WHERE x.user_id = s.uid AND x.tier = s.dt) AS mt, sid FROM s"
    )
    got = sorted(map(tuple, behavioral_sql(spark, sql).collect()))
    want = sorted(map(tuple, behavioral_sql(spark, cte_form).collect()))
    assert got == want and len(got) == 5


def test_subquery_in_order_by_passes_through(spark, ev, dims):
    sql = (
        f"SELECT e.user_id, {SE} AS sid "
        "FROM sess_scope_ev e JOIN sess_scope_dim d ON e.user_id = d.user_id "
        "ORDER BY (SELECT count(*) FROM sess_scope_dim) * e.user_id, e.ts"
    )
    rows = behavioral_sql(spark, sql).collect()
    assert [r["user_id"] for r in rows] == [1, 1, 1, 1, 2]


def test_struct_field_chain_hoists(spark, ev, dims):
    # `p.props.country` is lexically identical to an alias.column chain;
    # the hoist must carry the struct path through the derived table
    spark.createDataFrame(
        [(u, (f"c{u % 2}",)) for u in range(3)],
        "user_id long, props struct<country:string>",
    ).createOrReplaceTempView("sess_scope_props")
    sql = (
        "SELECT e.user_id, p.props.country, "
        "sessionize(e.ts, INTERVAL '30 minutes') "
        "OVER (PARTITION BY e.user_id ORDER BY e.ts) AS sid "
        "FROM sess_scope_ev e JOIN sess_scope_props p "
        "ON e.user_id = p.user_id"
    )
    rows = behavioral_sql(spark, sql).collect()
    assert len(rows) == 5
    assert set(behavioral_sql(spark, sql).columns) == {"user_id", "country", "sid"}
    assert {r["country"] for r in rows} == {"c0", "c1"}


def test_qualified_join_inside_cte_body(spark, ev, dims):
    # round-9 review: the hoist must find the enclosing SELECT at the
    # call's own paren depth — a sessionize+JOIN inside a CTE body
    # (unbalanced-paren prefix) regressed to a spurious
    # 'does not support subqueries' error
    sql = (
        "WITH j AS ("
        f"SELECT user_id, ts, tier, {S} AS sid "
        "FROM sess_scope_ev JOIN sess_scope_dim USING (user_id)"
        ") SELECT * FROM j WHERE tier = 'gold'"
    )
    rows = behavioral_sql(spark, sql).collect()
    assert len(rows) == 4
    sql_q = (
        "WITH j AS ("
        f"SELECT e.user_id, e.ts, d.tier, {SE} AS sid "
        "FROM sess_scope_ev e JOIN sess_scope_dim d ON e.user_id = d.user_id"
        ") SELECT * FROM j WHERE tier = 'gold'"
    )
    assert {tuple(r) for r in behavioral_sql(spark, sql_q).collect()} == {
        tuple(r) for r in rows
    }


def test_qualified_join_inside_from_subquery(spark, ev, dims):
    sql = (
        "SELECT * FROM ("
        f"SELECT user_id, ts, {S} AS sid "
        "FROM sess_scope_ev JOIN sess_scope_dim USING (user_id)"
        ") z"
    )
    assert len(behavioral_sql(spark, sql).collect()) == 5


def test_colliding_hoist_names_directed_to_cte(spark, ev, dims):
    # e.b_c and e.b.c both mangle to __q_e_b_c — must raise the pointed
    # error, not an ambiguous-reference analysis failure
    spark.createDataFrame(
        [(u, "x", ("y",)) for u in range(3)],
        "user_id long, b_c string, b struct<c:string>",
    ).createOrReplaceTempView("sess_scope_bc")
    sql = (
        "SELECT p.b_c, p.b.c, "
        "sessionize(e.ts, INTERVAL '30 minutes') "
        "OVER (PARTITION BY e.user_id ORDER BY e.ts) AS sid "
        "FROM sess_scope_ev e JOIN sess_scope_bc p ON e.user_id = p.user_id"
    )
    with pytest.raises(ValueError, match="same name|CTE"):
        behavioral_sql(spark, sql)
