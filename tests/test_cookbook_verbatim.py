"""Every SQL recipe in the reference's cookbook
(/root/reference/docs/src/cookbook.md) must run VERBATIM through
``behavioral_sql`` — the cookbook is the documentation reference
users copy-paste from, so it is part of the migration contract the
same way examples/0*.sql are (tests/test_examples_verbatim.py).

The recipes ship no data: they assume a user's ``events`` /
``activity`` / ``user_activity`` tables. This module synthesizes a
small deterministic corpus covering every column the recipes touch
(event_time, page_url, referrer, device_type, page, test_group,
cohort/signup weeks...) and designed so each recipe's analytical
SELECT returns rows; a handful of recipes are additionally
spot-checked against hand-computed facts.

The one permitted edit: the "Querying Parquet Files Directly" recipe
reads ``s3://my-bucket/events/*.parquet`` — the s3 path (and only the
path string) is substituted with a local parquet copy of the same
events fixture before running.
"""

from __future__ import annotations

import datetime as dt
import os
import re

import pytest

from duckdb_behavioral_spark.sql_surface import behavioral_sql

_COOKBOOK = "/root/reference/docs/src/cookbook.md"

_TS0 = dt.datetime(2024, 3, 1)


def _t(day: int, hh: int, mm: int, ss: int = 0) -> dt.datetime:
    return _TS0 + dt.timedelta(days=day - 1, hours=hh, minutes=mm, seconds=ss)


# (user_id, event_time, event_type, page, page_url, referrer,
#  device_type, test_group)
_EVENTS = [
    # u1: full purchase journey in one tight session + a day-2 session
    (1, _t(1, 9, 55), "search", "Home", "/home", "google", "mobile", "A"),
    (1, _t(1, 10, 0), "page_view", "Home", "/home", "google", "mobile", "A"),
    (1, _t(1, 10, 5), "add_to_cart", "Product", "/product", "google", "mobile", "A"),
    (1, _t(1, 10, 10), "checkout", "Checkout", "/checkout", "google", "mobile", "A"),
    (1, _t(1, 10, 15), "purchase", "Confirm", "/confirm", "google", "mobile", "A"),
    (1, _t(2, 11, 0), "page_view", "Home", "/home", "direct", "mobile", "A"),
    (1, _t(2, 11, 10), "add_to_cart", "Product", "/product", "direct", "mobile", "A"),
    # u2: browse only; 70-minute gap splits two sessions, second bounces
    (2, _t(1, 10, 0), "page_view", "Home", "/home", "direct", "desktop", "B"),
    (2, _t(1, 10, 20), "page_view", "Product", "/product", "direct", "desktop", "B"),
    (2, _t(1, 11, 30), "add_to_cart", "Product", "/product", "direct", "desktop", "B"),
    # u3: fast onboarding + milestone purchases + review
    (3, _t(1, 10, 0), "signup", "Signup", "/signup", "ad", "mobile", "A"),
    (3, _t(1, 10, 5), "onboarding_complete", "Onboard", "/onboard", "ad", "mobile", "A"),
    (3, _t(1, 10, 6), "profile_setup", "Profile", "/profile", "ad", "mobile", "A"),
    (3, _t(1, 10, 7), "first_action", "App", "/app", "ad", "mobile", "A"),
    (3, _t(1, 11, 0), "first_purchase", "Confirm", "/confirm", "ad", "mobile", "A"),
    (3, _t(1, 12, 0), "second_purchase", "Confirm", "/confirm", "ad", "mobile", "A"),
    (3, _t(1, 13, 0), "review", "Review", "/review", "ad", "mobile", "A"),
    # u4: slow onboarding, funnel stalls at signup
    (4, _t(1, 10, 0), "signup", "Signup", "/signup", "ad", "desktop", "B"),
    (4, _t(1, 10, 40), "onboarding_complete", "Onboard", "/onboard", "ad", "desktop", "B"),
    (4, _t(2, 10, 0), "profile_setup", "Profile", "/profile", "ad", "desktop", "B"),
    (4, _t(2, 10, 1), "first_action", "App", "/app", "ad", "desktop", "B"),
    # u5: repeated search->browse->cart cycles, duplicate-ts pair, purchase
    (5, _t(1, 9, 0), "search", "Home", "/home", "google", "tablet", "A"),
    (5, _t(1, 9, 1), "page_view", "Home", "/home", "google", "tablet", "A"),
    (5, _t(1, 9, 2), "add_to_cart", "Product", "/product", "google", "tablet", "A"),
    (5, _t(1, 9, 10), "search", "Home", "/home", "google", "tablet", "A"),
    (5, _t(1, 9, 11), "page_view", "Home", "/home", "google", "tablet", "A"),
    (5, _t(1, 9, 12), "add_to_cart", "Product", "/product", "google", "tablet", "A"),
    (5, _t(1, 9, 20), "page_view", "Product", "/product", "google", "tablet", "A"),
    (5, _t(1, 9, 20), "add_to_cart", "Product", "/product", "google", "tablet", "A"),
    (5, _t(1, 9, 30), "purchase", "Confirm", "/confirm", "google", "tablet", "A"),
]

_D = dt.date
# (user_id, cohort_week, activity_date)
_ACTIVITY = [
    (1, _D(2024, 1, 1), _D(2024, 1, 2)),
    (1, _D(2024, 1, 1), _D(2024, 1, 9)),
    (1, _D(2024, 1, 1), _D(2024, 1, 20)),
    (2, _D(2024, 1, 1), _D(2024, 1, 3)),
    (3, _D(2024, 1, 8), _D(2024, 1, 10)),
    (3, _D(2024, 1, 8), _D(2024, 1, 18)),
]

# (user_id, signup_date, activity_date, plan_type, activity_week, signup_week)
_USER_ACTIVITY = [
    (1, _D(2024, 1, 1), _D(2024, 1, 1), "pro", _D(2024, 1, 1), _D(2024, 1, 1)),
    (1, _D(2024, 1, 1), _D(2024, 1, 2), "pro", _D(2024, 1, 1), _D(2024, 1, 1)),
    (1, _D(2024, 1, 1), _D(2024, 1, 8), "pro", _D(2024, 1, 8), _D(2024, 1, 1)),
    (1, _D(2024, 1, 1), _D(2024, 1, 16), "pro", _D(2024, 1, 15), _D(2024, 1, 1)),
    (1, _D(2024, 1, 1), _D(2024, 1, 31), "pro", _D(2024, 1, 29), _D(2024, 1, 1)),
    (2, _D(2024, 1, 2), _D(2024, 1, 2), "free", _D(2024, 1, 1), _D(2024, 1, 1)),
    (2, _D(2024, 1, 2), _D(2024, 1, 9), "free", _D(2024, 1, 8), _D(2024, 1, 1)),
]


@pytest.fixture(scope="module")
def cookbook_tables(spark, tmp_path_factory):
    ev = spark.createDataFrame(
        _EVENTS,
        "user_id long, event_time timestamp, event_type string, page string,"
        " page_url string, referrer string, device_type string, test_group string",
    )
    ev.createOrReplaceTempView("events")
    spark.createDataFrame(
        _ACTIVITY, "user_id long, cohort_week date, activity_date date"
    ).createOrReplaceTempView("activity")
    spark.createDataFrame(
        _USER_ACTIVITY,
        "user_id long, signup_date date, activity_date date, plan_type string,"
        " activity_week date, signup_week date",
    ).createOrReplaceTempView("user_activity")
    pq = str(tmp_path_factory.mktemp("cookbook") / "events_parquet")
    ev.write.mode("overwrite").parquet(pq)
    yield {"parquet_dir": pq}
    for t in ("events", "activity", "user_activity"):
        spark.catalog.dropTempView(t)


def _recipes():
    if not os.path.exists(_COOKBOOK):
        return []
    text = open(_COOKBOOK).read()
    out = []
    # title = nearest preceding ### / ## heading, for readable test ids
    blocks = re.finditer(r"```sql\n(.*?)```", text, re.DOTALL)
    for m in blocks:
        head = text[: m.start()]
        title = re.findall(r"^#{2,3} (.+)$", head, re.MULTILINE)[-1]
        slug = re.sub(r"[^a-z0-9]+", "_", title.lower()).strip("_")
        out.append((slug, m.group(1).strip()))
    return out


_RECIPES = _recipes()


@pytest.mark.parametrize("slug,sql", _RECIPES, ids=[s for s, _ in _RECIPES])
def test_cookbook_recipe_runs_verbatim(spark, cookbook_tables, slug, sql):
    if "s3://" in sql:  # "Querying Parquet Files Directly": localize the path
        sql = sql.replace(
            "s3://my-bucket/events/*.parquet",
            cookbook_tables["parquet_dir"] + "/*.parquet",
        )
    rows = behavioral_sql(spark, sql.rstrip(";\n ")).collect()
    assert rows, f"cookbook recipe {slug!r} returned no rows"


def test_recipe_count_tracks_cookbook():
    # every fenced ```sql block is exercised; the trailing pattern-
    # reference block is unfenced-language and deliberately excluded
    assert len(_RECIPES) == 27


def _run(spark, slug):
    sql = dict(_RECIPES)[slug]
    return behavioral_sql(spark, sql.rstrip(";\n ")).collect()


def test_basic_funnel_facts(spark, cookbook_tables):
    """u1 reaches step 3 (view 10:00 -> cart 10:05 -> purchase 10:15,
    all within 1h); u2 stalls at step 1 (cart arrives 70min after the
    latest view); u4 never fires condition 1."""
    steps = {r["user_id"]: r["furthest_step"] for r in _run(spark, "basic_conversion_funnel")}
    assert steps[1] == 3 and steps[2] == 1 and steps[4] == 0


def test_session_metrics_facts(spark, cookbook_tables):
    """u2 has two sessions (70-minute gap > 30-minute timeout); the
    second is a single-event bounce."""
    rows = [r for r in _run(spark, "session_metrics_duration_page_count_bounce_rate") if r["user_id"] == 2]
    assert len(rows) == 2
    by_start = sorted(rows, key=lambda r: r["started_at"])
    assert by_start[0]["page_views"] == 2 and not by_start[0]["is_bounce"]
    assert by_start[1]["page_views"] == 1 and by_start[1]["is_bounce"]


def test_weekly_cohort_facts(spark, cookbook_tables):
    """2024-01-01 cohort: 2 users; u1 alone returns in weeks 1 and 2."""
    row = {r["cohort_week"]: r for r in _run(spark, "weekly_cohort_retention")}[_D(2024, 1, 1)]
    assert row["cohort_size"] == 2 and row["week_0"] == 2
    assert row["week_1"] == 1 and row["week_2"] == 1 and row["week_3"] == 0


def test_forward_flow_facts(spark, cookbook_tables):
    """After the Home->Home->Product chain: u1 and u2 continue to
    Checkout and Product respectively; u5 follows Home->Home->Product
    too (9:00 search is on page Home)."""
    rows = {r["next_page"]: r["users"] for r in _run(spark, "forward_flow_what_happens_next")}
    assert rows.get("Checkout") == 1  # u1


def test_entry_page_facts(spark, cookbook_tables):
    """DISTINCT ON picks each session's FIRST pageview: u1 d1 session
    entered on /home (09:55 search row), u2's second session on
    /product."""
    rows = {r["entry_page"]: r["sessions"] for r in _run(spark, "entry_page_analysis")}
    assert rows["/home"] >= 3 and rows["/product"] >= 1


def test_power_users_facts(spark, cookbook_tables):
    """u5 repeats the browse->cart cycle 3 times (non-overlapping)."""
    rows = {r["user_id"]: r for r in _run(spark, "power_users_detection")}
    assert rows[5]["browse_cart_cycles"] == 3
    assert rows[5]["search_browse_cycles"] == 2
