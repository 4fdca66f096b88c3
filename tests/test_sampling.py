"""Hash-based sampling: deterministic under re-partitioning."""

from duckdb_behavioral_spark.functions.sampling import (
    sample_hash_rate,
    sample_per_stratum_topk,
    sample_stratified,
)


def _docs(spark, n=500):
    rows = [(i, ["en", "de", "fr"][i % 3], i % 7) for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, lang string, n_chars long")


def test_rate_sample_stable_across_partitioning(spark):
    d = _docs(spark)
    a = {r["doc_id"] for r in sample_hash_rate(d.coalesce(1), 300, "doc_id").collect()}
    b = {r["doc_id"] for r in sample_hash_rate(d.repartition(16), 300, "doc_id").collect()}
    assert a == b
    assert 0 < len(a) < 500


def test_rate_sample_roughly_proportional(spark):
    d = _docs(spark, 2000)
    n = sample_hash_rate(d, 250, "doc_id").count()
    assert 400 < n < 600  # ~500 expected; md5 is uniform


def test_stratified_rates_apply_per_stratum(spark):
    d = _docs(spark)
    out = sample_stratified(d, "lang", {"en": 0}, 1000, key="doc_id")
    langs = {r["lang"] for r in out.collect()}
    assert langs == {"de", "fr"}  # en rate 0 drops all, default 1000 keeps all
    assert out.count() == 333  # 500 docs minus the 167 en docs


def test_per_stratum_topk_exact_and_stable(spark):
    d = _docs(spark)
    a = sorted(map(tuple, sample_per_stratum_topk(d.coalesce(1), "lang", 10, "doc_id").collect()))
    b = sorted(map(tuple, sample_per_stratum_topk(d.repartition(16), "lang", 10, "doc_id").collect()))
    assert a == b
    counts = {}
    for _, lang, _ in a:
        counts[lang] = counts.get(lang, 0) + 1
    assert counts == {"en": 10, "de": 10, "fr": 10}


def test_weighted_sample_clamps_and_is_stable(spark):
    from pyspark.sql import functions as F

    from duckdb_behavioral_spark.functions.sampling import sample_weighted

    d = _docs(spark)
    # weight 1000+ keeps everything, weight <= 0 drops everything
    assert sample_weighted(d, F.lit(5000), "doc_id").count() == 500
    assert sample_weighted(d, F.lit(0), "doc_id").count() == 0
    assert sample_weighted(d, F.lit(-10), "doc_id").count() == 0
    # stable under repartitioning
    w = (F.col("n_chars") * 150).cast("long")  # 0..900 permille
    a = {r["doc_id"] for r in sample_weighted(d.coalesce(1), w, "doc_id").collect()}
    b = {r["doc_id"] for r in sample_weighted(d.repartition(16), w, "doc_id").collect()}
    assert a == b
    assert 0 < len(a) < 500
    # weight-0 rows can never appear
    kept_zero = sample_weighted(d, w, "doc_id").where(F.col("n_chars") == 0).count()
    assert kept_zero == 0


def test_weighted_sample_proportionality(spark):
    from pyspark.sql import functions as F

    from duckdb_behavioral_spark.functions.sampling import sample_weighted

    d = _docs(spark, 2000)
    # n_chars cycles 0..6 -> weight 0..600 permille, mean 300
    w = (F.col("n_chars") * 100).cast("long")
    n = sample_weighted(d, w, "doc_id").count()
    assert 480 < n < 720  # ~600 expected under uniform hashing
