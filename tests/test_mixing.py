"""Semantics tests for deterministic corpus mixing (functions/mixing.py)."""

from duckdb_behavioral_spark.functions.mixing import mix_corpus


def docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_budget_floor_one_overshoot_max(spark):
    # one source, docs of 10 tokens each, budget 25 -> take docs until
    # cum - n < 25: stops after the first doc crossing the line (3 docs)
    rows = [(i, " ".join(["w"] * 10), "a") for i in range(10)]
    out = mix_corpus(docs(spark, rows), budget=25).collect()
    assert len(out) == 3
    assert max(r["cum_tokens"] for r in out) == 30  # <= budget + one doc


def test_weighted_shares(spark):
    # src0 is heavy (w=3), 'z' base (w=1): budget splits 3:1
    rows = [(i, " ".join(["w"] * 10), "src0") for i in range(50)]
    rows += [(100 + i, " ".join(["w"] * 10), "z") for i in range(50)]
    out = mix_corpus(docs(spark, rows), budget=400).collect()
    from collections import Counter

    c = Counter(r["source"] for r in out)
    # budgets: src0 -> 300, z -> 100; 10-token docs -> 30 vs 10 docs
    assert c["src0"] == 30 and c["z"] == 10


def test_selection_deterministic_under_repartition(spark):
    rows = [(i, " ".join(["w"] * (5 + i % 7)), "src%d" % (i % 4)) for i in range(200)]
    d1 = docs(spark, rows)
    a = sorted(r["doc_id"] for r in mix_corpus(d1, budget=300).collect())
    b = sorted(
        r["doc_id"] for r in mix_corpus(d1.repartition(13), budget=300).collect()
    )
    assert a == b and len(a) > 0


def test_empty_source_budget_excludes(spark):
    # budget so small every source gets a floor budget < min doc size:
    # the first doc still ships per source (cum - n = 0 < budget when
    # budget > 0)... unless budget rounds to 0 -> nothing ships
    rows = [(i, " ".join(["w"] * 10), "s") for i in range(3)]
    out = mix_corpus(docs(spark, rows), budget=0).collect()
    assert out == []
