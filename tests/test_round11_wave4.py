"""Round-11 wave 4: padding-waste curve (training_pad_waste_curve)."""


def test_pad_waste_vs_recount(spark):
    from duckdb_behavioral_spark.functions.pad_waste import (
        CONTEXTS,
        pad_waste_curve,
    )

    # token counts chosen to straddle every context boundary,
    # incl. exact multiples (zero padding) and n < C
    counts = [1, 63, 64, 65, 128, 200, 512, 513, 1000]
    rows = [(i, " ".join(f"t{j}" for j in range(n))) for i, n in enumerate(counts)]
    rows.append((99, None))     # NULL text: excluded
    # whitespace-only: the shared tokens() contract yields ONE empty
    # token (split of a trimmed-empty string) on BOTH engines, so the
    # doc counts as a 1-token doc — mirrored here
    rows.append((98, "   "))
    counts = counts + [1]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = [tuple(r) for r in pad_waste_curve(df).collect()]

    want = []
    for c in CONTEXTS:
        seqs = sum((n + c - 1) // c for n in counts)
        tot = sum(counts)
        pad = seqs * c - tot
        split = sum(1 for n in counts if n > c)
        want.append(
            (
                c,
                len(counts),
                seqs,
                tot,
                pad,
                1000 * pad // (seqs * c),
                split,
                1000 * split // len(counts),
            )
        )
    assert got == want


def test_pad_waste_exact_multiples_have_zero_padding(spark):
    from duckdb_behavioral_spark.functions.pad_waste import pad_waste_curve

    # every doc exactly 512 tokens: zero waste at C=512 and C=64/128/256
    rows = [(i, " ".join("w" for _ in range(512))) for i in range(3)]
    out = {
        r["context"]: (r["padding"], r["waste_permille"], r["split_docs"])
        for r in pad_waste_curve(
            spark.createDataFrame(rows, "doc_id long, text string")
        ).collect()
    }
    assert all(v == (0, 0, 3) for c, v in out.items() if c < 512)
    assert out[512] == (0, 0, 0)
