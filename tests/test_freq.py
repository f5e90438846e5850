"""Count-Min sketch: overcount guarantee, mergeability, and zero-for-unseen
on hand-computed data.  The sf-scale gate is the DuckDB oracle for
q_heavy_hitters_cms (bit-for-bit sketch replay)."""

from __future__ import annotations

from pyspark.sql import functions as F

from relationextractionpipeline_spark.operators import freq


def _words(spark, tokens):
    return spark.createDataFrame([(t,) for t in tokens], "word string")


TOKENS = (["alpha"] * 50 + ["beta"] * 20 + ["gamma"] * 7 + ["delta"] * 1
          + [f"tail{i}" for i in range(100)])


def test_estimate_never_undercounts(spark):
    df = _words(spark, TOKENS)
    sketch = freq.cms_build(df, "word", depth=4, width=64)
    exact = df.groupBy("word").agg(F.count(F.lit(1)).alias("n"))
    est = freq.cms_estimate(sketch, exact, "word", depth=4, width=64)
    rows = est.collect()
    assert len(rows) == 104
    assert all(r.est >= r.n for r in rows)
    # the sketch total per row equals the insert count, so overcounts are
    # bounded; heavy hitters at width 64 over 178 inserts stay near-exact
    by = {r.word: r for r in rows}
    assert by["alpha"].est >= 50 and by["alpha"].est <= 50 + 178


def test_sketch_size_bounded(spark):
    sketch = freq.cms_build(_words(spark, TOKENS), "word", depth=3, width=16)
    assert sketch.count() <= 3 * 16
    assert {tuple(r) for r in sketch.select("row").distinct().collect()} <= {
        (0,), (1,), (2,)
    }


def test_merge_equals_single_build(spark):
    half1, half2 = TOKENS[: len(TOKENS) // 2], TOKENS[len(TOKENS) // 2:]
    merged = freq.cms_merge(
        freq.cms_build(_words(spark, half1), "word", depth=4, width=64),
        freq.cms_build(_words(spark, half2), "word", depth=4, width=64),
    )
    whole = freq.cms_build(_words(spark, TOKENS), "word", depth=4, width=64)
    a = sorted(map(tuple, merged.collect()))
    b = sorted(map(tuple, whole.collect()))
    assert a == b


def test_unseen_key_can_read_zero(spark):
    # a fresh sketch over one token: almost every other key reads 0 (it
    # would need to collide on ALL depth rows to read >0)
    sketch = freq.cms_build(_words(spark, ["solo"]), "word", depth=4,
                            width=1024)
    items = _words(spark, [f"unseen{i}" for i in range(20)])
    est = freq.cms_estimate(sketch, items, "word", depth=4, width=1024)
    assert sum(r.est for r in est.collect()) == 0


def test_partition_invariance(spark):
    df = _words(spark, TOKENS)
    a = freq.cms_build(df.repartition(7), "word", depth=4, width=64)
    b = freq.cms_build(df.coalesce(1), "word", depth=4, width=64)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_kmv_exact_below_k(spark):
    df = _words(spark, TOKENS)  # 104 distinct < k
    est = freq.kmv_estimate(freq.kmv_sketch(df, "word", k=256), k=256)
    r = est.collect()[0]
    assert r.n_kept == 104 and r.est == 104


def test_kmv_estimate_accuracy_above_k(spark):
    n = 5000
    df = _words(spark, [f"tok{i}" for i in range(n)])
    r = freq.kmv_estimate(freq.kmv_sketch(df, "word", k=256), k=256).collect()[0]
    assert r.n_kept == 256
    # std error ~ 1/sqrt(k) ≈ 6.3%; allow 4 sigma
    assert abs(r.est - n) < 0.25 * n


def test_hll_estimate_accuracy(spark):
    n = 5000
    df = _words(spark, [f"tok{i}" for i in range(n)] * 2)  # dups don't count
    r = freq.hll_estimate(freq.hll_sketch(df, "word")).collect()[0]
    assert r.m == 256 and r.n_used + r.v_zero == 256
    # std error ~ 1.04/sqrt(256) ≈ 6.5%; allow 4 sigma
    assert abs(r.est - n) < 0.26 * n


def test_hll_linear_counting_small_range(spark):
    # 20 distinct « 2.5·m with empty registers ⇒ the m·ln(m/V) branch,
    # which is near-exact at this cardinality
    df = _words(spark, [f"tok{i}" for i in range(20)])
    r = freq.hll_estimate(freq.hll_sketch(df, "word")).collect()[0]
    assert r.v_zero >= 236
    assert abs(r.est - 20) <= 2


def test_hll_grouped_matches_per_group_global(spark):
    """The grouped sketch/estimate must equal running the global HLL on
    each group's rows separately — same cell math, same estimate."""
    rows = [(g, f"tok{g}_{i}") for g in ("a", "b") for i in range(400)]
    df = spark.createDataFrame(rows, "grp string, word string")
    grouped = {
        r.grp: (r.n_used, r.v_zero, r.s_scaled, r.est)
        for r in freq.hll_estimate_grouped(
            freq.hll_sketch_grouped(df, "word", ["grp"]), ["grp"]
        ).collect()
    }
    for g in ("a", "b"):
        solo = freq.hll_estimate(
            freq.hll_sketch(df.where(F.col("grp") == g), "word")
        ).collect()[0]
        assert grouped[g] == (solo.n_used, solo.v_zero, solo.s_scaled,
                              solo.est)


def test_hll_merge_equals_single_build(spark):
    toks = [f"tok{i}" for i in range(3000)]
    merged = freq.hll_merge(
        freq.hll_sketch(_words(spark, toks[:1500] + toks[:100]), "word"),
        freq.hll_sketch(_words(spark, toks[1500:]), "word"),
    )
    whole = freq.hll_sketch(_words(spark, toks), "word")
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )


def test_hll_partition_invariance(spark):
    df = _words(spark, TOKENS)
    a = freq.hll_estimate(freq.hll_sketch(df.repartition(7), "word"))
    b = freq.hll_estimate(freq.hll_sketch(df.coalesce(1), "word"))
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def _vals(spark, xs):
    return spark.createDataFrame([(float(x),) for x in xs], "x double")


def test_hist_quantiles_interpolate_within_bin_width(spark):
    xs = list(range(1000))  # uniform 0..999
    sk = freq.hist_sketch(_vals(spark, xs), "x", 0.0, 1000.0, 100)
    out = {
        r.q: r
        for r in freq.hist_quantiles(
            sk, [0.25, 0.5, 0.9], 0.0, 1000.0, 100
        ).collect()
    }
    # exact quantile of uniform ints is ~q*1000; estimate within one bin
    for q in (0.25, 0.5, 0.9):
        assert abs(out[q].est - q * 1000) <= 10.0


def test_hist_sketch_clamps_out_of_range(spark):
    sk = freq.hist_sketch(
        _vals(spark, [-5.0, 0.5, 99.5, 1000.0]), "x", 0.0, 100.0, 10
    )
    by = {r.bucket: r.cnt for r in sk.collect()}
    assert by == {0: 2, 9: 2}  # -5 clamps low, 1000 clamps high


def test_hist_merge_equals_single_build(spark):
    xs = [i % 97 for i in range(500)]
    merged = freq.hist_merge(
        freq.hist_sketch(_vals(spark, xs[:250]), "x", 0.0, 100.0, 20),
        freq.hist_sketch(_vals(spark, xs[250:]), "x", 0.0, 100.0, 20),
    )
    whole = freq.hist_sketch(_vals(spark, xs), "x", 0.0, 100.0, 20)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )


def test_kmv_merge_equals_single_build(spark):
    toks = [f"tok{i}" for i in range(3000)]
    a = freq.kmv_sketch(_words(spark, toks[:1500] + toks[:100]), "word", k=64)
    b = freq.kmv_sketch(_words(spark, toks[1500:]), "word", k=64)
    merged = sorted(r.h for r in freq.kmv_merge(64, a, b).collect())
    whole = sorted(
        r.h for r in freq.kmv_sketch(_words(spark, toks), "word", k=64).collect()
    )
    assert merged == whole


def test_cms_estimate_preserves_duplicate_rows_and_cnt_column(spark):
    """Point-query lookups are row-preserving: duplicate item rows stay
    duplicated, and an items column named 'cnt'/'row'/'bucket' must not
    collide with the sketch's internals."""
    from relationextractionpipeline_spark.operators import freq

    data = spark.createDataFrame([("x",), ("x",), ("y",)], ["w"])
    sk = freq.cms_build(data, "w", depth=3, width=16)
    items = spark.createDataFrame(
        [("x", 7), ("x", 7), ("y", 9)], ["w", "cnt"]
    )
    est = freq.cms_estimate(sk, items, "w", depth=3, width=16)
    rows = sorted((r["w"], r["cnt"], r["est"]) for r in est.collect())
    assert rows == [("x", 7, 2), ("x", 7, 2), ("y", 9, 1)]


def test_hist_sketch_excludes_nulls(spark):
    """Missing data is not minimum-value mass: nulls are excluded rather
    than clamped into bucket 0."""
    from relationextractionpipeline_spark.operators import freq

    df = spark.createDataFrame([(None,), (1.0,), (9.0,)], "v double")
    h = freq.hist_sketch(df, "v", 0, 10, 4)
    got = {r["bucket"]: r["cnt"] for r in h.collect()}
    assert sum(got.values()) == 2
    assert got.get(0, 0) == 1  # only the real 1.0, not the null
