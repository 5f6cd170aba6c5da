"""Distributed model-fitting tier (operators/probe.py): exact-integer
OLS recovery, determinant correctness, tie-exact rank AUC vs a
brute-force pair count, and the codegen contract of the scoring pass."""

from __future__ import annotations

import itertools
import random
from fractions import Fraction

from pyspark.sql import functions as F


def _perm_det(m):
    """Leibniz-formula determinant (independent reference)."""
    n = len(m)
    total = 0
    for perm in itertools.permutations(range(n)):
        sign = 1
        seen = list(perm)
        # parity via inversion count
        inv = sum(
            1
            for i in range(n)
            for j in range(i + 1, n)
            if seen[i] > seen[j]
        )
        sign = -1 if inv % 2 else 1
        prod = 1
        for i in range(n):
            prod *= m[i][perm[i]]
        total += sign * prod
    return total


def test_exact_int_det_matches_leibniz():
    from spark_alchemy_spark.operators.probe import exact_int_det

    rng = random.Random(11)
    for n in (1, 2, 3, 4, 5, 6):
        for _ in range(5):
            m = [
                [rng.randint(-9, 9) for _ in range(n)] for _ in range(n)
            ]
            assert exact_int_det(m) == _perm_det(m)
    # singular and pivot-swap paths of the Bareiss elimination
    assert exact_int_det([[0, 0], [0, 0]]) == 0
    assert exact_int_det([[0, 1], [1, 0]]) == -1  # needs the row swap
    assert exact_int_det([[1, 2], [2, 4]]) == 0  # rank-deficient


def test_fit_recovers_planted_integer_relation(spark):
    """y = 7 + 3*x1 + 2*x2 over a nondegenerate integer grid: the
    exact-integer Cramer solve must return the coefficients EXACTLY
    (ppm-pinned integers, zero residual system)."""
    from spark_alchemy_spark.operators.probe import fit_linear_probe_ppm

    rows = [
        (x1, x2, 7 + 3 * x1 + 2 * x2)
        for x1 in range(0, 20)
        for x2 in range(0, 7)
    ]
    df = spark.createDataFrame(rows, "x1 int, x2 int, y int")
    res = fit_linear_probe_ppm(df, ["x1", "x2"], "y")
    assert res["n"] == len(rows)
    assert res["coeffs_ppm"] == [7_000_000, 3_000_000, 2_000_000]


def test_fit_truncates_toward_zero_like_the_oracle(spark):
    """A system whose solution is NOT an exact ppm multiple: the pin
    must truncate toward zero, matching the CASE-sign HUGEINT form
    (checked against Fraction arithmetic)."""
    from spark_alchemy_spark.operators.probe import (
        exact_int_det,
        fit_linear_probe_ppm,
    )

    rng = random.Random(3)
    rows = [
        (
            x1 := rng.randint(0, 50),
            x2 := rng.randint(0, 30),
            rng.randint(0, 400) + 2 * x1 - 3 * x2,
        )
        for _ in range(200)
    ]
    df = spark.createDataFrame(rows, "x1 int, x2 int, y int")
    res = fit_linear_probe_ppm(df, ["x1", "x2"], "y")
    # reference: exact rational solve + trunc-toward-zero ppm
    n = len(rows)
    s1 = sum(r[0] for r in rows)
    s2 = sum(r[1] for r in rows)
    sy = sum(r[2] for r in rows)
    s11 = sum(r[0] * r[0] for r in rows)
    s12 = sum(r[0] * r[1] for r in rows)
    s22 = sum(r[1] * r[1] for r in rows)
    s1y = sum(r[0] * r[2] for r in rows)
    s2y = sum(r[1] * r[2] for r in rows)
    a = [[n, s1, s2], [s1, s11, s12], [s2, s12, s22]]
    b = [sy, s1y, s2y]
    d = exact_int_det(a)
    for k in range(3):
        mk = [
            [b[r] if c == k else a[r][c] for c in range(3)]
            for r in range(3)
        ]
        frac = Fraction(exact_int_det(mk), d) * 1_000_000
        want = int(frac)  # int() on Fraction truncates toward zero
        assert res["coeffs_ppm"][k] == want


def _brute_auc_ppm(scores, labels):
    """O(n^2) pair-count AUC with half-credit ties, exact rational,
    ppm-truncated — the definitional reference."""
    pos = [s for s, y in zip(scores, labels) if y]
    neg = [s for s, y in zip(scores, labels) if not y]
    num = 0
    for p in pos:
        for q in neg:
            num += 2 if p > q else (1 if p == q else 0)
    return int(Fraction(num, 2 * len(pos) * len(neg)) * 1_000_000)


def test_rank_auc_matches_brute_force_with_ties(spark):
    from spark_alchemy_spark.operators.probe import rank_auc_ppm

    rng = random.Random(5)
    scores = [rng.randint(0, 8) for _ in range(120)]  # heavy ties
    labels = [1 if rng.random() < (s + 1) / 10 else 0 for s in scores]
    if sum(labels) in (0, len(labels)):  # degenerate guard
        labels[0] = 1 - labels[0]
    df = spark.createDataFrame(
        list(zip(scores, labels)), "s int, pos int"
    )
    got = rank_auc_ppm(df, "s", "pos").collect()[0]
    assert got["n_pos"] == sum(labels)
    assert got["n_neg"] == len(labels) - sum(labels)
    assert got["auc_ppm"] == _brute_auc_ppm(scores, labels)


def test_rank_auc_perfect_and_random_extremes(spark):
    from spark_alchemy_spark.operators.probe import rank_auc_ppm

    # perfect separation -> exactly 1.0
    df = spark.createDataFrame(
        [(i, 1 if i >= 50 else 0) for i in range(100)], "s int, pos int"
    )
    assert rank_auc_ppm(df, "s", "pos").collect()[0]["auc_ppm"] == 1_000_000
    # constant score -> all ties -> exactly 0.5
    df2 = spark.createDataFrame(
        [(7, i % 2) for i in range(40)], "s int, pos int"
    )
    assert rank_auc_ppm(df2, "s", "pos").collect()[0]["auc_ppm"] == 500_000


def test_probe_score_is_codegen_only(spark):
    """Scoring is the hot path over the full corpus: the plan must
    contain no Python evaluation (broadcast-literal arithmetic only)."""
    from spark_alchemy_spark.operators.probe import probe_score_ppm

    df = spark.createDataFrame(
        [(i, i * 2) for i in range(100)], "x1 int, x2 int"
    )
    scored = df.select(
        probe_score_ppm([1_000_000, 2_000_000, 3_000_000], ["x1", "x2"])
        .alias("s")
    )
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    got = {r["s"] for r in scored.collect()}
    assert 1_000_000 + 2_000_000 * 3 + 3_000_000 * 6 in got


def test_probe_sums_single_aggregate(spark):
    """The fit's distributed work is ONE aggregate: the sums plan has
    exactly one shuffle (partial + final HashAggregate)."""
    from spark_alchemy_spark.operators.probe import linear_probe_sums

    df = spark.createDataFrame(
        [(i % 13, i % 7, i % 29) for i in range(500)],
        "x1 int, x2 int, y int",
    )
    sums = linear_probe_sums(df, ["x1", "x2"], "y")
    plan = sums._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 1


def test_ridge_zero_lambda_equals_ols(spark):
    """fit_ridge_path_ppm at lambda=0 must be bit-identical to the OLS
    fit (same sums, same solver, no diagonal shift)."""
    from spark_alchemy_spark.operators.probe import (
        fit_linear_probe_ppm,
        fit_ridge_path_ppm,
    )

    rows = [
        (x1, x2, 7 + 3 * x1 + 2 * x2 + (x1 * x2) % 5)
        for x1 in range(0, 20)
        for x2 in range(0, 7)
    ]
    df = spark.createDataFrame(rows, "x1 int, x2 int, y int")
    ols = fit_linear_probe_ppm(df, ["x1", "x2"], "y")
    path = fit_ridge_path_ppm(df, ["x1", "x2"], "y", [0])
    assert path[0]["coeffs_ppm"] == ols["coeffs_ppm"]
    assert path[0]["n"] == ols["n"]


def test_ridge_slopes_shrink_monotonically(spark):
    """Ridge with an unpenalized intercept: the slope-vector norm is
    non-increasing in lambda, strictly shrinking over a wide sweep,
    and -> 0 at huge lambda (ppm truncation allows ties between
    adjacent lambdas, never an increase beyond rounding)."""
    from spark_alchemy_spark.operators.probe import fit_ridge_path_ppm

    rows = [
        (x1, x2, 7 + 3 * x1 + 2 * x2 + (x1 * 7 + x2 * 3) % 11)
        for x1 in range(0, 25)
        for x2 in range(0, 9)
    ]
    df = spark.createDataFrame(rows, "x1 int, x2 int, y int")
    lambdas = [0, 10_000, 1_000_000, 100_000_000, 10**14]
    path = fit_ridge_path_ppm(df, ["x1", "x2"], "y", lambdas)
    norms = [
        r["coeffs_ppm"][1] ** 2 + r["coeffs_ppm"][2] ** 2 for r in path
    ]
    # monotone non-increasing with 1 ppm^2-scale slack for truncation
    for a, b in zip(norms, norms[1:]):
        assert b <= a + 4 * max(abs(c) for r in path for c in r["coeffs_ppm"])
    assert norms[-1] < norms[0]  # strict shrink across the sweep
    b1, b2 = path[-1]["coeffs_ppm"][1], path[-1]["coeffs_ppm"][2]
    assert abs(b1) <= 1 and abs(b2) <= 1  # slopes -> 0 at huge lambda


def test_ridge_solves_singular_ols_system(spark):
    """Perfectly collinear features (x2 = 2*x1) make OLS singular; any
    positive lambda must yield a solvable, finite fit — the practical
    reason the ridge path exists."""
    import pytest

    from spark_alchemy_spark.operators.probe import (
        fit_linear_probe_ppm,
        fit_ridge_path_ppm,
    )

    rows = [(x1, 2 * x1, 5 + 4 * x1) for x1 in range(0, 30)]
    df = spark.createDataFrame(rows, "x1 int, x2 int, y int")
    with pytest.raises(ZeroDivisionError):
        fit_linear_probe_ppm(df, ["x1", "x2"], "y")
    path = fit_ridge_path_ppm(df, ["x1", "x2"], "y", [0, 1_000])
    assert path[0]["coeffs_ppm"] is None  # singular surfaced, not hidden
    assert path[1]["coeffs_ppm"] is not None


def test_ridge_rejects_negative_lambda(spark):
    import pytest

    from spark_alchemy_spark.operators.probe import fit_linear_probe_ppm

    df = spark.createDataFrame([(1, 2, 3), (2, 3, 5)], "x1 int, x2 int, y int")
    with pytest.raises(ValueError, match="ridge_lambda"):
        fit_linear_probe_ppm(df, ["x1", "x2"], "y", ridge_lambda=-1)


def test_moment_sums_are_a_monoid(spark):
    """sums(A ∪ B) == merge(sums(A), sums(B)) in exact integers, and
    the fit from merged sums is bit-identical to the from-scratch fit
    — the law the streaming incremental-fit entry rides."""
    from spark_alchemy_spark.operators.probe import (
        _solve_ppm,
        fit_linear_probe_ppm,
        linear_probe_sums,
        merge_moment_sums,
    )

    rows = [
        (x1, x2, 3 + 2 * x1 + 5 * x2 + (x1 * x2) % 7)
        for x1 in range(0, 18)
        for x2 in range(0, 6)
    ]
    df = spark.createDataFrame(rows, "x1 int, x2 int, y int")
    a = df.filter("x1 % 3 = 0")
    b = df.filter("x1 % 3 = 1")
    c = df.filter("x1 % 3 = 2")
    parts = [
        linear_probe_sums(p, ["x1", "x2"], "y").collect()[0].asDict()
        for p in (a, b, c)
    ]
    merged = merge_moment_sums(parts, d=2)
    whole = linear_probe_sums(df, ["x1", "x2"], "y").collect()[0].asDict()
    assert merged == {k: int(whole[k]) for k in merged}
    n, coeffs = _solve_ppm(merged, d=2)
    direct = fit_linear_probe_ppm(df, ["x1", "x2"], "y")
    assert n == direct["n"] and coeffs == direct["coeffs_ppm"]
    # empty parts fold as zero (NULL sums)
    empty = linear_probe_sums(
        df.filter("x1 < 0"), ["x1", "x2"], "y"
    ).collect()[0].asDict()
    assert merge_moment_sums(parts + [empty], d=2) == merged


def test_weighted_fit_equals_replication(spark):
    """WLS with integer weights must equal OLS over the replicated
    rows EXACTLY (same sums, same Cramer solve) — and weight_col=None
    stays the unweighted path."""
    from spark_alchemy_spark.operators.probe import fit_linear_probe_ppm

    rows = [
        (x1, x2, 5 + 2 * x1 + 3 * x2 + (x1 + x2) % 4, 1 + (x1 * 3 + x2) % 3)
        for x1 in range(0, 15)
        for x2 in range(0, 5)
    ]
    df = spark.createDataFrame(rows, "x1 int, x2 int, y int, w int")
    weighted = fit_linear_probe_ppm(
        df, ["x1", "x2"], "y", weight_col="w"
    )
    replicated = spark.createDataFrame(
        [(x1, x2, y) for x1, x2, y, w in rows for _ in range(w)],
        "x1 int, x2 int, y int",
    )
    plain = fit_linear_probe_ppm(replicated, ["x1", "x2"], "y")
    assert weighted == plain
    assert weighted["n"] == sum(w for _, _, _, w in rows)


def test_r2_is_exactly_one_on_exact_fit(spark):
    """A zero-residual planted relation must report r2_ppm ==
    1_000_000 exactly — SSE's integer identity has no float fuzz to
    leak (VERDICT r7 task 4 law)."""
    from spark_alchemy_spark.operators.probe import fit_linear_probe_ppm

    rows = [
        (x1, x2, 7 + 3 * x1 + 2 * x2)
        for x1 in range(0, 20)
        for x2 in range(0, 7)
    ]
    df = spark.createDataFrame(rows, "x1 int, x2 int, y int")
    res = fit_linear_probe_ppm(df, ["x1", "x2"], "y")
    assert res["r2_ppm"] == 1_000_000


def test_r2_matches_rational_reference(spark):
    """r2_ppm must equal the definitional 1 - SSE/SST computed with
    EXACT rational coefficients (Fraction reference, trunc-toward-zero
    pin) — on a noisy system where R^2 is strictly inside (0, 1)."""
    from spark_alchemy_spark.operators.probe import (
        exact_int_det,
        fit_linear_probe_ppm,
    )

    rng = random.Random(7)
    rows = [
        (
            x1 := rng.randint(0, 50),
            x2 := rng.randint(0, 30),
            rng.randint(0, 400) + 2 * x1 - 3 * x2,
        )
        for _ in range(200)
    ]
    df = spark.createDataFrame(rows, "x1 int, x2 int, y int")
    res = fit_linear_probe_ppm(df, ["x1", "x2"], "y")
    n = len(rows)
    s1 = sum(r[0] for r in rows)
    s2 = sum(r[1] for r in rows)
    sy = sum(r[2] for r in rows)
    s11 = sum(r[0] * r[0] for r in rows)
    s12 = sum(r[0] * r[1] for r in rows)
    s22 = sum(r[1] * r[1] for r in rows)
    s1y = sum(r[0] * r[2] for r in rows)
    s2y = sum(r[1] * r[2] for r in rows)
    a = [[n, s1, s2], [s1, s11, s12], [s2, s12, s22]]
    b = [sy, s1y, s2y]
    d = exact_int_det(a)
    beta = []
    for k in range(3):
        mk = [
            [b[r] if c == k else a[r][c] for c in range(3)]
            for r in range(3)
        ]
        beta.append(Fraction(exact_int_det(mk), d))
    sse = sum(
        (Fraction(y) - beta[0] - beta[1] * x1 - beta[2] * x2) ** 2
        for x1, x2, y in rows
    )
    sst = Fraction(sum(r[2] ** 2 for r in rows)) - Fraction(sy * sy, n)
    # the pin convention: the SSE/SST RATIO is ppm-truncated (same
    # trunc-toward-zero rule as every coefficient pin), then
    # subtracted — NOT trunc(R^2), which differs by 1 ppm whenever
    # the ratio is fractional
    want = 1_000_000 - int(sse / sst * 1_000_000)
    assert res["r2_ppm"] == want
    assert 0 < res["r2_ppm"] < 1_000_000


def test_r2_monotone_nonincreasing_in_lambda(spark):
    """Per-lambda R^2 on the ridge path — measured against the
    UNPENALIZED residual — must be monotonically non-increasing in
    lambda (OLS minimizes SSE; shrinkage can only give up fit), with
    lambda=0 bit-identical to the plain fit's r2_ppm."""
    from spark_alchemy_spark.operators.probe import (
        fit_linear_probe_ppm,
        fit_ridge_path_ppm,
    )

    rows = [
        (x1, x2, 7 + 3 * x1 + 2 * x2 + (x1 * 7 + x2 * 3) % 11)
        for x1 in range(0, 25)
        for x2 in range(0, 9)
    ]
    df = spark.createDataFrame(rows, "x1 int, x2 int, y int")
    lambdas = [0, 10_000, 1_000_000, 100_000_000, 10**14]
    path = fit_ridge_path_ppm(df, ["x1", "x2"], "y", lambdas)
    r2s = [r["r2_ppm"] for r in path]
    assert all(v is not None for v in r2s)
    assert r2s[0] == fit_linear_probe_ppm(df, ["x1", "x2"], "y")["r2_ppm"]
    # exact integers: non-increasing needs only 1 ppm truncation slack
    for hi, lo in zip(r2s, r2s[1:]):
        assert lo <= hi + 1
    assert r2s[-1] < r2s[0]  # the sweep actually trades fit away


def test_weighted_ridge_equals_replicated_ridge(spark):
    """The VERDICT r7 task 5 composition law: ridge_lambda and
    weight_col together must equal ridge over the replicated rows at
    the same lambda — coefficients AND r2_ppm, bit-for-bit."""
    from spark_alchemy_spark.operators.probe import fit_linear_probe_ppm

    rows = [
        (x1, x2, 5 + 2 * x1 + 3 * x2 + (x1 + x2) % 4, 1 + (x1 * 3 + x2) % 3)
        for x1 in range(0, 15)
        for x2 in range(0, 5)
    ]
    df = spark.createDataFrame(rows, "x1 int, x2 int, y int, w int")
    replicated = spark.createDataFrame(
        [(x1, x2, y) for x1, x2, y, w in rows for _ in range(w)],
        "x1 int, x2 int, y int",
    )
    for lam in (1_000, 1_000_000):
        weighted = fit_linear_probe_ppm(
            df, ["x1", "x2"], "y", ridge_lambda=lam, weight_col="w"
        )
        plain = fit_linear_probe_ppm(
            replicated, ["x1", "x2"], "y", ridge_lambda=lam
        )
        assert weighted == plain  # n, coeffs_ppm, r2_ppm


def test_r2_none_on_constant_label(spark):
    """SST == 0 (constant y) leaves R^2 undefined: r2_ppm must come
    back None, not a division error, while the coefficients still
    solve (b0 = y, zero slopes)."""
    from spark_alchemy_spark.operators.probe import fit_linear_probe_ppm

    rows = [(x1, x2, 9) for x1 in range(0, 10) for x2 in range(0, 4)]
    df = spark.createDataFrame(rows, "x1 int, x2 int, y int")
    res = fit_linear_probe_ppm(df, ["x1", "x2"], "y")
    assert res["r2_ppm"] is None
    assert res["coeffs_ppm"] == [9_000_000, 0, 0]


def test_wide_probe_recovers_planted_relation(spark):
    """d=8 features — factorial cofactor expansion would be hopeless
    here; the Bareiss elimination makes wide probes practical.  An
    exact planted relation must come back bit-exact with r2 == 1e6."""
    import random

    from spark_alchemy_spark.operators.probe import fit_linear_probe_ppm

    rng = random.Random(42)
    coefs = [3, -2, 5, 1, -4, 2, 7, -1]
    rows = []
    for _ in range(400):
        xs = [rng.randint(0, 9) for _ in range(8)]
        y = 11 + sum(c * x for c, x in zip(coefs, xs))
        rows.append((*xs, y))
    schema = ", ".join(f"x{i} int" for i in range(8)) + ", y int"
    df = spark.createDataFrame(rows, schema)
    res = fit_linear_probe_ppm(df, [f"x{i}" for i in range(8)], "y")
    assert res["coeffs_ppm"] == [11_000_000] + [c * 1_000_000 for c in coefs]
    assert res["r2_ppm"] == 1_000_000


def test_moment_sums_subtract_exactly(spark):
    """The sums are a GROUP: sums(A) + sums(B) - sums(B) == sums(A)
    bit-exactly, and the fit over folded(+B, -B, +C) equals the
    from-scratch fit over A ∪ C — the law the streaming CDC fit
    entry rides (deletes maintain the model exactly)."""
    from spark_alchemy_spark.operators.probe import (
        _solve_ppm,
        fit_linear_probe_ppm,
        linear_probe_sums,
        merge_moment_sums,
        r2_ppm_from_sums,
        subtract_moment_sums,
    )

    rows = [
        (x1, x2, 3 + 2 * x1 + 5 * x2 + (x1 * x2) % 7)
        for x1 in range(0, 18)
        for x2 in range(0, 6)
    ]
    df = spark.createDataFrame(rows, "x1 int, x2 int, y int")
    a = df.filter("x1 % 3 = 0")
    b = df.filter("x1 % 3 = 1")
    c = df.filter("x1 % 3 = 2")

    def sums(p):
        return linear_probe_sums(p, ["x1", "x2"], "y").collect()[0].asDict()

    sa, sb, sc = sums(a), sums(b), sums(c)
    # exact inverse
    assert subtract_moment_sums(
        merge_moment_sums([sa, sb], d=2), sb, d=2
    ) == {k: int(sa[k]) for k in subtract_moment_sums(sa, sa, 2)}
    # CDC fold: insert A, insert B, delete B, insert C == fit(A ∪ C)
    folded = merge_moment_sums([sa, sb], d=2)
    folded = subtract_moment_sums(folded, sb, d=2)
    folded = merge_moment_sums([folded, sc], d=2)
    n, coeffs = _solve_ppm(folded, d=2)
    direct = fit_linear_probe_ppm(
        df.filter("x1 % 3 <> 1"), ["x1", "x2"], "y"
    )
    assert n == direct["n"] and coeffs == direct["coeffs_ppm"]
    assert r2_ppm_from_sums(folded, d=2) == direct["r2_ppm"]
    # subtracting down to the empty corpus gives the zero element
    empty = subtract_moment_sums(
        subtract_moment_sums(subtract_moment_sums(folded, sa, 2), sc, 2),
        merge_moment_sums([], 2),
        2,
    )
    assert all(v == 0 for v in empty.values())


def test_ridge_validation_sweep_exact_and_selects(spark):
    """Held-out model selection: validation R^2 at lambda=0 must match
    an exact Fraction reference of the definitional 1 - SSE_val/SST_val
    with the train fit's rational coefficients, and on noisy
    near-collinear training data the validation curve must PEAK at a
    positive lambda (training R^2 stays monotone non-increasing — OLS
    always wins on its own data, which is why selection needs the
    held-out split)."""
    import random

    from spark_alchemy_spark.operators.probe import (
        exact_int_det,
        ridge_validation_sweep,
    )

    rng = random.Random(19)
    # truth: y = 5 + 3*x1 + 3*x2, but x2 ~ x1 (near-collinear) and the
    # tiny train split carries heavy noise -> OLS overfits the noise
    # along the ill-determined direction; ridge shrinks back toward it
    def mk(n, noise):
        rows = []
        for _ in range(n):
            x1 = rng.randint(0, 40)
            x2 = x1 + rng.randint(-1, 1)
            y = 5 + 3 * x1 + 3 * x2 + rng.randint(-noise, noise)
            rows.append((x1, x2, y))
        return rows

    train_rows = mk(12, 60)
    val_rows = mk(400, 2)
    train = spark.createDataFrame(train_rows, "x1 int, x2 int, y int")
    val = spark.createDataFrame(val_rows, "x1 int, x2 int, y int")
    lambdas = [0, 10, 1_000, 100_000, 10_000_000]
    out = ridge_validation_sweep(train, val, ["x1", "x2"], "y", lambdas)
    assert [r["ridge_lambda"] for r in out] == lambdas
    assert all(isinstance(r["r2_val_ppm"], int) for r in out)

    # exact reference at lambda=0 via Fractions
    n = len(train_rows)
    s1 = sum(r[0] for r in train_rows)
    s2 = sum(r[1] for r in train_rows)
    sy = sum(r[2] for r in train_rows)
    s11 = sum(r[0] * r[0] for r in train_rows)
    s12 = sum(r[0] * r[1] for r in train_rows)
    s22 = sum(r[1] * r[1] for r in train_rows)
    s1y = sum(r[0] * r[2] for r in train_rows)
    s2y = sum(r[1] * r[2] for r in train_rows)
    a = [[n, s1, s2], [s1, s11, s12], [s2, s12, s22]]
    b = [sy, s1y, s2y]
    det = exact_int_det(a)
    beta = [
        Fraction(
            exact_int_det(
                [
                    [b[p] if c == k else a[p][c] for c in range(3)]
                    for p in range(3)
                ]
            ),
            det,
        )
        for k in range(3)
    ]
    sse_v = sum(
        (Fraction(y) - beta[0] - beta[1] * x1 - beta[2] * x2) ** 2
        for x1, x2, y in val_rows
    )
    nv = len(val_rows)
    syv = sum(r[2] for r in val_rows)
    sst_v = Fraction(sum(r[2] ** 2 for r in val_rows)) - Fraction(
        syv * syv, nv
    )
    want = 1_000_000 - int(sse_v / sst_v * 1_000_000)
    assert out[0]["r2_val_ppm"] == want

    # training R^2 monotone non-increasing; validation peaks at lam>0
    tr2 = [r["r2_train_ppm"] for r in out]
    for hi, lo in zip(tr2, tr2[1:]):
        assert lo <= hi + 1
    best = max(out, key=lambda r: r["r2_val_ppm"])
    assert best["ridge_lambda"] > 0
    assert best["r2_val_ppm"] > out[0]["r2_val_ppm"]


def test_very_wide_probe_no_key_collision(spark):
    """d=13 crosses the old f's{i}{j}' naming collision ('s11' was both
    x11's first moment and x1*x1's cross moment — review finding); the
    underscore-separated keys must keep the fit exact."""
    import random

    from spark_alchemy_spark.operators.probe import (
        fit_linear_probe_ppm,
        moment_sum_keys,
    )

    ks = moment_sum_keys(13)
    assert len(ks) == len(set(ks))
    rng = random.Random(7)
    coefs = [((-1) ** i) * (i + 1) for i in range(13)]
    rows = []
    for _ in range(600):
        xs = [rng.randint(0, 5) for _ in range(13)]
        rows.append((*xs, 9 + sum(c * x for c, x in zip(coefs, xs))))
    schema = ", ".join(f"x{i} int" for i in range(13)) + ", y int"
    df = spark.createDataFrame(rows, schema)
    res = fit_linear_probe_ppm(df, [f"x{i}" for i in range(13)], "y")
    assert res["coeffs_ppm"] == [9_000_000] + [
        c * 1_000_000 for c in coefs
    ]
    assert res["r2_ppm"] == 1_000_000
