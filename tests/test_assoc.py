"""Pairwise association profilers (operators/assoc.py)."""

from __future__ import annotations

import math

import pytest

from med_doi_feature_extraction_spark.operators.assoc import (
    cramers_v,
    pearson_matrix,
)


def _micro(x):
    m = math.floor(abs(x) * 1e6 + 0.5)
    return -m if x < 0 else m


def _pearson_ref(xs, ys):
    pairs = [(x, y) for x, y in zip(xs, ys) if x is not None and y is not None]
    n = len(pairs)
    sx = sum(x for x, _ in pairs)
    sy = sum(y for _, y in pairs)
    sxy = sum(x * y for x, y in pairs)
    sxx = sum(x * x for x, _ in pairs)
    syy = sum(y * y for _, y in pairs)
    cov = float(n * sxy - sx * sy)
    vx = float(n * sxx - sx * sx)
    vy = float(n * syy - sy * sy)
    if vx <= 0 or vy <= 0:
        return n, None
    return n, _micro(cov / (math.sqrt(vx) * math.sqrt(vy))) / 1e6


ROWS = [
    (i, 2 * i + 3, (i * 7) % 13, 5, None if i % 4 == 0 else i % 6)
    for i in range(60)
]
COLS = ["a", "b", "c", "const", "gappy"]


@pytest.fixture(scope="module")
def pm(spark):
    df = spark.createDataFrame(
        ROWS, "a long, b long, c long, const long, gappy long"
    )
    return {
        (r["col_x"], r["col_y"]): r
        for r in pearson_matrix(df, COLS).collect()
    }


def test_matches_python_reference(pm):
    data = {name: [row[i] for row in ROWS] for i, name in enumerate(COLS)}
    names = sorted(COLS)
    for i, cx in enumerate(names):
        for cy in names[i + 1:]:
            n, r = _pearson_ref(data[cx], data[cy])
            row = pm[(cx, cy)]
            assert row["n_pairs"] == n, (cx, cy)
            if r is None:
                assert row["r"] is None, (cx, cy)
            else:
                assert row["r"] == pytest.approx(r, abs=1e-12), (cx, cy)


def test_perfect_linear_correlation(pm):
    assert pm[("a", "b")]["r"] == 1.0  # b = 2a + 3


def test_constant_column_null_r(pm):
    assert pm[("a", "const")]["r"] is None
    assert pm[("b", "const")]["r"] is None


def test_pairwise_deletion(pm):
    # gappy is null on every 4th row: those rows drop from its pairs
    assert pm[("a", "gappy")]["n_pairs"] == 45
    assert pm[("a", "b")]["n_pairs"] == 60


def test_all_pairs_present(pm):
    assert len(pm) == 10  # C(5, 2)


def test_rejects_single_column(spark):
    df = spark.createDataFrame([(1,)], "a long")
    with pytest.raises(ValueError):
        pearson_matrix(df, ["a"])


def test_single_scan_one_row_agg(spark):
    df = spark.createDataFrame(ROWS[:5], "a long, b long, c long, const long, gappy long")
    plan = (
        pearson_matrix(df, COLS)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in plan  # one aggregate, no joins
    assert "BatchEvalPython" not in plan


# --- Cramér's V --------------------------------------------------------


def _cramers_ref(pairs):
    pairs = [(a, b) for a, b in pairs if a is not None and b is not None]
    n = len(pairs)
    from collections import Counter

    cells = Counter(pairs)
    rt = Counter(a for a, _ in pairs)
    ct = Counter(b for _, b in pairs)
    sum_u = 0
    for (a, b), o in cells.items():
        e = rt[a] * ct[b] / n
        sum_u += _micro((o - e) * (o - e) / e - e)
    chi2 = n + sum_u / 1e6
    na, nb = len(rt), len(ct)
    v = (
        math.sqrt(chi2 / (n * (min(na, nb) - 1)))
        if min(na, nb) >= 2
        else None
    )
    return (
        n, na, nb, _micro(chi2) / 1e6,
        None if v is None else _micro(v) / 1e6,
    )


def test_cramers_matches_reference(spark):
    pairs = [
        ((i * 3) % 4, (i * 5) % 3 if i % 7 else None) for i in range(80)
    ]
    df = spark.createDataFrame(
        [(str(a), None if b is None else str(b)) for a, b in pairs],
        "x string, y string",
    )
    row = cramers_v(df, "x", "y").collect()[0]
    n, na, nb, chi2, v = _cramers_ref(
        [(str(a), None if b is None else str(b)) for a, b in pairs]
    )
    assert (row["n"], row["n_a"], row["n_b"]) == (n, na, nb)
    assert row["chi2"] == pytest.approx(chi2, abs=1e-9)
    assert row["v"] == pytest.approx(v, abs=1e-9)


def test_cramers_identical_columns_v_one(spark):
    df = spark.createDataFrame(
        [(str(i % 5), str(i % 5)) for i in range(100)], "x string, y string"
    )
    row = cramers_v(df, "x", "y").collect()[0]
    assert row["v"] == pytest.approx(1.0, abs=1e-6)


def test_cramers_independent_blocks_v_zero(spark):
    # perfectly balanced independent columns -> chi2 = 0 -> v = 0
    df = spark.createDataFrame(
        [(str(i % 2), str((i // 2) % 3)) for i in range(60)],
        "x string, y string",
    )
    row = cramers_v(df, "x", "y").collect()[0]
    assert row["chi2"] == pytest.approx(0.0, abs=1e-6)
    assert row["v"] == pytest.approx(0.0, abs=1e-3)


def test_cramers_single_level_null_v(spark):
    df = spark.createDataFrame(
        [("k", str(i % 3)) for i in range(30)], "x string, y string"
    )
    row = cramers_v(df, "x", "y").collect()[0]
    assert row["v"] is None and row["n_a"] == 1


# --- Cohen's kappa -------------------------------------------------------


def _kappa_ref(pairs):
    pairs = [(a, b) for a, b in pairs if a is not None and b is not None]
    n = len(pairs)
    from collections import Counter

    rt = Counter(a for a, _ in pairs)
    ct = Counter(b for _, b in pairs)
    d = sum(1 for a, b in pairs if a == b)
    s = sum(rt[k] * ct.get(k, 0) for k in rt)
    po = _micro(d / n) / 1e6
    pe = _micro(s / (n * n)) / 1e6
    kappa = (
        _micro((d * n - s) / (n * n - s)) / 1e6 if n * n != s else None
    )
    return n, po, pe, kappa


def test_kappa_matches_reference(spark):
    from med_doi_feature_extraction_spark.operators.assoc import (
        cohens_kappa,
    )

    pairs = [
        (str(i % 3), str(i % 3 if i % 5 else (i + 1) % 3))
        for i in range(90)
    ] + [(None, "0"), ("1", None)]
    df = spark.createDataFrame(pairs, "x string, y string")
    row = cohens_kappa(df, "x", "y").collect()[0]
    n, po, pe, kappa = _kappa_ref(pairs)
    assert row["n"] == n
    assert row["po"] == pytest.approx(po, abs=1e-12)
    assert row["pe"] == pytest.approx(pe, abs=1e-12)
    assert row["kappa"] == pytest.approx(kappa, abs=1e-12)
    assert row["kappa"] > 0.5  # raters mostly agree


def test_kappa_perfect_agreement(spark):
    from med_doi_feature_extraction_spark.operators.assoc import (
        cohens_kappa,
    )

    df = spark.createDataFrame(
        [(str(i % 4), str(i % 4)) for i in range(80)], "x string, y string"
    )
    row = cohens_kappa(df, "x", "y").collect()[0]
    assert row["po"] == 1.0 and row["kappa"] == 1.0


def test_kappa_chance_level_is_zero(spark):
    from med_doi_feature_extraction_spark.operators.assoc import (
        cohens_kappa,
    )

    # independent balanced raters: po == pe -> kappa == 0
    df = spark.createDataFrame(
        [(str(i % 2), str((i // 2) % 2)) for i in range(40)],
        "x string, y string",
    )
    row = cohens_kappa(df, "x", "y").collect()[0]
    assert row["kappa"] == pytest.approx(0.0, abs=1e-9)


def test_kappa_degenerate_both_constant(spark):
    from med_doi_feature_extraction_spark.operators.assoc import (
        cohens_kappa,
    )

    df = spark.createDataFrame(
        [("k", "k")] * 10, "x string, y string"
    )
    row = cohens_kappa(df, "x", "y").collect()[0]
    assert row["kappa"] is None and row["po"] == 1.0


# --- Theil's U -----------------------------------------------------------


def _theil_ref(pairs):
    pairs = [(a, b) for a, b in pairs if a is not None and b is not None]
    n = len(pairs)
    from collections import Counter

    cells = Counter(pairs)
    rt = Counter(a for a, _ in pairs)
    ct = Counter(b for _, b in pairs)

    def ent_u(counter):
        return sum(
            math.floor(abs(-(c / n * math.log(c / n))) * 1e6 + 0.5)
            for c in counter.values()
        )

    ha_u, hb_u = ent_u(rt), ent_u(ct)
    hab_u = sum(
        math.floor(
            abs(-(o / n * math.log(o / ct[b]))) * 1e6 + 0.5
        )
        for (a, b), o in cells.items()
    )
    hba_u = sum(
        math.floor(
            abs(-(o / n * math.log(o / rt[a]))) * 1e6 + 0.5
        )
        for (a, b), o in cells.items()
    )

    def u(h, c):
        if h <= 0:
            return None
        return _micro((h - c) / h) / 1e6

    return n, ha_u / 1e6, hb_u / 1e6, u(ha_u, hab_u), u(hb_u, hba_u)


def test_theils_u_matches_reference(spark):
    from med_doi_feature_extraction_spark.operators.assoc import theils_u

    pairs = [
        (str((i * 3) % 4), str((i * 5) % 3) if i % 7 else None)
        for i in range(120)
    ]
    df = spark.createDataFrame(pairs, "x string, y string")
    row = theils_u(df, "x", "y").collect()[0]
    n, ha, hb, uab, uba = _theil_ref(pairs)
    assert row["n"] == n
    assert row["h_a"] == pytest.approx(ha, abs=1e-12)
    assert row["h_b"] == pytest.approx(hb, abs=1e-12)
    assert row["u_a_given_b"] == pytest.approx(uab, abs=1e-9)
    assert row["u_b_given_a"] == pytest.approx(uba, abs=1e-9)


def test_theils_u_is_asymmetric(spark):
    from med_doi_feature_extraction_spark.operators.assoc import theils_u

    # y determines x (x = y mod 2) but x does not determine y
    df = spark.createDataFrame(
        [(str(i % 4 % 2), str(i % 4)) for i in range(80)],
        "x string, y string",
    )
    row = theils_u(df, "x", "y").collect()[0]
    assert row["u_a_given_b"] == pytest.approx(1.0)  # b fixes a
    assert 0.0 < row["u_b_given_a"] < 1.0


def test_theils_u_independent_near_zero(spark):
    from med_doi_feature_extraction_spark.operators.assoc import theils_u

    df = spark.createDataFrame(
        [(str(i % 2), str((i // 2) % 3)) for i in range(120)],
        "x string, y string",
    )
    row = theils_u(df, "x", "y").collect()[0]
    assert abs(row["u_a_given_b"]) < 1e-4
    assert abs(row["u_b_given_a"]) < 1e-4


def test_theils_u_constant_column_null(spark):
    from med_doi_feature_extraction_spark.operators.assoc import theils_u

    df = spark.createDataFrame(
        [("k", str(i % 3)) for i in range(30)], "x string, y string"
    )
    row = theils_u(df, "x", "y").collect()[0]
    assert row["u_a_given_b"] is None  # H(a) = 0
    assert row["u_b_given_a"] is not None


# ---------------------------------------------------------------- spearman


def _rank_avg(vals):
    """Average ranks (1-based) with ties, Python reference."""
    order = sorted(range(len(vals)), key=lambda i: vals[i])
    ranks = [0.0] * len(vals)
    i = 0
    while i < len(order):
        j = i
        while j + 1 < len(order) and vals[order[j + 1]] == vals[order[i]]:
            j += 1
        r = (i + j) / 2 + 1
        for k in range(i, j + 1):
            ranks[order[k]] = r
        i = j + 1
    return ranks


def _spearman_ref(xs, ys):
    pairs = [
        (x, y) for x, y in zip(xs, ys) if x is not None and y is not None
    ]
    rx = _rank_avg([p[0] for p in pairs])
    ry = _rank_avg([p[1] for p in pairs])
    n = len(pairs)
    mx = sum(rx) / n
    my = sum(ry) / n
    cov = sum((a - mx) * (b - my) for a, b in zip(rx, ry))
    vx = sum((a - mx) ** 2 for a in rx)
    vy = sum((b - my) ** 2 for b in ry)
    if vx <= 0 or vy <= 0:
        return n, None
    return n, _micro(cov / math.sqrt(vx * vy)) / 1e6


def test_spearman_matches_reference_with_ties(spark):
    from med_doi_feature_extraction_spark.operators.assoc import spearman

    xs = [(i * 13) % 7 for i in range(80)]
    ys = [((i * 5) % 11) for i in range(80)]
    df = spark.createDataFrame(list(zip(xs, ys)), "x long, y long")
    row = spearman(df, "x", "y").collect()[0]
    n, rho = _spearman_ref(xs, ys)
    assert row["n"] == n
    assert row["rho"] == pytest.approx(rho, abs=1e-6)


def test_spearman_monotone_nonlinear_is_one(spark):
    from med_doi_feature_extraction_spark.operators.assoc import spearman

    rows = [(i, i * i * i) for i in range(-20, 21)]
    df = spark.createDataFrame(rows, "x long, y long")
    assert spearman(df, "x", "y").collect()[0]["rho"] == 1.0
    rev = spark.createDataFrame(
        [(x, -y) for x, y in rows], "x long, y long"
    )
    assert spearman(rev, "x", "y").collect()[0]["rho"] == -1.0


def test_spearman_constant_side_null(spark):
    from med_doi_feature_extraction_spark.operators.assoc import spearman

    df = spark.createDataFrame(
        [(i, 7) for i in range(10)], "x long, y long"
    )
    row = spearman(df, "x", "y").collect()[0]
    assert row["rho"] is None and row["n"] == 10


def test_spearman_null_rows_dropped(spark):
    from med_doi_feature_extraction_spark.operators.assoc import spearman

    rows = [(1, 1), (2, None), (None, 3), (4, 4), (5, 2)]
    df = spark.createDataFrame(rows, "x long, y long")
    row = spearman(df, "x", "y").collect()[0]
    n, rho = _spearman_ref(
        [r[0] for r in rows], [r[1] for r in rows]
    )
    assert row["n"] == 3 == n
    assert row["rho"] == pytest.approx(rho, abs=1e-6)
