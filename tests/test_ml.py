"""Distributed logistic regression: bit-determinism across partitionings
and parity with a single-process reference running the identical
quantized-partial loop."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _make_data(n=600, dim=8, seed=4):
    rng = np.random.default_rng(seed)
    w_true = rng.normal(size=dim)
    x = rng.normal(size=(n, dim))
    y = (x @ w_true + 0.25 * rng.normal(size=n) > 0).astype(np.int32)
    lab = np.where(y == 1, 3, 1).astype(np.int32)
    return x.astype(np.float32), lab


def _reference(x, lab, pos_label, rounds, lr=0.5, l2=1e-3, S=1_000_000):
    from timberjack_ray.functions.ml import logreg_grad_partial

    y = (lab == pos_label).astype(np.float64)
    w = np.zeros(x.shape[1] + 1, np.float64)
    correct = 0
    for _ in range(rounds):
        g, n, correct = logreg_grad_partial(x.astype(np.float64), y, w, S)
        grad = g.astype(np.float64) / (S * n)
        grad[:-1] += l2 * w[:-1]
        w = w - lr * grad
    wq = np.floor(w * 1e6 + 0.5).astype(np.int64)
    return wq, correct


def _ds_of(x, lab, parts):
    import ray.data as rd

    t = pa.table({
        "embedding": pa.array(x.tolist(), pa.list_(pa.float32())),
        "label": pa.array(lab, pa.int32()),
    })
    return rd.from_arrow(t).repartition(parts)


def test_logreg_matches_reference_and_partitioning(ray_session):
    from timberjack_ray.functions.ml import logreg_train

    x, lab = _make_data()
    wq_ref, correct_ref = _reference(x, lab, 3, rounds=6)

    outs = []
    for parts in (3, 7):
        out = logreg_train(_ds_of(x, lab, parts), "embedding", "label",
                           pos_label=3, rounds=6)
        outs.append(out)
    pd.testing.assert_frame_equal(outs[0], outs[1])  # partition-invariant

    got = outs[0]
    w_got = got[got["component"] >= 0].sort_values("component")["w_q"].to_numpy()
    assert w_got.tolist() == wq_ref.tolist()
    acc_row = got[got["component"] == -1]["w_q"].iloc[0]
    assert acc_row == correct_ref
    # the classifier actually learns the separable concept
    assert correct_ref / len(lab) > 0.9


def test_score_auc_exact_matches_pairwise(ray_session):
    from timberjack_ray.functions.ml import score_auc_exact

    x, lab = _make_data(n=400, seed=9)
    wq, _ = _reference(x, lab, 3, rounds=6)
    w = wq.astype(np.float64) / 1e6

    out = score_auc_exact(_ds_of(x, lab, 5), "embedding", "label", 3, w)
    # pairwise reference on the SAME quantized-bin domain
    z = x.astype(np.float64) @ w[:-1] + w[-1]
    b = np.floor(z * 1000).astype(np.int64)
    pos, neg = b[lab == 3], b[lab != 3]
    num2 = 0
    for p in pos:
        num2 += 2 * int((neg < p).sum()) + int((neg == p).sum())
    assert out["auc_num2"].iloc[0] == num2
    assert out["n_pos"].iloc[0] == len(pos)
    assert out["n_neg"].iloc[0] == len(neg)
    auc = num2 / (2 * len(pos) * len(neg))
    assert 0.8 < auc <= 1.0  # the separable concept is learnable


def test_score_calibration_invariants(ray_session):
    from timberjack_ray.functions.ml import score_calibration

    x, lab = _make_data(n=500, seed=11)
    wq, _ = _reference(x, lab, 3, rounds=6)
    w = wq.astype(np.float64) / 1e6
    out = score_calibration(_ds_of(x, lab, 4), "embedding", "label", 3, w)

    assert out["n"].sum() == 500
    assert out["n_pos"].sum() == int((lab == 3).sum())
    assert (out["n_pos"] <= out["n"]).all()
    assert out["bin_hi"].is_monotonic_increasing
    # monotone model: conversion rate rises from bottom to top decile
    lo = out.iloc[0]; hi = out.iloc[-1]
    assert hi["n_pos"] / hi["n"] > lo["n_pos"] / max(lo["n"], 1)
    # deterministic across partitionings
    out2 = score_calibration(_ds_of(x, lab, 9), "embedding", "label", 3, w)
    pd.testing.assert_frame_equal(out, out2)


def test_top_pc_q8_planted_direction_and_rayleigh(ray_session):
    """top_pc_q8: (1) a planted dominant direction is recovered to
    cosine >= 0.999 in 8 rounds; (2) on a near-isotropic corpus the
    returned vector's Rayleigh quotient is >= 0.98 of the max eigenvalue
    (the variance-captured guarantee that holds regardless of the
    spectral gap); (3) partition-invariant (exact integer partials)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from timberjack_ray.functions.similarity import top_pc_q8

    rng = np.random.default_rng(5)
    d = 16
    spike = rng.normal(size=d)
    spike /= np.linalg.norm(spike)
    rows = []
    for _ in range(300):
        base = 0.9 * spike * rng.choice([1, -1]) + 0.1 * rng.normal(size=d)
        rows.append(base / np.linalg.norm(base))
    df = pd.DataFrame({"embedding": [r.astype(np.float32) for r in rows]})
    out = top_pc_q8(rd.from_pandas(df).repartition(4), rounds=8)
    v = out["v_scaled"].to_numpy().astype(np.float64)
    cos = abs(v @ spike) / np.linalg.norm(v)
    assert cos >= 0.999, cos

    iso = [x / np.linalg.norm(x) for x in rng.normal(size=(400, d))]
    df2 = pd.DataFrame({"embedding": [r.astype(np.float32) for r in iso]})
    out2 = top_pc_q8(rd.from_pandas(df2).repartition(4), rounds=40)
    q = np.clip(np.floor(np.vstack(iso).astype(np.float64) * 127 + 0.5),
                -127, 127)
    G = q.T @ q
    v2 = out2["v_scaled"].to_numpy().astype(np.float64)
    rq = (v2 @ G @ v2) / (v2 @ v2)
    lmax = np.linalg.eigvalsh(G)[-1]
    # 40 rounds because an isotropic spectrum has no gap — convergence
    # rate is (l2/l1)^rounds; the 8-round production setting trades
    # final-percent precision for a 3x smaller unrolled oracle
    assert rq >= 0.98 * lmax, (rq, lmax)

    out3 = top_pc_q8(rd.from_pandas(df2).repartition(9), rounds=40)
    assert (out3["v_scaled"].to_numpy() == out2["v_scaled"].to_numpy()).all()


def test_best_stump_split_matches_bruteforce(ray_session):
    """Floored-rational Gini argmax vs an exhaustive python reference
    with Fraction-exact scoring, including the tie -> smallest-threshold
    rule and the planted perfectly-separating threshold."""
    from fractions import Fraction

    import numpy as np
    import pandas as pd
    import ray.data as rd

    from timberjack_ray.functions.ml import best_stump_split

    rng = np.random.default_rng(9)
    n = 800
    v = rng.integers(0, 60, n).astype(np.int64)
    lab = np.where(v + rng.integers(-8, 9, n) > 30, "hi", "lo")
    df = pd.DataFrame({"v": v, "c": lab})

    vals = np.unique(v)
    best = None
    SCALE = 10 ** 12
    for t in vals[:-1]:
        left = df[df["v"] <= t]["c"].value_counts()
        right = df[df["v"] > t]["c"].value_counts()
        n_l, n_r = int(left.sum()), int(right.sum())
        s_l = int((left ** 2).sum())
        s_r = int((right ** 2).sum())
        score = SCALE * (s_l * n_r + s_r * n_l) // (n_l * n_r)
        if best is None or score > best[1]:
            best = (int(t), score, n_l, n_r)
        # flooring never reorders materially vs the exact rational here
        exact = Fraction(s_l, n_l) + Fraction(s_r, n_r)
        assert Fraction(score, SCALE) <= exact

    got = best_stump_split(rd.from_pandas(df).repartition(5), "v", "c")
    assert got.iloc[0].tolist() == list(best)

    # two distinct values, one perfect split
    df2 = pd.DataFrame({"v": [1, 1, 2, 2], "c": ["a", "a", "b", "b"]})
    g2 = best_stump_split(rd.from_pandas(df2), "v", "c")
    assert g2.iloc[0]["split"] == 1 and g2.iloc[0]["n_l"] == 2

    # single distinct value -> no valid split
    df3 = pd.DataFrame({"v": [5, 5], "c": ["a", "b"]})
    assert best_stump_split(rd.from_pandas(df3), "v", "c").empty
