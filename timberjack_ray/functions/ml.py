"""Distributed iterative ML on Dataset batches — the parameter-server
pattern expressed Ray-Data-first: each training round is ONE streaming
``map_batches`` pass producing an exact-integer gradient partial per
batch; the driver folds partials (ints — order-independent), takes the
step, and broadcasts the new weights into the next round's task closure.

Determinism contract: every per-row gradient contribution is quantized
to int64 BEFORE summation (``floor(g·S + ½)`` per component), so the
fold is bit-identical under ANY partitioning / batch order — float
accumulation order never enters.  The quantization bias (≤ ½/S per row
per component) is part of the model definition, matched exactly by the
single-process reference in tests.

At 100 TB: gradient traffic per round is (dim+1)·8 B per batch —
independent of row count; weights broadcast once per round (dim floats).
Rounds are full passes (deterministic batch GD), the classic large-batch
regime; for epoch-style SGD swap the pass for a ``random_sample`` pass
per round (same plumbing, loses bit-determinism).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _sigmoid(z: np.ndarray) -> np.ndarray:
    out = np.empty_like(z)
    pos = z >= 0
    out[pos] = 1.0 / (1.0 + np.exp(-z[pos]))
    e = np.exp(z[~pos])
    out[~pos] = e / (1.0 + e)
    return out


def logreg_grad_partial(m: np.ndarray, y: np.ndarray, w: np.ndarray,
                        grad_scale: int) -> tuple[np.ndarray, int, int]:
    """One batch's exact-int gradient partial for binary logistic
    regression: per-row contributions ``(p_i − y_i)·[x_i, 1]`` quantized
    per COMPONENT to int64, then summed.  Returns (int gradient vector
    of dim+1, n_rows, n_correct@0.5) — all exactly mergeable."""
    z = m @ w[:-1] + w[-1]
    p = _sigmoid(z)
    r = p - y
    g = np.concatenate([r[:, None] * m, r[:, None]], axis=1)
    q = np.floor(g * float(grad_scale) + 0.5).astype(np.int64)
    correct = int(((p >= 0.5) == (y >= 0.5)).sum())
    return q.sum(axis=0), len(y), correct


def logreg_train(ds, vec_col: str, label_col: str, pos_label: int,
                 rounds: int = 10, lr: float = 0.5, l2: float = 1e-3,
                 grad_scale: int = 1_000_000) -> pd.DataFrame:
    """Train a one-vs-rest logistic classifier over an embedding column
    with deterministic distributed full-batch gradient descent (module
    docstring for the plan and the determinism contract).

    Returns one row per weight component: (component, w_q) with
    ``w_q = floor(w·10⁶ + ½)`` (component dim = bias last), plus a final
    ``train_acc`` accounting row (component = −1, w_q = n_correct) from
    the LAST round's partials — every emitted number is an exact int."""
    from timberjack_ray.functions.similarity import _to_matrix

    dim = None
    w = None
    n = correct = 0
    for _ in range(rounds):
        w_now = w

        def partial(t: pa.Table) -> pa.Table:
            m = _to_matrix(t[vec_col]).astype(np.float64)
            if m.size == 0:
                return pa.table({"g": pa.array([], pa.int64()),
                                 "i": pa.array([], pa.int64()),
                                 "n": pa.array([], pa.int64()),
                                 "c": pa.array([], pa.int64())})
            y = (t[label_col].to_numpy(zero_copy_only=False)
                 == pos_label).astype(np.float64)
            wv = w_now if w_now is not None \
                else np.zeros(m.shape[1] + 1, np.float64)
            g, nn, cc = logreg_grad_partial(m, y, wv, grad_scale)
            k = len(g)
            return pa.table({"g": pa.array(g),
                             "i": pa.array(np.arange(k, dtype=np.int64)),
                             "n": pa.array(np.full(k, nn, np.int64)),
                             "c": pa.array(np.full(k, cc, np.int64))})

        p = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
        agg = p.groupby("i", as_index=False).agg(g=("g", "sum"))
        gi = agg.sort_values("i")["g"].to_numpy()
        # n/c replicate per component; component 0's rows carry the totals
        n = int(p.loc[p["i"] == 0, "n"].sum())
        correct = int(p.loc[p["i"] == 0, "c"].sum())
        if dim is None:
            dim = len(gi) - 1
            w = np.zeros(dim + 1, np.float64)
        grad = gi.astype(np.float64) / (float(grad_scale) * max(n, 1))
        grad[:-1] += l2 * w[:-1]
        w = w - lr * grad

    wq = np.floor(w * 1e6 + 0.5).astype(np.int64)
    comp = np.arange(len(wq), dtype=np.int64)
    out = pd.DataFrame({"component": np.r_[comp, [-1]],
                        "w_q": np.r_[wq, [np.int64(correct)]]})
    return out.astype({"component": "int64", "w_q": "int64"})


def score_auc_exact(ds, vec_col: str, label_col: str, pos_label: int,
                    w: np.ndarray, z_scale: int = 1000) -> pd.DataFrame:
    """Exact ROC-AUC of a linear scorer as INTEGER rank statistics: one
    streaming pass folds a (score-bin, n_pos, n_neg) histogram —
    ``bin = floor(z·z_scale)`` of the logit (monotone in the
    probability, so AUC is identical) — then the driver computes the
    Mann-Whitney numerator exactly from the two histograms:
    ``auc_num2 = Σ_b n_pos_b · (2·cum_neg_below + n_neg_b)`` (ties count
    half, hence the ×2 integer form).  AUC = auc_num2 / (2·P·N), left to
    the consumer so every emitted number is an exact int.

    Histogram volume is bounded by the logit range × z_scale (logits are
    O(‖w‖) bounded), independent of row count — the evaluation-pass
    shape that works at any corpus size."""
    from timberjack_ray.functions.similarity import _to_matrix

    wv = np.asarray(w, dtype=np.float64)

    def partial(t: pa.Table) -> pa.Table:
        m = _to_matrix(t[vec_col]).astype(np.float64)
        if m.size == 0:
            return pa.table({"bin": pa.array([], pa.int64()),
                             "n_pos": pa.array([], pa.int64()),
                             "n_neg": pa.array([], pa.int64())})
        y = (t[label_col].to_numpy(zero_copy_only=False)
             == pos_label)
        z = m @ wv[:-1] + wv[-1]
        b = np.floor(z * z_scale).astype(np.int64)
        pv, pc_ = np.unique(b[y], return_counts=True)
        nv, nc_ = np.unique(b[~y], return_counts=True)
        bins = np.union1d(pv, nv)
        n_pos = np.zeros(len(bins), np.int64)
        n_neg = np.zeros(len(bins), np.int64)
        n_pos[np.searchsorted(bins, pv)] = pc_
        n_neg[np.searchsorted(bins, nv)] = nc_
        return pa.table({"bin": pa.array(bins),
                         "n_pos": pa.array(n_pos),
                         "n_neg": pa.array(n_neg)})

    from timberjack_ray.aggregates import merge_partials

    h = merge_partials(ds.map_batches(partial, batch_format="pyarrow"),
                       ["bin"], ["n_pos", "n_neg"]).to_pandas() \
        .sort_values("bin").reset_index(drop=True)
    n_pos = h["n_pos"].to_numpy(np.int64)
    n_neg = h["n_neg"].to_numpy(np.int64)
    cum_neg_below = np.concatenate([[0], np.cumsum(n_neg)[:-1]])
    auc_num2 = int((n_pos * (2 * cum_neg_below + n_neg)).sum())
    return pd.DataFrame({"auc_num2": [auc_num2],
                         "n_pos": [int(n_pos.sum())],
                         "n_neg": [int(n_neg.sum())]})


def score_calibration(ds, vec_col: str, label_col: str, pos_label: int,
                      w: np.ndarray, n_bins: int = 10,
                      z_scale: int = 1000) -> pd.DataFrame:
    """Calibration table for a linear scorer: equi-depth score deciles
    (type-1 quantile boundaries over the quantized-logit histogram, the
    same exact-int machinery as :func:`score_auc_exact`) × exact
    (n, n_pos) per bin — the reliability-diagram input; observed rate
    and predicted probability are the consumer's floats.

    Two streaming passes, both bounded by the logit-bin domain: (1) the
    (bin, n_pos, n_neg) histogram; (2) nothing — the decile assignment
    is a driver walk over the SAME histogram (no second scan needed:
    bins are already exact)."""
    h = _logit_histogram(ds, vec_col, label_col, pos_label, w, z_scale)
    n_all = (h["n_pos"] + h["n_neg"]).to_numpy()
    cum = np.cumsum(n_all)
    total = int(cum[-1])
    rows = []
    lo_idx = 0
    for d in range(1, n_bins + 1):
        k = -(-total * d // n_bins)  # ceil
        hi_idx = int(np.searchsorted(cum, k, side="left"))
        seg = h.iloc[lo_idx:hi_idx + 1]
        rows.append((d, int(seg["n_pos"].sum() + seg["n_neg"].sum()),
                     int(seg["n_pos"].sum()),
                     int(h["bin"].iloc[hi_idx])))
        lo_idx = hi_idx + 1
        if lo_idx >= len(h):
            lo_idx = len(h) - 1
    return pd.DataFrame(rows, columns=["decile", "n", "n_pos",
                                       "bin_hi"]).astype("int64")


def _logit_histogram(ds, vec_col, label_col, pos_label, w, z_scale):
    """Shared (bin, n_pos, n_neg) logit histogram (see score_auc_exact)."""
    from timberjack_ray.aggregates import merge_partials
    from timberjack_ray.functions.similarity import _to_matrix

    wv = np.asarray(w, dtype=np.float64)

    def partial(t: pa.Table) -> pa.Table:
        m = _to_matrix(t[vec_col]).astype(np.float64)
        if m.size == 0:
            return pa.table({"bin": pa.array([], pa.int64()),
                             "n_pos": pa.array([], pa.int64()),
                             "n_neg": pa.array([], pa.int64())})
        y = t[label_col].to_numpy(zero_copy_only=False) == pos_label
        z = m @ wv[:-1] + wv[-1]
        b = np.floor(z * z_scale).astype(np.int64)
        pv, pc_ = np.unique(b[y], return_counts=True)
        nv, nc_ = np.unique(b[~y], return_counts=True)
        bins = np.union1d(pv, nv)
        n_pos = np.zeros(len(bins), np.int64)
        n_neg = np.zeros(len(bins), np.int64)
        n_pos[np.searchsorted(bins, pv)] = pc_
        n_neg[np.searchsorted(bins, nv)] = nc_
        return pa.table({"bin": pa.array(bins),
                         "n_pos": pa.array(n_pos),
                         "n_neg": pa.array(n_neg)})

    return merge_partials(ds.map_batches(partial, batch_format="pyarrow"),
                          ["bin"], ["n_pos", "n_neg"]).to_pandas() \
        .sort_values("bin").reset_index(drop=True)


def best_stump_split(ds, val_col: str, label_col: str,
                     scale: int = 10 ** 12) -> pd.DataFrame:
    """Exact-integer decision stump (CART root split): the threshold t
    maximizing ``scale * (S_L*n_R + S_R*n_L) // (n_L*n_R)`` where S_side
    is the sum of squared class counts on that side of "v <= t" — the
    multiclass-Gini purity objective (maximizing Σ_side S_side/n_side ≡
    minimizing weighted Gini impurity) made hash-stable: the only
    non-integer step, the rational comparison across splits, is replaced
    by one shared floor division BOTH engines apply identically (HUGEINT
    in SQL, python big ints here), ties -> smallest t.  Candidate
    thresholds are the distinct values except the max (both sides
    non-empty).  Returns one row (split, score, n_l, n_r), empty if no
    valid split exists.

    Scale shape: the sufficient statistic is the (value, class) count
    histogram — per-batch partials collapse data rows, the merge and the
    driver prefix-sum scan are bounded by |distinct values x classes|
    (the value_histogram contract), never rows; the big-int scoring loop
    runs once on the driver over distinct candidate splits."""
    from timberjack_ray.aggregates import merge_partials

    proj = ds.select_columns([val_col, label_col])

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by([val_col, label_col]).aggregate([([], "count_all")])
        return g.rename_columns(["v", "c", "n"])

    h = merge_partials(proj.map_batches(partial, batch_format="pyarrow"),
                       ["v", "c"], ["n"]).to_pandas()
    empty = pd.DataFrame({"split": pd.Series([], dtype="int64"),
                          "score": pd.Series([], dtype="int64"),
                          "n_l": pd.Series([], dtype="int64"),
                          "n_r": pd.Series([], dtype="int64")})
    if h.empty:
        return empty
    grid = h.pivot_table(index="v", columns="c", values="n", aggfunc="sum",
                         fill_value=0).sort_index()
    vals = grid.index.to_numpy().astype(np.int64)
    if len(vals) < 2:
        return empty
    cum = grid.to_numpy().astype(object).cumsum(axis=0)   # python ints
    tot = cum[-1]
    n_tot = int(tot.sum())
    best = None
    for i in range(len(vals) - 1):                        # v <= vals[i]
        row = cum[i]
        n_l = int(row.sum())
        n_r = n_tot - n_l
        s_l = int(sum(int(x) * int(x) for x in row))
        s_r = int(sum((int(t) - int(x)) ** 2
                      for t, x in zip(tot, row)))
        score = scale * (s_l * n_r + s_r * n_l) // (n_l * n_r)
        if best is None or score > best[1]:
            best = (int(vals[i]), score, n_l, n_r)
    return pd.DataFrame([best], columns=["split", "score", "n_l", "n_r"]) \
        .astype("int64")
