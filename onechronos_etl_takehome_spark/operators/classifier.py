"""Model-assisted quality/label classification for corpus curation.

The "train a small classifier, score the whole corpus" stage of every
published LLM data pipeline (GPT-3's LR quality filter over CommonCrawl,
LLaMA/RefinedWeb's fastText gates): cheap lexical features feed a tiny
linear model whose *training* happens once on a bounded sample and
whose *scoring* must run at corpus scale.

Division of labor, matching the engine's other trained operators (IVF
centroids, BPE merges):

- :func:`featurize` — fixed lexical feature columns as pure JVM
  expressions (whole-stage codegen, scan-stage, no shuffle).
- :func:`train_logreg` — full-batch logistic regression on a
  hash-ordered **driver sample** (deterministic: fixed sample order,
  fixed iteration count, float64 numpy). Feature standardization is
  folded back into the returned weights, so scoring needs no stats.
- :func:`score` — the dot product + sigmoid as JVM expressions: the
  100-TB path is one embarrassingly parallel scan-stage projection,
  zero Python.

SQL cannot express iterative gradient training, so the catalog entry
(t20) is rows-only by design; the tests pin distributed==numpy scoring
equality, training determinism, and perfect recovery of a separable
synthetic rule.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from . import text as tx

FEATURE_COLS = [
    "f_log_chars",
    "f_mean_word_len",
    "f_lex_diversity",
    "f_stopword_frac",
    "f_digit_frac",
]


def _features(text: Column) -> dict[str, Column]:
    n_tok = tx.token_count(text)
    # NULL text: size(split(NULL)) is -1 under the pinned legacy
    # sizeOfNull semantics, so (-1)/(-1) ratios would read as 1.0 and
    # the coalesce-to-0.0 in featurize would never fire. Clamp the
    # denominator to NULL for n_tok <= 0 so every ratio goes NULL ->
    # 0.0 for NULL text; non-NULL text always has n_tok >= 1 (split
    # yields at least one element), so trained weights are unchanged.
    n_tok_safe = F.nullif(F.greatest(n_tok, F.lit(0)), F.lit(0)).cast("double")
    n_sep = n_tok - F.lit(1)
    return {
        "f_log_chars": F.log1p(F.length(text).cast("double")),
        "f_mean_word_len": (F.length(text).cast("long") - n_sep).cast("double")
        / n_tok_safe,
        "f_lex_diversity": tx.unique_token_count(text).cast("double")
        / n_tok_safe,
        "f_stopword_frac": tx.marker_hits(text, tx.STOPWORDS).cast("double")
        / n_tok_safe,
        "f_digit_frac": (
            F.length(F.regexp_replace(text, r"[^0-9]", "")).cast("double")
            / F.greatest(F.length(text), F.lit(1)).cast("double")
        ),
    }


def featurize(df: DataFrame, text_col: str) -> DataFrame:
    """Append the fixed lexical feature columns (doubles, NULL-safe)."""
    feats = _features(F.col(text_col))
    out = df
    for name in FEATURE_COLS:
        out = out.withColumn(name, F.coalesce(feats[name], F.lit(0.0)))
    return out


def train_logreg(
    df: DataFrame,
    label_col: str,
    id_col: str,
    *,
    sample_n: int = 2000,
    iters: int = 300,
    lr: float = 0.5,
    seed: int = 42,
) -> tuple[list[float], float]:
    """Fit logistic regression on a bounded driver sample; return
    (weights, bias) in RAW feature space (standardization folded in).

    ``df`` must already carry :data:`FEATURE_COLS` (see
    :func:`featurize`) and an integer 0/1 ``label_col``.  Full-batch
    gradient descent in float64 with a fixed iteration count — no
    stochasticity anywhere, so retraining is bit-reproducible.
    """
    rows = (
        df.select(label_col, *FEATURE_COLS)
        .where(F.col(label_col).isNotNull())
        .orderBy(F.xxhash64(F.col(id_col), F.lit(seed)), F.col(id_col))
        .limit(sample_n)
        .collect()
    )
    X = np.array([[r[c] for c in FEATURE_COLS] for r in rows], dtype=np.float64)
    y = np.array([float(r[label_col]) for r in rows], dtype=np.float64)
    mu = X.mean(axis=0)
    sd = X.std(axis=0)
    sd[sd == 0.0] = 1.0
    Xs = (X - mu) / sd
    w = np.zeros(X.shape[1], dtype=np.float64)
    b = 0.0
    n = float(len(y))
    for _ in range(iters):
        z = Xs @ w + b
        p = 1.0 / (1.0 + np.exp(-z))
        g = p - y
        w -= lr * (Xs.T @ g) / n
        b -= lr * float(g.sum()) / n
    # fold standardization into raw-space parameters:
    #   z = (x - mu)/sd @ w + b  ==  x @ (w/sd) + (b - mu/sd @ w)
    w_raw = w / sd
    b_raw = b - float((mu / sd) @ w)
    return [float(v) for v in w_raw], b_raw


def score(
    df: DataFrame, weights: list[float], bias: float, out_col: str = "score"
) -> DataFrame:
    """Sigmoid(w·x + b) as one JVM projection over the feature columns."""
    if len(weights) != len(FEATURE_COLS):
        raise ValueError(
            f"expected {len(FEATURE_COLS)} weights, got {len(weights)}"
        )
    z: Column = F.lit(bias)
    for c, w in zip(FEATURE_COLS, weights):
        z = z + F.col(c) * F.lit(w)
    s = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    return df.withColumn(out_col, s).withColumn(
        "predicted", (F.col(out_col) >= 0.5).cast("int")
    )
