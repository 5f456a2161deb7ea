"""Per-group model fitting — the grouped-map applyInPandas pattern.

``fit_linear_per_group`` is the general shape for "fit a small model
per group" (per-language calibration curves, per-source quality
baselines): Spark groups and ships each group to a pandas function as
one Arrow batch; the model fits in-memory per group; only the (tiny)
coefficient rows come back.

Engine discipline: when the model has a closed form expressible in
aggregates (like this linear fit), the JVM-side exact version wins —
plans/llm_ops2.x04_group_regression computes the same coefficients
from integer-exact sums with no Python. This operator is the escape
hatch for models that DON'T reduce to aggregates (regularized /
iterative fits); tests pin that both paths agree to 1e-9 here.

Scale: one shuffle on the group key; each group must fit one
executor's memory — per-language/per-source groups do, per-user-style
high-cardinality small groups are even easier.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame


def fit_linear_per_group(
    df: DataFrame, group_col: str, x_col: str, y_col: str
) -> DataFrame:
    """(group, intercept, slope, n) — least-squares y ~ a + b·x per group."""

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        x = pdf[x_col].to_numpy(dtype=np.float64)
        y = pdf[y_col].to_numpy(dtype=np.float64)
        a = np.vstack([np.ones_like(x), x]).T
        (intercept, slope), *_ = np.linalg.lstsq(a, y, rcond=None)
        return pd.DataFrame(
            {
                group_col: [pdf[group_col].iloc[0]],
                "intercept": [float(intercept)],
                "slope": [float(slope)],
                "n": [len(pdf)],
            }
        )

    return df.groupBy(group_col).applyInPandas(
        fit, schema=f"{group_col} string, intercept double, slope double, n long"
    )
