"""Per-group embedding diagnostics that genuinely need linear algebra
(spectral quantities have no DataFrame-builtin or ANSI-SQL form, so
this is the honest ``applyInPandas`` tier — Arrow-batched grouped
pandas, never row-at-a-time Python).

Use case: embedding-collapse detection per label/cluster/source — a
healthy embedding group has variance spread over many directions
(high effective rank); a collapsed one concentrates it in few.

Memory contract (same class as the dim-grain surrogate window): each
GROUP must fit in one executor's memory — n_g × dim doubles plus the
dim × dim covariance. Intended for bounded groups (labels, clusters,
sources), not per-corpus calls. For unbounded groups, compute the
covariance distributedly first (sum of outer products is an algebraic
aggregate: dim² partial per task) and eigendecompose the dim × dim
result on the driver — same output, one extra shuffle; not needed for
the bounded-group use this module targets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def group_covariance_spectrum(df: DataFrame, vec_col: str,
                              group_col: str) -> DataFrame:
    """Per ``group_col``: n, covariance trace, top eigenvalue, and
    effective rank (exp of the eigenvalue-distribution entropy) of the
    population covariance of ``vec_col``.

    Output: ``(group_col, n, trace, top_eig, effective_rank)``,
    one row per group.
    """
    import numpy as np
    import pandas as pd

    group_type = dict(df.dtypes)[group_col]
    schema = (f"{group_col} {group_type}, n bigint, trace double, "
              f"top_eig double, effective_rank double")

    def spectrum(pdf: pd.DataFrame) -> pd.DataFrame:
        X = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
        n = len(X)
        if n < 2:
            # a single point has zero covariance in every direction
            tr = top = 0.0
            erank = 0.0
        else:
            cov = np.cov(X, rowvar=False, bias=True)
            eig = np.clip(np.linalg.eigvalsh(cov), 0.0, None)
            tr = float(eig.sum())
            top = float(eig.max())
            if tr > 0.0:
                p = eig[eig > 0.0] / tr
                erank = float(np.exp(-(p * np.log(p)).sum()))
            else:
                erank = 0.0
        return pd.DataFrame({
            group_col: [pdf[group_col].iloc[0]],
            "n": [n], "trace": [tr], "top_eig": [top],
            "effective_rank": [erank],
        })

    return df.groupBy(group_col).applyInPandas(spectrum, schema)
