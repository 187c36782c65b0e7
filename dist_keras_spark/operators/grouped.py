"""Grouped-map and UDTF surface (SURVEY.md §2.L).

`zscore_per_group`: the canonical applyInPandas grouped-map — per-group
normalization where the group fits in one Arrow batch. The reference
had no grouped compute at all (its per-partition training loops are
the closest analogue).

`TokenExplode`: a Python UDTF (Spark 4) exploding text into token
rows — the UDTF row in the §2.L surface table; prefer the built-in
explode(split()) in plans (JVM-side), the UDTF exists for
arbitrary-Python tokenizers (BPE etc.).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.functions import udtf


def zscore_per_group(
    df: DataFrame, group_col: str, value_col: str, output_col: str = "zscore"
) -> DataFrame:
    """(x - mean_group) / stddev_group via applyInPandas; ddof=1 to
    match SQL stddev_samp. Groups with a single row emit NULL."""
    out_schema = f"{group_col} string, {value_col} double, {output_col} double"

    def norm(pdf: pd.DataFrame) -> pd.DataFrame:
        sd = pdf[value_col].std(ddof=1)
        mean = pdf[value_col].mean()
        z = (pdf[value_col] - mean) / sd if sd and sd > 0 else pd.Series([None] * len(pdf))
        return pd.DataFrame(
            {
                group_col: pdf[group_col],
                value_col: pdf[value_col],
                output_col: z.round(6),
            }
        )

    return df.select(group_col, value_col).groupBy(group_col).applyInPandas(norm, out_schema)


@udtf(returnType="token string, pos int", useArrow=True)
class TokenExplode:
    """text → one row per token with its position (Python UDTF).

    Arrow-optimized (`useArrow=True`): the plan node is
    ArrowEvalPythonUDTF — batched Arrow transfer instead of pickled
    row-at-a-time BatchEvalPythonUDTF, the same ~10-100× rule that
    applies to scalar UDFs (the global plan-hygiene test bans
    BatchEvalPython engine-wide)."""

    def eval(self, text: str):  # noqa: D102
        for i, t in enumerate((text or "").split(" ")):
            yield t, i
