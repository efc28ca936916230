"""Arrow-vectorized Python extension point (pandas_udf demo).

The engine's hot paths are deliberately 100% JVM expressions (SURVEY
§2.7: "UDF/UDAF/UDTF surface — none in the reference; Spark engine
exposes pandas_udf/applyInPandas for extension ops"). This module is
the certified example of that extension surface: an Arrow-batched
``pandas_udf`` computing embedding L2 norms, oracle-checked against
DuckDB and mirrored by the pure-JVM formulation
(``similarity.with_norm``'s sequential ``F.aggregate`` fold).

Why this shape scales: Arrow transfers whole columnar batches to one
Python worker per core (no per-row pickling), numpy does the math in C,
and the UDF is a pure per-row projection — no shuffle, runs at scan
speed minus the serialization tax. That tax is why the REAL norm used
by the similarity operators stays JVM-side; a pandas_udf earns its keep
only when the logic can't be expressed in built-ins (model scoring,
tokenizers, decoders — the multimodal stubs).

Float determinism: numpy's dot uses pairwise/SIMD summation while
DuckDB's list_sum folds sequentially, so raw doubles can differ in the
last ulp; both sides round to 9dp, the repo-wide drift defense.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

from ..registry import register
from ..sources.tables import load_table


def _l2_norm_arrow():
    # Built lazily: decorating at module scope parses the return-type DDL,
    # which needs an active SparkContext — and the driver contract imports
    # this module before it creates the session (verify-skill gotcha).
    @pandas_udf(DoubleType())
    def fn(vecs: pd.Series) -> pd.Series:
        import numpy as np

        return vecs.map(lambda v: float(np.sqrt(np.dot(v, v))))

    return fn


# Oracle derivation for the Arrow-norm section folded into knn_methods
# (similarity.py); kept here beside the kernel it describes.
NORMS_ORACLE = """
        SELECT vec_id,
               round(sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))), 9)
                 AS l2_norm
        FROM embeddings
"""


def embedding_norms_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding L2 norms through the Arrow-batched pandas_udf
    extension point — the one deliberately-Python operator, proving
    the UDF surface end-to-end (Arrow batch transfer, numpy kernel,
    9dp cross-engine rounding). Pure projection: no shuffle, scan-
    speed minus the Arrow tax; the production norm stays in the JVM
    (similarity.with_norm) and a test pins both formulations equal.
    Registered as the `arrow_l2norm` section of knn_methods."""
    emb = load_table(spark, "embeddings", sf_dir)
    norm = _l2_norm_arrow()
    return emb.select(
        "vec_id",
        F.round(norm(F.col("embedding").cast("array<double>")), 9).alias("l2_norm"),
    )
