"""Vector math on ``array<float>`` columns, JVM-side.

Embedding arithmetic stays inside Catalyst via higher-order functions
(``zip_with`` + ``aggregate``) — no Python in the per-row path. For large
batched scoring the pandas-UDF route in operators/similarity.py is used
instead (numpy matmul over Arrow batches).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: Column | str, b: Column | str) -> Column:
    return F.aggregate(
        F.zip_with(_c(a), _c(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(F.aggregate(_c(a), F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_sim(a: Column | str, b: Column | str) -> Column:
    """NULL (not NaN) when either vector has zero norm: NULLs sort LAST
    under every desc rank window AND match DuckDB, whose division by zero
    yields NULL — so the exact two-phase top-k reductions (pandas
    na_position='last', array_sort) and the final F.desc windows agree on
    zero-norm rows instead of inverting their order."""
    na, nb = l2_norm(a), l2_norm(b)
    return F.when((na > 0) & (nb > 0), dot(a, b) / (na * nb))


def hash_embedding(col: Column | str, dim: int = 16, n_gram: int = 3) -> Column:
    """Deterministic bag-of-shingles embedding: component d = Σ over the
    string's distinct character n-grams of an md5-derived pseudo-random
    value in [-1, 1) (same primitive as operators/similarity.plane_component,
    seeded by (d, shingle)). Strings sharing shingles get correlated
    vectors — a pure-function analog of the reference's mention encoder
    (reference: latest/model/coref.py:40-70) with the determinism rule
    SURVEY.md §7.3 demands, computable identically in DuckDB SQL."""
    from character_identification_spark.operators.blocking import char_shingles

    sh = char_shingles(col, n_gram)

    def comp(d: int) -> Column:
        return F.aggregate(
            F.transform(
                sh,
                lambda s: (
                    F.conv(
                        F.substring(
                            F.md5(F.concat_ws("|", F.lit(str(d)), s)), 1, 15
                        ),
                        16,
                        10,
                    ).cast("long")
                    / F.lit(float(2**59))
                )
                - 1.0,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    return F.array(*[comp(d) for d in range(dim)])
