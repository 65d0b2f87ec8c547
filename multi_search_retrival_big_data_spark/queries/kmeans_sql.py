"""DuckDB CTE mirrors of the deterministic Lloyd trainer
(operators/kmeans.py). Because every training step is engine-portable
(sequential-fold distances, (dist, cid) tiebreaks, quantized
DECIMAL(38,0) means), the oracle can re-derive the SAME centroids from
the raw corpus — so queries over Lloyd-TRAINED quantizers remain full
hash-match oracle rows, not weaker rows-only checks.

Naming: `kem` is the shared (vec_id, v DOUBLE[]) corpus CTE; IVF
chains are c{t} → a{t} → s{t} → m{t} → c{t+1}; PQ chains are per
sub-space pcb{m}_{t} → pa{m}_{t} → ps{m}_{t} → pm{m}_{t} →
pcb{m}_{t+1}.
"""

from __future__ import annotations

from multi_search_retrival_big_data_spark.queries.common import sql_dsum

KEM_CTE = "kem AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)"


def ivf_lloyd_ctes(stride: int, dim: int, iters: int, sum_scale: int = 9) -> tuple[str, str]:
    """Returns (cte_sql, final_centroid_cte_name). Requires KEM_CTE in
    scope. Mirrors kmeans.train_lloyd over kmeans.stride_init."""
    parts = [
        f"c0 AS (SELECT vec_id AS cid, v AS cv FROM kem WHERE vec_id % {stride} = 0)"
    ]
    for t in range(iters):
        parts.append(
            f"""a{t} AS (
      SELECT vec_id, cid FROM (
        SELECT e.vec_id, c.cid,
               row_number() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY list_distance(e.v, c.cv) ASC, c.cid ASC
               ) AS rn
        FROM kem e CROSS JOIN c{t} c
      ) WHERE rn = 1
    )"""
        )
        parts.append(
            f"""s{t} AS (
      SELECT a.cid, CAST(t.i AS INT) AS dim,
             {sql_dsum("e.v[CAST(t.i AS INT)]", sum_scale)} AS s,
             count(*) AS n
      FROM a{t} a JOIN kem e USING (vec_id), unnest(range(1, {dim + 1})) AS t(i)
      GROUP BY a.cid, t.i
    )"""
        )
        parts.append(
            f"m{t} AS (SELECT cid, list(s / n ORDER BY dim) AS cv FROM s{t} GROUP BY cid)"
        )
        # the final round's centroids are referenced repeatedly by the
        # consumer (probe + assignment + grid arms) — MATERIALIZED stops
        # DuckDB from re-running the whole training chain per reference
        mat = " MATERIALIZED" if t + 1 == iters else ""
        parts.append(
            f"c{t + 1} AS{mat} (SELECT c.cid, COALESCE(m.cv, c.cv) AS cv "
            f"FROM c{t} c LEFT JOIN m{t} m USING (cid))"
        )
    return ",\n    ".join(parts), f"c{iters}"


def pq_lloyd_ctes(
    m: int,
    ks: int,
    stride: int,
    dim: int,
    iters: int,
    sum_scale: int = 9,
    src: str = "kem",
    vcol: str = "v",
    prefix: str = "p",
) -> tuple[str, list[str]]:
    """Returns (cte_sql, [final codebook CTE name per sub-space]).
    Mirrors kmeans.train_lloyd_pq over kmeans.pq_stride_init. `src` is
    the training-corpus CTE exposing (vec_id, `vcol`) — "kem" for raw
    vectors, or a residual CTE for IVF-PQ; `prefix` namespaces the CTE
    chain so two trainings can coexist in one query."""
    dsub = dim // m
    p = prefix
    parts = [
        f"""{p}train AS (
      SELECT CAST(vec_id // {stride} AS INT) AS code, {vcol} AS v
      FROM {src} WHERE vec_id % {stride} = 0 AND vec_id < {ks * stride}
    )"""
    ]
    finals = []
    for mi in range(m):
        lo, hi = mi * dsub + 1, (mi + 1) * dsub
        parts.append(
            f"{p}cb{mi}_0 AS (SELECT code, v[{lo}:{hi}] AS cv FROM {p}train)"
        )
        for t in range(iters):
            parts.append(
                f"""{p}a{mi}_{t} AS (
      SELECT vec_id, code FROM (
        SELECT e.vec_id, c.code,
               row_number() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY list_distance(e.{vcol}[{lo}:{hi}], c.cv) ASC, c.code ASC
               ) AS rn
        FROM {src} e CROSS JOIN {p}cb{mi}_{t} c
      ) WHERE rn = 1
    )"""
            )
            parts.append(
                f"""{p}s{mi}_{t} AS (
      SELECT a.code, CAST(t.i AS INT) AS dim,
             {sql_dsum(f"e.{vcol}[CAST({lo - 1} + t.i AS INT)]", sum_scale)} AS s,
             count(*) AS n
      FROM {p}a{mi}_{t} a JOIN {src} e USING (vec_id), unnest(range(1, {dsub + 1})) AS t(i)
      GROUP BY a.code, t.i
    )"""
            )
            parts.append(
                f"{p}m{mi}_{t} AS (SELECT code, list(s / n ORDER BY dim) AS cv "
                f"FROM {p}s{mi}_{t} GROUP BY code)"
            )
            # final codebooks are each read twice (encode + query LUT);
            # MATERIALIZED stops chain re-evaluation per reference
            mat = " MATERIALIZED" if t + 1 == iters else ""
            parts.append(
                f"{p}cb{mi}_{t + 1} AS{mat} (SELECT c.code, COALESCE(m.cv, c.cv) AS cv "
                f"FROM {p}cb{mi}_{t} c LEFT JOIN {p}m{mi}_{t} m USING (code))"
            )
        finals.append(f"{p}cb{mi}_{iters}")
    return ",\n    ".join(parts), finals
