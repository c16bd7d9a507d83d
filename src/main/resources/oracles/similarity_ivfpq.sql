-- oracle for similarity_ivfpq: full SQL replay of the IVF-PQ index —
-- stride-sampled coarse centroids (vec_id % 20), residuals, a
-- stride-sampled codebook (vec_id % 17, entry index = ascending id),
-- EXACT-INTEGER code assignment over floor(x*10000 + 0.5)-scaled
-- residuals (products <= ~4e10 are exact in DuckDB's double folds, so
-- the argmin can never drift from the Spark kernel), reconstruction
-- with the exact double codebook values, asymmetric-cosine shortlist
-- of 20 over 8 probed cells, exact rerank to top-5.
-- Constants: dim 64, m 8, dsub 8.
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS dv FROM embeddings),
n AS (SELECT vec_id, dv, sqrt(list_dot_product(dv, dv)) AS nm FROM v),
cents AS (SELECT vec_id AS cent_id, dv AS ev, nm AS en
          FROM n WHERE vec_id % 20 = 0),
assigned AS (
  SELECT neighbor_id, cv, cn, cent_id, ev FROM (
    SELECT a.vec_id AS neighbor_id, a.dv AS cv, a.nm AS cn,
           c.cent_id, c.ev,
           row_number() OVER (PARTITION BY a.vec_id
             ORDER BY list_dot_product(a.dv, c.ev) / (a.nm * c.en) DESC,
                      c.cent_id) AS rn
    FROM n a, cents c) WHERE rn = 1),
resid AS (
  SELECT neighbor_id, cn, cent_id, ev,
         list_transform(range(1, 65), i -> cv[i] - ev[i]) AS res
  FROM assigned),
scaled AS (
  SELECT neighbor_id, cn, cent_id, ev, res,
         list_transform(res,
           x -> CAST(floor(x * 10000 + 0.5) AS BIGINT)) AS ri
  FROM resid),
cb AS (
  SELECT row_number() OVER (ORDER BY neighbor_id) - 1 AS e, res AS cres,
         list_transform(res,
           x -> CAST(floor(x * 10000 + 0.5) AS BIGINT)) AS ci
  FROM resid WHERE neighbor_id % 17 = 0),
js AS (SELECT CAST(j AS INTEGER) AS j FROM generate_series(0, 7) t(j)),
dists AS (
  SELECT s.neighbor_id, js.j, cb.e,
         list_dot_product(
           list_transform(range(1, 9), t -> s.ri[js.j * 8 + t]
                                            - cb.ci[js.j * 8 + t]),
           list_transform(range(1, 9), t -> s.ri[js.j * 8 + t]
                                            - cb.ci[js.j * 8 + t])) AS dist
  FROM scaled s, js, cb),
codes AS (
  SELECT neighbor_id, j, e AS code FROM (
    SELECT neighbor_id, j, e,
           row_number() OVER (PARTITION BY neighbor_id, j
                              ORDER BY dist, e) AS rn
    FROM dists) WHERE rn = 1),
dec AS (
  SELECT neighbor_id, flatten(list(sub ORDER BY j)) AS add_vec
  FROM (
    SELECT codes.neighbor_id, codes.j,
           list_transform(range(1, 9),
             t -> cb.cres[codes.j * 8 + t]) AS sub
    FROM codes JOIN cb ON cb.e = codes.code)
  GROUP BY neighbor_id),
approxv AS (
  SELECT s.neighbor_id, s.cn, s.cent_id,
         list_transform(range(1, 65), i -> s.ev[i] + d.add_vec[i]) AS adv
  FROM scaled s JOIN dec d USING (neighbor_id)),
probes AS (
  SELECT query_id, qv, qn, cent_id FROM (
    SELECT q.vec_id AS query_id, q.dv AS qv, q.nm AS qn, c.cent_id,
           row_number() OVER (PARTITION BY q.vec_id
             ORDER BY list_dot_product(q.dv, c.ev) / (q.nm * c.en) DESC,
                      c.cent_id) AS rn
    FROM n q, cents c WHERE q.vec_id % 20 = 0) WHERE rn <= 8),
short AS (
  SELECT query_id, qv, qn, neighbor_id FROM (
    SELECT p.query_id, p.qv, p.qn, a.neighbor_id,
           row_number() OVER (PARTITION BY p.query_id
             ORDER BY list_dot_product(a.adv, p.qv) / (a.cn * p.qn) DESC,
                      a.neighbor_id) AS ar
    FROM probes p JOIN approxv a ON a.cent_id = p.cent_id
    WHERE a.neighbor_id <> p.query_id) WHERE ar <= 20),
r AS (
  SELECT s.query_id, s.neighbor_id,
         list_dot_product(c.dv, s.qv) / (c.nm * s.qn) AS sim
  FROM short s JOIN n c ON c.vec_id = s.neighbor_id),
ranked AS (
  SELECT query_id, neighbor_id, sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY sim DESC, neighbor_id) AS rank
  FROM r)
SELECT query_id, neighbor_id, rank, round(sim, 4) AS sim
FROM ranked WHERE rank <= 5 ORDER BY query_id, rank
