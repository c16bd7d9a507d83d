WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS dv FROM embeddings),
n AS (SELECT vec_id, dv, sqrt(list_dot_product(dv, dv)) AS nm FROM v),
cents AS (SELECT vec_id AS cent_id, dv AS ev, nm AS en
          FROM n WHERE vec_id % 20 = 0),
assigned AS (
  SELECT neighbor_id, cv, cn, cent_id FROM (
    SELECT a.vec_id AS neighbor_id, a.dv AS cv, a.nm AS cn, c.cent_id,
           row_number() OVER (PARTITION BY a.vec_id
             ORDER BY list_dot_product(a.dv, c.ev) / (a.nm * c.en) DESC,
                      c.cent_id) AS rn
    FROM n a, cents c) WHERE rn = 1),
probes AS (
  SELECT query_id, qv, qn, cent_id FROM (
    SELECT q.vec_id AS query_id, q.dv AS qv, q.nm AS qn, c.cent_id,
           row_number() OVER (PARTITION BY q.vec_id
             ORDER BY list_dot_product(q.dv, c.ev) / (q.nm * c.en) DESC,
                      c.cent_id) AS rn
    FROM n q, cents c WHERE q.vec_id % 20 = 0) WHERE rn <= 8),
scored AS (
  SELECT p.query_id, a.neighbor_id,
         list_dot_product(a.cv, p.qv) / (a.cn * p.qn) AS sim
  FROM probes p JOIN assigned a ON a.cent_id = p.cent_id
  WHERE a.neighbor_id <> p.query_id),
r AS (SELECT query_id, neighbor_id, sim,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY sim DESC, neighbor_id) AS rank
      FROM scored)
SELECT query_id, neighbor_id, rank, round(sim, 4) AS sim
FROM r WHERE rank <= 5 ORDER BY query_id, rank