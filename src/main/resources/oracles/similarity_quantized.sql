WITH t AS (SELECT vec_id, embedding::DOUBLE[] AS dv FROM embeddings),
s AS (SELECT vec_id, dv,
             greatest(list_max(dv), -list_min(dv)) / 127.0 AS scale
      FROM t),
z AS (SELECT vec_id, dv, scale,
             [CASE WHEN scale > 0
                   THEN least(greatest(floor(x / scale + 0.5), -127.0), 127.0)
                   ELSE 0.0 END for x in dv] AS qd
      FROM s),
c AS (SELECT vec_id AS neighbor_id, dv AS cv, scale AS cs, qd AS cq FROM z),
q AS (SELECT vec_id AS query_id, dv AS qv, scale AS qs, qd AS qq
      FROM z WHERE vec_id % 20 = 0),
a AS (SELECT query_id, neighbor_id, cv, qv,
             cs * qs * list_dot_product(cq, qq) AS approx
      FROM c, q WHERE neighbor_id != query_id),
sh AS (SELECT query_id, neighbor_id, cv, qv,
              row_number() OVER (PARTITION BY query_id
                                 ORDER BY approx DESC, neighbor_id) AS ar
       FROM a),
e AS (SELECT query_id, neighbor_id,
             list_cosine_similarity(cv, qv) AS sim
      FROM sh WHERE ar <= 20),
r AS (SELECT query_id, neighbor_id, sim,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY sim DESC, neighbor_id) AS rank
      FROM e)
SELECT query_id, neighbor_id, rank, round(sim, 4) AS sim
FROM r WHERE rank <= 5 ORDER BY query_id, rank