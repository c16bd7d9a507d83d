WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
           FROM embeddings WHERE vec_id % 20 = 0),
c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv
      FROM embeddings),
s AS (SELECT query_id, neighbor_id,
             list_cosine_similarity(cv, qv) AS sim
      FROM c, q WHERE neighbor_id != query_id),
r AS (SELECT query_id, neighbor_id, sim,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY sim DESC, neighbor_id) AS rank
      FROM s)
SELECT query_id, neighbor_id, rank, round(sim, 4) AS sim
FROM r WHERE rank <= 5 ORDER BY query_id, rank