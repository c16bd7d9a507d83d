WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS dv FROM embeddings),
p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             list_cosine_similarity(a.dv, b.dv) AS c
      FROM v a, v b WHERE a.vec_id < b.vec_id)
SELECT id_a, id_b, round(c, 4) AS cos
FROM p WHERE c >= 0.45 ORDER BY id_a, id_b