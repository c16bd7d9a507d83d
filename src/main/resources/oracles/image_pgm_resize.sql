WITH src AS (
  SELECT vec_id,
         [greatest(0, least(255, CAST(round((x + 1) * 127) AS INT)))
          for x in CAST(embedding AS DOUBLE[])] AS px
  FROM embeddings),
small AS (
  SELECT vec_id,
         [px[i] for i in [1,3,5,7,17,19,21,23,33,35,37,39,49,51,53,55]] AS sp
  FROM src)
SELECT vec_id,
       CAST(len(sp) AS INT) AS n_px,
       CAST(list_aggregate(sp, 'sum') AS BIGINT) AS px_sum,
       CAST(list_aggregate(sp, 'min') AS INT) AS px_min,
       CAST(list_aggregate(sp, 'max') AS INT) AS px_max
FROM small ORDER BY vec_id