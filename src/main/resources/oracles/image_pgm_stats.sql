WITH px AS (
  SELECT vec_id,
         greatest(0, least(255,
           CAST(round((CAST(x AS DOUBLE) + 1) * 127) AS INT))) AS p
  FROM (SELECT vec_id, unnest(CAST(embedding AS DOUBLE[])) AS x
        FROM embeddings))
SELECT vec_id,
       CAST(8 AS INT) AS width, CAST(8 AS INT) AS height,
       CAST(255 AS INT) AS maxval,
       CAST(sum(p) AS BIGINT) AS px_sum,
       CAST(min(p) AS INT) AS px_min,
       CAST(max(p) AS INT) AS px_max,
       CAST(sum(p) AS BIGINT) * 10000 // 64 AS mean_bps
FROM px GROUP BY vec_id ORDER BY vec_id