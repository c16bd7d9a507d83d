WITH p AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
         unnest(generate_series(0, 15)) AS pos
  FROM embeddings),
c AS (
  SELECT vec_id, pos,
    greatest(0, least(255,
      CAST(round((emb[3*pos+1] + 1) * 127) AS BIGINT))) AS r,
    greatest(0, least(255,
      CAST(round((emb[3*pos+2] + 1) * 127) AS BIGINT))) AS g,
    greatest(0, least(255,
      CAST(round((emb[3*pos+3] + 1) * 127) AS BIGINT))) AS b
  FROM p),
l AS (SELECT vec_id, pos - 4*(pos//8) AS pos2,
             (299*r + 587*g + 114*b) // 1000 AS luma
      FROM c WHERE pos IN (0,1,2,3,8,9,10,11))
SELECT vec_id, CAST(8 AS INT) AS n_px,
       CAST(sum(luma) AS BIGINT) AS luma_sum,
       CAST(min(luma) AS BIGINT) AS luma_min,
       CAST(max(luma) AS BIGINT) AS luma_max,
       CAST(sum(pos2 * luma) AS BIGINT) AS pos_luma
FROM l GROUP BY vec_id ORDER BY vec_id