WITH p AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
         unnest(generate_series(0, 15)) AS k
  FROM embeddings),
c AS (
  SELECT vec_id, k,
    greatest(0, least(255,
      CAST(round((emb[3*k+1] + 1) * 127) AS BIGINT))) AS r,
    greatest(0, least(255,
      CAST(round((emb[3*k+2] + 1) * 127) AS BIGINT))) AS g,
    greatest(0, least(255,
      CAST(round((emb[3*k+3] + 1) * 127) AS BIGINT))) AS b
  FROM p),
bl AS (SELECT vec_id, k,
              (299*r + 587*g + 114*b) // 1000 AS luma FROM c),
g AS (
  SELECT v.vec_id, sf.sf, q.pos
  FROM (SELECT DISTINCT vec_id FROM embeddings) v
  CROSS JOIN (SELECT unnest([0, 2]) AS sf) sf
  CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS pos) q),
kx AS (
  SELECT vec_id, sf, pos,
    CASE WHEN sf = 0 THEN 8*(pos//4) + pos%4
         WHEN pos < 4 THEN pos
         ELSE CASE pos WHEN 4 THEN 8 WHEN 5 THEN 5
                       WHEN 6 THEN 9 ELSE 11 END
    END AS k
  FROM g),
lum AS (
  SELECT kx.vec_id, kx.sf, kx.pos, bl.luma
  FROM kx JOIN bl ON bl.vec_id = kx.vec_id AND bl.k = kx.k)
SELECT vec_id, CAST(sf AS INT) AS src_frame,
       CAST(8 AS INT) AS n_px,
       CAST(sum(luma) AS BIGINT) AS luma_sum,
       CAST(min(luma) AS BIGINT) AS luma_min,
       CAST(max(luma) AS BIGINT) AS luma_max,
       CAST(sum(luma * (pos + 1)) AS BIGINT) AS pos_luma
FROM lum GROUP BY vec_id, sf ORDER BY vec_id, src_frame