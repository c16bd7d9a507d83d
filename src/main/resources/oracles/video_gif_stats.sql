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
cells AS (
  SELECT v.vec_id, f.f, g.pos, g.pos//8 AS rr, g.pos%8 AS cc
  FROM (SELECT DISTINCT vec_id FROM embeddings) v
  CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS f) f
  CROSS JOIN (SELECT unnest(generate_series(0, 31)) AS pos) g),
kx AS (
  SELECT vec_id, f, pos,
    CASE
      WHEN f = 0 THEN 4*rr + cc//2
      WHEN f = 1 THEN
        CASE WHEN rr BETWEEN 1 AND 2 AND cc BETWEEN 2 AND 5
             THEN (4*rr + cc - 1) % 16 ELSE 4*rr + cc//2 END
      WHEN f = 2 THEN
        CASE WHEN rr >= 2 THEN
               CASE WHEN (8*rr - 16 + cc) % 3 = 0 THEN
                      CASE WHEN rr = 2 AND cc BETWEEN 2 AND 5
                           THEN NULL ELSE 4*rr + cc//2 END
                    ELSE (2*(8*rr - 16 + cc) + 1) % 16 END
             WHEN rr = 1 AND cc BETWEEN 2 AND 5 THEN NULL
             ELSE 4*rr + cc//2 END
      ELSE
        CASE WHEN rr <= 1 AND cc IN (5, 6)
               THEN (3*(2*rr + cc - 5) + 2) % 16
             WHEN rr >= 2 THEN
               CASE WHEN (8*rr - 16 + cc) % 3 = 0 THEN
                      CASE WHEN rr = 2 AND cc BETWEEN 2 AND 5
                           THEN NULL ELSE 4*rr + cc//2 END
                    ELSE (2*(8*rr - 16 + cc) + 1) % 16 END
             WHEN rr = 1 AND cc BETWEEN 2 AND 5 THEN NULL
             ELSE 4*rr + cc//2 END
    END AS k
  FROM cells),
lum AS (
  SELECT kx.vec_id, kx.f, kx.pos, coalesce(bl.luma, 0) AS luma
  FROM kx LEFT JOIN bl
    ON bl.vec_id = kx.vec_id AND bl.k = kx.k)
SELECT vec_id, CAST(f AS INT) AS frame,
       CAST(8 AS INT) AS width, CAST(4 AS INT) AS height,
       CAST(4 AS INT) AS n_frames,
       CAST(sum(luma) AS BIGINT) AS luma_sum,
       CAST(min(luma) AS BIGINT) AS luma_min,
       CAST(max(luma) AS BIGINT) AS luma_max,
       CAST(sum(luma * (pos + 1)) AS BIGINT) AS pos_luma
FROM lum GROUP BY vec_id, f ORDER BY vec_id, frame