-- oracle for image_jpeg_resize: 32×16 two-region 4:2:0 JPEG → decode
-- → nearest resize to 16×8 (left 8 columns region 0, right region 1,
-- both still block-constant) → re-encode 4:4:4 → decode. At quality
-- 100 each encode/decode pair is exact on constant blocks, so the
-- pixel math is exactly TWO chained RGB→YCbCr→RGB transforms per
-- region color — the codec's scaled-integer formulas (see
-- image_jpeg_stats for why integer: .5-tie floats diverge across
-- engines), replayed below. Index sums: region (x0, 8 wide, 8 tall)
-- in a 16-wide image → npx 64, idxsum 64*x0 + 16*8*28 + 8*28.
WITH p AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
         unnest(generate_series(0, 1)) AS reg
  FROM embeddings),
c AS (
  SELECT vec_id, reg,
    greatest(0, least(255,
      CAST(round((emb[3*reg+1] + 1) * 127) AS BIGINT))) AS r,
    greatest(0, least(255,
      CAST(round((emb[3*reg+2] + 1) * 127) AS BIGINT))) AS g,
    greatest(0, least(255,
      CAST(round((emb[3*reg+3] + 1) * 127) AS BIGINT))) AS b
  FROM p),
t1 AS (
  SELECT vec_id, reg,
    greatest(0, least(255,
      (299*r + 587*g + 114*b + 500) // 1000)) AS yy,
    greatest(0, least(255, 128 +
      (-168735892*r - 331264108*g + 500000000*b + 500000000)
        // 1000000000)) AS cb,
    greatest(0, least(255, 128 +
      (500000000*r - 418687589*g - 81312411*b + 500000000)
        // 1000000000)) AS cr
  FROM c),
rt1 AS (
  SELECT vec_id, reg,
    greatest(0, least(255,
      yy + (1402*(cr - 128) + 500) // 1000)) AS r,
    greatest(0, least(255,
      yy + (-344136*(cb - 128) - 714136*(cr - 128) + 500000)
        // 1000000)) AS g,
    greatest(0, least(255,
      yy + (1772*(cb - 128) + 500) // 1000)) AS b
  FROM t1),
t2 AS (
  SELECT vec_id, reg,
    greatest(0, least(255,
      (299*r + 587*g + 114*b + 500) // 1000)) AS yy,
    greatest(0, least(255, 128 +
      (-168735892*r - 331264108*g + 500000000*b + 500000000)
        // 1000000000)) AS cb,
    greatest(0, least(255, 128 +
      (500000000*r - 418687589*g - 81312411*b + 500000000)
        // 1000000000)) AS cr
  FROM rt1),
rt2 AS (
  SELECT vec_id, reg,
    greatest(0, least(255,
      yy + (1402*(cr - 128) + 500) // 1000)) AS r2,
    greatest(0, least(255,
      yy + (-344136*(cb - 128) - 714136*(cr - 128) + 500000)
        // 1000000)) AS g2,
    greatest(0, least(255,
      yy + (1772*(cb - 128) + 500) // 1000)) AS b2
  FROM t2),
l AS (
  SELECT vec_id, reg, (299*r2 + 587*g2 + 114*b2) // 1000 AS luma,
         8*reg AS x0
  FROM rt2)
SELECT vec_id,
       CAST(128 AS INT) AS n_px,
       CAST(sum(64 * luma) AS BIGINT) AS luma_sum,
       CAST(min(luma) AS BIGINT) AS luma_min,
       CAST(max(luma) AS BIGINT) AS luma_max,
       CAST(sum((64*x0 + 16*8*28 + 8*28) * luma) AS BIGINT) AS pos_luma
FROM l GROUP BY vec_id ORDER BY vec_id
