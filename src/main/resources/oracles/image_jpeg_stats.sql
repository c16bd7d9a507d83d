-- oracle for image_jpeg_stats: JPEG is LOSSY, so unlike the seven
-- lossless codecs the fixture is built to make the decode ANALYTIC:
-- 16×16 constant color regions → every 4:2:0 MCU is constant → exact
-- round trip at quality 100 (DC-only transform, all-ones quantization)
-- → the only pixel math between source color and decoded color is the
-- codec's RGB→YCbCr→RGB transform, defined in SCALED-INTEGER
-- arithmetic precisely so this replay is engine-exact: the JFIF
-- constants sum to exact halves (0.168735892 + 0.331264108 = 0.5), so
-- r==g / g==b pixels land on .5 ties where float rounding diverges
-- between engines; `(num + half) // scale` truncates identically in
-- the JVM and DuckDB. Geometry: 64×24, a 4×2 grid of 16-wide regions,
-- bottom row cropped to 8 rows (the padded partial MCU).
WITH p AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
         unnest(generate_series(0, 7)) AS reg
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
rt AS (
  SELECT vec_id, reg,
    greatest(0, least(255,
      yy + (1402*(cr - 128) + 500) // 1000)) AS r2,
    greatest(0, least(255,
      yy + (-344136*(cb - 128) - 714136*(cr - 128) + 500000)
        // 1000000)) AS g2,
    greatest(0, least(255,
      yy + (1772*(cb - 128) + 500) // 1000)) AS b2
  FROM t1),
l AS (
  SELECT vec_id, reg, (299*r2 + 587*g2 + 114*b2) // 1000 AS luma,
         16*(reg % 4) AS x0, 16*(reg // 4) AS y0,
         16 AS nxp, CASE WHEN reg // 4 = 0 THEN 16 ELSE 8 END AS nyp
  FROM rt),
w AS (
  SELECT vec_id, luma, nxp*nyp AS npx,
         nxp*nyp*(64*y0 + x0) + 64*nxp*(nyp*(nyp-1)//2)
           + nyp*(nxp*(nxp-1)//2) AS idxsum
  FROM l)
SELECT vec_id,
       CAST(64 AS INT) AS width, CAST(24 AS INT) AS height,
       CAST(sum(npx * luma) AS BIGINT) AS luma_sum,
       CAST(min(luma) AS BIGINT) AS luma_min,
       CAST(max(luma) AS BIGINT) AS luma_max,
       CAST(sum(idxsum * luma) AS BIGINT) AS pos_luma
FROM w GROUP BY vec_id ORDER BY vec_id
