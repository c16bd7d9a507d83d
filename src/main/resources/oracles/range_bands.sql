WITH bands AS (
  SELECT p_partkey AS band_id,
         p_retailprice * 10 AS lo,
         p_retailprice * 10 + 2000 AS hi
  FROM part WHERE p_partkey % 20 = 0)
SELECT band_id, count(*) AS n_points
FROM bands b JOIN lineitem l
  ON l.l_extendedprice BETWEEN b.lo AND b.hi
GROUP BY band_id ORDER BY band_id