SELECT bucket,
       CAST(round(0 + bucket * 5000.0, 4) AS DOUBLE) AS lo_edge,
       CAST(round(0 + (bucket + 1) * 5000.0, 4) AS DOUBLE) AS hi_edge,
       count(*) AS n_rows
FROM (SELECT CAST(least(greatest(floor((l_extendedprice - 0) / 5000.0), 0), 21) AS BIGINT) AS bucket
      FROM lineitem WHERE l_extendedprice IS NOT NULL)
GROUP BY bucket ORDER BY bucket