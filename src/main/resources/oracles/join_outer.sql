SELECT l_returnflag, count(*) AS n_rows,
       count(p.p_partkey) AS n_matched,
       CAST(round(sum(CAST(coalesce(p.p_retailprice, 0)
                           AS DECIMAL(24,6))), 2) AS DOUBLE) AS price_sum
FROM lineitem l
LEFT JOIN (SELECT p_partkey, p_retailprice FROM part
           WHERE p_partkey % 5 = 0) p
  ON l.l_partkey = p.p_partkey
GROUP BY l_returnflag ORDER BY l_returnflag