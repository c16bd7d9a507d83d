SELECT l_returnflag,
       CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n_pairs,
       round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
       round(regr_intercept(l_extendedprice, l_quantity), 2) AS intercept,
       round(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
       round(regr_avgx(l_extendedprice, l_quantity), 4) AS avg_qty
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag