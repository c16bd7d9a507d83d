SELECT l_returnflag,
       round(var_samp(l_quantity), 4) AS qty_var,
       round(stddev_samp(l_extendedprice), 2) AS price_stddev,
       round(covar_samp(l_quantity, l_extendedprice), 2) AS qty_price_covar,
       round(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag