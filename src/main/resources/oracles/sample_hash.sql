SELECT l_returnflag, count(*) AS n_rows,
       round(sum(l_quantity), 2) AS qty_sum
FROM lineitem
WHERE substr(md5(l_orderkey || ':' || l_linenumber), 1, 1) IN ('0', '1')
GROUP BY l_returnflag ORDER BY l_returnflag