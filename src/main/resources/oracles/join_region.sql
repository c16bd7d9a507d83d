SELECT r_name, count(DISTINCT n_nationkey) AS n_nations,
       count(s_suppkey) AS n_suppliers
FROM nation
JOIN region ON n_regionkey = r_regionkey
LEFT JOIN supplier ON s_nationkey = n_nationkey
GROUP BY r_name ORDER BY r_name