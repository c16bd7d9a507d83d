WITH st AS (SELECT l_partkey,
                   sum(CAST(l_quantity AS DECIMAL(12,2))) AS sumq,
                   count(*) AS nq
            FROM lineitem GROUP BY 1)
SELECT p_brand, count(*) AS n_small,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))), 2)
            AS DOUBLE) AS small_revenue
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN st USING (l_partkey)
WHERE CAST(l_quantity AS DECIMAL(12,2)) * 5 * nq < sumq
GROUP BY p_brand ORDER BY p_brand