SELECT p_brand, p_partkey, p_size,
       rank() OVER wt AS rnk,
       dense_rank() OVER wt AS drnk,
       round(percent_rank() OVER wt, 6) AS prnk,
       round(cume_dist() OVER wt, 6) AS cdist,
       ntile(4) OVER wu AS price_quartile,
       first_value(p_partkey) OVER wu AS top_part
FROM part
WINDOW wt AS (PARTITION BY p_brand ORDER BY p_size),
       wu AS (PARTITION BY p_brand
              ORDER BY p_retailprice DESC, p_partkey)
ORDER BY p_partkey