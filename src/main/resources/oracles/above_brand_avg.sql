WITH x AS (
  SELECT p_brand, p_retailprice,
         count(*) OVER (PARTITION BY p_brand) AS n,
         sum(CAST(p_retailprice AS DECIMAL(18,2)))
           OVER (PARTITION BY p_brand) AS s
  FROM part)
SELECT p_brand, count(*) AS n_above,
       round(max(p_retailprice), 2) AS max_price
FROM x
WHERE CAST(p_retailprice AS DECIMAL(18,2)) * n > s
GROUP BY p_brand ORDER BY p_brand