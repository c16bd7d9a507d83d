SELECT 'month=' || month AS "partition"
FROM (SELECT DISTINCT strftime(CAST(o_orderdate AS DATE), '%Y-%m')
               AS month
      FROM orders
      WHERE strftime(CAST(o_orderdate AS DATE), '%Y-%m')
              BETWEEN '1995-01' AND '1995-03'
        AND o_orderkey % 4 < 2)
ORDER BY 1