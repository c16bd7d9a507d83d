WITH sv AS (
  SELECT user_id,
         greatest(-32767, least(32767,
           CAST(round(value * 10) AS BIGINT))) AS s
  FROM events)
SELECT user_id,
       count(*) AS n_samples,
       CAST(16000 AS INT) AS sample_rate,
       CAST(max(abs(s)) AS BIGINT) AS peak,
       CAST(sum(s * s) AS BIGINT) AS energy
FROM sv GROUP BY user_id ORDER BY user_id