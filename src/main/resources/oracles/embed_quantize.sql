WITH t AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS dv FROM embeddings),
s AS (SELECT vec_id, dv,
             greatest(list_max(dv), -list_min(dv)) / 127.0 AS scale
      FROM t),
q AS (SELECT vec_id, dv, scale,
             [CAST(CASE WHEN scale > 0
                        THEN least(greatest(floor(x / scale + 0.5), -127.0), 127.0)
                        ELSE 0.0 END AS INT) for x in dv] AS qvec,
             [CASE WHEN scale > 0
                   THEN least(greatest(floor(x / scale + 0.5), -127.0), 127.0)
                   ELSE 0.0 END for x in dv] AS qd
      FROM s),
e AS (SELECT vec_id, len(dv) AS dim, scale, qvec,
             CASE WHEN len(dv) > 0 THEN
               list_reduce([(dv[i] - qd[i] * scale) * (dv[i] - qd[i] * scale)
                            for i in range(1, len(dv) + 1)],
                           (a, v) -> a + v) / len(dv)
             ELSE 0.0 END AS mse_raw
      FROM q)
SELECT vec_id, dim, round(scale, 6) AS q_scale,
       array_to_string(qvec, ',') AS qvec,
       round(mse_raw, 9) AS mse
FROM e ORDER BY vec_id