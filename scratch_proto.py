"""Scratch oracle prototyping (deleted before commit)."""
import duckdb

con = duckdb.connect()
con.sql("create view documents as select * from read_parquet('/root/testdata/sf0.01/documents.parquet')")

fd = lambda a, b: f"((({a}) - ((({a}) % ({b})) + ({b})) % ({b})) // ({b}))"

q = f"""
WITH d AS (
  SELECT source,
         len(regexp_extract_all(upper(text), '[A-Z][A-Z'']*'))::BIGINT AS w,
         greatest(len(regexp_extract_all(text, '[.!?]+')), 1)::BIGINT AS s,
         len(regexp_extract_all(upper(text), '[AEIOUY]+'))::BIGINT AS y
  FROM documents
),
f AS (
  SELECT source,
         206835 - (1015 * w) // s - (84600 * y) // greatest(w, 1) AS fre
  FROM d
)
SELECT source,
       count(*)::BIGINT AS n_docs,
       {fd('sum(fre) * 1', 'count(*)')}::BIGINT AS mean_fre_milli,
       count(*) FILTER (WHERE fre >= 60000)::BIGINT AS n_easy,
       (count(*) FILTER (WHERE fre >= 60000) * 1000 // count(*))::BIGINT AS easy_pm
FROM f GROUP BY source ORDER BY source
"""
print(con.sql(q).df().head(6))
