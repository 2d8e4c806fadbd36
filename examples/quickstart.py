"""Quickstart: the reference README's walkthrough, TPU-native.

Mirrors /root/reference/README.md:10-76 — build a table of vectors,
create an HNSW index, run accelerated top-k queries, persist, reopen.
"""
import numpy as np

from vss_tpu import Database

db = Database()

# the reference README's 3-d grid table
db.sql("CREATE TABLE my_vector_table (vec FLOAT[3])")
grid = np.stack(
    np.meshgrid(np.arange(10), np.arange(10), np.arange(10), indexing="ij"), -1
).reshape(-1, 3).astype(np.float32)
db.insert("my_vector_table", {"vec": grid})

db.sql("CREATE INDEX my_hnsw_index ON my_vector_table USING HNSW (vec)")

res = db.sql(
    "SELECT * FROM my_vector_table "
    "ORDER BY array_distance(vec, [1.0, 2.0, 3.0]) LIMIT 3"
)
print("top-3 rows near [1,2,3]:")
for v in res["vec"]:
    print(" ", v)

print()
print(db.sql(
    "EXPLAIN SELECT * FROM my_vector_table "
    "ORDER BY array_distance(vec, [1.0, 2.0, 3.0]) LIMIT 3"
)["explain"][0])

# cosine / inner product metrics with their operators
db.sql("CREATE INDEX idx_cos ON my_vector_table USING HNSW (vec) "
       "WITH (metric = 'cosine')")
res = db.sql("SELECT * FROM my_vector_table "
             "ORDER BY vec <=> [1.0, 2.0, 3.0] LIMIT 3")
print("\ncosine top-3:", [list(v) for v in res["vec"]])

# persistence
db.sql("SET hnsw_enable_experimental_persistence = TRUE")
db.checkpoint("/tmp/quickstart.vssdb")
db2 = Database.open("/tmp/quickstart.vssdb")
print("\nreopened:", db2.sql("SELECT count(*) FROM my_vector_table")["count"][0], "rows")
