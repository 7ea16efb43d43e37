#!/usr/bin/env python3
"""Build a 3x-scaled corpus dir for the heavy-family oracle sweep.

The driver only generates sf0.001/0.01/0.1; candidate-set blowup and
ANSI-overflow margins in the dedup/ANN family (q28/q29/q45/q46/q60/q75/
q77) are data-dependent, so we probe them at ~3x the bench corpus.
documents and embeddings are tripled deterministically:

  - originals unchanged;
  - +1,000,000 clones with one appended token ("pad<id%7>") — genuine
    near-dups of their original (high Jaccard, tiny hamming delta), so
    the pair/candidate volume scales superlinearly, which is the stress;
  - +2,000,000 clones with the first token dropped and a distinct lang
    rotation — weaker similarity, exercises threshold boundaries.

Both engines read the SAME parquet, so generation needs no cross-engine
parity — only determinism. Other tables are copied from the source SF
so tools/check.py can register its full table set.

Usage: python3 tools/scale_corpus.py /root/testdata/sf0.1 /root/repo/target/testdata/sf0.3x

An optional third argument sets the clone id offset (default 1000000).
Chaining the transform with a larger offset builds a 9x corpus whose
tier-2 clones include clones OF tier-1 clones (clone chains — the pair
volume grows superlinearly again, which is the stress):

  python3 tools/scale_corpus.py /root/testdata/sf0.1 target/testdata/sf0.3x
  python3 tools/scale_corpus.py target/testdata/sf0.3x target/testdata/sf0.9x 10000000
"""
import os
import shutil
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main(src: str, dst: str, offset: int = 1000000) -> int:
    o = offset
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    con.sql(f"""
        COPY (
          SELECT * FROM '{src}/documents.parquet'
          UNION ALL
          SELECT doc_id + {o},
                 text || ' pad' || CAST(doc_id % 7 AS VARCHAR),
                 lang, source, n_chars + 5 AS n_chars
          FROM '{src}/documents.parquet'
          UNION ALL
          SELECT doc_id + 2 * {o},
                 array_to_string(string_split(text, ' ')[2:], ' '),
                 (['en','de','fr'])[CAST(doc_id % 3 AS INT) + 1],
                 source,
                 length(array_to_string(string_split(text, ' ')[2:], ' '))
          FROM '{src}/documents.parquet'
          ORDER BY doc_id
        ) TO '{dst}/documents.parquet' (FORMAT PARQUET)
    """)
    con.sql(f"""
        COPY (
          SELECT * FROM '{src}/embeddings.parquet'
          UNION ALL
          SELECT vec_id + {o},
                 list_transform(embedding, x -> CAST(x * 0.99609375 AS FLOAT)),
                 label
          FROM '{src}/embeddings.parquet'
          UNION ALL
          SELECT vec_id + 2 * {o},
                 list_transform(embedding, x -> CAST(-x AS FLOAT)),
                 label
          FROM '{src}/embeddings.parquet'
          ORDER BY vec_id
        ) TO '{dst}/embeddings.parquet' (FORMAT PARQUET)
    """)
    for t in TABLES:
        if t in ("documents", "embeddings"):
            continue
        shutil.copyfile(f"{src}/{t}.parquet", f"{dst}/{t}.parquet")
    n = duckdb.sql(f"SELECT count(*) FROM '{dst}/documents.parquet'").fetchone()[0]
    m = duckdb.sql(f"SELECT count(*) FROM '{dst}/embeddings.parquet'").fetchone()[0]
    print(f"scaled corpus at {dst}: {n} documents, {m} embeddings")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
              int(sys.argv[3]) if len(sys.argv) > 3 else 1000000))
