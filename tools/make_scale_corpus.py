#!/usr/bin/env python3
"""Synthesize a K-times replica corpus from a testdata sf dir — the
scale-replay harness' data half (graft.ScaleReplay is the measuring
half). Facts are unioned K times with entity keys remapped by a
10^10 stride per replica so replicas never collide; the dims
(region/nation) and low-cardinality attributes (source, lang,
event_type, dates) are kept AS-IS, which is how real corpora grow —
more rows per group, not more groups.

Content columns are made DISJOINT across replicas — the subtle half
of corpus synthesis. A cheap one-token salt keeps replica copies
near-identical (Jaccard ~0.95, cosine ~0.99), so every dup cluster
becomes a K-times clique and every ANN bucket a K-times hot spot:
the replay would measure the quadratic growth of an artifact, not
the engine's scaling. Instead:
  - documents: every TOKEN gets a per-replica suffix — a bijective
    vocabulary remap, so each replica's internal near-dup/statistics
    structure is EXACTLY replica 0's, while shingle sets across
    replicas are disjoint (like genuinely new content);
  - customer names: a 2i-char suffix (common-suffix appends preserve
    edit distance within a replica; >=2 edits between replicas keeps
    the lev<=1 ER blocking from matching across);
  - embeddings: replicas >0 get fresh hash-derived coordinates (same
    marginal scale, no cross-replica near-dups).

Usage: python3 tools/make_scale_corpus.py <srcSfDir> <dstDir> <K>
"""
import sys

import duckdb

STRIDE = 10_000_000_000


def main() -> None:
    src, dst, k = sys.argv[1], sys.argv[2], int(sys.argv[3])
    con = duckdb.connect()
    import os
    os.makedirs(dst, exist_ok=True)

    # table -> per-replica SELECT template ({i} = replica index)
    remap = {
        "region": None,   # dims copied once
        "nation": None,
        "customer": "c_custkey + {o} AS c_custkey, "
                    "c_name || '{namesalt}' AS c_name, c_nationkey, "
                    "c_acctbal, c_mktsegment",
        "supplier": "s_suppkey + {o} AS s_suppkey, s_name, s_nationkey, "
                    "s_acctbal",
        "part": "p_partkey + {o} AS p_partkey, p_name, p_brand, p_type, "
                "p_size, p_retailprice",
        "orders": "o_orderkey + {o} AS o_orderkey, o_custkey + {o} AS "
                  "o_custkey, o_orderstatus, o_totalprice, o_orderdate, "
                  "o_orderpriority",
        "lineitem": "l_orderkey + {o} AS l_orderkey, l_partkey + {o} AS "
                    "l_partkey, l_suppkey + {o} AS l_suppkey, l_linenumber, "
                    "l_quantity, l_extendedprice, l_discount, l_tax, "
                    "l_returnflag, l_linestatus, l_shipdate",
        "events": "event_id + {o} AS event_id, ts, user_id + {o} AS "
                  "user_id, event_type, value, props",
        "documents": "doc_id + {o} AS doc_id, {text} AS text, lang, "
                     "source, CAST(length({text}) AS BIGINT) AS n_chars",
        "embeddings": "vec_id + {o} AS vec_id, {emb} AS embedding, label",
    }
    for table, tmpl in remap.items():
        path = f"{src}/{table}.parquet"
        if tmpl is None:
            con.execute(
                f"COPY (SELECT * FROM '{path}') TO "
                f"'{dst}/{table}.parquet' (FORMAT PARQUET)")
        else:
            parts = []
            for i in range(k):
                text = ("text" if i == 0 else
                        "array_to_string(list_transform("
                        f"string_split(text, ' '), t -> t || 'z{i}'), ' ')")
                emb = ("embedding" if i == 0 else
                       f"[CAST((hash(vec_id * 64 + j + {i} * 1000003) "
                       "% 1000) / 1000.0 - 0.5 AS FLOAT) "
                       "for j in range(1, len(embedding) + 1)]")
                sel = tmpl.format(i=i, o=i * STRIDE, text=text, emb=emb,
                                  namesalt="qq" * i)
                parts.append(f"SELECT {sel} FROM '{path}'")
            union = " UNION ALL ".join(parts)
            con.execute(f"COPY ({union}) TO '{dst}/{table}.parquet' "
                        "(FORMAT PARQUET)")
        n = con.sql(f"SELECT count(*) FROM '{dst}/{table}.parquet'") \
            .fetchone()[0]
        print(f"[scale-corpus] {table}: {n} rows")


if __name__ == "__main__":
    main()
