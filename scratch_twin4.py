"""Scratch: driver-twin check of the 4 new metric-oracle entries."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from tests.oracle_utils import duckdb_con
import __spark_entry__ as entry
from conecta_spark.session import get_session

NAMES = [
    "x67_dedup_clusters_distributed",
    "x09_dedup_minhash_ml",
    "x13_ann_brp_ml",
    "x14_ann_ivf_ml",
    "x25_sketch_stats",
]


def canon(df):
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(6)
    return df.astype(str).sort_values(list(df.columns)).reset_index(drop=True)


spark = get_session(
    app_name="twin4",
    extra_conf={"spark.sql.shuffle.partitions": "8", "spark.ui.enabled": "false"},
)
spark.sparkContext.setLogLevel("ERROR")
qs, oracles = entry.queries(), entry.oracle_sql()
for sf_dir in (sys.argv[1:] or ["/root/testdata/sf0.01"]):
    con = duckdb_con(sf_dir)
    for name in NAMES:
        sdf = qs[name](spark, sf_dir).toPandas()
        ddf = con.sql(oracles[name]).df()
        problems = []
        if len(sdf) != len(ddf):
            problems.append(f"rows {len(sdf)} vs {len(ddf)}")
        if sorted(sdf.columns) != sorted(ddf.columns):
            problems.append(f"columns {sorted(sdf.columns)} vs {sorted(ddf.columns)}")
        else:
            s = sdf[sorted(sdf.columns)].copy()
            d = ddf[sorted(ddf.columns)].copy()
            for c in s.columns:
                ks, kd = s[c].dtype.kind, d[c].dtype.kind
                if ks != kd and not {ks, kd} <= {"O", "M"}:
                    problems.append(f"dtype {c}: {ks} vs {kd}")
            if not problems and not canon(s).equals(canon(d)):
                problems.append("values")
                cs, cd = canon(s), canon(d)
                neq = cs != cd
                print(cs[neq.any(axis=1)].head(5))
                print(cd[neq.any(axis=1)].head(5))
        print(sf_dir, name, "OK" if not problems else f"FAIL {problems}", flush=True)
    con.close()
spark.stop()
