#!/usr/bin/env python
"""IVF recall rung (r9 verdict task 6): re-measure the 200k-vector ann
block at a better quantizer config and record the full recall/cost
frontier, because on these embeddings recall has a hard physics:

The synthetic vectors are ISOTROPIC unit vectors (norm cv = 0, no
cluster structure), so a true neighbor's cell is nearly uniform random
and recall@10 tracks the CANDIDATE FRACTION scanned, whatever the
quantizer -- measured (20-query numpy panel, same _lloyd_kmeans):

    128 cells: probe 32 -> 0.805 @ 25% of corpus; 64 -> 0.915 @ 50%
    256 cells: probe 64 -> 0.805 @ 25%;          96 -> 0.915 @ 37.6%
    512 cells: probe 192 -> 0.900 @ 37.8%
    1024 cells: probe 320 -> 0.890 @ 32.3%

A finer quantizer buys a better frontier point (same recall, fewer
candidates -- the faiss sqrt(n) rule), but >=0.9 recall on clusterless
data costs ~1/3 of the corpus scanned, full stop.  On real embedding
corpora (which cluster), the same index reaches 0.9+ probing a few
percent; the operator is not the limit, the data is.  This run replaces
the r8 ann block's 128/64 (0.82 recall at 50% candidates) with 256/96
(>=0.9 at 37.6%) through the REAL Spark operator, and stores the
measured frontier so the trade is visible.

Writes the ``ann`` block (with ``frontier``) into SF10_RUNG.json and
prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    import numpy as np

    import sf10_rung
    from conecta_spark.operators.simsearch import (
        ANN_QUERY_IDS,
        _exact_topk_panel,
        build_ivf_index,
        ivf_search_batch,
    )
    from conecta_spark.queries import _load_extensions
    from conecta_spark.session import get_session

    _load_extensions()
    spark = get_session(
        app_name="conecta-spark-ann-rung",
        master=f"local[{cpus}]",
        extra_conf={
            "spark.sql.shuffle.partitions": str(int(cpus) * 2),
            "spark.ui.enabled": "false",
            "spark.driver.memory": "48g",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    emb = spark.read.parquet(f"{sf10_rung.SF10_DIR}/embeddings.parquet")
    n_vectors = emb.count()

    t0 = time.perf_counter()
    exact_rows = _exact_topk_panel(emb, "cosine").collect()
    exact_sec = round(time.perf_counter() - t0, 3)
    exact: dict = {}
    for r in exact_rows:
        exact.setdefault(r.query_id, []).append((r.vec_id, round(r.score, 6)))

    def panel_recall(index, n_probe):
        t0 = time.perf_counter()
        rows = ivf_search_batch(
            index, ANN_QUERY_IDS, k=10, n_probe=n_probe
        ).collect()
        sec = round(time.perf_counter() - t0, 3)
        ann: dict = {}
        for r in rows:
            ann.setdefault(r.query_id, []).append(
                (r.vec_id, round(r.score, 6))
            )
        id_rec, score_rec = [], []
        for qid, truth in exact.items():
            got = ann.get(qid, [])
            truth_ids = {v for v, _ in truth}
            kth = min(s for _, s in truth)
            id_rec.append(
                len([v for v, _ in got if v in truth_ids]) / len(truth)
            )
            score_rec.append(
                len([s for _, s in got if s >= kth]) / len(truth)
            )
        return (
            round(float(np.mean(id_rec)), 4),
            round(float(np.mean(score_rec)), 4),
            sec,
        )

    frontier = []
    headline = None
    for n_cells, probes in ((128, (32, 64)), (256, (64, 96))):
        t0 = time.perf_counter()
        index = build_ivf_index(emb, n_clusters=n_cells)
        index.assigned.count()
        build_sec = round(time.perf_counter() - t0, 3)
        try:
            for n_probe in probes:
                id_r, score_r, sec = panel_recall(index, n_probe)
                row = {
                    "n_cells": n_cells,
                    "n_probe": n_probe,
                    "cand_frac": round(n_probe / n_cells, 3),
                    "id_recall_at_10": id_r,
                    "score_recall_at_10": score_r,
                    "search_sec": sec,
                    "build_sec": build_sec,
                }
                frontier.append(row)
                if (n_cells, n_probe) == (256, 96):
                    headline = row
        finally:
            index.unpersist()

    block = {
        "vectors": n_vectors,
        "n_cells": headline["n_cells"],
        "n_probe": headline["n_probe"],
        "build_sec": headline["build_sec"],
        "search_sec": headline["search_sec"],
        "exact_panel_sec": exact_sec,
        "id_recall_at_10": headline["id_recall_at_10"],
        "score_recall_at_10": headline["score_recall_at_10"],
        "frontier": frontier,
        "isotropy_note": (
            "synthetic embeddings are isotropic unit vectors (no cluster "
            "structure): recall tracks candidate fraction for any "
            "quantizer; finer quantizer = same recall at fewer "
            "candidates, and >=0.9 recall costs ~1/3 of the corpus here"
        ),
    }
    rung_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "SF10_RUNG.json"
    )
    try:
        with open(rung_path) as f:
            rung = json.load(f)
    except OSError:
        rung = {}
    rung["ann"] = block
    with open(rung_path, "w") as f:
        json.dump(rung, f, indent=1)
    print(json.dumps({"metric": "ann_rung", **block}))


if __name__ == "__main__":
    main()
