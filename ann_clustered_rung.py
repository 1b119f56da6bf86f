#!/usr/bin/env python
"""IVF recall rung on CLUSTER-STRUCTURED embeddings (r10 verdict task 5).

The standing ann block's 0.92 recall carries an honest caveat: the
driver's synthetic embeddings are isotropic unit vectors, so recall
tracks candidate fraction for ANY quantizer and the frontier says
nothing about real embedding corpora -- which cluster.  This rung
generates a mixture-of-Gaussians fixture (public-knowledge synthetic:
unit-normalized Gaussian cluster centers, isotropic within-cluster
noise, L2-normalized points -- the standard ANN-benchmark construction),
re-runs the recall/cost frontier through the REAL Spark operator
(build_ivf_index + ivf_search_batch), and tunes the cell count on it.

What the numbers must show: on clustered data the same operator reaches
>=0.9 recall@10 probing a few percent of the corpus (vs ~1/3 on
isotropic data), and a finer quantizer keeps buying candidate-fraction
reductions -- i.e. the operator was never the limit, the data was.

Fixture: 200k x 64-dim, 100 clusters, sigma=0.4/sqrt(64) (inter-center
angles ~90 deg, within-cluster cosine ~0.86 -- see the SIGMA note),
seed-pinned, written once to
testdata_sf10/embeddings_clustered.parquet with the driver embeddings'
exact schema.  Ground truth: exact cosine top-10 for a
20-query panel, computed in numpy (double precision) over the same
parquet -- engine-independent truth, same construction as the r9
frontier panels.

Writes an ``ann_clustered`` block into SF10_RUNG.json and prints one
JSON line.  Run: python ann_clustered_rung.py  (ANN_CLUSTERED_SMOKE=1
shrinks the fixture and skips the artifact write).
"""

from __future__ import annotations

import json
import os
import sys
import time

SMOKE = bool(os.environ.get("ANN_CLUSTERED_SMOKE"))
N_VECTORS = 20_000 if SMOKE else 200_000
N_COMPONENTS = 100
DIM = 64
#: Per-coordinate noise MUST scale as 1/sqrt(DIM): the total noise norm
#: is sigma*sqrt(DIM) against unit-norm centers, so a dimension-blind
#: sigma=0.3 gives noise norm 2.4 and the "clusters" are isotropic all
#: over again (measured: recall collapsed to 0.44 exactly as on the
#: driver embeddings).  0.4/sqrt(64)=0.05 puts same-cluster cosine at
#: ~1/(1+0.16)~0.86 vs ~0 cross-cluster (centers near-orthogonal in
#: 64-dim): strong but not degenerate structure.
SIGMA = 0.4 / DIM ** 0.5
SEED = 20260816
PANEL = tuple(range(20))


def _fixture_path() -> str:
    here = os.path.dirname(os.path.abspath(__file__))
    name = (
        "embeddings_clustered_smoke.parquet"
        if SMOKE
        else "embeddings_clustered.parquet"
    )
    return os.path.join(here, "testdata_sf10", name)


def _generate(spark, path: str):
    """Mixture of Gaussians on the unit sphere, seed-pinned; schema
    matches the driver embeddings (vec_id, embedding float array, label
    = true component, so label-purity checks stay possible)."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(SEED)
    centers = rng.standard_normal((N_COMPONENTS, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.integers(0, N_COMPONENTS, size=N_VECTORS)
    pts = centers[labels] + SIGMA * rng.standard_normal((N_VECTORS, DIM))
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    pdf = pd.DataFrame(
        {
            "vec_id": np.arange(N_VECTORS, dtype=np.int64),
            "embedding": list(pts.astype(np.float32)),
            "label": labels.astype(np.int32),
        }
    )
    spark.createDataFrame(pdf).repartition(32).write.mode(
        "overwrite"
    ).parquet(path)


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    import numpy as np

    from conecta_spark.operators.simsearch import (
        build_ivf_index,
        ivf_search_batch,
    )
    from conecta_spark.queries import _load_extensions
    from conecta_spark.session import get_session

    _load_extensions()
    spark = get_session(
        app_name="conecta-spark-ann-clustered",
        master=f"local[{cpus}]",
        extra_conf={
            "spark.sql.shuffle.partitions": str(int(cpus) * 2),
            "spark.ui.enabled": "false",
            "spark.driver.memory": "48g",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    path = _fixture_path()
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        _generate(spark, path)
    emb = spark.read.parquet(path)
    n_vectors = emb.count()

    # engine-independent exact truth: numpy double-precision cosine
    # top-10 per panel query (scores rounded like the operator's)
    rows = emb.select("vec_id", "embedding").toPandas()
    order = np.argsort(rows["vec_id"].to_numpy())
    ids = rows["vec_id"].to_numpy()[order]
    M = np.array(rows["embedding"].tolist(), dtype=np.float64)[order]
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    exact: dict = {}
    for qid in PANEL:
        qi = int(np.searchsorted(ids, qid))
        scores = Mn @ Mn[qi]
        scores[qi] = -np.inf  # self excluded, as in the operator
        top = np.argsort(-scores)[:10]
        exact[qid] = [
            (int(ids[j]), round(float(scores[j]), 6)) for j in top
        ]

    def panel_recall(index, n_probe):
        t0 = time.perf_counter()
        got_rows = ivf_search_batch(
            index, PANEL, k=10, n_probe=n_probe
        ).collect()
        sec = round(time.perf_counter() - t0, 3)
        ann: dict = {}
        for r in got_rows:
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

    grid = (
        (100, (1, 2, 4)),
        (256, (2, 4, 8)),
        (448, (4, 8, 16)),
        (1024, (8, 16, 32)),
    )
    frontier = []
    for n_cells, probes in grid:
        t0 = time.perf_counter()
        index = build_ivf_index(emb, n_clusters=n_cells)
        index.assigned.count()
        build_sec = round(time.perf_counter() - t0, 3)
        try:
            for n_probe in probes:
                id_r, score_r, sec = panel_recall(index, n_probe)
                frontier.append(
                    {
                        "n_cells": n_cells,
                        "n_probe": n_probe,
                        "cand_frac": round(n_probe / n_cells, 4),
                        "id_recall_at_10": id_r,
                        "score_recall_at_10": score_r,
                        "search_sec": sec,
                        "build_sec": build_sec,
                    }
                )
        finally:
            index.unpersist()

    # tune: the cheapest candidate fraction that clears 0.9 id-recall
    passing = [r for r in frontier if r["id_recall_at_10"] >= 0.9]
    headline = (
        min(passing, key=lambda r: (r["cand_frac"], r["search_sec"]))
        if passing
        else max(frontier, key=lambda r: r["id_recall_at_10"])
    )

    block = {
        "vectors": n_vectors,
        "fixture": {
            "components": N_COMPONENTS,
            "sigma": SIGMA,
            "seed": SEED,
            "construction": (
                "unit-normalized Gaussian centers + isotropic within-"
                "cluster noise, points L2-normalized (standard ANN-"
                "benchmark mixture-of-Gaussians)"
            ),
        },
        "headline": headline,
        "frontier": frontier,
        "isotropic_comparison": (
            "the driver-embedding ann block needs ~37% of the corpus "
            "scanned for >=0.9 recall (isotropic data); this fixture "
            "shows the same operator's frontier on clustered data"
        ),
        "load_end": round(os.getloadavg()[0], 1),
    }
    rung_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "SF10_RUNG.json"
    )
    if not SMOKE:
        try:
            with open(rung_path) as f:
                rung = json.load(f)
        except OSError:
            rung = {}
        rung["ann_clustered"] = block
        with open(rung_path, "w") as f:
            json.dump(rung, f, indent=1)
    print(json.dumps({"metric": "ann_clustered_rung", **block}))


if __name__ == "__main__":
    main()
