"""Persisted IVF ANN index: the similarity-search half of the
daily-ingest contract.

:func:`..operators.simsearch.build_ivf_index` (x14/x42's scale path)
trains the coarse quantizer and re-assigns the WHOLE corpus on every
run -- one full embedding scan per session just to rebuild state that
never changed.  At a steady 100 TB corpus with a small daily crawl that
rebuild dwarfs both the append and the search.  This module persists
the index once, mirroring the MinHash signature store
(operators/minhash_store.py) artifact discipline exactly:

* :func:`write_ann_store` -- one :func:`build_ivf_index` pass (sample-
  trained quantizer + one distributed assignment), written as a
  cell-partitioned parquet relation plus the centroid matrix and a
  params manifest;
* :func:`append_ann_batch` -- assigns ONLY the new batch against the
  STORED centroids (:func:`..operators.simsearch.assign_cells`, the
  same code path the build used) into a per-batch directory; O(batch)
  CPU, the corpus is never rescanned;
* :func:`ann_store_search` -- reads the stored relation (base + applied
  batches) and runs the in-memory engine's own
  :func:`..operators.simsearch.ivf_search_batch` over it, so a stored
  search is result-identical to a fresh in-memory rebuild BY
  CONSTRUCTION (pinned in tests/test_ann_store.py);
* :func:`compact_ann_store` -- folds applied batch dirs into a
  generation-suffixed base relation (manifest-last swap), keeping
  read-side file-listing cost flat as daily appends accumulate.

Frozen-centroid semantics -- the deliberate analog of the signature
store's frozen-DF table: centroids train once at build time and every
appended batch is assigned against them verbatim.  That is what makes
the append O(batch); retraining would re-scan the corpus.  The trade is
the same bounded drift: as appends shift the data distribution, cell
balance (and so recall-at-fixed-probe) degrades -- the manifest tracks
``n_appended`` vs ``n_vecs`` at build, and the guidance mirrors the
signature store's: rebuild (or re-run :func:`write_ann_store`) when
cumulative appends exceed ~10-20% of the corpus.

Crash discipline (shared with the signature store): every mutator holds
an exclusive flock; relations are written first and the atomic manifest
replace is the commit; batch dirs rename-then-commit so a crash is
healed by retrying the same ``batch_id``; a batch id stays committed
forever (``applied_batches`` OR ``compacted_batches``), so replays
never double-append; superseded generation/batch dirs survive a grace
window (readers take no lock) and age out of the next compaction's
sweep.

Reference parity note: the reference engine has no vector index; this
extends its surface with the ANN operation a training-data pipeline
runs daily (SURVEY.md section 2.4 extension family, r11 verdict task 6).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .minhash_store import _store_lock, _write_manifest
from .simsearch import (
    IVFIndex,
    assign_cells,
    build_ivf_index,
    ivf_search_batch,
    valid_vectors,
)

ANN_MANIFEST = "manifest.json"
ANN_STORE_VERSION = 1
CENTROIDS = "centroids.json"

#: Superseded dirs survive this long before the next compaction's sweep
#: removes them -- same reader-grace rationale (and bound) as
#: minhash_store._SWEEP_GRACE_NS.
_ANN_SWEEP_GRACE_NS = 3600 * 1_000_000_000


def _manifest_path(path: str) -> str:
    return os.path.join(path, ANN_MANIFEST)


def read_ann_manifest(path: str) -> dict:
    with open(_manifest_path(path)) as f:
        m = json.load(f)
    if m.get("version") != ANN_STORE_VERSION:
        raise ValueError(
            f"ANN store at {path}: version {m.get('version')} "
            f"!= supported {ANN_STORE_VERSION}"
        )
    return m


def _assigned_dir(path: str, m: dict) -> str:
    gen = m.get("generation", 0)
    return os.path.join(
        path, "assigned" if gen == 0 else f"assigned-g{gen}"
    )


def _committed(m: dict) -> set:
    return set(m.get("applied_batches", [])) | set(
        m.get("compacted_batches", [])
    )


def _assigned_relation(spark: SparkSession, path: str, m: dict) -> DataFrame:
    """Current generation's base relation plus every APPLIED batch dir
    (manifest-listed; an unlisted dir is an uncommitted append and must
    be invisible)."""
    paths = [_assigned_dir(path, m)] + [
        os.path.join(path, "batches", b, "assigned")
        for b in m.get("applied_batches", [])
    ]
    return spark.read.parquet(*paths)


def read_centroids(path: str):
    with open(os.path.join(path, CENTROIDS)) as f:
        return [list(map(float, c)) for c in json.load(f)]


def write_ann_store(
    df: DataFrame,
    path: str,
    n_clusters: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
    manifest_extra: dict | None = None,
) -> dict:
    """Build the corpus's ANN store at ``path`` and return the manifest:
    one :func:`build_ivf_index` pass (so the quantizer sample, k-means
    draw, and assignment are bit-identical to the in-memory engine's),
    with the assigned relation written repartitioned by ``cell`` --
    searches prefilter on cell, so cell-clustered files turn the probe
    into a row-group-skipping scan of ~n_probe/n_clusters of the data.

    Manifest written LAST (a crashed build reads as absent); rebuilding
    over an existing store removes its manifest and batch dirs first,
    exactly like the signature store's rebuild."""
    import re
    import shutil

    spark = df.sparkSession
    parallelism = spark.sparkContext.defaultParallelism
    with _store_lock(path):
        if os.path.exists(_manifest_path(path)):
            os.remove(_manifest_path(path))
        shutil.rmtree(os.path.join(path, "batches"), ignore_errors=True)
        for entry in os.listdir(path) if os.path.isdir(path) else []:
            if re.match(r"^assigned-g\d+$", entry):
                shutil.rmtree(os.path.join(path, entry), ignore_errors=True)

        if valid_vectors(df, vec_col, id_col).isEmpty():
            raise ValueError(
                "write_ann_store: corpus has no valid vectors"
            )
        index = build_ivf_index(
            df,
            n_clusters=n_clusters,
            vec_col=vec_col,
            id_col=id_col,
            seed=seed,
        )
        try:
            index.assigned.repartition(parallelism, "cell").write.mode(
                "overwrite"
            ).parquet(os.path.join(path, "assigned"))
            n_vecs = spark.read.parquet(
                os.path.join(path, "assigned")
            ).count()
            dim = len(index.centers[0])
            tmp = os.path.join(path, f".{CENTROIDS}.tmp")
            with open(tmp, "w") as f:
                json.dump(
                    [[float(x) for x in c] for c in index.centers], f
                )
            os.replace(tmp, os.path.join(path, CENTROIDS))
        finally:
            index.unpersist()

        manifest = {
            "version": ANN_STORE_VERSION,
            "n_clusters": int(n_clusters),
            "dim": int(dim),
            "vec_col": vec_col,
            "id_col": id_col,
            "seed": int(seed),
            "n_vecs": int(n_vecs),
            "n_appended": 0,
            "applied_batches": [],
            **(manifest_extra or {}),
        }
        _write_manifest(path, manifest)
    return manifest


def append_ann_batch(
    spark: SparkSession,
    store_path: str,
    new_df: DataFrame,
    batch_id: str | None = None,
    validate_ids: bool = True,
) -> dict:
    """Assign a new batch against the STORED centroids (frozen-centroid
    semantics -- no retrain, no corpus rescan) and fold it in as one
    batch directory, committed by the manifest.

    Same idempotency contract as the signature store's append: build in
    a temp dir, atomic rename to ``batches/<batch_id>/``, manifest
    commit (re-read + merge) under the store flock; a retry of a
    committed id -- applied OR already folded by a compaction -- is a
    no-op, so pass a stable ``batch_id`` (e.g. the ingest date) for
    retry safety."""
    import shutil
    import uuid

    m = read_ann_manifest(store_path)
    if batch_id is None:
        batch_id = uuid.uuid4().hex[:12]
    if batch_id in _committed(m):
        return m  # already committed: idempotent no-op
    id_col, vec_col = m["id_col"], m["vec_col"]
    new_vecs = valid_vectors(new_df, vec_col, id_col).select(
        F.col(id_col),
        F.expr(f"transform({vec_col}, x -> CAST(x AS DOUBLE))").alias("v"),
    )
    if validate_ids:
        overlap = (
            _assigned_relation(spark, store_path, m)
            .select(id_col)
            .join(
                F.broadcast(new_vecs.select(id_col).distinct()),
                id_col,
                "left_semi",
            )
        )
        if not overlap.isEmpty():
            sample = [r[0] for r in overlap.limit(5).collect()]
            raise ValueError(
                f"append_ann_batch: store at {store_path} and new_df "
                f"share vector ids (e.g. {sample}); ids must be disjoint"
            )

    batches_root = os.path.join(store_path, "batches")
    final_dir = os.path.join(batches_root, batch_id)
    if not os.path.isdir(final_dir):
        tmp = os.path.join(batches_root, f".tmp-{uuid.uuid4().hex[:12]}")
        assign_cells(new_vecs, read_centroids(store_path), id_col).write.mode(
            "overwrite"
        ).parquet(os.path.join(tmp, "assigned"))
        try:
            os.rename(tmp, final_dir)
        except OSError:
            shutil.rmtree(tmp, ignore_errors=True)
            if not os.path.isdir(final_dir):
                raise
    # stats from the COMMITTED files (heal-retry books what's on disk)
    n_new = spark.read.parquet(os.path.join(final_dir, "assigned")).count()
    with _store_lock(store_path):
        m = read_ann_manifest(store_path)
        if batch_id in _committed(m):
            return m  # racing retry/compaction committed first: no-op
        m["applied_batches"] = list(m.get("applied_batches", [])) + [
            batch_id
        ]
        m["n_appended"] = int(m.get("n_appended", 0)) + int(n_new)
        _write_manifest(store_path, m)
    return m


def ann_store_search(
    spark: SparkSession,
    store_path: str,
    query_ids,
    k: int = 10,
    n_probe: int = 2,
) -> DataFrame:
    """Top-k by exact cosine within the ``n_probe`` stored cells nearest
    each query -- :func:`..operators.simsearch.ivf_search_batch` run
    over the persisted relation instead of a fresh rebuild, so results
    are identical to the in-memory engine's by construction.  Per-search
    cost: one driver read of the centroid matrix (KBs), one collect of
    the |panel| query vectors (cell prefilter pushed to parquet), and
    one cell-pruned scan -- the corpus is never re-assigned."""
    m = read_ann_manifest(store_path)
    index = IVFIndex(
        _assigned_relation(spark, store_path, m),
        read_centroids(store_path),
        m["id_col"],
    )
    return ivf_search_batch(index, query_ids, k=k, n_probe=n_probe)


def compact_ann_store(spark: SparkSession, store_path: str) -> dict:
    """Fold every applied batch into the base relation -- retention for
    the daily loop, same generation + manifest-last + grace-sweep
    discipline as the signature store's :func:`compact_store` (see its
    docstring for the crash/reader analysis; it applies verbatim).
    Purely physical: the folded relation holds exactly base + batches
    (repartitioned by cell), centroids are untouched, and ``n_appended``
    keeps its drift-signal meaning."""
    parallelism = spark.sparkContext.defaultParallelism
    with _store_lock(store_path):
        m = read_ann_manifest(store_path)
        _sweep_unreferenced_ann(store_path, m)
        if not m.get("applied_batches"):
            return m  # nothing to fold: sweep-only pass
        new_gen = m.get("generation", 0) + 1
        rel = _assigned_relation(spark, store_path, m)
        rel.repartition(parallelism, "cell").write.mode(
            "overwrite"
        ).parquet(os.path.join(store_path, f"assigned-g{new_gen}"))
        folded = list(m["applied_batches"])
        m["generation"] = new_gen
        m["applied_batches"] = []
        m["compacted_batches"] = m.get("compacted_batches", []) + folded
        _write_manifest(store_path, m)
    return m


def _sweep_unreferenced_ann(store_path: str, m: dict) -> None:
    """Grace-window sweep of unreferenced dirs (superseded generations,
    folded batch dirs) -- minhash_store._sweep_unreferenced's contract
    for the ANN layout."""
    import re
    import shutil
    import time

    now_ns = time.time_ns()

    def _old(d: str) -> bool:
        try:
            return now_ns - os.stat(d).st_mtime_ns > _ANN_SWEEP_GRACE_NS
        except OSError:
            return False

    current = os.path.basename(_assigned_dir(store_path, m))
    try:
        entries = os.listdir(store_path)
    except OSError:
        return
    for entry in entries:
        d = os.path.join(store_path, entry)
        if (
            re.match(r"^assigned(-g\d+)?$", entry)
            and entry != current
            and _old(d)
        ):
            shutil.rmtree(d, ignore_errors=True)
    for b in m.get("compacted_batches", []):
        d = os.path.join(store_path, "batches", b)
        if os.path.isdir(d) and _old(d):
            shutil.rmtree(d, ignore_errors=True)


# -- registry -----------------------------------------------------------------

from ..queries import register, t  # noqa: E402
from .minhash_store import (  # noqa: E402
    _corpus_fingerprint,
    _prune_stale_stores,
)
from .simsearch import (  # noqa: E402
    ANN_QUERY_IDS,
    DIM,
    _exact_topk_panel,
    _panel_prep,
    _with_recall_flag,
    duck_cosine,
)

_DUCK_PANEL_SQL = (
    "WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings), "
    "q AS (SELECT vec_id AS query_id, v AS qv FROM e "
    f" WHERE vec_id IN {ANN_QUERY_IDS}) "
    "SELECT query_id, vec_id, score, rank, TRUE AS recall_ok FROM ("
    " SELECT q.query_id, e.vec_id, round("
    + duck_cosine("e.v", "q.qv", DIM)
    + ", 6) AS score, "
    "  row_number() OVER (PARTITION BY q.query_id ORDER BY round("
    + duck_cosine("e.v", "q.qv", DIM)
    + ", 6) DESC, e.vec_id) AS rank "
    " FROM e CROSS JOIN q WHERE e.vec_id <> q.query_id) t WHERE rank <= 10"
)


def _ann_store_path(sf_dir: str, n: int, cut: int, fp: str) -> str:
    """Content-addressed cache path (the signature-store convention):
    the corpus fingerprint names the directory, so regenerated testdata
    builds fresh instead of mutating under a concurrent reader."""
    import hashlib

    key = hashlib.md5(
        f"{sf_dir}|ann|{n}|{cut}|v{ANN_STORE_VERSION}".encode()
    ).hexdigest()[:12]
    return os.path.join("/tmp/conecta_spark_annstore", key, fp)


@register(
    "x79_ann_store_search",
    _DUCK_PANEL_SQL,
    "PERSISTED-ANN-INDEX search -- the full store lifecycle: IVF "
    "centroids + cell assignments built once over the oldest 4/5 of "
    "vec_ids and written as a parquet ANN store, the newest fifth "
    "appended as a batch assigned against the STORED centroids (frozen-"
    "centroid semantics, no retrain), and the x14 acceptance panel "
    "searched against the stored relation (8/16 cells probed) -- the "
    "corpus is read, never re-assigned.  Metric-oracled exactly like "
    "x14: exact cosine top-10 panel cross-checked by DuckDB + measured "
    "recall@10 acceptance flag (mean over 5 queries >= 0.5, the "
    "isotropic-corpus coverage bound)",
)
def x79_ann_store(spark, sf_dir) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    prep = _panel_prep(spark, sf_dir)
    if prep.isEmpty():
        return _with_recall_flag(
            _exact_topk_panel(emb, "cosine", vecs=prep), {}, 0.5
        )
    n = emb.count()
    cut = (4 * n) // 5
    fp = _corpus_fingerprint(sf_dir, table="embeddings")
    path = _ann_store_path(sf_dir, n, cut, fp)

    def _ready() -> bool:
        try:
            mm = read_ann_manifest(path)
            return (
                mm.get("corpus_fingerprint") == fp
                and "day-001" in _committed(mm)
            )
        except (OSError, ValueError):
            return False

    if not _ready():
        import fcntl

        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, ".build.lock"), "w") as lock:
            fcntl.flock(lock, fcntl.LOCK_EX)
            if not _ready():
                write_ann_store(
                    emb.where(F.col("vec_id") < cut),
                    path,
                    manifest_extra={"corpus_fingerprint": fp},
                )
                append_ann_batch(
                    spark,
                    path,
                    emb.where(F.col("vec_id") >= cut),
                    batch_id="day-001",
                )
        _prune_stale_stores(path)
    ann: dict = {}
    for r in (
        ann_store_search(spark, path, ANN_QUERY_IDS, k=10, n_probe=8)
        .select("query_id", "vec_id")
        .collect()
    ):
        ann.setdefault(r.query_id, []).append(r.vec_id)
    return _with_recall_flag(
        _exact_topk_panel(emb, "cosine", vecs=prep), ann, 0.5
    )
