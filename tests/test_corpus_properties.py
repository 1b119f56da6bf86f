"""Property-based invariants for the corpus-assembly operators (hypothesis
with a Python reference model; few examples -- each runs real Spark jobs).

* sequence_pack: seq assignment equals the reference greedy packer on any
  token distribution; streams are independent; no doc is lost or invented.
* incremental_dedup: output is exactly the batch rows whose content is
  absent from the snapshot, regardless of id collisions or duplicates.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import Row

from conecta_spark.functions.sampling import sequence_pack
from conecta_spark.operators.dedup import incremental_dedup

texts = st.lists(
    st.integers(min_value=0, max_value=12),  # token counts per doc
    min_size=1,
    max_size=24,
)


@given(toks=texts, seq_len=st.integers(min_value=1, max_value=16))
@settings(max_examples=8, deadline=None)
def test_sequence_pack_matches_reference_packer(spark, toks, seq_len):
    docs = [
        Row(doc_id=i, lang="en", text=" ".join(["w"] * n) if n else "")
        for i, n in enumerate(toks)
    ]
    out = {
        r.doc_id: (r.shard, r.n_tok, r.seq_id)
        for r in sequence_pack(
            spark.createDataFrame(docs), seq_len=seq_len, shards=4
        ).collect()
    }
    # reference: per (shard) stream in doc_id order, seq = start // seq_len
    assert set(out) == set(range(len(toks))), "docs lost or invented"
    offsets: dict[int, int] = {}
    for i, n in enumerate(toks):
        shard = i % 4
        start = offsets.get(shard, 0)
        assert out[i] == (shard, n, start // seq_len), (i, out[i])
        offsets[shard] = start + n


corpus = st.lists(st.text(alphabet="abc", max_size=3), min_size=0, max_size=12)


@given(snap=corpus, batch=corpus)
@settings(max_examples=8, deadline=None)
def test_incremental_dedup_is_set_difference_on_content(spark, snap, batch):
    mk = lambda rows, off: [
        Row(doc_id=off + i, text=t, source="s") for i, t in enumerate(rows)
    ]
    schema = "doc_id long, text string, source string"
    sdf = spark.createDataFrame(mk(snap, 0), schema)
    bdf = spark.createDataFrame(mk(batch, 1000), schema)
    got = sorted(r.doc_id for r in incremental_dedup(bdf, sdf).collect())
    want = sorted(
        1000 + i for i, t in enumerate(batch) if t not in set(snap)
    )
    assert got == want
